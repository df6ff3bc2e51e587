"""Watermarked windows + keyed-state sessionization: streamed output must
match the batch computation of the same operator."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark.streaming import windowed
from rust_near_indexer_spark.tables import load

N_CHUNKS = 3


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """The events table as height... ts-ordered chunked parquet files —
    each chunk one micro-batch, so sessions and windows span batches."""
    d = str(tmp_path_factory.mktemp("event_stream"))
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts_ns")
        .orderBy("ts_ns")
    )
    rows = ev.count()
    per = (rows + N_CHUNKS - 1) // N_CHUNKS
    pdf = ev.toPandas()
    for c in range(N_CHUNKS):
        chunk = pdf.iloc[c * per : (c + 1) * per]
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"c{c}")
        )
    # flatten: move part files up so the directory is a flat file stream
    import glob
    import shutil

    for c in range(N_CHUNKS):
        (part,) = glob.glob(os.path.join(d, f"c{c}", "part-*.parquet"))
        shutil.move(part, os.path.join(d, f"{c:03d}.parquet"))
        shutil.rmtree(os.path.join(d, f"c{c}"))
    return d


def _stream(spark, d):
    schema = (
        "event_id long, user_id long, event_type string, value double, ts_ns long"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def test_sessionize_stream_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    q = (
        windowed.sessionize(_stream(spark, event_stream_dir))
        .writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start_ns"]): (r["session_end_ns"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }

    ev = load(spark, sf_dir, "events")
    batch = {
        (r["user_id"], r["session_start_ns"]): (r["session_end_ns"], r["n_events"])
        for r in windowed.batch_sessions(ev).collect()
    }
    # the stream emits only CLOSED sessions; each user's final session
    # stays in state — so streamed ⊂ batch, and batch-minus-last == streamed
    last_per_user = {}
    for (u, s), _ in batch.items():
        if u not in last_per_user or s > last_per_user[u]:
            last_per_user[u] = s
    closed_batch = {k: v for k, v in batch.items() if last_per_user[k[0]] != k[1]}
    assert streamed == closed_batch
    assert len(streamed) > 0


def _have_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas state protocol requires google.protobuf "
    "(not installed here); the applyInPandasWithState test covers the semantics",
)
def test_sessionize_tws_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """The transformWithStateInPandas formulation must emit the same
    closed sessions as the applyInPandasWithState one (same shared fold),
    i.e. batch-minus-open-sessions."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        q = (
            windowed.sessionize_tws(_stream(spark, event_stream_dir))
            .writeStream.format("memory")
            .queryName("sessions_tws")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    streamed = {
        (r["user_id"], r["session_start_ns"]): (r["session_end_ns"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_tws").collect()
    }

    ev = load(spark, sf_dir, "events")
    batch = {
        (r["user_id"], r["session_start_ns"]): (r["session_end_ns"], r["n_events"])
        for r in windowed.batch_sessions(ev).collect()
    }
    last_per_user = {}
    for (u, s), _ in batch.items():
        if u not in last_per_user or s > last_per_user[u]:
            last_per_user[u] = s
    closed_batch = {k: v for k, v in batch.items() if last_per_user[k[0]] != k[1]}
    assert streamed == closed_batch
    assert len(streamed) > 0


def test_windowed_counts_stream_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    q = (
        windowed.windowed_event_counts(_stream(spark, event_stream_dir))
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }

    ev = load(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in windowed.windowed_event_counts(ev).collect()
    }
    # append mode emits a window only when the watermark passes it: the
    # final window(s) stay open at end-of-stream → streamed ⊆ batch,
    # every emitted window exact, and most windows emitted
    assert streamed
    for k, v in streamed.items():
        assert batch[k] == v, k
    assert len(streamed) >= 0.8 * len(batch)


def test_dedup_stream_drops_redeliveries(spark, sf_dir, event_stream_dir, tmp_path):
    """Every chunk is delivered twice (at-least-once upstream); the
    streamed dedup must emit each event exactly once == batch distinct."""
    import shutil

    d = str(tmp_path / "dup_stream")
    os.makedirs(d)
    copies = []
    for f in sorted(os.listdir(event_stream_dir)):
        copies.append(shutil.copy(os.path.join(event_stream_dir, f), os.path.join(d, f)))
        copies.append(
            shutil.copy(
                os.path.join(event_stream_dir, f),
                os.path.join(d, f.replace(".parquet", "_redelivery.parquet")),
            )
        )
    # FileStreamSource orders micro-batches by modification time: pin an
    # explicit chunk0, chunk0-redelivery, chunk1, ... order so no chunk's
    # FIRST delivery arrives after a later chunk advanced the watermark
    # (which would drop the whole chunk as late — redelivery adjacency is
    # the scenario under test, not cross-chunk reordering)
    for i, p in enumerate(copies):
        os.utime(p, (1_000_000_000 + 60 * i, 1_000_000_000 + 60 * i))
    q = (
        windowed.dedup_events_stream(_stream(spark, d))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = [
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_stream").collect()
    ]
    expected = [
        r["event_id"]
        for r in load(spark, sf_dir, "events").select("event_id").distinct().collect()
    ]
    assert sorted(streamed) == sorted(expected)
    assert len(streamed) == len(set(streamed))
