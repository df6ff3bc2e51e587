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


class _FakeValueState:
    """Minimal ValueState double mirroring the TWS handle contract
    (exists/get/update) so _SessionProcessor's logic executes without the
    protobuf state-server protocol."""

    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_session_processor_logic_without_state_server(spark, sf_dir):
    """VERDICT r03 item 4: google.protobuf is absent here, so the
    transformWithStateInPandas runtime cannot execute — instead, drive
    _SessionProcessor directly through a fake typed-state handle (the
    exact init/handleInputRows/close surface Spark calls) and assert it
    emits the same closed sessions as the batch oracle, per user."""
    import pandas as pd

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts_ns")
        .orderBy("ts_ns")
        .toPandas()
    )
    batch = {
        (r["user_id"], r["session_start_ns"]): (r["session_end_ns"], r["n_events"])
        for r in windowed.batch_sessions(load(spark, sf_dir, "events")).collect()
    }
    emitted = {}
    open_state = {}
    for user_id, g in ev.groupby("user_id"):
        proc = windowed._SessionProcessor()
        handle = _FakeHandle()
        proc.init(handle)
        # split each user's time-ordered rows into 3 sequential batches
        # to exercise state carry across micro-batches
        k = (len(g) + 2) // 3
        parts = [g.iloc[i * k : (i + 1) * k] for i in range(3)]
        parts = [p for p in parts if len(p)]
        # Spark feeds per-batch row iterators; chunk each batch in two
        for p in parts:
            half = max(1, len(p) // 2)
            chunks = iter([p.iloc[:half], p.iloc[half:]])
            for out in proc.handleInputRows((user_id,), chunks, None):
                for r in out.itertuples(index=False):
                    emitted[(r.user_id, r.session_start_ns)] = (
                        r.session_end_ns,
                        r.n_events,
                    )
        proc.close()
        st = handle.states["session"]
        if st.exists():
            start_ns, last_ns, n = st.get()
            open_state[(user_id, start_ns)] = (last_ns, n)
    # emitted ∪ open-state must equal the batch sessions exactly
    assert emitted and open_state
    assert not (set(emitted) & set(open_state))
    combined = {**emitted, **open_state}
    assert combined == batch


def test_sessionize_tws_plan_contract(spark, event_stream_dir):
    """The sessionize_tws wiring analyzes end-to-end without protobuf:
    the analyzed streaming plan contains the TransformWithStateInPandas
    operator keyed by user_id, and its output schema is SESSION_SCHEMA
    (protobuf is only a run-time requirement of the state server)."""
    df = windowed.sessionize_tws(_stream(spark, event_stream_dir))
    assert df.isStreaming
    assert df.schema == windowed.SESSION_SCHEMA
    plan = df._jdf.queryExecution().analyzed().toString()
    # Spark 4.1 names the logical node TransformWithStateInPySpark
    assert "transformwithstatein" in plan.lower()
    assert "user_id" in plan


def test_stream_stream_interval_join_matches_batch(
    spark, sf_dir, event_stream_dir, tmp_path
):
    """The stream-stream interval join must emit exactly the batch join's
    pairs (inner join + time-range condition), across micro-batch
    boundaries — clicks from batch 0 must attribute purchases in batch 2
    via the join state."""
    q = (
        windowed.attribute_purchases_stream(_stream(spark, event_stream_dir))
        .writeStream.format("memory")
        .queryName("attr_pairs")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["purchase_event_id"], r["click_event_id"]): (
            r["user_id"],
            r["gap_us"],
        )
        for r in spark.sql("SELECT * FROM attr_pairs").collect()
    }
    ev = load(spark, sf_dir, "events")
    batch = {
        (r["purchase_event_id"], r["click_event_id"]): (r["user_id"], r["gap_us"])
        for r in windowed.batch_purchase_click_pairs(ev).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0
