"""Incremental rollup maintenance: micro-batched sum-merge must equal
the batch-at-once tier, and coarser tiers derived from the maintained
minute tier must equal tiers computed directly from raw."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark.operators import rollup
from rust_near_indexer_spark.tables import load

N_CHUNKS = 4


def _prepared(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


@pytest.fixture(scope="module")
def chunk_dir(spark, sf_dir, tmp_path_factory):
    """events split into ts-ordered parquet chunks — one per micro-batch,
    so most minute buckets RECUR across batches (ties at chunk edges)."""
    d = str(tmp_path_factory.mktemp("rollup_stream"))
    pdf = _prepared(spark, sf_dir).orderBy("ts_us").toPandas()
    per = (len(pdf) + N_CHUNKS - 1) // N_CHUNKS
    for c in range(N_CHUNKS):
        spark.createDataFrame(pdf.iloc[c * per : (c + 1) * per]).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, f"c{c}"))
        (part,) = glob.glob(os.path.join(d, f"c{c}", "part-*.parquet"))
        shutil.move(part, os.path.join(d, f"{c:03d}.parquet"))
        shutil.rmtree(os.path.join(d, f"c{c}"))
    return d


def _tier_dict(df):
    return {
        (r["bucket_start_us"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in df.collect()
    }


def test_streamed_merge_equals_batch_tier(spark, sf_dir, chunk_dir, tmp_path):
    """foreachBatch maintenance: each micro-batch's partial minute tier is
    sum-merged into a parquet-backed maintained tier (read → merge →
    overwrite, the S18 incremental-MV loop)."""
    state_dir = str(tmp_path / "minute_tier")
    schema = "ts_us long, event_type string, vc long"

    def on_batch(batch_df, batch_id):
        delta = rollup.minute_tier(batch_df)
        if os.path.exists(state_dir):
            existing = batch_df.sparkSession.read.parquet(state_dir)
            merged = rollup.merge_tier(existing, delta)
        else:
            merged = delta
        # overwrite-after-read needs a materialized merge (localCheckpoint
        # breaks the lineage back to the files being replaced)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    maintained = spark.read.parquet(state_dir)
    batch = rollup.minute_tier(_prepared(spark, sf_dir))
    assert _tier_dict(maintained) == _tier_dict(batch)

    # coarser tiers from the MAINTAINED minute tier ≡ tiers from raw
    hour_from_maintained = rollup.coarsen(maintained, rollup.US_PER_HOUR)
    hour_from_raw = rollup.coarsen(batch, rollup.US_PER_HOUR)
    assert _tier_dict(hour_from_maintained) == _tier_dict(hour_from_raw)


def test_merge_tier_is_order_insensitive(spark, sf_dir):
    """merge(A, B) == merge(B, A) == tier(A ∪ B) on a real split."""
    ev = _prepared(spark, sf_dir)
    a = ev.where(F.col("ts_us") % 2 == 0)
    b = ev.where(F.col("ts_us") % 2 == 1)
    ta, tb = rollup.minute_tier(a), rollup.minute_tier(b)
    ab = _tier_dict(rollup.merge_tier(ta, tb))
    ba = _tier_dict(rollup.merge_tier(tb, ta))
    whole = _tier_dict(rollup.minute_tier(ev))
    assert ab == ba == whole


# --- OHLC (AggregatingMergeTree-parity) tier ------------------------------


def _prepared_ohlc(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )


def test_ohlc_merge_equals_batch_candles(spark, sf_dir):
    """Chunked micro-batches folded through merge_ohlc_tier must equal
    both the batch-at-once tier AND the registry's ohlc_candles query —
    open/close survive arbitrary batch boundaries because the argmin/
    argmax state carries its own (ts_us, event_id) ordering key."""
    from rust_near_indexer_spark.queries import load_registry

    ev = _prepared_ohlc(spark, sf_dir)
    # adversarial split: round-robin by event_id, so every bucket's rows
    # scatter across ALL chunks (open and close usually land in
    # different chunks)
    chunks = [
        rollup.ohlc_tier(ev.where(F.col("event_id") % N_CHUNKS == c))
        for c in range(N_CHUNKS)
    ]
    maintained = chunks[0]
    for delta in chunks[1:]:
        maintained = rollup.merge_ohlc_tier(maintained, delta)
    merged = {
        (r["event_type"], r["bucket_start_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n_events"],
        )
        for r in rollup.finalize_ohlc(maintained).collect()
    }
    batch = {
        (r["event_type"], r["bucket_start_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n_events"],
        )
        for r in rollup.finalize_ohlc(rollup.ohlc_tier(ev)).collect()
    }
    assert merged == batch
    query = {
        (r["event_type"], r["bucket_us"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n_events"],
        )
        for r in load_registry()["ohlc_candles"].spark(spark, sf_dir).collect()
    }
    assert merged == query


def test_ohlc_coarsen_hour_to_day(spark, sf_dir):
    """A day tier re-aggregated from the hour tier (merge at coarser
    buckets) equals the day tier computed from raw — the continuous-
    aggregate identity for order-dependent aggregates."""
    ev = _prepared_ohlc(spark, sf_dir)
    hour = rollup.ohlc_tier(ev, width=rollup.US_PER_HOUR)
    day_from_hour = rollup.coarsen_ohlc(hour, rollup.US_PER_DAY)
    day_raw = rollup.ohlc_tier(ev, width=rollup.US_PER_DAY)
    a = {tuple(r) for r in rollup.finalize_ohlc(day_from_hour).collect()}
    b = {tuple(r) for r in rollup.finalize_ohlc(day_raw).collect()}
    assert a == b


def test_streamed_ohlc_merge_equals_batch(spark, sf_dir, tmp_path):
    """The OHLC tier under the same foreachBatch incremental-MV loop:
    each micro-batch's partial candles merge into a parquet-backed
    maintained tier; after draining, the maintained candles equal the
    batch-at-once candles.  Chunks are round-robin by event_id, so a
    bucket's open and close typically arrive in different micro-batches
    — the merge must re-elect them across batches."""
    ev = _prepared_ohlc(spark, sf_dir)
    chunk_dir = str(tmp_path / "ohlc_chunks")
    for c in range(N_CHUNKS):
        ev.where(F.col("event_id") % N_CHUNKS == c).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(chunk_dir, f"c{c}"))
        (part,) = glob.glob(os.path.join(chunk_dir, f"c{c}", "part-*.parquet"))
        shutil.move(part, os.path.join(chunk_dir, f"{c:03d}.parquet"))
        shutil.rmtree(os.path.join(chunk_dir, f"c{c}"))
    state_dir = str(tmp_path / "ohlc_tier")
    schema = "ts_us long, event_id long, event_type string, vc long"

    def on_batch(batch_df, batch_id):
        delta = rollup.ohlc_tier(batch_df)
        if os.path.exists(state_dir):
            existing = batch_df.sparkSession.read.parquet(state_dir)
            merged = rollup.merge_ohlc_tier(existing, delta)
        else:
            merged = delta
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ohlc_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        tuple(r)
        for r in rollup.finalize_ohlc(spark.read.parquet(state_dir)).collect()
    }
    batch = {tuple(r) for r in rollup.finalize_ohlc(rollup.ohlc_tier(ev)).collect()}
    assert streamed == batch
