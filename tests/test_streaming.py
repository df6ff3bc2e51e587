"""Streaming == batch: the Structured Streaming formulation must produce
exactly the bronze tables of the batch pipeline (per-table fingerprints),
including chains that span micro-batches and TTL expiry across batches."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark import fixtures, sinks
from rust_near_indexer_spark.canonical import fingerprint
from rust_near_indexer_spark.plans.pipeline import run_bronze
from rust_near_indexer_spark.queries.near_events import TTL_BLOCKS
from rust_near_indexer_spark.streaming import run_streaming

N_BLOCKS = 240  # same fixture parameters as scripts/make_fixture.py
N_CHUNKS = 4


@pytest.fixture(scope="module")
def chunked_blocks_dir(tmp_path_factory):
    """The fixture stream split into height-ordered chunk files — each
    chunk becomes (at least) one micro-batch."""
    blocks, _ = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL_BLOCKS)
    d = tmp_path_factory.mktemp("block_stream")
    per = (len(blocks) + N_CHUNKS - 1) // N_CHUNKS
    for c in range(N_CHUNKS):
        chunk = blocks[c * per : (c + 1) * per]
        with open(d / f"chunk-{c:03d}.jsonl", "w") as f:
            for b in chunk:
                f.write(json.dumps(b, separators=(",", ":")) + "\n")
    return str(d), blocks


def _fp(df):
    cols = [F.col(c).cast("string") for c in df.columns if c != "receipt_ids"]
    return df.agg(F.count("*").alias("n"), fingerprint(*cols).alias("fp")).collect()[0]


def test_streaming_equals_batch(spark, chunked_blocks_dir, tmp_path):
    blocks_dir, blocks = chunked_blocks_dir
    out = str(tmp_path / "out")
    run_streaming(
        spark,
        blocks_dir,
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        ttl_blocks=TTL_BLOCKS,
    )

    batch_tables = run_bronze(fixtures.blocks_df(spark, blocks), ttl_blocks=TTL_BLOCKS)
    for name, pk in sinks.TABLE_PKS.items():
        streamed = sinks.read_final(spark, os.path.join(out, name), pk)
        want = _fp(batch_tables[name])
        got = _fp(streamed.select(*[c for c in batch_tables[name].columns]))
        assert got == want, f"{name}: streaming diverged from batch ({got} vs {want})"


def test_streaming_silver_equals_batch(spark, chunked_blocks_dir, tmp_path):
    """S18 incremental MV maintenance: per-batch silver appends must union
    to exactly the batch-mode silver tables (ClickHouse MV semantics —
    each MV sees only the insert batch)."""
    from rust_near_indexer_spark.plans import silver

    blocks_dir, blocks = chunked_blocks_dir
    out = str(tmp_path / "out")
    run_streaming(
        spark,
        blocks_dir,
        out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        ttl_blocks=TTL_BLOCKS,
        with_silver=True,
    )
    batch_events = run_bronze(
        fixtures.blocks_df(spark, blocks), ttl_blocks=TTL_BLOCKS
    )["events"]
    batch_silver = silver.all_silver_tables(batch_events)
    for name in ("silver_nep_245_events", "silver_dip4_transfer", "silver_transfers"):
        streamed = (
            spark.read.parquet(os.path.join(out, "silver", name))
            .drop("ingest_seq", "height_bucket")
        )
        want = _fp(batch_silver[name])
        got = _fp(streamed.select(*batch_silver[name].columns))
        assert got == want, f"{name}: streamed silver diverged ({got} vs {want})"


def test_streaming_restart_is_noop(spark, chunked_blocks_dir, tmp_path):
    """Restarting with no new input (same checkpoint) changes nothing —
    the checkpoint + PK-dedup sink compose to exactly-once."""
    blocks_dir, _ = chunked_blocks_dir
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming(spark, blocks_dir, out, checkpoint_dir=ckpt, ttl_blocks=TTL_BLOCKS)
    before = _fp(sinks.read_final(spark, os.path.join(out, "events"), sinks.TABLE_PKS["events"]))
    run_streaming(spark, blocks_dir, out, checkpoint_dir=ckpt, ttl_blocks=TTL_BLOCKS)
    after = _fp(sinks.read_final(spark, os.path.join(out, "events"), sinks.TABLE_PKS["events"]))
    assert before == after
