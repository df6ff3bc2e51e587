"""R1/R2 source-adapter seam: the same bronze pipeline run from every
source kind must produce identical tables (per-table fingerprints).

The reference switches blocksapi vs NEAR-Lake behind one config enum
(`indexer-clickhouse/src/main.rs:59-79`) and the handlers never know
which fed them; `sources.block_stream` is the Spark rendering, so the
proof obligation is source-kind invariance of the output."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark import fixtures, sinks
from rust_near_indexer_spark.canonical import fingerprint
from rust_near_indexer_spark.queries.near_events import TTL_BLOCKS
from rust_near_indexer_spark.streaming import SOURCE_KINDS, run_streaming

N_BLOCKS = 120
N_CHUNKS = 3


@pytest.fixture(scope="module")
def blocks_dir(tmp_path_factory):
    blocks, _ = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL_BLOCKS)
    d = tmp_path_factory.mktemp("adapter_blocks")
    per = (len(blocks) + N_CHUNKS - 1) // N_CHUNKS
    for c in range(N_CHUNKS):
        chunk = blocks[c * per : (c + 1) * per]
        with open(d / f"chunk-{c:03d}.jsonl", "w") as f:
            for b in chunk:
                f.write(json.dumps(b, separators=(",", ":")) + "\n")
    return str(d)


def _table_fps(spark, out: str) -> dict[str, tuple]:
    fps = {}
    for name, pk in sinks.TABLE_PKS.items():
        df = sinks.read_final(spark, os.path.join(out, name), pk)
        cols = [F.col(c).cast("string") for c in df.columns if c != "receipt_ids"]
        fps[name] = tuple(
            df.agg(F.count("*").alias("n"), fingerprint(*cols).alias("fp")).collect()[0]
        )
    return fps


def test_all_source_kinds_fingerprint_match(spark, blocks_dir, tmp_path):
    fps = {}
    for kind in SOURCE_KINDS:
        out = str(tmp_path / f"out-{kind}")
        run_streaming(
            spark,
            blocks_dir,
            out,
            checkpoint_dir=str(tmp_path / f"ckpt-{kind}"),
            ttl_blocks=TTL_BLOCKS,
            source_kind=kind,
            max_files_per_trigger=1 if kind != "rate-lookup" else 40,
        )
        fps[kind] = _table_fps(spark, out)
    base = fps["file"]
    assert all(base[t][0] > 0 for t in base), base  # non-trivial corpus
    for kind in SOURCE_KINDS[1:]:
        assert fps[kind] == base, f"{kind} diverged from file source"


def test_unknown_kind_rejected(spark, blocks_dir):
    from rust_near_indexer_spark.streaming import block_stream

    with pytest.raises(ValueError, match="unknown block source kind"):
        block_stream(spark, "grpc", blocks_dir)
