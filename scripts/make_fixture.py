#!/usr/bin/env python
"""Materialize the deterministic block-stream fixture + golden bronze tables.

Writes (committed to git — the correctness gate reads them by path):

- ``fixture_data/blocks.jsonl``      — nested StreamerMessage-shaped rows
  (the Spark pipeline's input; read with schemas.BLOCK);
- ``fixture_data/assets.parquet``    — defuse_assets dimension rows;
- ``fixture_data/expected/*.parquet`` — golden bronze tables computed by
  the pure-Python reference-semantics simulator (oracle_sim.py), which the
  DuckDB oracles SELECT from.

Deterministic: fixtures.generate(seed=42) + a seeded simulator; re-running
this script reproduces byte-identical logical content.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from rust_near_indexer_spark import fixtures, oracle_sim  # noqa: E402

N_BLOCKS = 240  # long enough to cross the 50-block TTL bound many times
TTL_BLOCKS = 50

S, L, D = pa.string(), pa.int64(), pa.float64()

COMMON = [("block_height", L), ("block_timestamp_ns", L), ("block_hash", S)]

SCHEMAS = {
    "events": pa.schema(
        COMMON
        + [
            ("contract_id", S),
            ("execution_status", S),
            ("version", S),
            ("standard", S),
            ("index_in_log", L),
            ("event", S),
            ("data", S),
            ("related_receipt_id", S),
            ("related_receipt_receiver_id", S),
            ("related_receipt_predecessor_id", S),
            ("tx_hash", S),
            ("receipt_index_in_block", L),
        ]
    ),
    "transactions": pa.schema(
        COMMON
        + [("transaction_hash", S), ("signer_id", S), ("receiver_id", S), ("actions", S)]
    ),
    "receipts": pa.schema(
        COMMON
        + [
            ("parent_transaction_hash", S),
            ("receipt_id", S),
            ("receiver_id", S),
            ("predecessor_id", S),
            ("actions", S),
        ]
    ),
    "execution_outcomes": pa.schema(
        COMMON
        + [
            ("execution_outcome_id", S),
            ("parent_transaction_hash", S),
            ("executor_id", S),
            ("receipt_ids", pa.list_(S)),
            ("status", S),
            ("logs", S),
            ("tokens_burnt", S),
            ("gas_burnt", L),
        ]
    ),
}

ASSETS_SCHEMA = pa.schema(
    [
        ("blockchain", S),
        ("contract_address", S),
        ("decimals", L),
        ("defuse_asset_id", S),
        ("price", D),
        ("price_updated_at_ns", L),
        ("symbol", S),
    ]
)


def write_table(rows: list[dict], schema: pa.Schema, path: str):
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path, compression="snappy")


def main():
    out_dir = os.path.join(_REPO, "fixture_data")
    os.makedirs(os.path.join(out_dir, "expected"), exist_ok=True)

    blocks, assets = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL_BLOCKS)

    with open(os.path.join(out_dir, "blocks.jsonl"), "w") as f:
        for b in blocks:
            f.write(json.dumps(b, separators=(",", ":"), sort_keys=True) + "\n")
    write_table(assets, ASSETS_SCHEMA, os.path.join(out_dir, "assets.parquet"))

    golden = oracle_sim.run_bronze_sim(blocks, ttl_blocks=TTL_BLOCKS)
    for name, rows in golden.items():
        write_table(
            rows, SCHEMAS[name], os.path.join(out_dir, "expected", f"{name}.parquet")
        )
        print(f"expected/{name}.parquet: {len(rows)} rows")
    print(f"blocks.jsonl: {len(blocks)} blocks; assets.parquet: {len(assets)} rows")


if __name__ == "__main__":
    main()
