#!/usr/bin/env python
"""Synthesize an sf1 scaling point from the driver's sf0.1 tables
(VERDICT r06 #6): 10 key-shifted replicas of every fact table, written
to ``fixture_data/sf1`` (gitignored).

The driver's generator is not available and /root/testdata is
read-only, so sf1 is self-synthesized by replication with disjoint key
ranges: per-copy offsets are applied consistently to every PK and FK
(orders.o_custkey shifts with customer.c_custkey, etc.), so joins have
identical per-key selectivity and 10x the matching volume — exactly
what a scaling measurement needs.  Distribution notes:

- region/nation stay fixed (TPC-H semantics: they never scale);
- document text gets a per-copy leading token (``c<k>``), so replicas
  are NEAR-dups of each other, not exact dups — the dedup family sees
  10x the docs without a degenerate 10-clone exact-dup spike;
- embeddings perturb component 0 by k*1e-4 so ANN top-k has no
  10-way exact ties.

Ratios computed against sf0.1 measure the same queries on 10x the
rows; the absolute numbers are NOT comparable to the driver's sf
ladder (different generator), the per-query ratio is the signal.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "fixture_data", "sf1"))
# 10 copies = sf1; 30 copies (SPARK_GRAFT_SFN_COPIES=30 + DST override)
# = the sf3 point used to separate overhead-floor exit from genuine
# super-linearity in scripts/bench_sf1.py
COPIES = int(os.environ.get("SPARK_GRAFT_SFN_COPIES", "10"))

# per-table: column -> per-copy offset (PKs and FKs shift together)
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
FIXED = ("region", "nation")


def _shifted_copy(name: str, t: pa.Table, k: int) -> pa.Table:
    cols = {}
    for field in t.schema:
        col = t[field.name]
        off = SHIFTS.get(name, {}).get(field.name, 0)
        if off and k:
            col = pc.add(col, pa.scalar(off * k, type=field.type))
        cols[field.name] = col
    out = pa.table(cols)
    if name == "documents" and k:
        text = pc.binary_join_element_wise(
            pa.array([f"c{k}"] * len(out)), out["text"].combine_chunks(), " "
        )
        out = out.set_column(
            out.schema.get_field_index("text"), "text", text
        )
        out = out.set_column(
            out.schema.get_field_index("n_chars"),
            "n_chars",
            pc.cast(pc.utf8_length(text), pa.int64()),
        )
    if name == "embeddings" and k:
        import numpy as np

        emb = out["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).copy()
        widths = np.diff(emb.offsets.to_numpy())
        starts = emb.offsets.to_numpy()[:-1][widths > 0]
        flat[starts] += k * 1e-4
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(flat, pa.float32()))
        out = out.set_column(
            out.schema.get_field_index("embedding"), "embedding", new
        )
    return out


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(DST, f"{name}.parquet"))
        print(f"[sf1] {name}: {len(t)} rows (fixed dim)", file=sys.stderr)
    for name in SHIFTS:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        big = pa.concat_tables([_shifted_copy(name, t, k) for k in range(COPIES)])
        pq.write_table(big, os.path.join(DST, f"{name}.parquet"))
        print(f"[sf1] {name}: {len(t)} -> {len(big)} rows", file=sys.stderr)
    print(DST)
    return 0


if __name__ == "__main__":
    sys.exit(main())
