"""Mechanical scan of every registered DuckDB oracle's OUTPUT column types.

The driver fetches oracle results through pandas/Arrow, where DuckDB's
HUGEINT/UHUGEINT (int128) become float64/decimal128 and render
``11000000000000.0`` against Spark's int64 ``11000000000000`` —
rows match, schema matches, value hash doesn't (VERDICT r04 §What's
wrong #1).  This scan types every oracle's result relation WITHOUT
executing it (DuckDB binds the plan lazily) and reports any column whose
type is HUGEINT, UHUGEINT, or an unexpected DECIMAL — the exact class of
silent rendering divergence.

Usage:  python scripts/scan_oracle_types.py [sf_dir]
Exit 1 if any offending column is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import duck_connect  # noqa: E402

from rust_near_indexer_spark.queries import REGISTRY, load_registry  # noqa: E402

load_registry()

BAD_TYPES = {"HUGEINT", "UHUGEINT"}

# Queries whose DECIMAL output columns are INTENTIONAL (the Spark side
# returns the matching DecimalType, so the typed harness compares them
# as decimals, not floats).  Everything else outputting DECIMAL is a
# likely unfinished BIGINT cast — flagged.
DECIMAL_ALLOWLIST: dict[str, set[str]] = {
    "r25_dip4_transfers": {"total_amount"},
}


def scan(sf_dir: str) -> list[tuple[str, str, str]]:
    con = duck_connect(sf_dir)
    offenders: list[tuple[str, str, str]] = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t in BAD_TYPES:
                offenders.append((name, col, t))
            elif t.startswith("DECIMAL") and col not in DECIMAL_ALLOWLIST.get(
                name, ()
            ):
                offenders.append((name, col, t))
    return offenders


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    offenders = scan(sf_dir)
    n_oracles = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    print(f"scanned {n_oracles} oracles in {len(REGISTRY)} registered queries")
    if offenders:
        for name, col, t in offenders:
            print(f"  BAD {name}.{col}: {t}")
        sys.exit(1)
    print("no HUGEINT/UHUGEINT or unallowlisted DECIMAL output columns")
