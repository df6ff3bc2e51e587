#!/usr/bin/env python
"""Local replica of the driver's t2 correctness sweep over the FULL registry.

Runs every `queries()` entry and its DuckDB oracle at sf0.01 (override via
SPARK_GRAFT_GATE_SF_DIR) through tests/oracle_harness.compare and prints a
one-line verdict per query plus a failure summary — run this before every
round-ending commit to predict CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from rust_near_indexer_spark.queries import load_registry  # noqa: E402
from rust_near_indexer_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duck_connect  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("gate", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    reg = load_registry()
    if len(sys.argv) > 1:  # optional substring filters: run only matching names
        reg = {
            n: q
            for n, q in reg.items()
            if any(pat in n for pat in sys.argv[1:])
        }
    con = duck_connect(sf_dir)
    failures: list[str] = []
    for name in sorted(reg):
        q = reg[name]
        t0 = time.perf_counter()
        try:
            if q.oracle is None:
                n = q.spark(spark, sf_dir).count()
                status = f"rows-only ({n} rows)"
            else:
                r = compare(q.spark(spark, sf_dir), con, q.oracle)
                status = "OK" if r["hash_match"] else f"MISMATCH {r}"
                if not r["hash_match"]:
                    failures.append(name)
        except Exception as e:
            status = f"ERROR {type(e).__name__}: {str(e)[:160]}"
            failures.append(name)
        print(f"[gate] {name}: {status} ({time.perf_counter() - t0:.1f}s)", flush=True)
    print(f"[gate] {len(reg) - len(failures)}/{len(reg)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
