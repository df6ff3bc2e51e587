#!/usr/bin/env python
"""Replicate the bench's alphabetical prefix to localize the in-session
slowdown of embedding_pca_top_component (round 12 adjudication).

Runs every registry query alphabetically up to and including
embedding_pca_top_component, 3 reps each (bench methodology, including
the sf0.001 warmup pass), printing per-query medians — then re-times
the sentinel.  Optionally skips a family via --skip substr to bisect.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[])
    ap.add_argument("--upto", default="embedding_pca_top_component")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from rust_near_indexer_spark.queries import load_registry
    from rust_near_indexer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("prefix_probe")
    reg = load_registry()
    names = [n for n in sorted(reg) if n <= args.upto]
    names = [n for n in names if not any(s in n for s in args.skip)]
    fixture_prefixes = ("bronze_", "silver_", "staging_", "gold_", "r25_", "receipt_")

    for n in names:
        if not n.startswith(fixture_prefixes):
            try:
                reg[n].spark(spark, warm_dir).collect()
            except Exception as e:
                print(f"[prefix] warmup {n} failed: {e}", flush=True)
    print("[prefix] warmup done", flush=True)

    for n in names:
        rr = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            reg[n].spark(spark, sf_dir).collect()
            rr.append(round(time.perf_counter() - t0, 3))
        print(f"[prefix] {n}: {sorted(rr)[len(rr)//2]:.3f} {rr}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
