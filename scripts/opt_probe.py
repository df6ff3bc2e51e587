#!/usr/bin/env python
"""Per-query optimization probe (round 12, guide §1).

For each named registry query: capture ``explain("formatted")`` to
``plans/r12/<name>_<tag>.txt`` and time N reps of the bench action
(``.collect()``, the bench.py methodology) plus one noop-sink rep
(guide §1.4) so compute can be separated from result pickup.  Prints a
compact per-query line and a JSON tail for scripting.

Usage:
    python scripts/opt_probe.py --tag before --reps 3 q1 q2 ...
    python scripts/opt_probe.py --tag before --all-over 1.2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all-over", type=float, default=None,
                    help="probe every query whose BENCH_FULL.json median "
                         "exceeds this many seconds")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=os.path.join(_REPO_DIR, "plans", "r12"))
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    from rust_near_indexer_spark.queries import load_registry
    from rust_near_indexer_spark.session import get_spark

    registry = load_registry()
    names = list(args.names)
    if args.all_over is not None:
        bench = json.load(open(os.path.join(_REPO_DIR, "BENCH_FULL.json")))
        names += [n for n, s in bench["queries"].items()
                  if s >= args.all_over and n not in names]
    names = [n for n in sorted(set(names)) if n in registry]
    if not names:
        print("no queries selected", file=sys.stderr)
        return 1

    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("opt_probe")
    sc = spark.sparkContext

    # one warmup of each at the smallest sibling SF (bench.py protocol)
    from bench import _warmup_dir

    warm = _warmup_dir(args.sf_dir)
    for n in names if args.reps else []:
        if not n.startswith(("bronze_", "silver_", "staging_", "gold_",
                             "r25_", "receipt_")):
            try:
                registry[n].spark(spark, warm).collect()
            except Exception as e:
                print(f"[probe] warmup {n} failed: {e}", file=sys.stderr)

    results = {}
    for n in names:
        q = registry[n]
        df = q.spark(spark, args.sf_dir)
        with open(os.path.join(args.plans_dir, f"{n}_{args.tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        reps = []
        rows = []
        for i in range(args.reps):
            sc.setJobDescription(f"probe:{n}:collect:{i}")
            t0 = time.perf_counter()
            rows = q.spark(spark, args.sf_dir).collect()
            reps.append(round(time.perf_counter() - t0, 3))
        noop = None
        if not args.no_noop and args.reps:
            sc.setJobDescription(f"probe:{n}:noop")
            t0 = time.perf_counter()
            (q.spark(spark, args.sf_dir)
             .write.format("noop").mode("overwrite").save())
            noop = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        med = sorted(reps)[len(reps) // 2] if reps else None
        results[n] = {"reps": reps, "median": med, "noop": noop,
                      "rows": len(rows)}
        print(f"[probe] {n}: median {med} reps={reps} "
              f"noop={noop} rows={len(rows)}", file=sys.stderr)

    print(json.dumps({"tag": args.tag, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
