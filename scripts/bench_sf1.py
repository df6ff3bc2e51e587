#!/usr/bin/env python
"""Extend the scaling evidence one decade: median-of-3 wall times for
the most expensive / historically worst-scaling registry queries at
sf0.01 / sf0.1 / sf1 (sf1 = scripts/make_sf1.py's key-shifted 10x
replication of sf0.1), appended to SCALING.md between markers.

Subset, not the full registry: the point of the extra decade is the
ratio of the queries already in (or near) the data-bound regime — the
overhead-bound sub-second tail adds wall time and no signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUERIES = [
    # top of BENCH_FULL r07 (non-fixture) + prior worst x10 scalers
    "dedup_containment_join",
    "column_profile",
    "dedup_prefix_filter_join",
    "table_fingerprint",
    "embedding_pca_top_component",
    "item_cooccurrence_pairs",
    "pricing_summary",
    "bm25_topk_retrieval",
    # the probes-as-fraction form: quadratic pair space BY CONSTRUCTION,
    # kept as the control that separates workload growth from engine
    # behavior (VERDICT r07 #3; the registered headline is fixed-probe)
    "bm25_fraction_probes_control",
    "quality_classifier_score",
    "corpus_curation_funnel",
    "text_pii_scrub",
    "text_quality_score",
    "bpe_pair_induction",
    "dedup_cluster_cliqueness",
    "curation_decisions",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "benchmark_decontamination",
    "doc_length_percentiles",
]

SFS = [
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("1", os.path.join(_REPO, "fixture_data", "sf1")),
]

MARK_A = "<!-- sf1-decade:begin -->"
MARK_B = "<!-- sf1-decade:end -->"


def main() -> int:
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    from rust_near_indexer_spark.caching import clear_caches
    from rust_near_indexer_spark.queries import load_registry
    from rust_near_indexer_spark.session import get_spark

    spark = get_spark("bench-sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    registry = load_registry()
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    import gc

    for sf, sf_dir in SFS:
        clear_caches()  # per-SF caches (LSH artifact read, shingles) start cold
        for q in QUERIES:
            rr = []
            for _ in range(reps):
                t0 = time.perf_counter()
                registry[q].spark(spark, sf_dir).collect()
                rr.append(round(time.perf_counter() - t0, 3))
            # Release THIS query's localCheckpoint blocks before the next
            # query runs: at sf1 the materialized token tables are large
            # enough that letting them accrete across the 20-query loop
            # puts later queries under executor-storage pressure
            # (bm25 measured 86 s mid-loop vs 49 s isolated).  Python GC
            # drops the DataFrame refs; ContextCleaner then unpersists.
            clear_caches()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            med = sorted(rr)[len(rr) // 2]
            results[q][sf] = med
            print(f"[sf1-bench] sf{sf} {q}: median {med:.3f}s of {rr}",
                  file=sys.stderr)
    with open(os.path.join(_REPO, "BENCH_SF1.json"), "w") as f:
        json.dump({"protocol": f"median-of-{reps}", "results": results}, f,
                  indent=1, sort_keys=True)

    lines = [
        MARK_A,
        "",
        "## The sf1 decade (round 8 refresh)",
        "",
        "The 100 TB arguments extrapolated from sf0.1; this table adds a",
        "decade (sf1 = `scripts/make_sf1.py`, key-shifted 10x replication",
        "of sf0.1 — 6M-row lineitem, 50k docs) for the most expensive /",
        "historically worst-scaling queries.  Median-of-3 per cell, one",
        "warm session per SF.  `x10a` = t(sf0.1)/t(sf0.01), `x10b` =",
        "t(sf1)/t(sf0.1): a query is super-linear only if its ratio",
        "RISES decade over decade past 10.",
        "",
        "| query | sf0.01 | sf0.1 | sf1 | x10a | x10b |",
        "|---|---|---|---|---|---|",
    ]
    worst = ("", 0.0)
    for q in QUERIES:
        a, b, c = results[q]["0.01"], results[q]["0.1"], results[q]["1"]
        xa, xb = b / max(a, 1e-9), c / max(b, 1e-9)
        if xb > worst[1]:
            worst = (q, xb)
        lines.append(
            f"| {q} | {a:.2f} | {b:.2f} | {c:.2f} | {xa:.1f} | {xb:.1f} |"
        )
    verdict = (
        "at or below the 10x data growth, i.e. no super-linear query "
        "in the third decade either."
        if worst[1] <= 10.0
        else "ABOVE the 10x data growth — super-linear; investigate."
    )
    lines += [
        "",
        f"Worst sf0.1->sf1 ratio: {worst[1]:.1f}x ({worst[0]}) — {verdict}",
        "",
        MARK_B,
    ]
    block = "\n".join(lines)
    sc_path = os.path.join(_REPO, "SCALING.md")
    doc = open(sc_path).read()
    if MARK_A in doc:
        pre = doc.split(MARK_A)[0]
        post = doc.split(MARK_B)[1]
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    open(sc_path, "w").write(doc)
    print("BENCH_SF1.json + SCALING.md updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
