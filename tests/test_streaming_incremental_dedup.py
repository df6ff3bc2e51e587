"""S18-style proof for the dedup family: exact dedup maintained
INCREMENTALLY across micro-batches (per-batch anti-join against the
accumulated keeper state, keep-first-arrival) ends in exactly the
batch-mode dedup decision — the ingest-pipeline formulation where the
corpus arrives over time and history is a persisted state table.

The batch twin is dedup_exact's keep-min policy; arrival order here is
doc_id order, so first-arrival == min-doc_id and the final keeper sets
must match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark.queries.dedup import augmented_docs

N_BATCHES = 5


def test_incremental_dedup_converges_to_batch_decision(spark, sf_dir, tmp_path):
    aug = augmented_docs(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("k")
    )
    # batch-mode ground truth: keeper = min doc_id per content key
    want_keepers = {
        (r["k"], r["keeper"])
        for r in aug.groupBy("k").agg(F.min("doc_id").alias("keeper")).collect()
    }

    # arrival schedule: doc_id ranges as micro-batches (height-ordered
    # ingest); the duplicate variants (+100000/+200000) arrive AFTER
    # their originals, exercising the cross-batch dup path
    ids = sorted(r["doc_id"] for r in aug.select("doc_id").collect())
    cuts = [ids[int(len(ids) * i / N_BATCHES)] for i in range(1, N_BATCHES)] + [
        ids[-1] + 1
    ]
    state_path = str(tmp_path / "keepers")
    lo = None
    kept_per_batch = []
    for hi in cuts:
        batch = aug.where(
            (F.col("doc_id") < hi)
            & (F.col("doc_id") >= (lo if lo is not None else -1))
        )
        lo = hi
        try:
            state = spark.read.parquet(state_path)
        except Exception:
            state = spark.createDataFrame([], "k string, keeper long")
        # within-batch dedup (keep-min), then anti-join against history
        batch_keepers = batch.groupBy("k").agg(F.min("doc_id").alias("keeper"))
        # materialize BEFORE overwriting the directory both depend on
        fresh = batch_keepers.join(
            state.select("k"), "k", "left_anti"
        ).localCheckpoint(eager=True)
        new_state = state.unionByName(fresh).localCheckpoint(eager=True)
        new_state.write.mode("overwrite").parquet(state_path)
        kept_per_batch.append(fresh.count())

    got_keepers = {
        (r["k"], r["keeper"]) for r in spark.read.parquet(state_path).collect()
    }
    assert got_keepers == want_keepers
    # the dup-heavy later batches must actually have dropped something
    total_rows = aug.count()
    assert sum(kept_per_batch) == len(want_keepers) < total_rows
