"""validate.sh invariants + the R25↔MV dual-formulation cross-check
(the scripts/cross-validate-pg.sh N-version-programming method)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark import schemas, validate
from rust_near_indexer_spark.plans import silver
from rust_near_indexer_spark.queries.near_events import bronze_tables


def test_bronze_invariants(spark):
    metrics = validate.validate_bronze(bronze_tables(spark))
    validate.assert_bronze_invariants(metrics)
    # the fixture exercises potential-tier chains on purpose: some
    # receipts chain to noise transactions that were never emitted
    assert metrics["ri_receipts_violations"] > 0
    # and the only invalid receipt actions are the R15 '' (GCD) rows
    gcd = (
        bronze_tables(spark)["receipts"].where(F.col("actions") == "").count()
    )
    assert metrics["invalid_receipt_actions"] == gcd


def test_r25_cross_validates_mv(spark):
    """cross-validate-pg.sh:85-244 adapted: the Rust-path (R25) and
    SQL-MV-path formulations of silver_dip4_transfer must agree — same
    row count, identical rows on the shared columns, and amounts equal
    under 1e-10 relative tolerance (NUMERIC vs Float64)."""
    ev = bronze_tables(spark)["events"]
    mv = silver.dip4_transfer(ev, schemas.PRODUCTION_CONTRACTS)
    r25 = silver.dip4_transfers_r25(ev, schemas.PRODUCTION_CONTRACTS)

    # phase 1: total counts
    assert mv.count() == r25.count()

    # phase 2+3: full row diff on shared columns, amount under tolerance.
    # MV memo is ''-defaulted while R25 nulls empty memos — normalize
    # exactly like cross-validate-pg.sh's COALESCE normalization (:180-195).
    # new_owner_id is nullable by design on BOTH sides (missing receiver_id
    # → JSON_VALUE without coalesce, sql:393) — NULL join keys never match
    # in an equi-join, so normalize it the same way as memo.
    key = ["block_height", "related_receipt_id", "token_id", "intent_hash",
           "old_owner_id"]
    shared = key + ["block_hash", "tx_hash", "contract_id", "execution_status",
                    "version", "standard", "event",
                    "related_receipt_receiver_id", "related_receipt_predecessor_id"]
    nullable = ["memo", "new_owner_id"]

    def _norm(df, amount_col):
        return df.select(
            *shared,
            *[F.coalesce(c, F.lit("")).alias(c) for c in nullable],
            F.col("amount").cast("double").alias(amount_col),
        )

    joined = _norm(mv, "amount_mv").join(
        _norm(r25, "amount_r25"), shared + nullable, "full_outer"
    )
    assert joined.where(F.col("amount_mv").isNull() | F.col("amount_r25").isNull()).count() == 0

    # |a-b| <= 1e-10 * max(|a|,|b|)  (cross-validate-pg.sh:200,232)
    bad = joined.where(
        F.abs(F.col("amount_mv") - F.col("amount_r25"))
        > 1e-10 * F.greatest(F.abs("amount_mv"), F.abs("amount_r25"))
    )
    assert bad.count() == 0

    # R25's extra column: every referral it reports is a genuinely
    # non-empty referral of the same receipt's token_diff events
    refs = r25.where(F.col("referral").isNotNull())
    assert refs.count() > 0
    assert refs.where(F.col("referral") == "").count() == 0


def test_diff_by_block_localizes_divergence(spark):
    """Mutating one event in one block must flag exactly that block —
    and identical renderings must flag nothing (cross-validate.sh
    per-block drill-down parity)."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.queries.near_events import bronze_tables
    from rust_near_indexer_spark.validate import diff_by_block

    ev = bronze_tables(spark)["events"]
    cols = ["block_height", "related_receipt_id", "event", "data"]
    assert diff_by_block(ev, ev, cols).count() == 0

    victim = ev.orderBy("block_height").limit(1).collect()[0]
    mutated = ev.withColumn(
        "event",
        F.when(
            (F.col("block_height") == victim["block_height"])
            & (F.col("related_receipt_id") == victim["related_receipt_id"])
            & (F.col("index_in_log") == victim["index_in_log"]),
            F.lit("CORRUPTED"),
        ).otherwise(F.col("event")),
    )
    diff = diff_by_block(ev, mutated, cols).collect()
    assert [r["block"] for r in diff] == [victim["block_height"]]
    assert diff[0]["n_rows_a"] == diff[0]["n_rows_b"]  # content, not count
    assert diff[0]["fp_a"] != diff[0]["fp_b"]
