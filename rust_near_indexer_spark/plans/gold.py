"""Gold layer: gold_view_intents_metrics (clickhouse/init/03-gold-views.sql:4-31).

The reference's flagship on-read view: DISTINCT over silver NEP-245
events left-joined to the token_diff referral and to the per-day asset
price (S10 equi-join, S11 date-bucket expression join, S12 DISTINCT, S13
conditional aggregation, S14 GROUP BY ALL + ORDER BY ordinal, S15 scalar
math, S16 string-length filter).

Determinism deviation (documented): the reference sums Float64 USD
values, which is partition-order-dependent; we round each distinct row's
USD value to micro-dollars and aggregate in DecimalType(38,6).  Exact,
permutation-invariant, and the reference's own PG path proves the
exact-decimal variant is the "correct" one (SURVEY §1.2).

Scale posture: the assets dim is broadcast (days × assets — tiny at any
scale); the only shuffles are the token_diff equi-join on
related_receipt_id and the final small-cardinality groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _day(ns_col) -> F.Column:
    """CAST(DateTime64(9) AS date) from the canonical ns-long, UTC."""
    return F.to_date(F.timestamp_micros(F.expr(f"{ns_col} div 1000")))


def intents_metrics(
    nep245: DataFrame, token_diff: DataFrame, assets: DataFrame
) -> DataFrame:
    """03-gold-views.sql:4-31, shape-for-shape."""
    e = nep245.alias("e")
    d = token_diff.select(
        F.col("related_receipt_id"), F.col("referral")
    ).alias("d")
    a = assets.select(
        _day("price_updated_at_ns").alias("price_day"),
        F.col("defuse_asset_id"),
        F.col("decimals"),
        F.col("price"),
        F.col("symbol"),
        F.col("blockchain"),
    ).alias("a")

    decoded = (
        e.join(d, F.col("e.related_receipt_id") == F.col("d.related_receipt_id"), "left")
        .join(
            F.broadcast(a),
            (_day("block_timestamp_ns") == F.col("a.price_day"))
            & (F.col("e.token_id") == F.col("a.defuse_asset_id")),
            "left",
        )
        .select(
            F.col("e.block_timestamp_ns").alias("block_timestamp_ns"),
            F.col("e.block_hash").alias("block_hash"),
            F.col("e.event").alias("event"),
            F.col("e.memo").alias("memo"),
            F.col("e.old_owner_id").alias("old_owner_id"),
            F.col("e.new_owner_id").alias("new_owner_id"),
            F.col("e.token_id").alias("token_id"),
            ((F.col("e.amount") / F.pow(F.lit(10.0), F.col("a.decimals"))) * F.col("a.price")).alias(
                "usd_value"
            ),
            F.col("a.symbol").alias("symbol"),
            F.col("a.blockchain").alias("blockchain"),
            F.col("d.referral").alias("referral"),
        )
        # 3VL on purpose: NULL referral AND empty memo → NULL → filtered,
        # exactly like ClickHouse (sql:21)
        .where(~((F.length("referral") == 0) & (F.length("memo") == 0)))
        .distinct()
    )

    # Exact micro-USD in DecimalType(38,0): the double→decimal rounding is
    # identical cross-engine (same IEEE input, away-from-zero ties), the
    # decimal SUM is permutation-invariant, and only the final division
    # returns to Float64 — same output type as the reference view.
    usd_micro = F.round(F.col("usd_value") * 1e6).cast("decimal(38,0)")

    def metric(sum_col) -> F.Column:
        return sum_col.cast("double") / F.lit(1e6)

    return (
        decoded.where((F.col("symbol") != "") & (F.col("blockchain") != ""))
        .groupBy(
            _day("block_timestamp_ns").alias("day"),
            "symbol",
            F.coalesce("referral", F.lit("Others")).alias("referral"),
            "blockchain",
        )
        .agg(
            metric(F.sum(F.when(F.col("event") == "mt_transfer", usd_micro))).alias(
                "transfer_volume"
            ),
            metric(F.sum(F.when(F.col("event") == "mt_mint", usd_micro))).alias(
                "deposits"
            ),
            metric(-F.sum(F.when(F.col("event") == "mt_burn", usd_micro))).alias(
                "withdraws"
            ),
            metric(
                F.sum(
                    F.when(F.col("event") == "mt_mint", usd_micro).when(
                        F.col("event") == "mt_burn", -usd_micro
                    )
                )
            ).alias("netflow"),
        )
        .orderBy("day")
    )
