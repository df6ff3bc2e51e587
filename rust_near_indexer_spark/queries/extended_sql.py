"""Beyond-reference SQL operators (SURVEY §2B coverage notes).

The reference has no window functions, grouping sets, or set operators —
the checklist's "north-star asks us to design for anyway" items.  Three
oracle-matched queries prove the engine's breadth there: ROLLUP grouping
sets, a running-sum window frame, and INTERSECT/EXCEPT set ops.

Same determinism contract as everything else: integer cents, unique-key
frame ordering, NULL grouping keys compared verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..canonical import cents
from ..tables import load
from . import register


@register(
    "revenue_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("rollup", "beyond-reference"),
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (returnflag, linestatus) with subtotal
    and grand-total rows (NULL keys) — map-side partial aggregation makes
    this one shuffle regardless of the grouping-set count."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents("l_extendedprice")).alias("revenue_cents"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "running_customer_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM orders
    WHERE o_custkey % 20 = 0
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "beyond-reference"),
)
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame: per-customer running revenue ordered by
    (o_orderdate, o_orderkey) — the unique key makes the frame
    deterministic.  One shuffle on the partition key."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 20 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(cents("o_totalprice")).over(w).alias("running_cents"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "customer_year_setops",
    oracle="""
    WITH y1995 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         y1996 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT 'both' AS op, o_custkey FROM (SELECT * FROM y1995 INTERSECT SELECT * FROM y1996)
    UNION ALL
    SELECT 'only_1995', o_custkey FROM (SELECT * FROM y1995 EXCEPT SELECT * FROM y1996)
    ORDER BY op, o_custkey
    """,
    tags=("setops", "beyond-reference"),
)
def customer_year_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: customers ordering in both 1995 and 1996 vs
    1995-only — set semantics (distinct), tagged and unioned."""
    o = load(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select(F.lit("both").alias("op"), "o_custkey")
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("op"), "o_custkey")
    return both.unionByName(only95).orderBy("op", "o_custkey")
