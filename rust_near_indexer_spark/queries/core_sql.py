"""Core relational operator surface (SURVEY.md §2B S1–S28) over the
driver's TPC-H-ish tables.

Each query demonstrates one (or a small cluster of) reference operators
re-expressed Spark-first, with a value-identical DuckDB oracle.  The
reference file:line for each operator is cited in the docstring.

Determinism: see canonical.py — integer-cents aggregation, single-division
derived floats, unique-key tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..canonical import cents, duck_fingerprint, fingerprint
from ..tables import load, spread
from . import register

# ---------------------------------------------------------------------------
# S21 conditional/plain aggregation + S15 scalar math — TPC-H Q1 shape.
# Reference analog: gold conditional aggregation clickhouse/init/03-gold-views.sql:23-27
# and validation aggregates scripts/validate.sh:91-118.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)            AS sum_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(100 - l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(100 - l_discount * 100) AS BIGINT)
               * CAST(ROUND(100 + l_tax * 100) AS BIGINT)) AS BIGINT)      AS sum_charge_e6,
      ROUND(SUM(CAST(ROUND(l_quantity) AS BIGINT)) / (COUNT(*) * 1.0), 4)  AS avg_qty,
      ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / (COUNT(*) * 100.0), 4) AS avg_price,
      ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / (COUNT(*) * 100.0), 4)      AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("S21", "S13", "S15", "tpch-q1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped scan→filter→groupBy→agg→sort pipeline.

    Exercises predicate pushdown to parquet (shipdate filter), map-side
    partial aggregation, and exact integer-domain money arithmetic.
    Reference analogs: conditional aggregation 03-gold-views.sql:23-27,
    min/max/count validation aggregates scripts/validate.sh:91-118.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = cents("l_extendedprice")
    disc_pct = F.round(F.lit(100) - F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.lit(100) + F.col("l_tax") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_cents"),
            F.sum(price_c * disc_pct).alias("sum_disc_price_e4"),
            F.sum(price_c * disc_pct * tax_pct).alias("sum_charge_e6"),
            F.round(F.sum(qty) / (F.count("*") * F.lit(1.0)), 4).alias("avg_qty"),
            F.round(F.sum(price_c) / (F.count("*") * F.lit(100.0)), 4).alias("avg_price"),
            F.round(F.sum(disc_c) / (F.count("*") * F.lit(100.0)), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# S10 equi LEFT JOIN + S28 top-N with deterministic tie-break.
# Reference: gold LEFT JOIN 03-gold-views.sql:19; drill-down ORDER BY..LIMIT
# scripts/cross-validate.sh:217-221.
# ---------------------------------------------------------------------------


@register(
    "top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           COUNT(o.o_orderkey) AS order_count,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
             AS total_spend_cents
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY total_spend_cents DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("S10", "S28"),
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT equi-join orders→customer, grouped spend, deterministic top-20.

    Reference analogs: S10 left join 03-gold-views.sql:19,
    S28 ORDER BY + LIMIT scripts/cross-validate.sh:217-221.
    At scale: join key is the natural shuffle key; AQE handles skew.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # Aggregate the fact table BEFORE the join: the shuffle then moves
    # two longs per customer instead of every order row carrying the
    # customer name/segment payload — the plan that survives a 100×
    # fact-table scale-up.  Equivalent because o_custkey is customer PK.
    o_agg = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("order_count"),
        F.sum(cents("o_totalprice")).alias("total_spend_cents"),
    )
    return (
        c.join(o_agg, c.c_custkey == o_agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            F.coalesce("total_spend_cents", F.lit(0)).alias("total_spend_cents"),
        )
        .orderBy(F.desc("total_spend_cents"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Broadcast dimension join chain (region→nation→customer).
# Reference: the assets dimension join 03-gold-views.sql:20 is exactly a
# broadcast-dim pattern at scale.
# ---------------------------------------------------------------------------


@register(
    "region_rollup",
    oracle="""
    SELECT r.r_name AS region_name,
           COUNT(*) AS customer_count,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("S10", "broadcast"),
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop dimension join with explicit broadcast of the small sides.

    On a 1000-executor cluster region/nation are KB-sized: broadcasting
    removes two shuffles; only the final groupBy shuffles (on a 5-value
    key, trivially small).
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("customer_count"),
            F.sum(cents("c_acctbal")).alias("acctbal_cents"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# S23 anti-join referential integrity.
# Reference: scripts/validate.sh:145-149 (receipts without parent tx must be 0).
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NULL
    ORDER BY c.c_custkey
    """,
    tags=("S23",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: rows in customer with no matching orders row.

    Reference analog: referential-integrity anti-join
    scripts/validate.sh:145-149.  Spark's LEFT ANTI avoids materializing
    the null-extended rows a LEFT JOIN + IS NULL would.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# S13 conditional aggregation (gold metrics shape) + S22 countIf.
# Reference: 03-gold-views.sql:23-27; scripts/cross-validate.sh:231-233.
# ---------------------------------------------------------------------------


@register(
    "daily_event_metrics",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
      CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT) AS purchase_cents,
      CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT) AS view_cents,
      CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
        - COALESCE(SUM(CASE WHEN event_type = 'error'
           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT)  AS netflow_cents,
      COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
      COUNT(*) AS event_count
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day
    """,
    tags=("S13", "S22", "S14"),
)
def daily_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation per day — the gold-view shape.

    Reference analogs: sum(multiIf(...)) metrics 03-gold-views.sql:23-27,
    countIf scripts/cross-validate.sh:231-233, GROUP BY ALL + ORDER BY
    03-gold-views.sql:30-31.
    """
    ev = load(spark, sf_dir, "events")
    vc = cents("value")
    purchases = F.coalesce(
        F.sum(F.when(F.col("event_type") == "purchase", vc)), F.lit(0)
    )
    errors_sum = F.coalesce(F.sum(F.when(F.col("event_type") == "error", vc)), F.lit(0))
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            purchases.alias("purchase_cents"),
            F.coalesce(F.sum(F.when(F.col("event_type") == "view", vc)), F.lit(0)).alias(
                "view_cents"
            ),
            (purchases - errors_sum).alias("netflow_cents"),
            F.count(F.when(F.col("event_type") == "error", F.lit(1))).alias("error_count"),
            F.count("*").alias("event_count"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# S20 dedup-on-read (ReplacingMergeTree FINAL semantics).
# Reference: last-write-wins per declared PK, scripts/cross-validate.sh:111.
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS latest_value_cents
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("S20", "window"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins dedup per key via row_number — the Spark rendering of
    ClickHouse ReplacingMergeTree + FINAL (SURVEY §1.3; cross-validate.sh:111).

    At scale this is one shuffle on the dedup key; with bucketed storage on
    user_id it would be shuffle-free.
    """
    ev = load(spark, sf_dir, "events")
    # Order at µs precision (ts_ns div 1000) to match the oracle exactly:
    # DuckDB reads the parquet TIMESTAMP(NANOS) column µs-truncated, so a
    # ns-precision ordering here could pick a different row on same-user
    # same-µs collisions.  event_id (unique) breaks any remaining tie.
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.expr("ts_ns div 1000")), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
            cents("value").alias("latest_value_cents"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# S5/S25 JSON scalar extraction + validity.
# Reference: JSON_VALUE silver extraction 02-silver-tables.sql:81-83,
# isValidJSON scripts/validate.sh:162-169.
# ---------------------------------------------------------------------------


@register(
    "props_json_extract",
    oracle="""
    SELECT (CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.k') END::BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           COUNT(CASE WHEN json_valid(props) THEN 1 END) AS valid_json_count
    FROM events
    GROUP BY 1
    ORDER BY k_mod
    """,
    tags=("S5", "S25"),
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONPath scalar extraction from a string column + validity predicate.

    Reference analogs: JSON_VALUE(data,'$.x') 02-silver-tables.sql:81-83;
    isValidJSON scripts/validate.sh:162-169.  Stays JVM-side via
    get_json_object / from_json — no Python UDF.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    valid = F.try_parse_json(F.col("props")).isNotNull()
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(valid, F.lit(1))).alias("valid_json_count"),
        )
        .orderBy("k_mod")
    )


# ---------------------------------------------------------------------------
# S11 date-bucket join (the gold assets as-of-by-day join).
# Reference: 03-gold-views.sql:20.
# ---------------------------------------------------------------------------


@register(
    "date_bucket_join",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS daily_count
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, CAST(e.ts AS DATE) AS day, e.event_type, d.daily_count
    FROM events e
    LEFT JOIN daily d
      ON CAST(e.ts AS DATE) = d.day AND e.event_type = d.event_type
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
    tags=("S11",),
)
def date_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN on a date-bucket expression + equi key — the reference's
    calendar-day as-of join against the assets dimension
    (03-gold-views.sql:20: CAST(ts,'date') = CAST(price_updated_at,'date')
    AND token = asset).  The daily dim is small → broadcast.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("daily_count"))
    )
    e = ev.filter(F.col("event_type") == "purchase").alias("e")
    d = F.broadcast(daily.alias("d"))
    return (
        e.join(
            d,
            (F.to_date(F.col("e.ts")) == F.col("d.day"))
            & (F.col("e.event_type") == F.col("d.event_type")),
            "left",
        )
        .select(
            F.col("e.event_id").alias("event_id"),
            F.to_date(F.col("e.ts")).alias("day"),
            F.col("e.event_type").alias("event_type"),
            F.col("d.daily_count").alias("daily_count"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# S17 UNION ALL view + S24 NOT-IN set filter.
# Reference: silver_transfers union 02-silver-tables.sql:410-435;
# account-set check scripts/validate.sh:155-156.
# ---------------------------------------------------------------------------


@register(
    "union_event_flows",
    oracle="""
    SELECT flow, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM (
      SELECT 'conversion' AS flow, value FROM events WHERE event_type IN ('purchase', 'signup')
      UNION ALL
      SELECT 'engagement' AS flow, value FROM events WHERE event_type NOT IN ('purchase', 'signup', 'error')
    )
    GROUP BY flow
    ORDER BY flow
    """,
    tags=("S17", "S24"),
)
def union_event_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections + isin/NOT-isin set filters.

    Reference analogs: silver_transfers UNION ALL view
    02-silver-tables.sql:410-435; NOT IN account check
    scripts/validate.sh:155-156.  One scan feeds both branches (Spark
    reuses the exchange under AQE).
    """
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.lit("conversion").alias("flow"), "value"
    )
    eng = ev.filter(~F.col("event_type").isin("purchase", "signup", "error")).select(
        F.lit("engagement").alias("flow"), "value"
    )
    return (
        conv.unionByName(eng)
        .groupBy("flow")
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("value_cents"))
        .orderBy("flow")
    )


# ---------------------------------------------------------------------------
# S12 DISTINCT projection.
# Reference: gold CTE dedup 03-gold-views.sql:15.
# ---------------------------------------------------------------------------


@register(
    "distinct_segments",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
    tags=("S12",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a projection (gold CTE dedup, 03-gold-views.sql:15).
    Map-side partial dedup keeps the shuffle small at scale."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# S21 completeness min/max/count.
# Reference: scripts/validate.sh:91-118; resume query
# indexer-clickhouse/src/database.rs:23.
# ---------------------------------------------------------------------------


@register(
    "completeness_stats",
    oracle="""
    SELECT COUNT(*) AS row_count,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(DISTINCT event_type) AS distinct_types
    FROM events
    """,
    tags=("S21",),
)
def completeness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/min/max completeness check (validate.sh:91-118) — also the
    resume-height query shape (SELECT max(block_height),
    indexer-clickhouse/src/database.rs:14-39)."""
    return load(spark, sf_dir, "events").agg(
        F.count("*").alias("row_count"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
    )


# ---------------------------------------------------------------------------
# S26/S27 order-independent table fingerprint.
# Reference: groupBitXor(cityHash64(...)) scripts/cross-validate.sh:103-153.
# ---------------------------------------------------------------------------


@register(
    "table_fingerprint",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {duck_fingerprint("l_orderkey", "l_linenumber")} AS pk_fingerprint
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("S26", "S27"),
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent fingerprint: bit_xor of a 60-bit md5 row hash over
    the PK, per group — the engine-portable rendering of
    groupBitXor(cityHash64(pk)) (scripts/cross-validate.sh:103-153).
    """
    # spread the compact scan before the md5-per-row aggregate (r12):
    # the sf0.1 parquet arrives as ONE split, so every row hash ran on a
    # single core; project to the three needed columns first so the
    # widening shuffle carries no payload (no-op at 100 TB, tables.spread)
    li = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber"
        ),
        "l_orderkey",
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            fingerprint("l_orderkey", "l_linenumber").alias("pk_fingerprint"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Window top-K per group (north-star surface; reference has no window fns —
# SURVEY §2B coverage notes — but pagination indexes S29 imply the need).
# ---------------------------------------------------------------------------


@register(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
    tags=("window", "S28"),
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranked window — the standard OLAP pattern the
    reference serves with pagination indexes (S29, migrations/...sql:24-40).
    Deterministic tie-break on o_orderkey."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            cents("o_totalprice").alias("totalprice_cents"),
            "rnk",
        )
        .orderBy("o_orderpriority", "rnk")
    )


# ---------------------------------------------------------------------------
# Multi-way join + grouped aggregation (TPC-H Q3 shape) — exercises join
# reordering + AQE; the scale-critical plan.
# ---------------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(100 - l.l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue_e4 DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("S10", "S3", "tpch-q3"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join: selective dim filter → fact join → agg →
    deterministic top-N.  Catalyst pushes both date filters to the scans;
    AQE picks broadcast for the filtered customer side at small SF and
    shuffle-hash at 100 TB."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.sum(
        cents("l_extendedprice") * F.round(F.lit(100) - F.col("l_discount") * 100).cast("long")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(revenue.alias("revenue_e4"))
        .select("l_orderkey", "revenue_e4", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_e4"), "l_orderkey")
        .limit(10)
    )
