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


@register(
    "hourly_event_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window", "beyond-reference"),
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed aggregation (streaming/windowed.py
    ``windowed_event_counts``) run verbatim on the batch events table —
    ``withWatermark`` is a no-op in batch, so this gates the exact
    operator the stream executes (epoch-aligned tumbling windows,
    integer-cents sums) against a DuckDB ``time_bucket`` oracle."""
    from ..streaming.windowed import windowed_event_counts

    ev = load(spark, sf_dir, "events")
    return windowed_event_counts(ev).orderBy("window_start", "event_type")


SESSION_GAP_US = 30 * 60 * 10**6  # µs rendering of windowed.SESSION_GAP_NS


@register(
    "user_sessions",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
    m AS (
        SELECT user_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                         > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    s AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM m
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start_us
    """,
    tags=("streaming", "session", "beyond-reference"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) as the batch window
    computation of streaming/windowed.py ``batch_sessions`` — the oracle
    side of the keyed-state streaming sessionizer (their equivalence is
    proven in tests/test_streaming_windowed.py).

    Rendered in the µs domain on BOTH engines: DuckDB reads the
    TIMESTAMP(NANOS) parquet µs-truncated, so comparing ns-domain session
    bounds would hinge on sub-µs gaps (the round-1 ADVICE precision
    trap).  µs-truncation is monotone, so same-µs ordering ties cannot
    change session membership or bounds."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    marked = ev.withColumn(
        "new_session",
        F.coalesce(
            (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US).cast("int"),
            F.lit(0),
        ),
    )
    sid = F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marked.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .drop("session_id")
        .orderBy("user_id", "session_start_us")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): per-part average gating a
# fact-scan filter — the decorrelation pattern (subquery → aggregate +
# join) Catalyst must produce instead of a per-row re-scan.
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE CAST(ROUND(l.l_quantity) AS BIGINT) * 10 * a.n < 2 * a.sum_qty
    """,
    tags=("sql", "beyond-reference", "subquery"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of lines whose quantity is below 20% of
    their part's average — the correlated scalar subquery
    (``l_quantity < (SELECT 0.2*avg(..) WHERE same part)``) expressed in
    its decorrelated form: ONE aggregate per part joined back to the
    fact scan.  The 0.2·avg comparison is cross-multiplied into pure
    integers (qty·10·n < 2·sum) so no division or float appears.

    Scale shape (r12, guide §2.4): the decorrelated aggregate-plus-join
    form read lineitem TWICE (fact scan + aggregate scan) and shuffled
    both (the fact rows by partkey for the SortMergeJoin, the partial
    aggregates for the groupBy).  Per-part sum/count over a window
    partitioned by partkey computes the identical gate on ONE scan and
    ONE exchange — two operations keyed the same way share the
    partitioning.  The inner join dropped NULL partkeys; the explicit
    isNotNull filter replicates that (TPC-H partkey is non-null, so
    it is belt-and-braces that also reaches the parquet scan)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    w = Window.partitionBy("l_partkey")
    small = (
        li.where(F.col("l_partkey").isNotNull())
        .select("l_partkey", qty.alias("qty"), cents("l_extendedprice").alias("c"))
        .withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("qty") * 10 * F.col("n") < 2 * F.col("sum_qty"))
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Two-fact multi-way join (TPC-H Q7 shape): supplier-nation x
# customer-nation trade volume per year.
# ---------------------------------------------------------------------------


@register(
    "nation_pair_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(100 - l.l_discount * 100) AS BIGINT)) AS BIGINT)
               AS volume_e4
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_nationkey < cn.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("sql", "beyond-reference", "multiway-join"),
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: discounted trade volume between ordered nation
    pairs per ship year — a five-way join (two fact tables, two
    broadcastable dims, nation twice under different roles) with exact
    integer volume (cents × discount-percent = e-4 units).

    Scale shape: lineitem⋈orders is the one big exchange (orderkey);
    customer/supplier join keyed on their PKs (AQE broadcasts them at
    dim scale), and both nation copies broadcast.  Catalyst's join
    reordering gets freedom because everything is declarative — the plan
    test only pins 'no cartesian, nations broadcast'."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = cents("l_extendedprice") * F.round(
        F.lit(100) - F.col("l_discount") * 100
    ).cast("long")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("s_nk") < F.col("c_nk"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(vol).cast("long").alias("volume_e4"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# SCD-2 validity intervals: change-detection history (type-2 slowly
# changing dimension built from an event stream).
# ---------------------------------------------------------------------------


@register(
    "user_state_scd2",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        FROM events
    ),
    ordered AS (
        SELECT user_id, event_type, ts_us, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    changes AS (
        -- event_id rides along as the LEAD tie-break: two state changes
        -- collapsed into the same microsecond by ts_ns div 1000 would
        -- otherwise make the lead ordering nondeterministic across
        -- engines (ADVICE r04 #3)
        SELECT user_id, event_type, ts_us AS valid_from_us, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type != event_type
    )
    SELECT user_id, event_type,
           CAST(valid_from_us AS BIGINT) AS valid_from_us,
           CAST(COALESCE(LEAD(valid_from_us) OVER (
                    PARTITION BY user_id ORDER BY valid_from_us, event_id),
                9223372036854775807) AS BIGINT) AS valid_to_us,
           LEAD(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY valid_from_us, event_id
           ) IS NULL AS is_current
    FROM changes
    ORDER BY user_id, valid_from_us
    """,
    tags=("sql", "beyond-reference", "scd2", "temporal"),
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from the event stream:
    collapse each user's consecutive same-type runs into validity
    intervals [valid_from, valid_to) via change detection (lag) + the
    next change's timestamp (lead); the open current row carries
    max-int.  The dimension-history build every warehouse load performs,
    exact in integer microseconds.

    Scale shape: two window passes over the same (user_id, ts) ordering
    — one exchange keyed by user_id, both windows reuse it (same
    partitioning+ordering); change rows are a fraction of events, so the
    second window's input is already small."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        # event_id survives change-detection purely as the second-window
        # tie-break: same-microsecond state changes (ts_ns div 1000
        # collisions) would otherwise order nondeterministically between
        # engines (ADVICE r04 #3)
        .select(
            "user_id",
            "event_type",
            F.col("ts_us").alias("valid_from_us"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    nxt = F.lead("valid_from_us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(9223372036854775807)).cast("long").alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us")


# ---------------------------------------------------------------------------
# Ordered conversion funnel (ClickHouse windowFunnel analog): the deepest
# view -> click -> purchase chain each user completes within a horizon.
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_US = 7 * 24 * 3600 * 10**6  # 7-day conversion horizon


@register(
    "conversion_funnel",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    s1 AS (
        SELECT user_id, MIN(ts_us) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts_us) AS t2
        FROM e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts_us > s1.t1
          AND e.ts_us <= s1.t1 + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts_us) AS t3
        FROM e JOIN s1 ON s1.user_id = e.user_id
        JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
          AND e.ts_us <= s1.t1 + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ),
    levels AS (
        SELECT s1.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS funnel_level
        FROM s1
        LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s2.user_id
    )
    SELECT CAST(funnel_level AS BIGINT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM levels GROUP BY funnel_level
    ORDER BY funnel_level
    """,
    tags=("sql", "beyond-reference", "funnel"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel`` analog: the deepest strictly-ordered
    view -> click -> purchase chain each user completes within a 7-day
    horizon of their FIRST view, reported as users per funnel level.
    First-occurrence chaining (min view, then min later click, then min
    later purchase) — the standard funnel simplification, deterministic
    in integer microseconds.

    Scale shape: three (user, min) aggregates over filtered scans, each
    one exchange keyed by user_id — AQE reuses the partitioning across
    the step joins; the final level count is a 3-row aggregate.  No
    window over unbounded event arrays, no per-user collect."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .where(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t1") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    levels = (
        s1.join(s2.select("user_id", F.lit(True).alias("l2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(True).alias("l3")), "user_id", "left")
        .select(
            F.when(F.col("l3"), F.lit(3))
            .when(F.col("l2"), F.lit(2))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("funnel_level")
        )
    )
    return (
        levels.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_level")
    )


# ---------------------------------------------------------------------------
# Cohort retention (the ClickHouse retention() analog): users grouped by
# first-activity week, tracked for re-activity over the following weeks.
# ---------------------------------------------------------------------------

WEEK_US = 7 * 24 * 3600 * 10**6
RETENTION_MAX_OFFSET = 3


@register(
    "cohort_retention",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
    ),
    firsts AS (
        SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
    ),
    cohort_sizes AS (
        SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week
    ),
    activity AS (SELECT DISTINCT user_id, week FROM e),
    hits AS (
        SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM activity a JOIN firsts f ON f.user_id = a.user_id
        WHERE a.week - f.cohort_week BETWEEN 0 AND {RETENTION_MAX_OFFSET}
        GROUP BY 1, 2
    )
    SELECT CAST(h.cohort_week AS BIGINT) AS cohort_week,
           CAST(h.week_offset AS BIGINT) AS week_offset,
           CAST(h.n_active AS BIGINT) AS n_active,
           CAST(s.n_cohort AS BIGINT) AS n_cohort,
           CAST((1000 * h.n_active) // s.n_cohort AS BIGINT) AS retention_milli
    FROM hits h JOIN cohort_sizes s ON s.cohort_week = h.cohort_week
    ORDER BY cohort_week, week_offset
    """,
    tags=("sql", "beyond-reference", "retention", "cohort"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (the ClickHouse ``retention()`` /
    product-analytics staple): users bucketed by first-activity week,
    re-activity fractions for the next {RETENTION_MAX_OFFSET} weeks in
    exact integer milli (week-0 row = 1000 by construction — the
    self-check).

    Scale shape: firsts and activity are two aggregates keyed by
    user_id sharing one exchange; the hits join is user-keyed (same
    partitioning again) and collapses to a (cohort, offset) grid —
    #weeks x {RETENTION_MAX_OFFSET + 1} rows — before the tiny
    cohort-size join."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts_ns div 1000) div {WEEK_US}").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    activity = ev.distinct()
    hits = (
        activity.join(firsts, "user_id")
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .where(F.col("week_offset").between(0, RETENTION_MAX_OFFSET))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        hits.join(sizes, "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            F.expr("(1000 * n_active) div n_cohort").cast("long").alias(
                "retention_milli"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Pivot (crosstab) and unpivot (melt) — the wide<->long reshaping
# operators (Spark groupBy().pivot() / DataFrame.unpivot).
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("view", "click", "purchase", "error")


@register(
    "event_type_pivot",
    oracle=f"""
    WITH e AS (
        SELECT user_id % 100 AS user_bucket, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT CAST(user_bucket AS BIGINT) AS user_bucket,
           {", ".join(
               f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN cents END), 0) AS BIGINT) AS {t}_cents"
               for t in _PIVOT_TYPES
           )}
    FROM e GROUP BY user_bucket
    ORDER BY user_bucket
    """,
    tags=("sql", "beyond-reference", "pivot"),
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab: value cents per user bucket pivoted into one column per
    event type — Spark's ``groupBy().pivot()`` with an EXPLICIT value
    list (never the value-discovery overload, which runs a distinct scan
    AND makes the schema data-dependent — both wrong at scale).  With
    explicit values the pivot compiles to the same conditional
    aggregation the oracle states, one exchange keyed by the group key.
    """
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 100).alias("user_bucket"),
        "event_type",
        cents("value").alias("cents"),
    )
    wide = (
        ev.groupBy("user_bucket")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.sum("cents"))
    )
    return wide.select(
        F.col("user_bucket").cast("long").alias("user_bucket"),
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"{t}_cents")
            for t in _PIVOT_TYPES
        ],
    ).orderBy("user_bucket")


@register(
    "daily_metrics_unpivot",
    oracle=f"""
    WITH e AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    wide AS (
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM e GROUP BY day
    )
    SELECT day, metric, value FROM (
        SELECT day, 'n_events' AS metric, n_events AS value FROM wide
        UNION ALL SELECT day, 'n_types', n_types FROM wide
        UNION ALL SELECT day, 'total_cents', total_cents FROM wide
    )
    ORDER BY day, metric
    """,
    tags=("sql", "beyond-reference", "unpivot"),
)
def daily_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt: per-day wide aggregates reshaped to (day, metric, value)
    long form via ``DataFrame.unpivot`` — the metrics-export shape
    (one row per time-series point).  Unpivot is a row-local
    projection+explode (no shuffle beyond the aggregate that built the
    wide frame); the oracle states the equivalent UNION ALL."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date(F.col("ts")).alias("day"),
        "event_type",
        cents("value").alias("cents"),
    )
    wide = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum("cents").alias("total_cents"),
    )
    return (
        wide.unpivot(
            ["day"], ["n_events", "n_types", "total_cents"], "metric", "value"
        )
        .select("day", "metric", F.col("value").cast("long").alias("value"))
        .orderBy("day", "metric")
    )


# ---------------------------------------------------------------------------
# Value-based RANGE window frame: trailing 3-day rolling spend per user
# (ROWS frames count rows; RANGE frames bound by the ORDER-BY value —
# the moving-time-window aggregation).
# ---------------------------------------------------------------------------

ROLL_WINDOW_US = 3 * 24 * 3600 * 10**6


@register(
    "rolling_3day_user_spend",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, CAST(ts_us AS BIGINT) AS ts_us,
           CAST(SUM(cents) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS spend_3d_cents,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_purchases_3d
    FROM e
    ORDER BY user_id, ts_us, event_id
    """,
    tags=("sql", "beyond-reference", "window-range-frame"),
)
def rolling_3day_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-day rolling purchase spend per user via a VALUE-based
    RANGE window frame (`RANGE BETWEEN 3 days PRECEDING`) — the frame
    class ROWS cannot express (rows in the frame depend on the ORDER-BY
    timestamp, not a count).  Exact integer cents and microseconds.

    Scale shape: one exchange keyed by user_id; the frame is evaluated
    by Spark's sliding window aggregation in a single sort pass per
    partition — state bounded by the 3-day span, not the user's
    history."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        cents("value").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLL_WINDOW_US, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts_us").cast("long").alias("ts_us"),
        F.sum("cents").over(w).cast("long").alias("spend_3d_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_purchases_3d"),
    ).orderBy("user_id", "ts_us", "event_id")


# ---------------------------------------------------------------------------
# ntile distribution bucketing: spend quartiles over customers.
# ---------------------------------------------------------------------------


@register(
    "customer_spend_quartiles",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS spend_cents
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ),
    tiled AS (
        SELECT c_custkey, spend_cents,
               NTILE(4) OVER (ORDER BY spend_cents, c_custkey) AS quartile
        FROM spend
    )
    SELECT CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(spend_cents) AS BIGINT) AS min_spend_cents,
           CAST(MAX(spend_cents) AS BIGINT) AS max_spend_cents,
           CAST(SUM(spend_cents) AS BIGINT) AS total_spend_cents
    FROM tiled GROUP BY quartile
    ORDER BY quartile
    """,
    tags=("sql", "beyond-reference", "ntile"),
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-spend quartiles via exact NTILE(4) semantics
    (equal-count distribution bucketing, custkey tie-break makes the
    split exact and engine-identical), reduced to per-quartile boundary
    stats.

    Scale shape: the spend aggregate is keyed by custkey; the global
    NTILE runs over ONE ROW PER CUSTOMER (the aggregate, not the fact
    table) and — since billions of customers would still drown one
    reducer — uses the same two-phase range rank as
    equi_depth_histogram (``operators/ranking.py``) instead of a global
    window; the output is 4 rows."""
    from ..operators.ranking import two_phase_ntile

    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("cents")
    )
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("spend_cents"))
    )
    tiled = two_phase_ntile(spend, ["spend_cents", "c_custkey"], 4).withColumnRenamed(
        "bucket", "quartile"
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("spend_cents").alias("min_spend_cents"),
            F.max("spend_cents").alias("max_spend_cents"),
            F.sum("spend_cents").cast("long").alias("total_spend_cents"),
        )
        .select(F.col("quartile").cast("long").alias("quartile"), "n_customers",
                "min_spend_cents", "max_spend_cents", "total_spend_cents")
        .orderBy("quartile")
    )


@register(
    "cube_returns_by_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY grouping_id, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("cube", "grouping-sets", "beyond-reference"),
)
def cube_returns_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with GROUPING() ids: all four aggregation
    granularities of (returnflag, linestatus) in one pass, each row
    tagged with the bitmask distinguishing a real NULL key from a
    subtotal NULL — the disambiguation every BI export needs.
    Completes the grouping-sets class next to revenue_rollup (ROLLUP)
    and region_rollup.

    Scale shape: like ROLLUP, Spark lowers CUBE to ONE Expand +
    map-combined aggregation — each input row fans to 4 grouping-set
    rows map-side, partial sums collapse them before the single
    exchange, so shuffle volume is bounded by the group-domain size ×4,
    never the fact table."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("l_extendedprice")).alias("revenue_cents"),
        )
        .select("l_returnflag", "l_linestatus", "grouping_id", "n", "revenue_cents")
        .orderBy(
            "grouping_id",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


HIST_BUCKETS = 10
# contiguous sort-key ranges for the two-phase exact rank (terasort
# pattern); at 100 TB this is #executors-sized, the cumsum stays tiny
HIST_RANGE_PARTS = 32


@register(
    "equi_depth_histogram",
    oracle=f"""
    WITH v AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    t AS (
        SELECT cents,
               NTILE({HIST_BUCKETS}) OVER (ORDER BY cents, o_orderkey) AS bucket
        FROM v
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("histogram", "profiling", "beyond-reference"),
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order totals: exact NTILE
    semantics over the (cents, orderkey) total order — the histogram
    shape optimizers and data-profilers prefer over equi-width because
    every bucket carries the same row count regardless of skew.  The
    unique-key tie order makes bucket boundaries deterministic in both
    engines.

    Scale shape: the global rank that NTILE needs is computed WITHOUT
    a global window — the terasort two-phase pattern (shared helper
    ``operators/ranking.py``): (1) ``repartitionByRange`` splits rows
    into contiguous (cents, orderkey) ranges (Spark's RangePartitioner
    derives balanced cuts from a deterministic reservoir sample — the
    exact rank is boundary-independent, balance is all the sample
    buys), (2) tiny per-partition counts roll into broadcast
    cumulative offsets, (3) each range ranks internally (row_number
    partitioned by the range id) and adds its offset.  The NTILE
    bucket is then pure arithmetic on (rank, N): the first N mod B
    buckets take ceil(N/B) rows, the rest floor(N/B) — bit-identical
    to the oracle's single NTILE window.  Every corpus-sized exchange
    is range- or pid-keyed; the only single-partition step is the
    per-range count cumsum (#partitions rows)."""
    from ..operators.ranking import two_phase_ntile

    o = load(spark, sf_dir, "orders")
    v = o.select("o_orderkey", cents("o_totalprice").alias("cents"))
    tiled = two_phase_ntile(
        v, ["cents", "o_orderkey"], HIST_BUCKETS, parts=HIST_RANGE_PARTS
    )
    return (
        tiled.select("cents", "bucket")
        .groupBy("bucket")
        .agg(
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"), "lo_cents", "hi_cents", "n"
        )
        .orderBy("bucket")
    )


@register(
    "user_modal_event",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ),
    r AS (
        SELECT user_id, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c
    )
    SELECT user_id, event_type AS modal_event, n AS modal_count
    FROM r WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("mode", "aggregate", "beyond-reference"),
)
def user_modal_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group with a deterministic tie rule: each
    user's most frequent event type (count desc, then lexicographic) —
    the argmax-per-group aggregate ClickHouse spells topK/argMax and
    ANSI 2023 spells MODE, made engine-portable by the explicit tie
    order.

    Scale shape: the heavy reduction happens FIRST (map-combined
    (user, type) counts — output bounded by users × |types|); the
    argmax window then rides a user-keyed exchange of those tiny count
    rows.  Catalyst plans the rn=1 filter as WindowGroupLimit, so
    per-user candidate lists never sort beyond the running top-1."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event"),
            F.col("n").alias("modal_count"),
        )
        .orderBy("user_id")
    )


@register(
    "snapshot_reconcile_diff",
    oracle="""
    WITH a AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents_1995
        FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey
    ),
    b AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents_1996
        FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
           a.cents_1995, b.cents_1996,
           CASE WHEN a.o_custkey IS NULL THEN 'added'
                WHEN b.o_custkey IS NULL THEN 'removed'
                WHEN a.cents_1995 = b.cents_1996 THEN 'unchanged'
                ELSE 'changed' END AS status,
           COALESCE(b.cents_1996, 0) - COALESCE(a.cents_1995, 0) AS delta_cents
    FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
    ORDER BY o_custkey
    """,
    tags=("reconciliation", "full-outer-join", "validation", "beyond-reference"),
)
def snapshot_reconcile_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation diff: two aggregates of the same fact at
    different periods FULL-OUTER-joined and classified
    added/removed/changed/unchanged with a signed delta — the
    table-diff operator behind migration validation and store
    cross-checks (the reference's validate.sh compares ClickHouse
    against DuckDB table-by-table; this is that comparison as a single
    distributed query instead of a count loop).

    Scale shape: each snapshot reduces map-side FIRST (customer-keyed
    partial sums), so the full-outer join exchanges only (key, long)
    pairs — never fact rows; classification is a row-local CASE after
    the join.  Both sides share the same key partitioning, and on
    bucketed snapshot tables (sinks.write_bucketed) the join is
    exchange-free."""
    o = load(spark, sf_dir, "orders")

    def snap(year: int, alias: str) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(cents("o_totalprice")).alias(alias))
        )

    a = snap(1995, "cents_1995")
    b = snap(1996, "cents_1996")
    j = a.join(b, "o_custkey", "full_outer")
    status = (
        F.when(F.col("cents_1995").isNull(), "added")
        .when(F.col("cents_1996").isNull(), "removed")
        .when(F.col("cents_1995") == F.col("cents_1996"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        "o_custkey",
        "cents_1995",
        "cents_1996",
        status.alias("status"),
        (
            F.coalesce(F.col("cents_1996"), F.lit(0))
            - F.coalesce(F.col("cents_1995"), F.lit(0))
        ).alias("delta_cents"),
    ).orderBy("o_custkey")
