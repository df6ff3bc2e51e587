"""Data-profiling operator: a one-scan, all-columns table profile.

The reference ships a bash validation harness that eyeballs per-table
row counts and min/max heights (``validate_duckdb.sh`` loops one query
per check); ClickHouse itself exposes the same facts via
``system.columns`` / ``system.parts`` statistics.  At 100 TB neither
shape survives: N separate full scans for N columns is N× the I/O of
the single pass Spark can do.  ``column_profile`` computes the whole
profile — per column: non-null count, exact distinct count, min, max —
in ONE scan of the table.

Physical shape: the multi-column exact ``COUNT(DISTINCT ...)`` lowers
to Catalyst's Expand (one input row fans to k grouping-set rows, one
per distinct-aggregate), then partial aggregation map-side — so the
exchange carries only per-group partial states, never rows.  Expand
multiplies the *in-memory* row stream ×k but the table is still read
once; that is the standard Spark plan for multi-distinct and exactly
what you want against parquet at 100 TB, where the scan dominates.
The final unpivot (``stack``) runs on a single 1-row driver-side
aggregate result — free.

Determinism contract: min/max are computed on the NATIVE type (never
on a string cast — '10' < '9' lexicographically) and rendered to
VARCHAR only at the end.  DOUBLE money is profiled in integer cents;
TIMESTAMP dates are profiled at DATE granularity — both render
identically from both engines ('1995-03-15', plain integers, ASCII
strings compare byte-wise the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..canonical import cents
from ..tables import load
from . import register

def _orders_specs() -> tuple:
    """(profile column name, Spark expression over orders) — the
    canonical integer/date domains, mirrored 1:1 in the oracle SQL
    below.  Built lazily: Column construction needs a live
    SparkContext."""
    return (
        ("o_custkey", F.col("o_custkey")),
        ("o_orderdate", F.col("o_orderdate").cast("date")),
        ("o_orderkey", F.col("o_orderkey")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_totalprice_cents", cents("o_totalprice")),
    )

_ORACLE_COLS = {
    "o_custkey": "o_custkey",
    "o_orderdate": "CAST(o_orderdate AS DATE)",
    "o_orderkey": "o_orderkey",
    "o_orderpriority": "o_orderpriority",
    "o_orderstatus": "o_orderstatus",
    "o_totalprice_cents": "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
}

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT({expr}) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
           CAST(MIN({expr}) AS VARCHAR) AS min_repr,
           CAST(MAX({expr}) AS VARCHAR) AS max_repr
    FROM orders
    """
    for name, expr in _ORACLE_COLS.items()
)


@register(
    "column_profile",
    oracle=f"SELECT * FROM (\n{_PROFILE_ORACLE}\n) ORDER BY column_name",
    tags=("profiling", "validation", "beyond-reference"),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan table profile of ``orders``: per column the non-null
    count, exact distinct count, and native-typed min/max rendered to
    VARCHAR.  The oracle unions six per-column scans — same answer, the
    shape Spark's single Expand-pass replaces at scale (module
    docstring has the plan analysis).  Parity target: the reference's
    validate_duckdb.sh check loop / ClickHouse system.columns stats."""
    o = load(spark, sf_dir, "orders")
    specs = _orders_specs()
    # r12 (guide §7.2, plans/r12/column_profile_{before,after}.txt): one
    # combined agg put string min/max buffers (immutable types) into the
    # same aggregate tree as the multi-distinct Expand, forcing every
    # level to SortAggregate — a full 7-key sort of the ×(k+1)-expanded
    # table.  Split instead: the distinct counts alone plan as
    # HashAggregate over the Expand (grouping KEYS may be strings; only
    # buffer types gate hash agg), and the min/max/non-null pass is a
    # global no-Expand aggregate (empty grouping → no sort even as
    # SortAggregate).  Two pruned columnar scans beat one scan + one
    # sort-and-spill of 7× the table at any scale.  Both results are
    # single rows; the cross join is 1×1.
    prof_d = o.agg(
        *[F.count_distinct(e).alias(f"nd__{name}") for name, e in specs]
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, e in specs:
        aggs += [
            F.count(e).alias(f"nn__{name}"),
            F.min(e).cast("string").alias(f"mn__{name}"),
            F.max(e).cast("string").alias(f"mx__{name}"),
        ]
    prof = o.agg(*aggs).crossJoin(prof_d)
    stack = ", ".join(
        f"'{n}', nn__{n}, nd__{n}, mn__{n}, mx__{n}" for n, _ in specs
    )
    return (
        prof.selectExpr(
            "n_rows",
            f"stack({len(specs)}, {stack}) AS "
            "(column_name, n_nonnull, n_distinct, min_repr, max_repr)",
        )
        .select(
            "column_name", "n_rows", "n_nonnull", "n_distinct", "min_repr", "max_repr"
        )
        .orderBy("column_name")
    )
