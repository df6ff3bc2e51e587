"""Multi-resolution rollup tiers (hypertable continuous-aggregate shape).

The tier aggregates (count + integer-cents sum) are decomposable:
``agg(A ∪ B) = merge(agg(A), agg(B))``.  That one algebraic fact yields
both capabilities this module exports:

- ``coarsen``: an hour tier re-aggregates MINUTE output and a day tier
  re-aggregates HOUR output — at 100 TB the raw table is scanned once,
  not once per resolution;
- ``merge_tier``: a micro-batch's partial minute tier sum-merges into
  the maintained tier — incremental materialized-view maintenance
  (S18, the ClickHouse SummingMergeTree pattern) with work per batch
  proportional to the batch, not the history.

``queries/temporal.py::event_rollup_hierarchy`` gates these against a
DuckDB oracle that computes every tier directly from raw, and
tests/test_streaming_rollup.py proves batch-at-once ≡ incrementally
merged micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_MIN = 60 * 10**6
US_PER_HOUR = 3600 * 10**6
US_PER_DAY = 86_400_000_000

TIER_KEY = ["bucket_start_us", "event_type"]
TIER_COLS = TIER_KEY + ["n_events", "value_cents"]


def minute_tier(ev: DataFrame) -> DataFrame:
    """Base tier: per-(minute bucket, event_type) count + exact cents sum.
    Input needs ``ts_us`` (long) + ``event_type`` + ``vc`` (cents long)."""
    return (
        ev.groupBy(
            (F.expr(f"ts_us div {US_PER_MIN}") * US_PER_MIN).alias("bucket_start_us"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.sum("vc").alias("value_cents"))
    )


def coarsen(src: DataFrame, width: int) -> DataFrame:
    """Re-aggregate a finer tier into ``width``-µs buckets — never raw."""
    return (
        src.groupBy(
            (F.expr(f"bucket_start_us div {width}") * width).alias("bucket_start_us"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


def merge_tier(maintained: DataFrame, delta: DataFrame) -> DataFrame:
    """Sum-merge a batch's partial tier into the maintained tier.

    Union + re-aggregate on the tier key: existing buckets accumulate,
    new buckets append.  Decomposability makes this exact — merged
    micro-batches equal the batch-at-once tier, whatever the batch
    boundaries (proven in tests/test_streaming_rollup.py)."""
    return (
        maintained.select(*TIER_COLS)
        .unionByName(delta.select(*TIER_COLS))
        .groupBy(*TIER_KEY)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


# --- order-dependent (OHLC) tier: AggregatingMergeTree parity -------------
#
# SummingMergeTree covers count/sum; open/close need argmin/argmax state.
# Carrying the (ts_us, event_id, cents) triple as the aggregate state
# keeps the merge associative AND deterministic: the (ts_us, event_id)
# key is unique, so min_by/max_by have no ties to resolve arbitrarily —
# merged micro-batches equal the batch-at-once candle whatever the batch
# boundaries (the ClickHouse AggregatingMergeTree pattern).

OHLC_KEY = ["bucket_start_us", "event_type"]
OHLC_COLS = OHLC_KEY + ["open_s", "high_cents", "low_cents", "close_s", "n_events"]


def ohlc_tier(ev: DataFrame, width: int = US_PER_HOUR) -> DataFrame:
    """Base OHLC tier from events: needs ``ts_us``, ``event_id``,
    ``event_type``, ``vc`` (cents).  State columns ``open_s``/``close_s``
    are (ts_us, event_id, vc) structs — the mergeable argmin/argmax."""
    ord_ = F.struct(F.col("ts_us"), F.col("event_id"))
    state = F.struct("ts_us", "event_id", "vc")
    return ev.groupBy(
        (F.expr(f"ts_us div {width}") * width).alias("bucket_start_us"),
        "event_type",
    ).agg(
        F.min_by(state, ord_).alias("open_s"),
        F.max("vc").alias("high_cents"),
        F.min("vc").alias("low_cents"),
        F.max_by(state, ord_).alias("close_s"),
        F.count("*").alias("n_events"),
    )


def merge_ohlc_tier(maintained: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a batch's partial OHLC tier into the maintained tier —
    min_by/max_by over the carried (ts_us, event_id) keys re-elect
    open/close exactly; high/low/count fold as max/min/sum."""
    u = maintained.select(*OHLC_COLS).unionByName(delta.select(*OHLC_COLS))
    open_ord = F.struct(F.col("open_s.ts_us"), F.col("open_s.event_id"))
    close_ord = F.struct(F.col("close_s.ts_us"), F.col("close_s.event_id"))
    return u.groupBy(*OHLC_KEY).agg(
        F.min_by("open_s", open_ord).alias("open_s"),
        F.max("high_cents").alias("high_cents"),
        F.min("low_cents").alias("low_cents"),
        F.max_by("close_s", close_ord).alias("close_s"),
        F.sum("n_events").alias("n_events"),
    )


def finalize_ohlc(tier: DataFrame) -> DataFrame:
    """Project the carried argmin/argmax state to the candle columns
    (matches queries/temporal.py::ohlc_candles output)."""
    return tier.select(
        "event_type",
        "bucket_start_us",
        F.col("open_s.vc").alias("open_cents"),
        "high_cents",
        "low_cents",
        F.col("close_s.vc").alias("close_cents"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def coarsen_ohlc(src: DataFrame, width: int) -> DataFrame:
    """Re-aggregate a finer OHLC tier into ``width``-µs buckets without
    touching raw data — the continuous-aggregate identity holds for the
    order-dependent aggregates because the argmin/argmax state carries
    its own ordering key."""
    open_ord = F.struct(F.col("open_s.ts_us"), F.col("open_s.event_id"))
    close_ord = F.struct(F.col("close_s.ts_us"), F.col("close_s.event_id"))
    return (
        src.withColumn(
            "bucket_start_us",
            (F.expr(f"bucket_start_us div {width}") * width),
        )
        .groupBy(*OHLC_KEY)
        .agg(
            F.min_by("open_s", open_ord).alias("open_s"),
            F.max("high_cents").alias("high_cents"),
            F.min("low_cents").alias("low_cents"),
            F.max_by("close_s", close_ord).alias("close_s"),
            F.sum("n_events").alias("n_events"),
        )
    )
