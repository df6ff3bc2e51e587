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
