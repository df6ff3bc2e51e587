"""Edge-semantics unit tests for operators/temporal.py — the oracle gate
(test_queries_oracle) proves whole-query equivalence; these pin the
operator contracts on hand-built rows: as-of boundary/tie/tolerance
rules and range-join interval boundaries."""

from __future__ import annotations

import pytest

from rust_near_indexer_spark.operators.temporal import asof_join, interval_point_join


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, rid long")
    return {
        r["id"]: (r["r"]["rid"] if r["r"] is not None else None)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", tolerance=100
        ).collect()
    }


def test_asof_boundary_tie_and_tolerance(spark):
    got = _asof(
        spark,
        # (id, key, ts)
        [(1, 7, 50), (2, 7, 10), (3, 7, 200), (4, 8, 50), (5, 9, 50)],
        # (key, ts, rid)
        [
            (7, 50, 101),  # exactly at left ts → matches (<=)
            (7, 50, 102),  # same ts tie → greatest payload (ts, rid) wins
            (7, 40, 100),
            (8, 51, 300),  # strictly after the only left row → no match
            (9, 1, 400),  # gap 49 ≤ tolerance 100 → matches
        ],
    )
    assert got == {1: 102, 2: None, 3: None, 4: None, 5: 400}
    # id=3: latest candidate is ts=50, gap 150 > tolerance → nulled


def test_asof_without_tolerance_keeps_old_matches(spark):
    left = spark.createDataFrame([(1, 7, 500)], "id long, k long, ts long")
    right = spark.createDataFrame([(7, 10, 42)], "k long, ts long, rid long")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    assert out[0]["r"]["rid"] == 42


def test_interval_point_join_boundaries(spark):
    # interval [100, 300) with bucket width 60 spans buckets 1..4
    iv = spark.createDataFrame([(100, 300, 1)], "s long, e long, wid long")
    pts = spark.createDataFrame(
        [(99,), (100,), (299,), (300,)], "ts long"
    )
    got = sorted(
        r["ts"]
        for r in interval_point_join(iv, pts, "s", "e", "ts", bucket_width=60).collect()
    )
    assert got == [100, 299]  # start inclusive, end exclusive


def test_interval_point_join_rejects_column_collision(spark):
    iv = spark.createDataFrame([(1, 2)], "s long, ts long")
    pts = spark.createDataFrame([(1,)], "ts long")
    with pytest.raises(ValueError, match="collision"):
        interval_point_join(iv, pts, "s", "ts", "ts", bucket_width=10)


# --- round-5 batch-2 operator properties ----------------------------------


def test_interval_islands_disjoint_and_complete(spark, sf_dir):
    """Merged islands must be pairwise disjoint per user (maximal merge)
    and account for every error event exactly once."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.queries.temporal import interval_merge_islands
    from rust_near_indexer_spark.tables import load

    out = interval_merge_islands(spark, sf_dir).collect()
    n_errors = (
        load(spark, sf_dir, "events").where(F.col("event_type") == "error").count()
    )
    assert sum(r["n_errors"] for r in out) == n_errors
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["island_start_us"])
        for a, b in zip(rows, rows[1:]):
            # strictly separated: next island starts after this one ends
            assert b["island_start_us"] > a["island_end_us"]
        # island ids are 1..k in start order
        assert [r["island_id"] for r in rows] == list(range(1, len(rows) + 1))


def test_ohlc_candles_invariants(spark, sf_dir):
    """low ≤ open, close ≤ high for every candle; counts per (type,
    bucket) match a direct aggregation."""
    from rust_near_indexer_spark.queries.temporal import ohlc_candles

    rows = ohlc_candles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low_cents"] <= r["open_cents"] <= r["high_cents"]
        assert r["low_cents"] <= r["close_cents"] <= r["high_cents"]
        assert r["n_events"] >= 1
        if r["n_events"] == 1:
            assert r["open_cents"] == r["close_cents"]


def test_fuzzy_join_blocking_recall(spark, sf_dir):
    """Multi-key blocking must recover every unblocked lev≤3 name pair
    on the test corpus (the recall claim in the docstring)."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.queries.dedup import (
        FUZZY_MAX_DIST,
        fuzzy_edit_distance_join,
    )
    from rust_near_indexer_spark.tables import load

    blocked = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_edit_distance_join(spark, sf_dir).collect()
    }
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("na"))
    b = names.select(F.col("p_name").alias("nb"))
    unblocked = {
        (r["na"], r["nb"])
        for r in a.crossJoin(b)
        .where(
            (F.col("na") < F.col("nb"))
            & (F.levenshtein("na", "nb") <= FUZZY_MAX_DIST)
        )
        .collect()
    }
    assert blocked == unblocked


def test_transition_matrix_rows_are_stochastic(spark, sf_dir):
    """Per from_type, transition counts sum to the LEAD pair total and
    ppm probabilities sum to ≈1e6 (floor rounding loses < n_types)."""
    from rust_near_indexer_spark.queries.temporal import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for f, rs in by_from.items():
        ppm = sum(r["prob_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= ppm <= 1_000_000, f
