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
