"""Property-based differential tests for operators/temporal.py.

The oracle gate runs the as-of and range joins against the fixed
testdata, where tie patterns are whatever the corpus happens to
contain.  Hypothesis generates adversarial small inputs — duplicate
timestamps on both sides, matches exactly at the tolerance edge,
intervals meeting at bucket boundaries — and checks Spark's output
against an independent DuckDB formulation (argmax join for as-of,
plain inequality join for range), the same differential method the
salted-join and canonical-hash property tests use.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_near_indexer_spark.operators.temporal import asof_join, interval_point_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny ts domain → dense collisions; keys from a 3-value pool
_TS = st.integers(min_value=0, max_value=12)
_KEY = st.integers(min_value=0, max_value=2)

_LEFT = st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=12)
_RIGHT = st.lists(st.tuples(_KEY, _TS), min_size=0, max_size=12)

TOL = 5


@given(_LEFT, _RIGHT)
@settings(**_SETTINGS)
def test_asof_join_matches_argmax_oracle(spark, left_rows, right_rows):
    left = pd.DataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left_rows)],
        columns=["id", "k", "ts"],
    )
    right = pd.DataFrame(
        [(k, ts, 1000 + i) for i, (k, ts) in enumerate(right_rows)],
        columns=["k", "ts", "rid"],
    )
    ldf = spark.createDataFrame(
        list(left.itertuples(index=False)), "id long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        list(right.itertuples(index=False)), "k long, ts long, rid long"
    )
    out = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts", tolerance=TOL)
    got = {
        r["id"]: (None if r["r"] is None else r["r"]["rid"]) for r in out.collect()
    }

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    # independent formulation: argmax join with the same tie rule
    # (greatest (ts, rid) payload among right rows at or before left ts)
    rows = con.sql(f"""
        SELECT l.id, (
            SELECT r.rid FROM r
            WHERE r.k = l.k AND r.ts <= l.ts AND r.ts >= l.ts - {TOL}
            ORDER BY r.ts DESC, r.rid DESC LIMIT 1
        ) AS rid
        FROM l
    """).fetchall()
    want = {row[0]: row[1] for row in rows}
    assert got == want


_IV = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 25)), min_size=0, max_size=8
)
_PTS = st.lists(st.integers(min_value=0, max_value=70), min_size=0, max_size=15)


@given(_IV, _PTS, st.sampled_from([1, 3, 7, 16]))
@settings(**_SETTINGS)
def test_interval_point_join_matches_inequality_oracle(spark, ivs, pts, width):
    intervals = pd.DataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)],
        columns=["wid", "s", "e"],
    )
    points = pd.DataFrame(enumerate(pts), columns=["pid", "ts"])
    idf = spark.createDataFrame(
        list(intervals.itertuples(index=False)), "wid long, s long, e long"
    )
    pdf = spark.createDataFrame(
        list(points.itertuples(index=False)), "pid long, ts long"
    )
    out = interval_point_join(idf, pdf, "s", "e", "ts", bucket_width=width)
    got = sorted((r["wid"], r["pid"]) for r in out.collect())

    con = duckdb.connect()
    con.register("iv", intervals)
    con.register("p", points)
    want = sorted(
        tuple(row)
        for row in con.sql(
            "SELECT iv.wid, p.pid FROM iv JOIN p ON p.ts >= iv.s AND p.ts < iv.e"
        ).fetchall()
    )
    assert got == want
