"""operators/ranking.py: the shared two-phase global rank/NTILE must be
bit-identical to a single-window formulation on any input, including the
N < buckets edge and heavily duplicated sort keys (unique tie-break)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rust_near_indexer_spark.operators.ranking import two_phase_ntile, two_phase_rank


def _cases():
    # (values, buckets) — dup-heavy keys, tiny N < B, exact multiples
    return [
        ([5, 3, 3, 3, 9, 1, 1, 7, 7, 7, 7, 2], 5),
        ([4, 4, 4], 10),  # N < B
        (list(range(40)), 4),  # exact multiple
        ([0] * 17, 3),  # all-equal keys, tie-break only
    ]


def test_two_phase_rank_equals_window_rank(spark):
    for vals, _ in _cases():
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        got = {
            r["id"]: (r["rank"], r["n_total"])
            for r in two_phase_rank(df, ["v", "id"], parts=4).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: (r["rk"], len(vals))
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want


def test_two_phase_ntile_equals_window_ntile(spark):
    for vals, b in _cases():
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        got = {
            r["id"]: r["bucket"]
            for r in two_phase_ntile(df, ["v", "id"], b, parts=4).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: r["nt"]
            for r in df.withColumn("nt", F.ntile(b).over(w)).collect()
        }
        assert got == want


# --- property-based: arbitrary multisets + bucket counts ------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    b=st.integers(min_value=1, max_value=12),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(**_H_SETTINGS)
def test_two_phase_ntile_property(spark, vals, b, parts):
    """For ANY value multiset, bucket count, and partition count, the
    two-phase NTILE equals the single-window NTILE under the unique
    (v, id) tie order."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v long")
    got = {
        r["id"]: r["bucket"]
        for r in two_phase_ntile(df, ["v", "id"], b, parts=parts).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["nt"] for r in df.withColumn("nt", F.ntile(b).over(w)).collect()
    }
    assert got == want


@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(**_H_SETTINGS)
def test_two_phase_grouped_rank_property(spark, vals, parts):
    """Per-group rank + group size equal the windowed formulation for
    arbitrary group/value multisets and partition counts."""
    from rust_near_indexer_spark.operators.ranking import two_phase_grouped_rank

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(vals)], "id long, g string, v long"
    )
    got = {
        r["id"]: (r["rank"], r["n_group"])
        for r in two_phase_grouped_rank(df, ["g"], ["v", "id"], parts=parts).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: (r["rk"], r["n"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("g")))
        .collect()
    }
    assert got == want
