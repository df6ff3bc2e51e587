"""salted_join must be result-identical to the plain join — salt only
steers placement."""

from __future__ import annotations

import pytest

from rust_near_indexer_spark.operators.skew import salted_join


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows), one cold key, one key absent from dim
    fact = spark.createDataFrame(
        [("hot", i) for i in range(90)]
        + [("cold", i) for i in range(9)]
        + [("orphan", 0)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, attr string"
    )
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_equals_plain(spark, skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, "k", how)
    salted = salted_join(fact, dim, "k", n_salt=4, how=how)
    cols = ["k", "v", "attr"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_rejects_dim_preserving(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="right")
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", n_salt=0)


def test_salt_column_not_leaked(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, "k", how="inner")
    assert "_salt" not in out.columns


def test_spread_widens_narrow_scans_only(spark, tmp_path):
    """tables.spread repartitions a narrow frame up to defaultParallelism
    and leaves an already-wide FILE scan untouched (the 100 TB no-op
    path).  The width probe is file-listing-based (the r06-advice df.rdd
    retirement), so in-memory frames are treated as narrow by design —
    they are fixture-sized, and the probe must never materialize a plan."""
    from rust_near_indexer_spark.tables import spread

    n = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert spread(narrow, "id").rdd.getNumPartitions() == n

    path = str(tmp_path / "wide.parquet")
    spark.range(1000).repartition(n + 4).write.parquet(path)
    wide = spark.read.parquet(path)  # n+4 files >= n splits
    out = spread(wide, "id")
    assert out is wide  # untouched, not just same width

    # in-memory frames have no file listing: documented treat-as-narrow
    mem_wide = spark.range(100).repartition(n + 4)
    assert spread(mem_wide, "id") is not mem_wide
