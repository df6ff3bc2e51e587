"""Every registered query with an oracle must hash-match DuckDB — the
local replica of the driver's t2 gate (sf0.001 here for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from rust_near_indexer_spark.queries import load_registry

from .oracle_harness import compare, duck_connect

REGISTRY = load_registry()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    result = compare(q.spark(spark, sf_dir), duck, q.oracle)
    assert result["hash_match"], f"{name}: {result}"


def test_rows_only_queries(spark, sf_dir):
    """Registry entries WITHOUT an oracle get the driver's weaker
    rows-only check.  Currently every entry carries an oracle, so this
    asserts that invariant instead of skipping on an empty param set."""
    for name in ROWS_ONLY_QUERIES:
        q = REGISTRY[name]
        df = q.spark(spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.schema.fields) > 0, name
    assert ROWS_ONLY_QUERIES == [] or len(ROWS_ONLY_QUERIES) < len(REGISTRY)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every oracle key must exist in queries()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
