"""Registry contract guard: the driver-facing surface must not shrink or
lose oracles silently (every operator claim in COVERAGE.md rests on it)."""

from __future__ import annotations

from rust_near_indexer_spark.queries import load_registry

MIN_QUERIES = 50


def test_registry_size_and_oracles():
    reg = load_registry()
    assert len(reg) >= MIN_QUERIES, sorted(reg)
    missing = [n for n, q in reg.items() if not q.oracle]
    assert not missing, f"queries without oracles: {missing}"


def test_entry_module_contract():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert e.FLAGSHIP in qs
    # oracles must be non-trivial SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
