"""End-to-end bronze pipeline vs the pure-Python reference simulator.

The committed fixture (fixture_data/) bakes in every corner case:
TTL-expired chains, potential-tier promotion (noise tx → of-interest
receipt), malformed/non-event logs, all three ReceiptEnumView kinds,
multi-shard blocks, and pre-cutoff timestamps.
"""

from __future__ import annotations

import pytest

from rust_near_indexer_spark import fixtures, oracle_sim, schemas
from rust_near_indexer_spark.queries import load_registry
from rust_near_indexer_spark.queries.near_events import (
    BLOCKS_PATH,
    TTL_BLOCKS,
    bronze_tables,
    expected_path,
)

from .oracle_harness import compare, duck_connect

N_BLOCKS = 240  # must match scripts/make_fixture.py


@pytest.fixture(scope="module")
def golden():
    blocks, _ = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL_BLOCKS)
    return blocks, oracle_sim.run_bronze_sim(blocks, ttl_blocks=TTL_BLOCKS)


def test_fixture_files_current(golden):
    """Committed goldens match a fresh simulator run (regeneration guard)."""
    import duckdb

    _, sim = golden
    con = duckdb.connect()
    for name, rows in sim.items():
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{expected_path(name)}')"
        ).fetchone()[0]
        assert n == len(rows), f"{name}: stale fixture_data/ — rerun scripts/make_fixture.py"


@pytest.mark.parametrize(
    "name",
    [
        "bronze_transactions",
        "bronze_receipts",
        "bronze_execution_outcomes",
        "bronze_events",
        "bronze_events_block_end",
        "bronze_events_only_mode",
        "bronze_per_block_stats",
        "bronze_outcomes_fingerprint",
    ],
)
def test_bronze_query_matches_golden(spark, sf_dir, name):
    reg = load_registry()
    con = duck_connect(sf_dir)
    q = reg[name]
    r = compare(q.spark(spark, sf_dir), con, q.oracle)
    assert r["hash_match"], r


def test_ttl_expiry_drops_rows(golden):
    """R19: with an unbounded TTL more events resolve — i.e. the fixture
    really contains past-TTL receipts and the bound really drops them."""
    blocks, sim = golden
    unbounded = oracle_sim.run_bronze_sim(blocks, ttl_blocks=10**9)
    assert len(unbounded["events"]) > len(sim["events"])
    assert len(unbounded["receipts"]) > len(sim["receipts"])


def test_potential_tier_promotion(golden):
    """R16/R17: some emitted events chain to a NOISE transaction (seeded in
    the potential tier, readable because the receipt touches accounts of
    interest) — the promotion path carries real rows."""
    _, sim = golden
    interest_txs = {t["transaction_hash"] for t in sim["transactions"]}
    via_potential = [e for e in sim["events"] if e["tx_hash"] not in interest_txs]
    assert via_potential, "fixture lost its potential-tier coverage"


def test_receipt_kind_branches(golden):
    """R15: all three ReceiptEnumView projections appear in the output."""
    _, sim = golden
    actions = [r["actions"] for r in sim["receipts"]]
    assert any(a == "null" for a in actions), "no Data receipt emitted"
    assert any(a == "" for a in actions), "no GlobalContractDistribution receipt emitted"
    assert any(a.startswith("[{") for a in actions), "no Action receipt emitted"


def test_events_only_mode_shape(spark):
    out = bronze_tables(spark, events_only=True)
    assert set(out) == {"events"}


def test_null_txhash_slo(golden):
    """validate.sh:126-139 quality gate, adapted: the share of *candidate*
    event logs dropped by resolution misses must stay ≤ 5+ε % — the
    fixture's expiry rate is calibrated under the SLO."""
    blocks, sim = golden
    unbounded = oracle_sim.run_bronze_sim(blocks, ttl_blocks=10**9)
    dropped = len(unbounded["events"]) - len(sim["events"])
    rate = dropped / max(len(unbounded["events"]), 1)
    assert rate <= 0.08, f"miss rate {rate:.1%} implausibly high for TTL≈50 blocks"


@pytest.mark.parametrize("seed", [7, 123, 20260813])
def test_random_fixture_differential(spark, seed):
    """Property-style differential: a fresh random block stream (seeds the
    committed fixture never used) must produce identical rows from the
    Spark pipeline and the pure-Python simulator — the corner cases are
    probabilistic, so every new seed exercises a different mix of TTL
    expiries, promotions, malformed logs, and zip mismatches."""
    from rust_near_indexer_spark.plans.pipeline import run_bronze

    from .oracle_harness import canonical_rows

    blocks, _ = fixtures.generate(n_blocks=60, seed=seed, ttl_blocks=TTL_BLOCKS)
    sim = oracle_sim.run_bronze_sim(blocks, ttl_blocks=TTL_BLOCKS)
    tables = run_bronze(fixtures.blocks_df(spark, blocks), ttl_blocks=TTL_BLOCKS)
    for name, df in tables.items():
        cols = df.columns
        _, s_rows = canonical_rows(cols, [tuple(r) for r in df.collect()])
        _, o_rows = canonical_rows(
            cols, [tuple(d.get(c) for c in cols) for d in sim[name]]
        )
        assert s_rows == o_rows, f"{name} mismatch at seed {seed}"
