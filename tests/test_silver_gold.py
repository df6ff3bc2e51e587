"""Silver MV transforms + gold view vs independent DuckDB SQL oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark.plans import silver
from rust_near_indexer_spark.queries import load_registry
from rust_near_indexer_spark.queries.near_events import bronze_tables

from .oracle_harness import compare, duck_connect

SILVER_GOLD = [
    "silver_nep245_events",
    "silver_dip4_token_diff",
    "silver_dip4_public_keys",
    "silver_dip4_intents_executed",
    "silver_dip4_fee_changed",
    "silver_dip4_transfer",
    "silver_staging_dip4_transfer",
    "silver_transfers",
    "staging_silver_transfers",
    "gold_intents_metrics",
]


@pytest.mark.parametrize("name", SILVER_GOLD)
def test_silver_gold_matches_oracle(spark, sf_dir, name):
    reg = load_registry()
    con = duck_connect(sf_dir)
    q = reg[name]
    r = compare(q.spark(spark, sf_dir), con, q.oracle)
    assert r["hash_match"], r


def test_cutoff_excludes_pre_cutoff_blocks(spark):
    """Per-MV cutoffs (02-silver-tables.sql:79 vs :388): the fixture's
    pre-cutoff blocks are excluded from the nep245 silver but the transfer
    MVs (no cutoff) keep them."""
    ev = bronze_tables(spark)["events"]
    pre = ev.where(F.col("block_timestamp_ns") < silver.CUTOFF_NEP245_NS)
    assert pre.count() > 0, "fixture lost its pre-cutoff blocks"
    nep = silver.nep_245_events(ev)
    assert nep.where(F.col("block_timestamp_ns") < silver.CUTOFF_NEP245_NS).count() == 0
    pre_transfers = pre.where(
        (F.col("standard") == "dip4") & (F.col("event") == "transfer")
    ).count()
    if pre_transfers:
        t = silver.dip4_transfer(ev, ("intents.near", "defuse-alpha.near", "staging-intents.near"))
        assert t.where(F.col("block_timestamp_ns") < silver.CUTOFF_NEP245_NS).count() > 0


def test_staging_production_split(spark):
    """Production and staging transfer MVs partition by contract."""
    ev = bronze_tables(spark)["events"]
    prod = silver.dip4_transfer(ev, ("defuse-alpha.near", "intents.near"))
    staging = silver.dip4_transfer(ev, ("staging-intents.near",))
    assert prod.where(F.col("contract_id") == "staging-intents.near").count() == 0
    assert staging.where(F.col("contract_id") != "staging-intents.near").count() == 0
    assert prod.count() > 0 and staging.count() > 0


def test_silver_frames_cached_per_session_and_equal_uncached(spark):
    """r12: the shared silver MV frames (nep245, token_diff, the two
    dip4_transfer variants) are persisted once per session and served
    from the cache — and the cached frame is row-identical to a fresh
    uncached run of the same transform (no staleness, no result drift)."""
    from rust_near_indexer_spark import schemas
    from rust_near_indexer_spark.queries.silver_gold import _events, _silver

    a = _silver(spark, "nep245")
    b = _silver(spark, "nep245")
    # same persisted DataFrame object, not a rebuilt plan
    assert a is b
    assert a.storageLevel.useMemory

    fresh = silver.nep_245_events(_events(spark))
    assert a.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(a).count() == 0

    t = _silver(spark, "transfer_staging")
    fresh_t = silver.dip4_transfer(_events(spark), (schemas.STAGING_CONTRACT,))
    assert t.exceptAll(fresh_t).count() == 0
    assert fresh_t.exceptAll(t).count() == 0
