"""End-to-end batch pipeline: block stream → bronze tables.

The per-block orchestration of the reference (R6,
indexer-clickhouse/src/handlers/mod.rs:66-139 — transactions seed state
first, then receipts/outcomes and events read it) becomes a declarative
DAG here: state resolution is a fixpoint over the whole bounded input,
which is equivalent for ordered replay because mapping validity windows
are checked against the reader's block height.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import schemas
from . import bronze, state


def run_bronze(
    blocks: DataFrame,
    accounts: tuple = schemas.ACCOUNTS_OF_INTEREST,
    ttl_blocks: int = state.DEFAULT_TTL_BLOCKS,
    block_end: int | None = None,
    events_only: bool = False,
) -> dict[str, DataFrame]:
    """Return the four bronze tables as DataFrames.

    block_end: bounded stop (R5, handlers/mod.rs:23-29) — the bound is
    applied up front, before extraction and state computation.  This is
    equivalent to the reference's stop-consuming-at-the-bound semantics
    because a mapping written at block W is only readable at blocks
    M ≥ W: state written above the bound is unreachable by any in-bound
    reader, so dropping those blocks entirely changes no emitted row.
    (Contrast with the accounts-of-interest filter, which must NOT be
    pushed past state writes — filtered txs still seed the potential
    tier; the DAG below honors that by building seeds/edges from the
    unfiltered flat_txs/flat_outcomes.)

    events_only: R26 (config.rs:74-76) — extract & state-update everything
    but only produce the events table.
    """
    if block_end is not None:
        blocks = blocks.where(blocks["block_height"] <= block_end)

    flat_txs = bronze.flatten_transactions(blocks)
    flat_outcomes = bronze.flatten_outcomes(blocks).persist()

    seeds = state.seed_mappings(flat_txs, accounts)
    edges = state.child_edges(flat_outcomes, accounts)
    mappings = state.resolve_mappings(seeds, edges, ttl_blocks)

    # readers feeds BOTH resolve passes and resolved_rows feeds BOTH the
    # outcome and receipt projections; without a persist every consumer
    # action replays the distinct/join/agg chain (r12 — measured via the
    # bronze blocks/s bench, which counts all four tables; same pattern
    # as the flat_outcomes persist above)
    readers = state.readers_from_outcomes(flat_outcomes).persist()
    resolved_rows = state.resolve(
        readers, mappings, accounts, ttl_blocks, events_path=False
    ).persist()
    resolved_events = state.resolve(readers, mappings, accounts, ttl_blocks, events_path=True)

    events = bronze.event_rows(flat_outcomes, resolved_events, accounts)
    out: dict[str, DataFrame] = {"events": events}
    if not events_only:
        outcomes_rows, receipt_rows = bronze.outcome_and_receipt_rows(
            flat_outcomes, resolved_rows, accounts
        )
        out["transactions"] = bronze.transaction_rows(flat_txs, accounts)
        out["execution_outcomes"] = outcomes_rows.unionByName(
            bronze.tx_outcome_rows(flat_txs, accounts)
        )
        out["receipts"] = receipt_rows
    return out
