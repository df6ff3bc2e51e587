"""VERDICT r05 #6: the persisted correlation-state table must stay
O(TTL window) under sustained replay — TTL pruning actually bites — and
streaming must still equal batch at the end of a long run.

The reference's only state bound is the Redis TTL
(`indexer-common/src/cache/redis.rs:67-91`); our analog is the
height-distance prune in streaming/pipeline.py (_save_state keeps
``write_block >= max_h - ttl``).  A 200-micro-batch replay (one block
per batch — the reference's exact cadence, handlers/mod.rs:31-40) would
grow the mappings table linearly if pruning regressed; this pins the
ceiling AND the exact final state.

``process_batch`` is driven directly (it IS the foreachBatch body —
same code path, none of the Structured Streaming scaffolding that the
adapter tests already cover), so 200 batches run in test-friendly time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark import fixtures, schemas
from rust_near_indexer_spark.canonical import fingerprint
from rust_near_indexer_spark.plans.pipeline import run_bronze
from rust_near_indexer_spark.streaming.pipeline import process_batch

N_BLOCKS = 200
TTL = 12  # small TTL so the window is a fraction of the run length


def test_state_stays_bounded_over_200_batches(spark, tmp_path):
    blocks, _ = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL)
    out = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")

    state_sizes = []
    for i, block in enumerate(blocks):  # one block per micro-batch
        df = fixtures.blocks_df(spark, [block])
        # events_only: one sink write per batch instead of four — the
        # correlation-state maintenance under test is identical (R26
        # extracts and state-updates everything either way).
        n = process_batch(
            df,
            batch_id=i,
            out_dir=out,
            state_dir=state_dir,
            ttl_blocks=TTL,
            events_only=True,
        )
        assert n == 1
        if i % 20 == 19:
            state_sizes.append(
                spark.read.parquet(f"{state_dir}/mappings").count()
            )

    # Exact bound: the persisted state must equal the batch-global
    # mapping fixpoint restricted to the TTL window — not merely "small".
    all_blocks = fixtures.blocks_df(spark, blocks)
    from rust_near_indexer_spark.plans import bronze, state

    flat_txs = bronze.flatten_transactions(all_blocks)
    flat_outcomes = bronze.flatten_outcomes(all_blocks)
    batch_mappings = state.resolve_mappings(
        state.seed_mappings(flat_txs, schemas.ACCOUNTS_OF_INTEREST),
        state.child_edges(flat_outcomes, schemas.ACCOUNTS_OF_INTEREST),
        TTL,
    )
    max_h = all_blocks.agg(F.max("block_height")).collect()[0][0]
    want = batch_mappings.where(F.col("write_block") >= max_h - TTL)

    def fp(df):
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        return tuple(
            df.agg(F.count("*").alias("n"), fingerprint(*cols).alias("fp")).collect()[0]
        )

    streamed_state = spark.read.parquet(f"{state_dir}/mappings")
    assert fp(streamed_state.select(*want.columns)) == fp(want)

    # Growth profile: every checkpointed size is within the window
    # ceiling (window mappings of the worst window seen, with the batch
    # fixpoint's per-window max as the bound) — i.e. O(TTL), not O(run).
    per_block = dict(
        batch_mappings.groupBy("write_block")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    worst_window = max(
        sum(per_block.get(h, 0) for h in range(w - TTL, w + 1))
        for w in range(min(per_block), max(per_block) + 1)
    )
    assert worst_window > 0
    assert all(s <= worst_window for s in state_sizes), (state_sizes, worst_window)
    # and the run visibly prunes: the state never approaches run length
    total_mappings = batch_mappings.count()
    assert max(state_sizes) < total_mappings

    # Streaming output == batch output after 200 single-block batches.
    batch_events = run_bronze(all_blocks, ttl_blocks=TTL)["events"]
    from rust_near_indexer_spark import sinks

    streamed_events = sinks.read_final(
        spark, f"{out}/events", sinks.TABLE_PKS["events"]
    ).select(*batch_events.columns)
    assert fp(streamed_events) == fp(batch_events)
