"""Streaming indexer: block stream → bronze sinks, exactly-once.

The reference is a streaming system (R1/R2 sources → R4 ordered map →
per-block handlers → R23 sink, indexer-clickhouse/src/main.rs:59-79,
handlers/mod.rs:16-139).  The Spark-first rendering:

- **Source (R1/R2)**: ``readStream`` over a directory of block files
  (the file source is the stand-in for blocksapi/NEAR-Lake; both are
  "ordered sequence of block messages from external storage").
  ``maxFilesPerTrigger`` bounds the micro-batch — the analog of the
  blocksapi prefetch batch (indexer-common/src/config.rs:98-104).
- **Ordered processing (R4)**: micro-batches run strictly serially
  (Structured Streaming's execution model) and the within-batch fixpoint
  checks mapping-validity windows against reader heights, so replay
  order is height-deterministic, not arrival-time-dependent.
- **Correlation state (R16–R19)**: the reference's Redis is a *shared*
  KV store read across keys (an outcome's lookup for receipt R writes
  mappings for its children R′ — a cross-key dependency chain).  Spark's
  keyed-state operators (``applyInPandasWithState`` /
  ``transformWithStateInPandas``) partition state BY KEY and forbid
  cross-key reads inside a batch, so chained same-batch resolution is
  inexpressible there.  The idiomatic Spark equivalent of a shared KV
  is an incrementally-maintained **state table**: each batch unions the
  carried mappings with the batch's seeds, runs the bounded fixpoint
  (plans/state.py), emits rows, and persists the surviving window of
  mappings (TTL-pruned by height distance).  Deterministic, and the
  whole state lives in columnar storage instead of an external Redis.
- **Incremental MVs (S18)**: silver transforms are stateless per batch
  (exactly ClickHouse MV semantics — each MV sees only the insert
  batch), so the same ``plans/silver.py`` functions run inside
  ``foreachBatch`` unchanged.
- **Exactly-once**: ``foreachBatch`` may replay a batch after failure;
  every append is stamped with ``ingest_seq = batch_id`` and the sinks
  dedup by declared PK on read/compact (sinks.py), so replays collapse —
  the same ReplacingMergeTree + re-insert-overlap idempotency model the
  reference relies on (SURVEY §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import metrics, schemas, sinks
from ..plans import bronze, state
from ..tracing import TRACER

_STATE_COLS = ("receipt_id", "tx_hash", "tier", "write_block")


def _load_state(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, "mappings")
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame(
        [], "receipt_id string, tx_hash string, tier string, write_block long"
    )


def _save_state(df: DataFrame, state_dir: str) -> None:
    path = os.path.join(state_dir, "mappings")
    # materialize before overwriting the directory we just read from
    df = df.localCheckpoint(eager=True)
    df.select(*_STATE_COLS).write.mode("overwrite").parquet(path)


def process_batch(
    blocks: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    accounts: tuple = schemas.ACCOUNTS_OF_INTEREST,
    ttl_blocks: int = state.DEFAULT_TTL_BLOCKS,
    events_only: bool = False,
    with_silver: bool = False,
) -> int:
    """One micro-batch: the streaming body of handle_streamer_message
    (handlers/mod.rs:66-139) over a batch of blocks.  Returns the number
    of blocks processed (0 for an empty trigger).

    Traced as the reference traces it: one ``handle_block_batch`` root
    span per batch (the handle_streamer_message span,
    handlers/mod.rs:58-65) with per-sink child spans; a no-op unless
    tracing.init_tracing configured an exporter."""
    with TRACER.span("handle_block_batch", batch_id=batch_id) as sp:
        n = _process_batch_inner(
            blocks, batch_id, out_dir, state_dir, accounts, ttl_blocks,
            events_only, with_silver,
        )
        sp.attributes["n_blocks"] = n
        return n


def _process_batch_inner(
    blocks: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    accounts: tuple,
    ttl_blocks: int,
    events_only: bool,
    with_silver: bool,
) -> int:
    spark = blocks.sparkSession
    if blocks.isEmpty():
        return 0

    # One JSON parse per batch: blocks feeds the two flattens and the
    # max-height agg, and flat_txs feeds three consumers (seeds,
    # transaction rows, tx-outcome rows) — without caching, each action
    # re-parses the JSON micro-batch from scratch.
    blocks = blocks.persist()
    flat_txs = bronze.flatten_transactions(blocks).persist()
    flat_outcomes = bronze.flatten_outcomes(blocks).persist()

    carried = _load_state(spark, state_dir)
    seeds = carried.unionByName(state.seed_mappings(flat_txs, accounts))
    edges = state.child_edges(flat_outcomes, accounts)
    # fixpoint over (carried ∪ batch seeds) and the batch's edges: an
    # edge's parent mapping is either carried (earlier batch) or produced
    # in this batch — there are no forward cross-batch dependencies
    # because a parent executes before its children are spawned.
    mappings = state.resolve_mappings(seeds, edges, ttl_blocks)

    # readers feeds both resolve passes and resolved_rows feeds both the
    # outcome and receipt sink appends — without a persist each append
    # action replays the distinct/join/agg chain per table (r12, same
    # rationale as the flatten persists above; released below)
    readers = state.readers_from_outcomes(flat_outcomes).persist()
    resolved_rows = state.resolve(readers, mappings, accounts, ttl_blocks).persist()
    resolved_events = state.resolve(
        readers, mappings, accounts, ttl_blocks, events_path=True
    )

    tables = {"events": bronze.event_rows(flat_outcomes, resolved_events, accounts)}
    if not events_only:
        outcome_rows, receipt_rows = bronze.outcome_and_receipt_rows(
            flat_outcomes, resolved_rows, accounts
        )
        tables["transactions"] = bronze.transaction_rows(flat_txs, accounts)
        tables["execution_outcomes"] = outcome_rows.unionByName(
            bronze.tx_outcome_rows(flat_txs, accounts)
        )
        tables["receipts"] = receipt_rows

    if with_silver:
        # S18 incremental view maintenance: each ClickHouse MV sees only
        # the inserted block batch (SURVEY §3.2) — exactly this shape.
        # The transforms are stateless, so per-batch append == full
        # recompute ∪-ed over batches.
        from ..plans import silver as silver_plans

        events_batch = tables["events"].persist()
        for sname, sdf in silver_plans.all_silver_tables(events_batch).items():
            tables[f"silver/{sname}"] = sdf

    def _append_observed(d: DataFrame, p: str) -> int:
        # R22: the appended row count rides the write job via observe —
        # the per-asset-type captured gauge costs zero extra Spark jobs.
        # A fresh Observation per attempt: one attaches only once.
        obs = Observation()
        sinks.append(d.observe(obs, F.count(F.lit(1)).alias("n")), p, batch_id)
        return obs.get["n"]

    for name, df in tables.items():
        # the reference's instrumented insert span (database.rs:41)
        with TRACER.span("sink_append", table=name) as ssp:
            n = sinks.with_retries(
                lambda d=df, p=os.path.join(out_dir, name): _append_observed(d, p)
            )
            ssp.attributes["rows"] = n
        metrics.ASSETS_IN_BLOCK_CAPTURED_TOTAL.labels(asset_type=name).set(n)

    # TTL prune: a mapping written at W is unreadable once every future
    # reader height exceeds W + ttl; batches arrive in height order, so
    # pruning against the batch's max height is safe.  The same (only)
    # collect also feeds the R22 throughput/height metrics.
    agg = blocks.agg(
        F.max("block_height").alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    max_h = agg["h"]
    metrics.BLOCK_PROCESSED_TOTAL.inc(agg["n"])
    metrics.LATEST_BLOCK_HEIGHT.set(max_h)
    with TRACER.span("save_state", max_block_height=int(max_h)):
        _save_state(
            mappings.where(F.col("write_block") >= max_h - ttl_blocks), state_dir
        )
    resolved_rows.unpersist()
    readers.unpersist()
    flat_outcomes.unpersist()
    flat_txs.unpersist()
    blocks.unpersist()
    return int(agg["n"])


def run_streaming(
    spark: SparkSession,
    blocks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str | None = None,
    accounts: tuple = schemas.ACCOUNTS_OF_INTEREST,
    ttl_blocks: int = state.DEFAULT_TTL_BLOCKS,
    max_files_per_trigger: int = 1,
    events_only: bool = False,
    with_silver: bool = False,
    source_kind: str = "file",
) -> None:
    """Run the streaming indexer over all available block files
    (Trigger.AvailableNow — R5's bounded-stop in streaming form) and
    block until the backlog drains.

    ``source_kind`` selects the block-source adapter (R1/R2 seam —
    sources.block_stream; the Spark rendering of the reference's
    data-source switch, indexer-clickhouse/src/main.rs:59-79).  The
    downstream pipeline is source-agnostic: all kinds deliver the same
    schema in the same height order.
    """
    from . import sources

    state_dir = state_dir or os.path.join(out_dir, "_state")
    stream = sources.block_stream(
        spark, source_kind, blocks_dir, blocks_per_trigger=max_files_per_trigger
    )
    processed = {"n": 0}

    def _batch(df: DataFrame, bid: int) -> None:
        processed["n"] += process_batch(
            df,
            bid,
            out_dir,
            state_dir,
            accounts=accounts,
            ttl_blocks=ttl_blocks,
            events_only=events_only,
            with_silver=with_silver,
        )

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if source_kind == "http-poll":
        # Unbounded network source — bounded-stop (R5) from the driver:
        # poll until the stream's COMMITTED ordinal reaches the
        # endpoint's tip height (the same index-until-tip loop a live
        # blocksapi deployment runs).  The condition must be the
        # checkpointed offset, not a processed-this-run counter: a
        # RESUMED run starts mid-log and would never count `tip` blocks.
        import ast
        import time

        tip = sources.fetch_height(blocks_dir)
        query = writer.trigger(processingTime="0 seconds").start()

        def _tip_reached() -> bool:
            p = query.lastProgress
            if not p:
                return False
            try:
                eo = p["sources"][0]["endOffset"]
                if isinstance(eo, str):
                    # pyspark renders python-datasource offsets with
                    # str(dict) — repr, not JSON — hence literal_eval
                    eo = ast.literal_eval(eo)
                return int(eo.get("next", -1)) >= tip
            except Exception:
                return False

        while query.isActive and not _tip_reached():
            time.sleep(0.05)
        query.stop()
        query.awaitTermination()
    elif source_kind == "rate-lookup":
        # The sequence source is unbounded — bounded-stop (R5) comes
        # from the driver: stop once every block in the lookup table has
        # been joined through (idle tail triggers join to zero rows).
        import time

        expected = spark.read.schema(schemas.BLOCK).json(blocks_dir).count()
        query = writer.trigger(processingTime="0 seconds").start()
        while query.isActive and processed["n"] < expected:
            time.sleep(0.05)
        query.stop()
        query.awaitTermination()
    else:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
