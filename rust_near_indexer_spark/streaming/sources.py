"""Block-source adapters (R1/R2): one schema contract, swappable kinds.

The reference selects its block source with a config switch — blocksapi
gRPC vs NEAR-Lake S3/GCS (`indexer-clickhouse/src/main.rs:59-79`,
`indexer-common/src/config.rs:93-107`) — and everything downstream sees
the same ordered `StreamerMessage` stream.  This module is the Spark
rendering of that seam: :func:`block_stream` returns a *streaming*
DataFrame in the canonical ``schemas.BLOCK`` shape regardless of the
source kind, and the per-trigger bound (the blocksapi prefetch-batch
analog, `config.rs:98-104`) is applied inside each adapter.

Kinds
-----
``file``
    Schema'd JSON directory scan (``maxFilesPerTrigger`` bounding) —
    the NEAR-Lake stand-in: Lake is "list objects, read JSON blocks in
    key order", which is exactly Spark's file source against an
    S3/GCS path (the sandbox has no network; swapping the directory
    for an ``s3://`` URI is the only change).
``kafka-envelope``
    A text-envelope stream parsed with ``from_json`` into the block
    schema.  This is byte-for-byte the consumer code a real Kafka /
    blocksapi bridge needs — Kafka delivers ``value`` as an opaque
    payload column and the adapter owns the envelope→schema parse.  In
    the sandbox the envelope rows come from the ``text`` file source
    (one JSON block per line); a production deployment swaps
    ``.format("text")`` for ``.format("kafka")`` + subscribe options
    and keeps the parse identical.  Corrupt payloads surface as NULL
    ``block_height`` rows and are dropped loudly (counted by the
    caller's observe hook rather than silently vanishing inside a
    malformed-JSON exception).
``rate-lookup``
    Spark's ``rate-micro-batch`` source emits a monotone sequence
    number per trigger (``rowsPerBatch`` bounding); a stream-static
    equi-join resolves each sequence number to its block payload from
    an indexed static table.  This models pull-by-ordinal sources
    (blocksapi's "give me block N next" replay protocol,
    `main.rs:100-127` start-block resume): ordering comes from the
    sequence source, payload from a keyed lookup.

All three kinds produce identical rows in identical height order, so
the bronze pipeline fingerprint-matches across them (proved by
tests/test_source_adapters.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import schemas

SOURCE_KINDS = ("file", "kafka-envelope", "rate-lookup")


def block_stream(
    spark: SparkSession,
    kind: str,
    blocks_dir: str,
    blocks_per_trigger: int = 1,
) -> DataFrame:
    """Return a streaming DataFrame of block rows (``schemas.BLOCK``).

    ``blocks_per_trigger`` bounds one micro-batch: files for ``file``
    and ``kafka-envelope`` (a file is the sandbox's unit of arrival),
    rows for ``rate-lookup`` (its unit of arrival is one block).
    """
    if kind == "file":
        return (
            spark.readStream.schema(schemas.BLOCK)
            .option("maxFilesPerTrigger", blocks_per_trigger)
            .json(blocks_dir)
        )
    if kind == "kafka-envelope":
        envelope = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", blocks_per_trigger)
            .load(blocks_dir)
        )
        return (
            envelope.select(
                F.from_json(F.col("value"), schemas.BLOCK).alias("b")
            )
            .select("b.*")
            .where(F.col("block_height").isNotNull())
        )
    if kind == "rate-lookup":
        # Static lookup side: block payloads keyed by their 0-based
        # height ordinal.  The window is a one-time driver-side indexing
        # of the (small) lookup table metadata — the stream side never
        # sees an unpartitioned window.
        indexed = (
            spark.read.schema(schemas.BLOCK)
            .json(blocks_dir)
            .withColumn(
                "seq",
                F.row_number().over(Window.orderBy("block_height")).cast("long") - 1,
            )
        )
        seqs = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", blocks_per_trigger)
            .load()
            .select(F.col("value").alias("seq"))
        )
        return seqs.join(indexed, "seq").drop("seq")
    raise ValueError(f"unknown block source kind {kind!r}; one of {SOURCE_KINDS}")
