"""Access to the driver-provided parquet tables.

``/root/testdata/sf{0.001,0.01,0.1}/*.parquet`` — TPC-H-ish star schema
plus ``events`` / ``documents`` / ``embeddings`` (see TESTDATA.md).
Reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and partition-sized splits for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Widen a compact scan before CPU-heavy per-row derivation.

    A small parquet file yields few input splits (parquet can't split
    below row-group granularity), so md5/regex-heavy projections over it
    run on a handful of cores no matter the cluster size.  Repartition to
    ``defaultParallelism`` — which scales with the cluster — but ONLY
    when the scan is narrower than that: at 100 TB the scan already has
    more partitions than cores and the shuffle would be pure waste, so
    this becomes a no-op there.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Keep the reference's dual convention regardless of how the
        # driver wrote ts (SURVEY §1.2: block_timestamp_ns long +
        # µs-truncated TimestampType ts).  Testdata generations have
        # shipped ts as either parquet TIMESTAMP(NANOS) — read as
        # ns-long under nanosAsLong (session.py) — or TIMESTAMP(MICROS)
        # — read as TIMESTAMP_NTZ.  Branch on the arrived type.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            # NTZ → session-UTC timestamp carries the same wall-clock
            # instant (session.py pins spark.sql.session.timeZone=UTC).
            ts = F.col("ts").cast("timestamp")
            df = df.withColumn("ts_ns", F.unix_micros(ts) * F.lit(1000)).withColumn(
                "ts", ts
            )
    return df
