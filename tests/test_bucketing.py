"""Bucketed tables co-locate join keys: the equi-join between two tables
bucketed on the same key must plan with ZERO Exchange operators (no
shuffle on either side) and return exactly the plain join's rows."""

from __future__ import annotations

import pytest

from rust_near_indexer_spark.sinks import write_bucketed
from rust_near_indexer_spark.tables import load


@pytest.fixture()
def bucketdb(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketdb):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    write_bucketed(orders, f"{bucketdb}.orders_b", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(cust, f"{bucketdb}.customer_b", "o_custkey", 8, sort_col="o_custkey")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table(f"{bucketdb}.orders_b").join(
            spark.table(f"{bucketdb}.customer_b"), "o_custkey"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        assert j.count() == orders.join(cust, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
