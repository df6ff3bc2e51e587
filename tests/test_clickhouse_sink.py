"""ClickHouse sink shape: payload construction, batching, retry wiring
(transport injected — no server in this environment)."""

from __future__ import annotations

import json

from rust_near_indexer_spark.clickhouse_sink import ClickHouseSink, insert_payloads


def test_payload_batching():
    rows = [{"a": i, "b": f"x{i}"} for i in range(25)]
    batches = list(insert_payloads("events", rows, batch_rows=10))
    assert len(batches) == 3
    q, body = batches[0]
    assert q == "INSERT INTO events FORMAT JSONEachRow"
    lines = body.split(b"\n")
    assert len(lines) == 10
    assert json.loads(lines[0]) == {"a": 0, "b": "x0"}
    assert len(batches[2][1].split(b"\n")) == 5


def test_sink_posts_with_retry():
    posted: list[tuple[str, bytes]] = []
    fails = {"n": 2}

    def flaky_post(url: str, body: bytes) -> None:
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("transient")
        posted.append((url, body))

    sink = ClickHouseSink("http://ch:8123", post_fn=flaky_post, batch_rows=2)
    n = sink.write_rows("transactions", [{"h": 1}, {"h": 2}, {"h": 3}])
    assert n == 2  # two batches
    assert len(posted) == 2
    assert "INSERT%20INTO%20transactions" in posted[0][0]


def test_month_partitioning(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from rust_near_indexer_spark import sinks
    from rust_near_indexer_spark.queries.near_events import bronze_tables

    ev = bronze_tables(spark)["events"]
    path = str(tmp_path / "events_by_month")
    sinks.append(ev, path, ingest_seq=1, partitioning="month")
    dirs = [d for d in os.listdir(path) if d.startswith("height_bucket=")]
    # fixture spans the pre-cutoff month and several Feb/Mar days
    assert any("2025-02" in d for d in dirs)
    assert len(dirs) >= 2
    # month-range predicate prunes partitions at scan time
    got = spark.read.parquet(path).where(F.col("height_bucket") == dirs[0].split("=")[1])
    assert got.count() > 0
