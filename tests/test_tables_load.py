"""tables.load must normalize every events.parquet generation the driver
has shipped — TIMESTAMP(NANOS) (read as ns-long under nanosAsLong) and
TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) — to the same ts/ts_ns pair.
The r02 gate lost 8 queries to this exact flip-flop."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path: str, unit: str) -> None:
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    ts = [base + dt.timedelta(microseconds=250 * i) for i in range(4)]
    table = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([7, 7, 8, 9], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "c"]),
            "value": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
            "props": pa.array(['{"k":1}'] * 4),
        }
    )
    pq.write_table(table, os.path.join(path, "events.parquet"))


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_normalizes_both_ts_generations(spark, tmp_path, unit):
    from rust_near_indexer_spark.tables import load

    d = tmp_path / unit
    d.mkdir()
    _write_events(str(d), unit)
    df = load(spark, str(d), "events")
    types = dict(df.dtypes)
    assert types["ts_ns"] == "bigint"
    assert types["ts"].startswith("timestamp")
    rows = {r["event_id"]: r for r in df.collect()}
    base_us = int(dt.datetime(2024, 5, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    for i in range(4):
        assert rows[i]["ts_ns"] == (base_us + 250 * i) * 1000
        # ts is the µs truncation of ts_ns, rendered in UTC
        assert rows[i]["ts"].replace(tzinfo=dt.timezone.utc).timestamp() == pytest.approx(
            (base_us + 250 * i) / 1e6
        )
