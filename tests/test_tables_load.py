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


@pytest.mark.parametrize("elem", ["float32", "float64"])
def test_load_normalizes_embedding_widths(spark, tmp_path, elem):
    """VERDICT r03 item 5: embeddings must load to the same canonical
    array<double> schema — and identical values — whether the driver
    ships float32 or float64 elements (values chosen float32-exact so
    both variants carry the same doubles)."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.queries.similarity import _qvec
    from rust_near_indexer_spark.tables import load

    d = tmp_path / elem
    d.mkdir()
    vecs = [[0.5, -0.25, 0.125, 1.0], [0.75, 0.0, -0.5, -1.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int32()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32() if elem == "float32" else pa.float64())
                ),
                "label": pa.array([3, 4], pa.int64()),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    df = load(spark, str(d), "embeddings")
    assert dict(df.dtypes) == {
        "vec_id": "bigint",
        "embedding": "array<double>",
        "label": "int",
    }
    rows = {r["vec_id"]: r for r in df.select("vec_id", _qvec(F.col("embedding")).alias("q")).collect()}
    assert rows[0]["q"] == [500000, -250000, 125000, 1000000]
    assert rows[1]["q"] == [750000, 0, -500000, -1000000]


@pytest.mark.parametrize("width", ["int32", "int64"])
def test_load_normalizes_documents_counters(spark, tmp_path, width):
    from rust_near_indexer_spark.tables import load

    d = tmp_path / width
    d.mkdir()
    it = pa.int32() if width == "int32" else pa.int64()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], it),
                "text": pa.array(["a b", "c"]),
                "lang": pa.array(["en", "de"]),
                "source": pa.array(["web", "books"]),
                "n_chars": pa.array([3, 1], it),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    df = load(spark, str(d), "documents")
    types = dict(df.dtypes)
    assert types["doc_id"] == "bigint" and types["n_chars"] == "bigint"
    assert {(r["doc_id"], r["n_chars"]) for r in df.collect()} == {(1, 3), (2, 1)}
