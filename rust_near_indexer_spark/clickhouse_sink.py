"""ClickHouse batched sink (R23, indexer-clickhouse/src/database.rs:41-99).

The reference inserts one row-binary batch per table per block over the
ClickHouse HTTP interface, retrying with exponential backoff (250 ms →
60 s cap, 10 attempts).  Spark-first rendering: a ``foreachBatch`` /
per-table writer that posts ``INSERT INTO <table> FORMAT JSONEachRow``
over plain HTTP (stdlib urllib — no driver dependency), batching rows
per partition and reusing the exact retry policy from sinks.py.

No ClickHouse server exists in this environment, so the transport is
injectable (``post_fn``); tests exercise payload construction, batching,
ordering and the retry path against a fake transport.  Pointing
``ClickHouseSink`` at a real ``http://host:8123`` endpoint is the only
production delta.

Scale posture: ``write_dataframe`` ships each partition independently
from the executors via ``foreachPartition`` — the driver never
materializes rows; batch size bounds each POST body.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable

from pyspark.sql import DataFrame

from .sinks import with_retries

DEFAULT_BATCH_ROWS = 10_000


def _default_post(url: str, body: bytes) -> None:  # pragma: no cover - network
    import urllib.request

    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as resp:
        if resp.status // 100 != 2:
            raise RuntimeError(f"clickhouse insert failed: HTTP {resp.status}")


def insert_payloads(
    table: str, rows: Iterable[dict], batch_rows: int = DEFAULT_BATCH_ROWS
) -> Iterable[tuple[str, bytes]]:
    """(query-string, body) pairs: INSERT ... FORMAT JSONEachRow with one
    JSON object per line — the HTTP-interface equivalent of the row-binary
    batch insert (database.rs:90-98)."""
    query = f"INSERT INTO {table} FORMAT JSONEachRow"
    buf: list[bytes] = []
    for row in rows:
        buf.append(json.dumps(row, separators=(",", ":"), sort_keys=True).encode())
        if len(buf) >= batch_rows:
            yield query, b"\n".join(buf)
            buf = []
    if buf:
        yield query, b"\n".join(buf)


class ClickHouseSink:
    """Retrying batched writer for one ClickHouse endpoint."""

    def __init__(
        self,
        endpoint: str,
        post_fn: Callable[[str, bytes], None] | None = None,
        batch_rows: int = DEFAULT_BATCH_ROWS,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.post_fn = post_fn or _default_post
        self.batch_rows = batch_rows

    def _url(self, query: str) -> str:
        from urllib.parse import quote

        return f"{self.endpoint}/?query={quote(query)}"

    def write_rows(self, table: str, rows: Iterable[dict]) -> int:
        """Insert a batch of row dicts; returns batches sent.  Each batch
        retries with the reference policy (database.rs:53-71) and is
        traced like the reference's instrumented insert (database.rs:41,
        73 — span per insert with the table attribute)."""
        from .tracing import TRACER

        n = 0
        for query, body in insert_payloads(table, rows, self.batch_rows):
            with TRACER.span("clickhouse_insert", table=table, bytes=len(body)):
                with_retries(lambda q=query, b=body: self.post_fn(self._url(q), b))
            n += 1
        return n

    def write_dataframe(self, df: DataFrame, table: str) -> None:
        """Executor-side write: each partition posts its own batches —
        the foreachBatch body for a streaming query's ClickHouse sink."""
        endpoint, post_fn, batch_rows = self.endpoint, self.post_fn, self.batch_rows

        def _send(it):
            sink = ClickHouseSink(endpoint, post_fn, batch_rows)
            sink.write_rows(table, (row.asDict(recursive=True) for row in it))

        df.foreachPartition(_send)
