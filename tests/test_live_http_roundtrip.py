"""Live localhost HTTP round-trips for the two network sinks.

The unit suites pin the ClickHouse wire bytes (tests/golden/
clickhouse_wire.json) and the OTLP JSON encoding against injected
transports; these tests close the remaining gap a sandbox allows —
running the DEFAULT urllib transport against a real socket, with a
server that actually PARSES what arrives:

- a fake ClickHouse speaking the HTTP interface (?query=INSERT ...
  FORMAT JSONEachRow): it json-parses every body line into per-table
  rows, so escaping/NULL/array handling is verified by a parser on the
  other side of a TCP connection, not by byte comparison;
- a fake OTLP collector on /v1/traces asserting the resourceSpans
  tree (service resource, span parentage) from the posted JSON.

A real deployment swaps the endpoint URL only — the code path
exercised here (urllib POST, retry wrapper, executor-side
foreachPartition posting) is exactly the production one.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest


class _FakeServer:
    """Localhost HTTP server recording and parsing what it receives."""

    def __init__(self, fail_first: int = 0):
        self.tables: dict[str, list[dict]] = {}
        self.traces: list[dict] = []
        self.requests: list[tuple[str, str]] = []
        self.fail_remaining = fail_first
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 - stdlib API name
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                parsed = urlparse(self.path)
                with outer.lock:
                    outer.requests.append((parsed.path, parsed.query))
                    if outer.fail_remaining > 0:
                        outer.fail_remaining -= 1
                        self.send_response(500)
                        self.end_headers()
                        self.wfile.write(b"simulated transient failure")
                        return
                    if parsed.path == "/v1/traces":
                        outer.traces.append(json.loads(body))
                    else:
                        q = parse_qs(parsed.query).get("query", [""])[0]
                        assert q.startswith("INSERT INTO "), q
                        assert q.endswith(" FORMAT JSONEachRow"), q
                        table = q[len("INSERT INTO ") : -len(" FORMAT JSONEachRow")]
                        rows = [json.loads(ln) for ln in body.split(b"\n") if ln]
                        outer.tables.setdefault(table, []).extend(rows)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")

            def log_message(self, *a):  # quiet
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self.httpd.server_port}"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def server():
    s = _FakeServer()
    yield s
    s.close()


# The wire-golden hard cases: escaping, embedded newline/quote/unicode,
# NULL, nested arrays, negative + large ints.
TRICKY_ROWS = [
    {"id": 1, "s": 'quote " backslash \\ newline \n tab \t', "arr": [1, 2, 3]},
    {"id": 2, "s": "unicode ✓ ☃ é", "arr": []},
    {"id": 3, "s": None, "arr": [-(2**62), 2**62]},
    {"id": -4, "s": "", "arr": [0]},
]


def test_clickhouse_sink_roundtrips_through_real_socket(server):
    from rust_near_indexer_spark.clickhouse_sink import ClickHouseSink

    sink = ClickHouseSink(server.endpoint)  # DEFAULT urllib transport
    n = sink.write_rows("bronze.events", TRICKY_ROWS)
    assert n == 1
    got = server.tables["bronze.events"]
    assert got == TRICKY_ROWS  # parsed on the far side of the socket


def test_clickhouse_sink_batches_and_retries_over_live_socket(server):
    from rust_near_indexer_spark.clickhouse_sink import ClickHouseSink

    server.fail_remaining = 2  # first two posts get HTTP 500
    rows = [{"id": i, "v": f"r{i}"} for i in range(5)]
    sink = ClickHouseSink(server.endpoint, batch_rows=2)
    n = sink.write_rows("t.retry", rows)
    assert n == 3  # ceil(5/2) batches
    # the two 500s were retried: same 5 rows land exactly once
    assert sorted(server.tables["t.retry"], key=lambda r: r["id"]) == rows
    assert len(server.requests) == 5  # 3 batches + 2 retried failures


def test_clickhouse_write_dataframe_posts_from_executors(spark, server):
    from rust_near_indexer_spark.clickhouse_sink import ClickHouseSink

    df = spark.range(10).selectExpr("id", "concat('v', id) AS v").repartition(4)
    ClickHouseSink(server.endpoint).write_dataframe(df, "t.exec")
    got = sorted(server.tables["t.exec"], key=lambda r: r["id"])
    assert got == [{"id": i, "v": f"v{i}"} for i in range(10)]


def test_otlp_spans_reach_live_collector(server):
    from rust_near_indexer_spark import tracing

    old_exporter, old_service = tracing.TRACER.exporter, tracing.TRACER.service
    try:
        tracing.init_tracing(endpoint=server.endpoint + "/v1/traces",
                             service="live-test", version="9.9.9")
        with tracing.TRACER.span("root", block_height=42):
            with tracing.TRACER.span("child", table="bronze.events"):
                pass
    finally:
        tracing.TRACER.exporter, tracing.TRACER.service = old_exporter, old_service

    assert len(server.traces) == 1  # one batch at root-span end
    rs = server.traces[0]["resourceSpans"][0]
    res_attrs = {a["key"]: a["value"] for a in rs["resource"]["attributes"]}
    assert res_attrs["service.name"]["stringValue"] == "live-test"
    assert res_attrs["service.version"]["stringValue"] == "9.9.9"
    spans = {s["name"]: s for s in rs["scopeSpans"][0]["spans"]}
    assert set(spans) == {"root", "child"}
    assert spans["child"]["parentSpanId"] == spans["root"]["spanId"]
    assert spans["child"]["traceId"] == spans["root"]["traceId"]
    assert "parentSpanId" not in spans["root"]
    attrs = {a["key"]: a["value"] for a in spans["root"]["attributes"]}
    assert attrs["block_height"]["intValue"] == "42"
    assert int(spans["root"]["endTimeUnixNano"]) >= int(
        spans["root"]["startTimeUnixNano"]
    )
