"""R1/R2 source-adapter seam: the same bronze pipeline run from every
source kind must produce identical tables (per-table fingerprints).

The reference switches blocksapi vs NEAR-Lake behind one config enum
(`indexer-clickhouse/src/main.rs:59-79`) and the handlers never know
which fed them; `sources.block_stream` is the Spark rendering, so the
proof obligation is source-kind invariance of the output."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_near_indexer_spark import fixtures, sinks
from rust_near_indexer_spark.canonical import fingerprint
from rust_near_indexer_spark.queries.near_events import TTL_BLOCKS
from rust_near_indexer_spark.streaming import SOURCE_KINDS, run_streaming

N_BLOCKS = 120
N_CHUNKS = 3


@pytest.fixture(scope="module")
def blocks_dir(tmp_path_factory):
    blocks, _ = fixtures.generate(n_blocks=N_BLOCKS, ttl_blocks=TTL_BLOCKS)
    d = tmp_path_factory.mktemp("adapter_blocks")
    per = (len(blocks) + N_CHUNKS - 1) // N_CHUNKS
    for c in range(N_CHUNKS):
        chunk = blocks[c * per : (c + 1) * per]
        with open(d / f"chunk-{c:03d}.jsonl", "w") as f:
            for b in chunk:
                f.write(json.dumps(b, separators=(",", ":")) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def blocks_server(blocks_dir):
    """Live localhost blocksapi-style server over the SAME fixture
    blocks: GET /blocks?from=N&limit=K (height-ordered JSON array) and
    GET /height (total count) — what the http-poll adapter speaks."""
    import glob
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    blocks: list[dict] = []
    for p in sorted(glob.glob(os.path.join(blocks_dir, "*.jsonl"))):
        with open(p) as f:
            blocks.extend(json.loads(ln) for ln in f if ln.strip())

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API name
            parsed = urlparse(self.path)
            if parsed.path == "/height":
                body = json.dumps(len(blocks)).encode()
            elif parsed.path == "/blocks":
                q = parse_qs(parsed.query)
                start = int(q.get("from", ["0"])[0])
                limit = int(q.get("limit", ["1"])[0])
                body = json.dumps(blocks[start : start + limit]).encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    httpd.server_close()


def _table_fps(spark, out: str) -> dict[str, tuple]:
    fps = {}
    for name, pk in sinks.TABLE_PKS.items():
        df = sinks.read_final(spark, os.path.join(out, name), pk)
        cols = [F.col(c).cast("string") for c in df.columns if c != "receipt_ids"]
        fps[name] = tuple(
            df.agg(F.count("*").alias("n"), fingerprint(*cols).alias("fp")).collect()[0]
        )
    return fps


def test_all_source_kinds_fingerprint_match(spark, blocks_dir, blocks_server, tmp_path):
    fps = {}
    for kind in SOURCE_KINDS:
        out = str(tmp_path / f"out-{kind}")
        # http-poll's "location" is a live URL (R1's real-network path:
        # default urllib transport against an actual socket); the rest
        # read the fixture directory.  rate-lookup and http-poll batch
        # by BLOCKS per trigger, the file kinds by files.
        location = blocks_server if kind == "http-poll" else blocks_dir
        run_streaming(
            spark,
            location,
            out,
            checkpoint_dir=str(tmp_path / f"ckpt-{kind}"),
            ttl_blocks=TTL_BLOCKS,
            source_kind=kind,
            max_files_per_trigger=1 if kind in ("file", "kafka-envelope") else 40,
        )
        fps[kind] = _table_fps(spark, out)
    base = fps["file"]
    assert all(base[t][0] > 0 for t in base), base  # non-trivial corpus
    for kind in SOURCE_KINDS[1:]:
        assert fps[kind] == base, f"{kind} diverged from file source"


def test_unknown_kind_rejected(spark, blocks_dir):
    from rust_near_indexer_spark.streaming import block_stream

    with pytest.raises(ValueError, match="unknown block source kind"):
        block_stream(spark, "grpc", blocks_dir)


def test_http_poll_resumes_from_checkpoint_as_tip_advances(
    spark, blocks_dir, tmp_path
):
    """The live scenario R3 + R1 compose into: index to the server's
    tip, stop, the chain grows, restart from the same checkpoint — the
    second run must pick up at the committed ordinal (initialOffset/
    readBetweenOffsets from checkpoint restore over a real socket) and
    the final tables must fingerprint-match a single uninterrupted
    file-source run."""
    import glob
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    blocks: list[dict] = []
    for p in sorted(glob.glob(os.path.join(blocks_dir, "*.jsonl"))):
        with open(p) as f:
            blocks.extend(json.loads(ln) for ln in f if ln.strip())
    visible = {"n": len(blocks) // 2}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            parsed = urlparse(self.path)
            if parsed.path == "/height":
                body = json.dumps(visible["n"]).encode()
            else:
                q = parse_qs(parsed.query)
                start = int(q.get("from", ["0"])[0])
                limit = int(q.get("limit", ["1"])[0])
                window = blocks[: visible["n"]][start : start + limit]
                body = json.dumps(window).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        common = dict(
            checkpoint_dir=ckpt, ttl_blocks=TTL_BLOCKS,
            source_kind="http-poll", max_files_per_trigger=40,
        )
        run_streaming(spark, url, out, **common)   # indexes to half-tip
        visible["n"] = len(blocks)                 # the chain grows
        run_streaming(spark, url, out, **common)   # resume to new tip

        ref = str(tmp_path / "ref")
        run_streaming(
            spark, blocks_dir, ref,
            checkpoint_dir=str(tmp_path / "ckpt-ref"),
            ttl_blocks=TTL_BLOCKS, source_kind="file",
        )
        assert _table_fps(spark, out) == _table_fps(spark, ref)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_poll_drops_corrupt_payloads_loudly(spark, tmp_path):
    """kafka-envelope's corrupt-payload contract holds for http-poll
    too: a block the server serves as unparseable JSON becomes a NULL
    block_height row and is dropped by the adapter — the stream keeps
    going instead of dying inside from_json."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from rust_near_indexer_spark.streaming import block_stream

    blocks, _ = fixtures.generate(n_blocks=6, ttl_blocks=TTL_BLOCKS)
    served = [dict(b) for b in blocks]
    served[2] = {"garbage": "\x00not-a-block"}  # parses as JSON, wrong shape
    served[4] = {"block_height": None}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            p = urlparse(self.path)
            if p.path == "/height":
                body = json.dumps(len(served)).encode()
            else:
                q = parse_qs(p.query)
                s, l = int(q["from"][0]), int(q["limit"][0])
                body = json.dumps(served[s : s + l]).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_port}"
        stream = block_stream(spark, "http-poll", url, blocks_per_trigger=6)
        got = []

        def _b(df, bid):
            got.extend(r["block_height"] for r in df.select("block_height").collect())

        q = (stream.writeStream.foreachBatch(_b)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(processingTime="0 seconds").start())
        import time

        t0 = time.time()
        while time.time() - t0 < 60 and len(got) < 4:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        want = [b["block_height"] for i, b in enumerate(blocks) if i not in (2, 4)]
        assert sorted(got) == sorted(want)
    finally:
        httpd.shutdown()
        httpd.server_close()
