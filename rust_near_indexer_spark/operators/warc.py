"""WARC (ISO 28500) record parser — the Common Crawl ingestion path.

A 100 TB text corpus starts life as WARC: web-archive record streams,
usually with each record an independent gzip member (``.warc.gz``).
The reference has no web-ingestion surface; this is SURVEY §2B
north-star pipeline source plumbing, implemented in full for the
record layer:

- the version line (``WARC/1.0`` / ``WARC/1.1``), case-insensitive
  named headers with RFC-style continuation-line folding,
  ``Content-Length`` block framing, and the mandatory CRLF CRLF
  record terminator;
- per-record gzip members (the magic-sniffed ``.warc.gz`` layout —
  each member decompressed independently so a 100 TB file splits at
  member boundaries, exactly why Common Crawl ships it this way);
- all standard record types (warcinfo / request / response /
  resource / metadata / revisit) surfaced verbatim;
- HTTP response payload parsing inside ``application/http`` blocks
  (status line, headers, body split at the first CRLF CRLF);
- ``warc_documents``: the ingestion projection — HTTP 200 text
  responses → (uri, date, body text) rows, the step that turns an
  archive into a ``documents`` table.

Truncated/malformed records raise ValueError (same contract as the
codec layer).  Integer-exact framing means the gate query
(queries/multimodal.warc_ingest_stats) replays record counts, HTTP
statuses, content lengths, and token counts relationally in DuckDB
against synthesized genuine archives — including the gzipped-member
path.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = bytearray()
    view = data
    while view:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(view)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC: {exc}") from exc
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        view = d.unused_data
    return bytes(out)


def _parse_headers(lines: list[bytes]) -> dict[str, str]:
    """Named fields with continuation-line folding; keys case-folded."""
    headers: dict[str, str] = {}
    last = None
    for ln in lines:
        if ln[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + ln.strip().decode("utf-8", "replace")
            continue
        if b":" not in ln:
            raise ValueError(f"malformed WARC header line {ln[:40]!r}")
        k, v = ln.split(b":", 1)
        last = k.strip().decode("ascii", "replace").lower()
        headers[last] = v.strip().decode("utf-8", "replace")
    return headers


def parse_warc(data: bytes) -> list[dict]:
    """bytes (plain or per-record-gzipped) → list of record dicts:
    ``{"version", "type", "headers", "uri", "date", "content_length",
    "block"}``."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra blank lines between records
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = eol + 2
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = data[pos:hdr_end].split(_CRLF)
        headers = _parse_headers(lines)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record without Content-Length") from exc
        block_start = hdr_end + 4
        block_end = block_start + length
        if block_end > n:
            raise ValueError(
                f"truncated WARC block: want {length} bytes, have "
                f"{n - block_start}"
            )
        if data[block_end : block_end + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing CRLF CRLF terminator")
        records.append(
            {
                "version": version,
                "type": headers.get("warc-type", ""),
                "headers": headers,
                "uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "content_length": length,
                "block": data[block_start:block_end],
            }
        )
        pos = block_end + 4
    if not records:
        raise ValueError("no WARC records found")
    return records


def parse_http_response(block: bytes) -> dict:
    """``application/http; msgtype=response`` block → status line,
    headers, body."""
    split = block.find(_CRLF + _CRLF)
    if split < 0:
        raise ValueError("HTTP block without header terminator")
    head = block[:split].split(_CRLF)
    status_line = head[0].decode("ascii", "replace")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {status_line[:40]!r}")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise ValueError(f"bad HTTP status {parts[1]!r}") from exc
    headers = _parse_headers(head[1:]) if len(head) > 1 else {}
    return {
        "status": status,
        "headers": headers,
        "body": block[split + 4 :],
    }


def warc_documents(records: list[dict]) -> list[dict]:
    """The ingestion projection: HTTP 200 text responses →
    ``{"uri", "date", "text", "n_bytes"}`` rows (the archive →
    documents-table step; non-text and non-200 records drop)."""
    out = []
    for rec in records:
        if rec["type"] != "response":
            continue
        if "application/http" not in rec["headers"].get("content-type", ""):
            continue
        http = parse_http_response(rec["block"])
        if http["status"] != 200:
            continue
        ctype = http["headers"].get("content-type", "")
        if not ctype.startswith(("text/plain", "text/html")):
            continue
        body = http["body"]
        out.append(
            {
                "uri": rec["uri"],
                "date": rec["date"],
                "text": body.decode("utf-8", "replace"),
                "n_bytes": len(body),
            }
        )
    return out


# ---------------------------------------------------------------------------
# Product-side synthesizer for the gate query: a genuine WARC/1.0
# archive (warcinfo + request/response pairs, fixed-width HTTP
# framing) whose every length is integer-derivable; odd seeds emit
# the per-record-gzip .warc.gz layout so the gate also drives the
# member-decompression path.
# ---------------------------------------------------------------------------


def _record(rtype: str, block: bytes, uri: str | None = None,
            ctype: str = "application/http; msgtype=response") -> bytes:
    h = b"WARC/1.0\r\n"
    h += b"WARC-Type: " + rtype.encode() + _CRLF
    h += b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
    if uri is not None:
        h += b"WARC-Target-URI: " + uri.encode() + _CRLF
    h += b"Content-Type: " + ctype.encode() + _CRLF
    h += b"Content-Length: " + str(len(block)).encode() + _CRLF
    return h + _CRLF + block + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def synth_warc(seed: int, n_responses: int) -> bytes:
    """``n_responses`` HTTP 200 text responses (bodies are the pure
    formula ``"tok " * (5 + (seed + i) % 7)``) behind a warcinfo
    record; odd seeds gzip each record as its own member."""
    raws = [
        _record(
            "warcinfo",
            b"software: synth\r\n",
            ctype="application/warc-fields",
        )
    ]
    for i in range(n_responses):
        k = 5 + (seed + i) % 7
        body = b"tok " * k
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain\r\n"
            + b"\r\n"
            + body
        )
        raws.append(
            _record("response", http, uri=f"http://ex.com/{seed}/{i}")
        )
    if seed % 2 == 1:
        return b"".join(_gzip_member(r) for r in raws)
    return b"".join(raws)


def warc_member_ranges(data: bytes) -> list[tuple[int, int]]:
    """``(offset, length)`` spans of the archive's independently
    parseable units: gzip members for ``.warc.gz`` bytes, record spans
    (version line → trailing CRLF CRLF) for plain WARC.  Every span,
    sliced back out of the raw file, is a self-contained input to
    ``parse_warc`` — the property the member-granular reader relies on.
    """
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        # Feed fixed-size windows from a memoryview instead of handing
        # each decompressobj the whole remaining tail: unused_data then
        # copies at most one window per member (the old form copied the
        # ~half-archive average tail per member — quadratic on the
        # 1 GB x 50k-member archives this index pass exists for).  The
        # window is sized near the typical compressed-record size so
        # the per-member overcopy stays small; multi-window members
        # just loop.
        ranges = []
        mv = memoryview(data)
        n = len(data)
        chunk = 64 << 10
        pos = 0
        while pos < n:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            p = pos
            while p < n and not d.eof:
                window = mv[p : p + chunk]
                try:
                    d.decompress(window)  # output discarded per window
                except zlib.error as exc:
                    raise ValueError(
                        f"corrupt gzip member in WARC: {exc}"
                    ) from exc
                p += len(window) - len(d.unused_data)
            if not d.eof:
                raise ValueError("truncated gzip member in WARC")
            ranges.append((pos, p - pos))
            pos = p
        if not ranges:
            raise ValueError("no WARC records found")
        return ranges
    # plain WARC: walk the record framing, recording byte spans
    ranges = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        start = pos
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(data[pos:hdr_end].split(_CRLF)[1:])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record without Content-Length") from exc
        end = hdr_end + 4 + length + 4
        if end > n:
            raise ValueError("truncated WARC block")
        ranges.append((start, end - start))
        pos = end
    if not ranges:
        raise ValueError("no WARC records found")
    return ranges


def warc_member_index(spark, path: str):
    """Archive directory → ``(warc_path, offset, length)`` member index.

    The scan-planning pass of the member-granular reader: one
    sequential read per archive (binaryFile, file-granular) emits the
    byte span of every independently decompressible unit.  This is the
    same offset/length index Common Crawl publishes alongside its
    crawls (cdx); at 100 TB it is built once per crawl and reused by
    every downstream read, which is why it is exposed as its own
    DataFrame rather than fused into the reader."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def _index(batches):
        import pandas as pd

        for pdf in batches:
            out = {"warc_path": [], "offset": [], "length": []}
            for p, blob in zip(pdf["path"], pdf["content"]):
                for off, ln in warc_member_ranges(bytes(blob)):
                    out["warc_path"].append(p)
                    out["offset"].append(off)
                    out["length"].append(ln)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        _index, schema="warc_path string, offset long, length long"
    )


def _local_file(path: str) -> str:
    """binaryFile paths arrive URI-form (``file:/…``); map to an OS
    path.  On a real cluster the ranged read below goes through the
    Hadoop FileSystem API instead (s3://, gs:// all support ranged
    GET); the local build keeps the identical (path, offset, length)
    task shape."""
    if path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(path).path)
    return path


def warc_documents_df_members(spark, path: str, index=None):
    """Member-granular variant of ``warc_documents_df``: the SAME
    ``(uri, date, text, n_bytes, warc_path, doc_id)`` frame, but the
    unit of parallelism is the gzip member (≈ one record), not the
    file — so ONE 1 GB archive fans out across the whole cluster.
    This is the skew case the file-granular cut cannot fix: few, large
    archives.

    Plan shape: index pass (one sequential read per archive) → shuffle
    of the TINY (path, offset, length) index rows across
    defaultParallelism tasks → per-task ranged reads of just its
    members (seek+read, grouped per file, offset-sorted so the access
    pattern stays sequential per task).  Archive payload bytes still
    never cross a shuffle — only index triples do."""
    from pyspark.sql import functions as F

    idx = index if index is not None else warc_member_index(spark, path)
    n = spark.sparkContext.defaultParallelism
    spread = idx.repartition(n, "warc_path", "offset")

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "uri": [], "date": [], "text": [], "n_bytes": [],
                "warc_path": [],
            }
            for p, grp in pdf.groupby("warc_path", sort=False):
                spans = sorted(zip(grp["offset"], grp["length"]))
                with open(_local_file(str(p)), "rb") as fh:
                    for off, ln in spans:
                        fh.seek(int(off))
                        for doc in warc_documents(
                            parse_warc(fh.read(int(ln)))
                        ):
                            out["uri"].append(doc["uri"])
                            out["date"].append(doc["date"])
                            out["text"].append(doc["text"])
                            out["n_bytes"].append(doc["n_bytes"])
                            out["warc_path"].append(p)
            yield pd.DataFrame(out)

    return spread.mapInPandas(
        _read,
        schema="uri string, date string, text string, n_bytes long, "
        "warc_path string",
    ).select(
        "uri", "date", "text", "n_bytes", "warc_path",
        F.xxhash64("uri").alias("doc_id"),
    )


def warc_documents_df(spark, path: str):
    """Directory of ``.warc`` / ``.warc.gz`` files → a documents
    DataFrame ``(uri, date, text, n_bytes, warc_path)`` — the Spark
    ingestion entry point.

    Reads via the ``binaryFile`` source (one row per archive file,
    splittable across executors at FILE granularity) and parses inside
    an Arrow ``mapInPandas`` stage, so archive bytes never cross a
    shuffle.  At 100 TB Common Crawl ships ~1 GB .warc.gz files in the
    per-record-member layout precisely so a finer split at gzip-member
    boundaries is possible; this loader takes the file-granular cut
    (100k files x 1 GB already yields more splits than any cluster has
    cores).  When archives are FEW and LARGE — the skew case file
    granularity cannot fix — use ``warc_documents_df_members``, which
    fans a single archive across tasks at member granularity via a
    (path, offset, length) index pass."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "uri": [], "date": [], "text": [], "n_bytes": [],
                "warc_path": [],
            }
            for p, blob in zip(pdf["path"], pdf["content"]):
                for doc in warc_documents(parse_warc(bytes(blob))):
                    out["uri"].append(doc["uri"])
                    out["date"].append(doc["date"])
                    out["text"].append(doc["text"])
                    out["n_bytes"].append(doc["n_bytes"])
                    out["warc_path"].append(p)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        _parse,
        schema="uri string, date string, text string, n_bytes long, "
        "warc_path string",
    ).select(
        "uri", "date", "text", "n_bytes", "warc_path",
        F.xxhash64("uri").alias("doc_id"),
    )
