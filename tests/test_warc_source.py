"""Golden tests for the WARC parser (operators/warc.py).

The in-test archive writer serializes records independently (its own
header ordering, its own framing math, stdlib gzip.compress for
members instead of the module's compressobj), so framing bugs cannot
cancel out.
"""

from __future__ import annotations

import gzip

import pytest

from rust_near_indexer_spark.operators.warc import (
    parse_http_response,
    parse_warc,
    synth_warc,
    warc_documents,
    warc_member_ranges,
)


def _rec(rtype, block, extra_headers=(), version="WARC/1.0"):
    """Independent record writer: different header order, lowercase
    type name in a differently-cased key."""
    out = version.encode() + b"\r\n"
    out += b"content-length: %d\r\n" % len(block)  # lowercase key
    for k, v in extra_headers:
        out += k.encode() + b": " + v.encode() + b"\r\n"
    out += b"WARC-TYPE: " + rtype.encode() + b"\r\n"  # uppercase key
    out += b"\r\n" + block + b"\r\n\r\n"
    return out


def _http(status, body, ctype="text/plain", reason="OK"):
    return (
        f"HTTP/1.1 {status} {reason}\r\nContent-Type: {ctype}\r\n\r\n".encode()
        + body
    )


def test_plain_archive_roundtrip():
    a = _rec("warcinfo", b"software: t\r\n")
    b = _rec(
        "response",
        _http(200, b"hello world"),
        [("WARC-Target-URI", "http://x/1"),
         ("Content-Type", "application/http; msgtype=response")],
    )
    recs = parse_warc(a + b)
    assert [r["type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["uri"] == "http://x/1"
    assert recs[1]["content_length"] == len(_http(200, b"hello world"))


def test_gzip_members_roundtrip():
    raw1 = _rec("response", _http(200, b"abc"),
                [("Content-Type", "application/http; msgtype=response")])
    raw2 = _rec("response", _http(200, b"defgh"),
                [("Content-Type", "application/http; msgtype=response")])
    gz = gzip.compress(raw1) + gzip.compress(raw2)  # two members
    recs = parse_warc(gz)
    assert len(recs) == 2
    assert parse_http_response(recs[1]["block"])["body"] == b"defgh"


def test_header_folding_and_case():
    folded = _rec(
        "metadata",
        b"x",
        [("WARC-Concurrent-To", "<urn:a>\r\n <urn:b>")],
    )
    recs = parse_warc(folded)
    assert recs[0]["headers"]["warc-concurrent-to"] == "<urn:a> <urn:b>"


def test_http_response_parse():
    h = parse_http_response(_http(404, b"missing", reason="Not Found"))
    assert h["status"] == 404
    assert h["headers"]["content-type"] == "text/plain"
    assert h["body"] == b"missing"


def test_warc_documents_projection():
    recs = parse_warc(
        _rec("warcinfo", b"i: 1\r\n")
        + _rec("request", b"GET / HTTP/1.1\r\n\r\n",
               [("Content-Type", "application/http; msgtype=request")])
        + _rec("response", _http(200, b"keep me"),
               [("WARC-Target-URI", "http://x/keep"),
                ("Content-Type", "application/http; msgtype=response")])
        + _rec("response", _http(404, b"drop 404"),
               [("Content-Type", "application/http; msgtype=response")])
        + _rec("response", _http(200, b"\x89PNG", ctype="image/png"),
               [("Content-Type", "application/http; msgtype=response")])
    )
    docs = warc_documents(recs)
    assert len(docs) == 1
    assert docs[0]["uri"] == "http://x/keep"
    assert docs[0]["text"] == "keep me"
    assert docs[0]["n_bytes"] == 7


def test_binary_body_length_framing():
    # a body containing \r\n\r\n must NOT confuse record framing:
    # Content-Length governs
    body = b"a\r\n\r\nb" * 3
    rec = _rec("resource", body, [("Content-Type", "text/plain")])
    out = parse_warc(rec + _rec("metadata", b"m", []))
    assert out[0]["block"] == body
    assert out[1]["type"] == "metadata"


def test_truncation_and_corruption_raise():
    good = _rec("response", _http(200, b"xyz"),
                [("Content-Type", "application/http; msgtype=response")])
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) - 6])  # missing terminator
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(gzip.compress(good)[:-4])  # truncated member
    no_len = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\nx\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(no_len)


def test_warc_11_version_accepted():
    recs = parse_warc(_rec("metadata", b"v", [], version="WARC/1.1"))
    assert recs[0]["version"] == "WARC/1.1"


def test_synth_matches_formula_both_layouts():
    for seed in (2, 3):  # plain and gzipped
        n = 4
        recs = parse_warc(synth_warc(seed, n))
        assert recs[0]["type"] == "warcinfo"
        docs = warc_documents(recs)
        assert len(docs) == n
        for i, d in enumerate(docs):
            k = 5 + (seed + i) % 7
            assert d["text"] == "tok " * k
            assert d["n_bytes"] == 4 * k
            assert d["uri"] == f"http://ex.com/{seed}/{i}"


def test_warc_documents_df_ingestion(spark, tmp_path):
    """End-to-end Spark ingestion: a directory of mixed plain/.gz
    archives → a documents DataFrame with one row per HTTP 200 text
    response and a stable xxhash64 doc_id."""
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(synth_warc(2, 3))     # plain, 3 docs
    (d / "b.warc.gz").write_bytes(synth_warc(3, 2))  # gzipped, 2 docs
    (d / "ignore.txt").write_bytes(b"not an archive")

    from rust_near_indexer_spark.operators.warc import warc_documents_df

    df = warc_documents_df(spark, str(d))
    rows = {r["uri"]: r for r in df.collect()}
    assert len(rows) == 5
    assert rows["http://ex.com/3/1"]["text"] == "tok " * (5 + (3 + 1) % 7)
    assert rows["http://ex.com/2/0"]["n_bytes"] == 4 * (5 + 2 % 7)
    assert rows["http://ex.com/2/0"]["warc_path"].endswith("a.warc")
    ids = {r["doc_id"] for r in rows.values()}
    assert len(ids) == 5  # distinct, derived from uri


def test_member_ranges_plain_and_gzip():
    """Every span warc_member_ranges reports must slice back out of
    the raw bytes as a self-contained parse_warc input, and the spans
    must tile the archive exactly."""
    for seed, layout in ((2, "plain"), (3, "gzip")):
        raw = synth_warc(seed, 4)
        spans = warc_member_ranges(raw)
        assert len(spans) == 5  # warcinfo + 4 responses
        assert spans[0][0] == 0
        for (o1, l1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + l1 == o2, layout
        assert spans[-1][0] + spans[-1][1] == len(raw)
        all_recs = []
        for off, ln in spans:
            all_recs.extend(parse_warc(raw[off : off + ln]))
        assert [r["type"] for r in all_recs] == [
            r["type"] for r in parse_warc(raw)
        ]


def test_member_ranges_corrupt_raises():
    with pytest.raises(ValueError):
        warc_member_ranges(b"\x1f\x8b\x08garbage")
    with pytest.raises(ValueError):
        warc_member_ranges(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")


def test_member_granular_reader_fans_one_archive_across_tasks(
    spark, tmp_path
):
    """VERDICT r09 #6 done-bar: N>1 tasks process ONE archive, with
    fingerprint-equal output to the file-granular path."""
    from pyspark.sql import functions as F

    from rust_near_indexer_spark.operators.warc import (
        warc_documents_df,
        warc_documents_df_members,
        warc_member_index,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    # ONE large gzipped archive — the few-big-files skew case
    (d / "big.warc.gz").write_bytes(synth_warc(7, 40))

    idx = warc_member_index(spark, str(d))
    assert idx.count() == 41  # warcinfo + 40 responses

    members = warc_documents_df_members(spark, str(d))
    # the single archive must occupy MORE THAN ONE task
    n_tasks = (
        members.withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert n_tasks > 1

    base = warc_documents_df(spark, str(d))
    key = ["uri", "date", "text", "n_bytes", "doc_id"]
    a = sorted(tuple(r[k] for k in key) for r in base.select(*key).collect())
    b = sorted(
        tuple(r[k] for k in key) for r in members.select(*key).collect()
    )
    assert a == b and len(a) == 40


def test_member_reader_mixed_layout_dir_matches_file_granular(
    spark, tmp_path
):
    from rust_near_indexer_spark.operators.warc import (
        warc_documents_df,
        warc_documents_df_members,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(synth_warc(2, 3))
    (d / "b.warc.gz").write_bytes(synth_warc(3, 2))
    key = ["uri", "text", "n_bytes", "warc_path", "doc_id"]
    a = sorted(
        tuple(r[k] for k in key)
        for r in warc_documents_df(spark, str(d)).select(*key).collect()
    )
    b = sorted(
        tuple(r[k] for k in key)
        for r in warc_documents_df_members(spark, str(d))
        .select(*key)
        .collect()
    )
    assert a == b and len(a) == 5
