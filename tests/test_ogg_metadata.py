"""Golden tests for the OGG/Vorbis metadata scanner (operators/ogg.py).

The in-test stream builder serializes pages from the RFC 3533 field
layout written here independently (its own lacing math, its own
header packing), so container-framing bugs cannot cancel out.
"""

from __future__ import annotations

import struct

import pytest

from rust_near_indexer_spark.operators.ogg import (
    parse_ogg_vorbis,
    synth_ogg_vorbis,
)


def _page(serial, seq, granule, flags, payloads):
    """Independent page serializer (RFC 3533)."""
    lace = []
    body = b""
    for p in payloads:
        n = len(p)
        while n >= 255:
            lace.append(255)
            n -= 255
        lace.append(n)
        body += p
    out = b"OggS\x00" + bytes([flags])
    out += granule.to_bytes(8, "little", signed=True)
    out += serial.to_bytes(4, "little")
    out += seq.to_bytes(4, "little")
    out += b"\x00" * 4  # CRC not checked by the scanner
    out += bytes([len(lace)]) + bytes(lace) + body
    return out


def _ident(channels=2, rate=48000, br=(0, 128000, 0)):
    return (
        b"\x01vorbis"
        + struct.pack("<IBIiii", 0, channels, rate, br[0], br[1], br[2])
        + b"\xb8\x01"
    )


def _comments(entries, vendor=b"testvendor"):
    c = b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor
    c += struct.pack("<I", len(entries))
    for e in entries:
        c += struct.pack("<I", len(e)) + e
    return c + b"\x01"


def _stream(channels=2, rate=48000, audio_granules=(4096, 8192), tags=()):
    out = _page(7, 0, 0, 0x02, [_ident(channels, rate)])
    out += _page(7, 1, 0, 0x00, [_comments(list(tags))])
    for i, g in enumerate(audio_granules):
        eos = 0x04 if i == len(audio_granules) - 1 else 0
        out += _page(7, 2 + i, g, eos, [b"\xAA" * 100])
    return out


def test_identification_fields():
    m = parse_ogg_vorbis(_stream(channels=1, rate=44100))
    assert m["channels"] == 1
    assert m["sample_rate"] == 44100
    assert m["bitrate_nominal"] == 128000


def test_duration_from_last_granule():
    m = parse_ogg_vorbis(_stream(rate=48000, audio_granules=(4096, 9600)))
    assert m["pcm_samples"] == 9600
    assert m["duration_ms"] == 9600 * 1000 // 48000
    assert m["eos_seen"]


def test_comments_parsed():
    m = parse_ogg_vorbis(
        _stream(tags=(b"TITLE=My Song", b"artist=Someone", b"noequalsign"))
    )
    assert m["comments"]["TITLE"] == "My Song"
    assert m["comments"]["ARTIST"] == "Someone"  # keys case-folded
    assert m["vendor"] == "testvendor"
    assert len(m["comments"]) == 2  # malformed entry skipped


def test_packet_spanning_pages_via_continuation():
    # a 600-byte comment packet split across two pages: page 1 ends
    # with a 255 lace value (packet open), page 2 sets CONTINUED
    big = _comments([b"TITLE=" + b"x" * 580])
    first, rest = big[:510], big[510:]
    out = _page(7, 0, 0, 0x02, [_ident()])
    # hand-lace: two 255 segments, packet still open
    hdr = b"OggS\x00\x00" + (0).to_bytes(8, "little", signed=True)
    hdr += (7).to_bytes(4, "little") + (1).to_bytes(4, "little")
    hdr += b"\x00" * 4 + bytes([2, 255, 255])
    out += hdr + first
    out += _page(7, 2, 0, 0x01, [rest])  # CONTINUED flag
    out += _page(7, 3, 4096, 0x04, [b"\xAA" * 10])
    m = parse_ogg_vorbis(out)
    assert m["comments"]["TITLE"] == "x" * 580
    assert m["n_packets"] == 3


def test_multiplexed_second_stream_skipped():
    s = _stream()
    foreign = _page(99, 0, 12345, 0x02, [b"\x01vorbis" + b"\x00" * 23])
    # interleave the foreign BOS after ours
    first_page_len = len(_page(7, 0, 0, 0x02, [_ident()]))
    data = s[:first_page_len] + foreign + s[first_page_len:]
    m = parse_ogg_vorbis(data)
    assert m["sample_rate"] == 48000
    assert m["n_pages"] == 4  # foreign page not counted


def test_sequence_gap_raises():
    s = _stream()
    # renumber the last page's sequence field (offset 18 in its header)
    pages = s.split(b"OggS")
    assert len(pages) == 5  # '' + 4 pages
    last = bytearray(b"OggS" + pages[-1])
    last[18:22] = (99).to_bytes(4, "little")
    data = b"OggS".join([b""] + pages[1:-1]) + bytes(last)
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_vorbis(data)


def test_non_vorbis_raises_not_implemented():
    opus = _page(7, 0, 0, 0x02, [b"OpusHead" + b"\x00" * 10])
    with pytest.raises(NotImplementedError):
        parse_ogg_vorbis(opus)


def test_corrupt_pages_raise():
    with pytest.raises(ValueError):
        parse_ogg_vorbis(b"NotOgg" + b"\x00" * 30)
    s = _stream()
    with pytest.raises(ValueError):
        parse_ogg_vorbis(s[: len(s) - 40])  # truncated body


def test_synth_matches_module_and_formula():
    for seed, np_ in ((0, 2), (5, 4), (33, 7)):
        m = parse_ogg_vorbis(synth_ogg_vorbis(seed, np_))
        assert m["channels"] == 1 + seed % 2
        assert m["bitrate_nominal"] == 112000 + (seed % 7) * 16000
        want = sum(1024 * (1 + (seed + i) % 3) for i in range(np_))
        assert m["pcm_samples"] == want
        assert m["duration_ms"] == want * 1000 // 44100
        assert m["n_pages"] == 2 + np_
        assert m["comments"]["TITLE"] == f"doc {seed}"
        assert m["eos_seen"]
