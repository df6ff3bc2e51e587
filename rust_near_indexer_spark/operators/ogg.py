"""OGG/Vorbis metadata scanner — page walk + identification/comment
headers + sample-exact duration from granule positions.

The audio twin of operators/mp3.py for the other ubiquitous compressed
format: full Vorbis *decode* (MDCT/floor/residue) is outside the
sandbox codec contract, but the curation-pipeline metadata pass is
pure container arithmetic, implemented in full:

- the OGG page layer: capture pattern, version, header-type flags
  (continuation / BOS / EOS), granule position, serial number, page
  sequence with gap detection, segment lace-value table;
- logical-stream packet reassembly (segments < 255 terminate a
  packet, lacing across page boundaries via the continuation flag);
- the Vorbis identification header (packet type 1: version, channels,
  sample rate, bitrate triple, blocksizes) and comment header (packet
  type 3: vendor string + the length-prefixed UTF-8 ``KEY=value``
  list — Vorbis comments are the tag system FLAC reuses);
- duration = last granule position (PCM sample count in Vorbis) over
  the identification sample rate — sample-exact, no decode.

Everything is integer arithmetic, so the gate query
(queries/multimodal.audio_ogg_metadata_scan) replays the scan
relationally against synthesized genuine streams.  Corrupt pages
raise ValueError; non-Vorbis OGG payloads (Opus/Theora) raise
NotImplementedError.  The reference has no codec layer; SURVEY §2B
north-star surface.
"""

from __future__ import annotations

import struct


def _pages(data: bytes):
    """Yield (flags, granule, serial, seq, packets_closed, carry) per
    page, where packet segmentation follows the lacing table."""
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 27:
            raise ValueError("truncated OGG page header")
        if bytes(data[pos : pos + 4]) != b"OggS":
            raise ValueError("bad OGG capture pattern")
        if data[pos + 4] != 0:
            raise ValueError(f"unknown OGG version {data[pos + 4]}")
        flags = data[pos + 5]
        granule = struct.unpack_from("<q", data, pos + 6)[0]
        serial = struct.unpack_from("<I", data, pos + 14)[0]
        seq = struct.unpack_from("<I", data, pos + 18)[0]
        nseg = data[pos + 26]
        lace = data[pos + 27 : pos + 27 + nseg]
        if len(lace) < nseg:
            raise ValueError("truncated OGG lacing table")
        body_start = pos + 27 + nseg
        body_len = sum(lace)
        if body_start + body_len > n:
            raise ValueError("truncated OGG page body")
        segments = []
        off = body_start
        for lv in lace:
            segments.append(data[off : off + lv])
            off += lv
        yield flags, granule, serial, seq, lace, segments
        pos = body_start + body_len


def parse_ogg_vorbis(data: bytes) -> dict:
    """Full metadata scan of the FIRST logical stream."""
    data = bytes(data)
    packets: list[bytes] = []
    carry = b""
    serial0 = None
    last_granule = 0
    n_pages = 0
    saw_eos = False
    expect_seq = None
    for flags, granule, serial, seq, lace, segments in _pages(data):
        if serial0 is None:
            if not flags & 0x02:
                raise ValueError("first OGG page is not BOS")
            serial0 = serial
        if serial != serial0:
            continue  # multiplexed second stream: skip
        if expect_seq is not None and seq != expect_seq:
            raise ValueError(
                f"OGG page sequence gap: want {expect_seq}, got {seq}"
            )
        expect_seq = seq + 1
        n_pages += 1
        if granule >= 0:
            last_granule = max(last_granule, granule)
        if flags & 0x04:
            saw_eos = True
        if not flags & 0x01:
            carry = b""  # fresh packet boundary at page start
        for lv, seg in zip(lace, segments):
            carry += seg
            if lv < 255:
                packets.append(carry)
                carry = b""
    if not packets:
        raise ValueError("no OGG packets found")
    ident = packets[0]
    if len(ident) < 30 or ident[0] != 1 or ident[1:7] != b"vorbis":
        raise NotImplementedError(
            "OGG stream is not Vorbis (Opus/Theora metadata not implemented)"
        )
    version, channels = struct.unpack_from("<IB", ident, 7)
    rate = struct.unpack_from("<I", ident, 12)[0]
    br_max, br_nom, br_min = struct.unpack_from("<iii", ident, 16)
    if version != 0:
        raise ValueError(f"unknown Vorbis version {version}")
    if rate == 0 or channels == 0:
        raise ValueError("illegal Vorbis identification header")
    comments: dict[str, str] = {}
    vendor = ""
    if len(packets) > 1:
        c = packets[1]
        if len(c) >= 7 and c[0] == 3 and c[1:7] == b"vorbis":
            p = 7
            vlen = struct.unpack_from("<I", c, p)[0]
            p += 4
            vendor = c[p : p + vlen].decode("utf-8", "replace")
            p += vlen
            count = struct.unpack_from("<I", c, p)[0]
            p += 4
            for _ in range(count):
                if p + 4 > len(c):
                    raise ValueError("truncated Vorbis comment list")
                clen = struct.unpack_from("<I", c, p)[0]
                p += 4
                item = c[p : p + clen].decode("utf-8", "replace")
                p += clen
                if "=" in item:
                    k, v = item.split("=", 1)
                    comments[k.upper()] = v
    return {
        "channels": channels,
        "sample_rate": rate,
        "bitrate_nominal": br_nom,
        "bitrate_max": br_max,
        "bitrate_min": br_min,
        "n_pages": n_pages,
        "n_packets": len(packets),
        "pcm_samples": last_granule,
        "duration_ms": last_granule * 1000 // rate,
        "eos_seen": saw_eos,
        "vendor": vendor,
        "comments": comments,
    }


# ---------------------------------------------------------------------------
# Product-side synthesizer: a genuine OGG container (correct lacing,
# BOS/EOS flags, sequence numbers, granule positions) around genuine
# Vorbis identification + comment headers and formula-sized opaque
# audio packets — every field integer-derivable for the oracle.
# ---------------------------------------------------------------------------


def _page(serial: int, seq: int, granule: int, flags: int,
          packets: list[bytes]) -> bytes:
    lace = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lace += b"\xff" * q + bytes([r])
        body += pkt
    hdr = b"OggS" + bytes([0, flags]) + struct.pack(
        "<qII", granule, serial, seq
    ) + b"\x00\x00\x00\x00" + bytes([len(lace)])
    return hdr + bytes(lace) + bytes(body)


def synth_ogg_vorbis(seed: int, n_audio_pages: int,
                     rate: int = 44100) -> bytes:
    """One Vorbis stream: BOS page (identification), a comment page,
    then ``n_audio_pages`` audio pages whose granule positions advance
    by 1024·(1 + (seed+i) % 3) samples per page."""
    serial = 0x1000 + (seed % 251)
    ident = b"\x01vorbis" + struct.pack(
        "<IBIiii", 0, 1 + seed % 2, rate, 0, 112000 + (seed % 7) * 16000, 0
    ) + bytes([0xB8, 0x01])  # blocksizes + framing bit
    title = f"doc {seed}".encode()
    comment = b"\x03vorbis"
    vendor = b"synth"
    comment += struct.pack("<I", len(vendor)) + vendor
    entry = b"TITLE=" + title
    comment += struct.pack("<I", 1) + struct.pack("<I", len(entry)) + entry
    comment += b"\x01"  # framing bit
    out = bytearray()
    out += _page(serial, 0, 0, 0x02, [ident])  # BOS
    out += _page(serial, 1, 0, 0x00, [comment])
    granule = 0
    for i in range(n_audio_pages):
        granule += 1024 * (1 + (seed + i) % 3)
        pkt = bytes(((seed + i + j) % 253) for j in range(40 + (seed + i) % 60))
        flags = 0x04 if i == n_audio_pages - 1 else 0x00
        out += _page(serial, 2 + i, granule, flags, [pkt])
    return bytes(out)
