"""MP3 metadata scanner — ID3v1/ID3v2 tags + MPEG audio frame walk.

Full Layer III *decode* needs a hybrid filterbank the sandbox's
documented codec contract excludes (operators/multimodal.decode_audio
raises NotImplementedError for MP3 magic), but the metadata pass —
what a corpus-curation pipeline actually runs over millions of MP3s
to get duration / bitrate / VBR stats and tag text without paying a
decode — is pure integer header arithmetic, implemented here in
full:

- ID3v2.2/2.3/2.4 header (syncsafe size, extended-header skip,
  footer), text-frame extraction (T*** frames; latin-1 / UTF-16 with
  BOM / UTF-16BE / UTF-8 encodings per the spec byte);
- ID3v1 trailer (the fixed 128-byte "TAG" block);
- the MPEG frame-header walk: versions 1/2/2.5 x layers I/II/III,
  the full bitrate and sample-rate index tables, padding, the
  frame-length formulas (Layer I slot-of-4; Layer II/III 144/72
  coefficient), samples-per-frame, free-format and bad headers
  rejected with resync;
- the Xing/Info VBR header (frame/byte counts, at the
  version/channel-dependent side-info offset) and the VBRI variant.

Everything is integer-exact, so the gate query
(queries/multimodal.audio_mp3_metadata_scan) replays frame sizes,
duration, and bitrate stats relationally in DuckDB against
synthesized genuine streams.  The reference has no codec layer; this
is SURVEY §2B north-star multimodal surface.
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, index 1..14 (0 = free format, 15 = bad)
_BITRATES = {
    # (version_group, layer): MPEG1 vs MPEG2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG1 (version bits 11)
    2: [22050, 24000, 16000],  # MPEG2 (bits 10)
    0: [11025, 12000, 8000],  # MPEG2.5 (bits 00)
}

_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}
_CHANNEL_MODE = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe byte in ID3v2 size")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(enc: int, raw: bytes) -> str:
    if enc == 0:
        return raw.decode("latin-1", "replace").rstrip("\x00")
    if enc == 1:
        return raw.decode("utf-16", "replace").rstrip("\x00")
    if enc == 2:
        return raw.decode("utf-16-be", "replace").rstrip("\x00")
    if enc == 3:
        return raw.decode("utf-8", "replace").rstrip("\x00")
    raise ValueError(f"unknown ID3v2 text encoding {enc}")


def parse_id3v2(data: bytes) -> tuple[dict, int]:
    """Leading ID3v2 tag → ({frames}, bytes consumed).  ({}, 0) when
    absent."""
    if bytes(data[:3]) != b"ID3" or len(data) < 10:
        return {}, 0
    major = data[3]
    flags = data[5]
    size = _syncsafe(data[6:10])
    end = 10 + size + (10 if flags & 0x10 else 0)  # footer
    if end > len(data):
        raise ValueError("ID3v2 size past end of payload")
    frames: dict[str, str] = {}
    pos = 10
    if flags & 0x40:  # extended header
        if major >= 4:
            pos += _syncsafe(data[10:14])
        else:
            pos += 4 + struct.unpack_from(">I", data, 10)[0]
    body_end = 10 + size
    idlen = 3 if major == 2 else 4
    szlen = 3 if major == 2 else 4
    while pos + idlen + szlen <= body_end:
        fid = bytes(data[pos : pos + idlen])
        if fid.strip(b"\x00") == b"":
            break  # padding
        if major == 2:
            fsz = (data[pos + 3] << 16) | (data[pos + 4] << 8) | data[pos + 5]
            hdr = 6
        else:
            raw = data[pos + 4 : pos + 8]
            fsz = _syncsafe(raw) if major >= 4 else struct.unpack(">I", raw)[0]
            hdr = 10
        if pos + hdr + fsz > body_end:
            raise ValueError(f"ID3v2 frame {fid!r} past tag end")
        payload = bytes(data[pos + hdr : pos + hdr + fsz])
        name = fid.decode("latin-1")
        if name.startswith("T") and fsz >= 1:
            frames[name] = _decode_text(payload[0], payload[1:])
        pos += hdr + fsz
    return frames, end


def parse_id3v1(data: bytes) -> dict:
    if len(data) >= 128 and bytes(data[-128:-125]) == b"TAG":
        blk = data[-128:]
        return {
            "title": bytes(blk[3:33]).decode("latin-1").rstrip("\x00 "),
            "artist": bytes(blk[33:63]).decode("latin-1").rstrip("\x00 "),
            "album": bytes(blk[63:93]).decode("latin-1").rstrip("\x00 "),
        }
    return {}


def _frame_header(data: bytes, pos: int):
    """Parse 4 header bytes at pos → dict or None if not a valid sync."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 0x03
    lbits = (b1 >> 1) & 0x03
    if vbits == 1 or lbits == 0:
        return None  # reserved
    layer = 4 - lbits  # bits 01=III(3), 10=II(2), 11=I(1)
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / bad
    vgroup = 1 if vbits == 3 else 2
    bitrate = _BITRATES[(vgroup, layer)][br_idx]  # kbps
    rate = _SAMPLE_RATES[vbits][sr_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x03
    if layer == 1:
        size = (12000 * bitrate // rate + padding) * 4
        spf = 384
    elif layer == 2:
        size = 144000 * bitrate // rate + padding
        spf = 1152
    else:  # Layer III
        if vgroup == 1:
            size = 144000 * bitrate // rate + padding
            spf = 1152
        else:
            size = 72000 * bitrate // rate + padding
            spf = 576
    return {
        "version": _VERSION_NAME[vbits],
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODE[mode],
        "frame_bytes": size,
        "samples": spf,
        "_vgroup": vgroup,
        "_mono": mode == 3,
    }


def _xing(data: bytes, pos: int, hdr: dict):
    """Xing/Info/VBRI header inside the first frame, if present."""
    if hdr["layer"] != 3:
        return None
    # Layer III side-info sizes: MPEG1 mono 17 / stereo 32,
    # MPEG2/2.5 mono 9 / stereo 17
    side = (32 if not hdr["_mono"] else 17) if hdr["_vgroup"] == 1 else (
        17 if not hdr["_mono"] else 9
    )
    off = pos + 4 + side
    tag = bytes(data[off : off + 4])
    if tag in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", data, off + 4)[0]
        out = {"tag": tag.decode(), "frames": None, "bytes": None}
        p = off + 8
        if flags & 1:
            out["frames"] = struct.unpack_from(">I", data, p)[0]
            p += 4
        if flags & 2:
            out["bytes"] = struct.unpack_from(">I", data, p)[0]
        return out
    voff = pos + 4 + 32
    if bytes(data[voff : voff + 4]) == b"VBRI":
        return {
            "tag": "VBRI",
            "bytes": struct.unpack_from(">I", data, voff + 10)[0],
            "frames": struct.unpack_from(">I", data, voff + 14)[0],
        }
    return None


def parse_mp3(data: bytes) -> dict:
    """Full metadata scan → tags + per-stream frame statistics."""
    data = bytes(data)
    id3v2, pos = parse_id3v2(data)
    id3v1 = parse_id3v1(data)
    end = len(data) - (128 if id3v1 else 0)
    n = 0
    kbps_sum = 0
    kbps_min = None
    kbps_max = None
    samples = 0
    frame_bytes = 0
    first = None
    vbr_hdr = None
    rates = set()
    while pos < end:
        hdr = _frame_header(data, pos)
        if hdr is None:
            if n == 0:
                pos += 1  # resync before the first valid frame only
                continue
            break  # trailing garbage after a valid stream: stop
        if pos + hdr["frame_bytes"] > end:
            break  # truncated last frame
        if first is None:
            first = hdr
            vbr_hdr = _xing(data, pos, hdr)
        n += 1
        kbps_sum += hdr["bitrate_kbps"]
        kbps_min = min(kbps_min, hdr["bitrate_kbps"]) if kbps_min else hdr[
            "bitrate_kbps"
        ]
        kbps_max = max(kbps_max or 0, hdr["bitrate_kbps"])
        samples += hdr["samples"]
        frame_bytes += hdr["frame_bytes"]
        rates.add(hdr["sample_rate"])
        pos += hdr["frame_bytes"]
    if first is None:
        raise ValueError("no MPEG audio frames found")
    if len(rates) > 1:
        raise ValueError("sample rate changes mid-stream")
    rate = first["sample_rate"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": rate,
        "channel_mode": first["channel_mode"],
        "n_frames": n,
        "frame_bytes": frame_bytes,
        "duration_ms": samples * 1000 // rate,
        "bitrate_kbps_min": kbps_min,
        "bitrate_kbps_max": kbps_max,
        "bitrate_kbps_sum": kbps_sum,
        "is_vbr": kbps_min != kbps_max,
        "vbr_header": vbr_hdr,
        "id3v2": id3v2,
        "id3v1": id3v1,
    }


# ---------------------------------------------------------------------------
# Product-side synthesizer for the gate query: genuine MPEG1 Layer III
# headers (44100 Hz, joint stereo) with formula-driven bitrates and an
# ID3v2.4 tag of formula-driven padding — every byte position integer-
# derivable, so DuckDB replays frame sizes and duration relationally.
# ---------------------------------------------------------------------------

_SYNTH_BR_IDX = [7, 8, 9, 10, 11]  # 96/112/128/160/192 kbps in MPEG1-III


def synth_mp3(seed: int, n_frames: int) -> bytes:
    out = bytearray()
    title = f"doc {seed}".encode("latin-1")
    # ID3v2.4 syncsafe frame size (title is tiny, fits 7 bits)
    tframe = b"TIT2" + bytes([0, 0, 0, len(title) + 1]) + b"\x00\x00"
    tframe += b"\x00" + title  # latin-1 encoding byte
    pad = seed % 17
    body = tframe + b"\x00" * pad
    out += b"ID3\x04\x00\x00" + bytes(
        [
            (len(body) >> 21) & 0x7F,
            (len(body) >> 14) & 0x7F,
            (len(body) >> 7) & 0x7F,
            len(body) & 0x7F,
        ]
    )
    out += body
    for i in range(n_frames):
        br_idx = _SYNTH_BR_IDX[(seed * 3 + i) % 5]
        kbps = _BITRATES[(1, 3)][br_idx]
        padding = (seed + i) % 2
        size = 144000 * kbps // 44100 + padding
        # header: MPEG1 (11), Layer III (01), no CRC (1)
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1
        b2 = (br_idx << 4) | (0 << 2) | (padding << 1)
        b3 = 0x40  # joint stereo
        hdr = bytes([0xFF, b1, b2, b3])
        filler = bytes(((seed + i + j) % 251) for j in range(size - 4))
        out += hdr + filler
    return bytes(out)
