"""Golden tests for the MP3 metadata scanner (operators/mp3.py).

The in-test stream builder constructs MPEG frame headers bit-by-bit
from the published header layout (sync/version/layer/bitrate-index
fields placed by shifts written here, not imported), with its own
copies of the published bitrate/sample-rate tables — independent of
the module under test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.mp3 import (
    parse_id3v1,
    parse_id3v2,
    parse_mp3,
    synth_mp3,
)

# published tables, re-typed here independently
BR_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BR_V1L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
BR_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
SR_V1 = [44100, 48000, 32000]
SR_V2 = [22050, 24000, 16000]
SR_V25 = [11025, 12000, 8000]


def _hdr(version, layer, br_idx, sr_idx, padding=0, mode=1):
    """Build 4 header bytes from the spec's bit layout."""
    vbits = {1: 3, 2: 2, 2.5: 0}[version]
    lbits = {1: 3, 2: 2, 3: 1}[layer]
    b1 = 0xE0 | (vbits << 3) | (lbits << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (mode << 6)
    return bytes([0xFF, b1, b2, b3])


def _frame(version, layer, br_idx, sr_idx, padding=0, mode=1, fill=0xAB):
    if version == 1:
        br = {1: BR_V1L1, 3: BR_V1L3}[layer][br_idx]
        sr = SR_V1[sr_idx]
    else:
        br = BR_V2L3[br_idx]
        sr = (SR_V25 if version == 2.5 else SR_V2)[sr_idx]
    if layer == 1:
        size = (12000 * br // sr + padding) * 4
    elif layer == 3 and version != 1:
        size = 72000 * br // sr + padding
    else:
        size = 144000 * br // sr + padding
    h = _hdr(version, layer, br_idx, sr_idx, padding, mode)
    return h + bytes([fill]) * (size - 4), size


def test_cbr_stream_stats():
    frames = b"".join(_frame(1, 3, 9, 0)[0] for _ in range(10))
    m = parse_mp3(frames)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 44100
    assert m["n_frames"] == 10
    assert m["bitrate_kbps_min"] == m["bitrate_kbps_max"] == 128
    assert not m["is_vbr"]
    # 10 frames x 1152 samples at 44100 Hz
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert m["frame_bytes"] == 10 * (144000 * 128 // 44100)


def test_vbr_stream_min_max_mean():
    seq = [5, 9, 13, 9, 5]
    frames = b"".join(_frame(1, 3, i, 0)[0] for i in seq)
    m = parse_mp3(frames)
    assert m["is_vbr"]
    assert m["bitrate_kbps_min"] == BR_V1L3[5]
    assert m["bitrate_kbps_max"] == BR_V1L3[13]
    assert m["bitrate_kbps_sum"] == sum(BR_V1L3[i] for i in seq)


def test_padding_bit_changes_frame_size():
    f0, s0 = _frame(1, 3, 9, 0, padding=0)
    f1, s1 = _frame(1, 3, 9, 0, padding=1)
    assert s1 == s0 + 1
    m = parse_mp3(f0 + f1)
    assert m["n_frames"] == 2
    assert m["frame_bytes"] == s0 + s1


def test_layer1_slot_arithmetic():
    f, size = _frame(1, 1, 4, 1)  # 128 kbps @ 48000, Layer I
    assert size == (12000 * 128 // 48000) * 4
    m = parse_mp3(f)
    assert m["layer"] == 1
    assert m["duration_ms"] == 384 * 1000 // 48000


def test_mpeg2_layer3_576_samples():
    f, _ = _frame(2, 3, 8, 0)  # 64 kbps @ 22050
    m = parse_mp3(f)
    assert m["version"] == "2"
    assert m["duration_ms"] == 576 * 1000 // 22050


def test_mpeg25_sample_rates():
    f, _ = _frame(2.5, 3, 8, 2)
    m = parse_mp3(f)
    assert m["version"] == "2.5"
    assert m["sample_rate"] == 8000


def test_channel_modes():
    for mode, name in enumerate(
        ["stereo", "joint_stereo", "dual_channel", "mono"]
    ):
        f, _ = _frame(1, 3, 9, 0, mode=mode)
        assert parse_mp3(f)["channel_mode"] == name


def test_id3v2_v4_text_frames_and_offset():
    title = "Hello".encode("latin-1")
    frame = b"TIT2" + bytes([0, 0, 0, len(title) + 1]) + b"\x00\x00"
    frame += b"\x00" + title
    body = frame + b"\x00" * 7
    tag = b"ID3\x04\x00\x00" + bytes(
        [0, 0, (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    ) + body
    frames, consumed = parse_id3v2(tag + b"rest")
    assert consumed == 10 + len(body)
    assert frames["TIT2"] == "Hello"
    audio = _frame(1, 3, 9, 0)[0]
    m = parse_mp3(tag + audio)
    assert m["id3v2"]["TIT2"] == "Hello" and m["n_frames"] == 1


def test_id3v2_utf16_and_utf8_encodings():
    for enc, raw in ((1, "naïve".encode("utf-16")), (3, "naïve".encode("utf-8"))):
        payload = bytes([enc]) + raw
        frame = b"TPE1" + bytes([0, 0, 0, len(payload)]) + b"\x00\x00" + payload
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(frame)]) + frame
        frames, _ = parse_id3v2(tag)
        assert frames["TPE1"] == "naïve", enc


def test_id3v1_trailer():
    audio = _frame(1, 3, 9, 0)[0]
    blk = bytearray(128)
    blk[0:3] = b"TAG"
    blk[3 : 3 + 6] = b"MyName"
    m = parse_mp3(audio + bytes(blk))
    assert m["id3v1"]["title"] == "MyName"
    assert m["n_frames"] == 1  # the trailer is not scanned as frames


def test_xing_header_frame_count():
    # Layer III MPEG1 stereo: side info 32 bytes after the 4-byte header
    f, size = _frame(1, 3, 9, 0, mode=1)
    buf = bytearray(f)
    off = 4 + 32
    buf[off : off + 4] = b"Xing"
    buf[off + 4 : off + 8] = struct.pack(">I", 3)  # frames+bytes flags
    buf[off + 8 : off + 12] = struct.pack(">I", 777)
    buf[off + 12 : off + 16] = struct.pack(">I", 123456)
    m = parse_mp3(bytes(buf))
    assert m["vbr_header"]["tag"] == "Xing"
    assert m["vbr_header"]["frames"] == 777
    assert m["vbr_header"]["bytes"] == 123456


def test_xing_mono_offset():
    f, _ = _frame(1, 3, 9, 0, mode=3)
    buf = bytearray(f)
    off = 4 + 17
    buf[off : off + 4] = b"Info"
    buf[off + 4 : off + 8] = struct.pack(">I", 1)
    buf[off + 8 : off + 12] = struct.pack(">I", 42)
    m = parse_mp3(bytes(buf))
    assert m["vbr_header"]["tag"] == "Info"
    assert m["vbr_header"]["frames"] == 42


def test_resync_skips_leading_garbage():
    audio = _frame(1, 3, 9, 0)[0]
    m = parse_mp3(b"\x00garbage\xff\x00" + audio)
    assert m["n_frames"] == 1


def test_truncated_last_frame_not_counted():
    f, _ = _frame(1, 3, 9, 0)
    m = parse_mp3(f + f[: len(f) // 2])
    assert m["n_frames"] == 1


def test_no_frames_raises():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 600)


def test_synth_mp3_matches_module_and_formula():
    for seed, nf in ((0, 3), (7, 5), (40, 8)):
        m = parse_mp3(synth_mp3(seed, nf))
        assert m["n_frames"] == nf
        assert m["sample_rate"] == 44100
        kbps = [BR_V1L3[[7, 8, 9, 10, 11][(seed * 3 + i) % 5]] for i in range(nf)]
        pads = [(seed + i) % 2 for i in range(nf)]
        assert m["bitrate_kbps_sum"] == sum(kbps)
        assert m["frame_bytes"] == sum(
            144000 * k // 44100 + p for k, p in zip(kbps, pads)
        )
        assert m["id3v2"]["TIT2"] == f"doc {seed}"
        assert m["duration_ms"] == nf * 1152 * 1000 // 44100
