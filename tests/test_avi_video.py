"""Round-7+ real video path: RIFF/AVI container parse + MJPEG / raw-DIB
frame decode + container-aware sampled frame extraction.

The AVI fixtures are MUXED IN-TEST (`_mux_avi`) from frames produced by
the independent in-test JPEG encoder (tests/test_jpeg_codec._encode_jpeg
with a flat quant table, so decode is near-lossless) or from raw
bottom-up BGR DIB rasters (bit-exact path).  Assertions compare decoded
frames against the ORIGINAL numpy rasters, not against the decoder's own
output, and the Spark operator's per-frame features are recomputed
independently in the test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.multimodal import (
    decode_video,
    parse_avi,
    sample_video_frames,
)
from tests.test_jpeg_codec import _encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def _mux_avi(
    frames: list[tuple[bytes, bytes]],
    w: int,
    h: int,
    usec_per_frame: int = 40_000,
    use_rec_groups: bool = False,
) -> bytes:
    """Minimal AVI writer: avih main header + one video strl, then a
    movi LIST of the given (fourcc, payload) frame chunks — optionally
    wrapped in 'rec ' record groups, which interleaved AVI writers emit
    and the parser must descend into."""
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                        1, 25, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3,
                       0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    frame_chunks = [_chunk(fcc, body) for fcc, body in frames]
    if use_rec_groups:
        movi_body = b"".join(_list(b"rec ", fc) for fc in frame_chunks)
    else:
        movi_body = b"".join(frame_chunks)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gradient_frames(n: int, h: int = 16, w: int = 24) -> list[np.ndarray]:
    """n distinct smooth RGB rasters (smooth → small quantization error
    through the flat-table JPEG round trip)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [
                (yy * 4 + i * 10) % 256,
                (xx * 4 + i * 20) % 256,
                ((yy + xx) * 2 + i * 30) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        for i in range(n)
    ]


def _dib_body(img: np.ndarray) -> bytes:
    """HWC RGB → bottom-up BGR rows padded to 4-byte stride."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def test_parse_avi_header_and_index():
    srcs = _gradient_frames(5)
    avi = _mux_avi([(b"00dc", _encode_jpeg(f)) for f in srcs], 24, 16,
                   usec_per_frame=33_333)
    info = parse_avi(avi)
    assert (info["width"], info["height"]) == (24, 16)
    assert info["n_frames"] == 5 and len(info["frames"]) == 5
    assert info["usec_per_frame"] == 33_333
    # index points at real JPEG payloads without decoding them
    for fcc, off, sz in info["frames"]:
        assert fcc == b"00dc" and avi[off : off + 3] == b"\xff\xd8\xff"


def test_decode_video_mjpeg_roundtrip():
    srcs = _gradient_frames(4)
    avi = _mux_avi([(b"00dc", _encode_jpeg(f)) for f in srcs], 24, 16)
    decoded, fps = decode_video(avi, {})
    assert fps == pytest.approx(25.0)
    assert [i for i, _ in decoded] == [0, 1, 2, 3]
    for (_, got), src in zip(decoded, srcs):
        assert got.shape == src.shape
        # flat quant table of 1s: DCT round-off only
        assert np.abs(got.astype(int) - src.astype(int)).max() <= 2


def test_decode_video_dib_bit_exact_and_rec_groups():
    srcs = _gradient_frames(3, h=10, w=10)  # stride 30 -> padded to 32
    avi = _mux_avi([(b"00db", _dib_body(f)) for f in srcs], 10, 10,
                   use_rec_groups=True)
    decoded, _ = decode_video(avi, {})
    assert len(decoded) == 3
    for (_, got), src in zip(decoded, srcs):
        np.testing.assert_array_equal(got, src)


def test_decode_video_selective_indices():
    srcs = _gradient_frames(6)
    avi = _mux_avi([(b"00dc", _encode_jpeg(f)) for f in srcs], 24, 16)
    decoded, _ = decode_video(avi, {}, frame_indices=[1, 4])
    assert [i for i, _ in decoded] == [1, 4]
    for (i, got) in decoded:
        assert np.abs(got.astype(int) - srcs[i].astype(int)).max() <= 2


def test_decode_video_contracts():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_video(b"not a container at all", {})
    # a non-JPEG compressed chunk is an unsupported codec, not a crash
    avi = _mux_avi([(b"00dc", b"\x00\x01\x02\x03")], 8, 8)
    with pytest.raises(NotImplementedError):
        decode_video(avi, {})


def test_sample_video_frames_spark(spark):
    """End-to-end mapInPandas path: two AVI payloads + one junk payload;
    every 2nd frame decoded, features recomputed independently."""
    srcs_a = _gradient_frames(5)
    srcs_b = _gradient_frames(4, h=10, w=10)
    avi_a = _mux_avi([(b"00dc", _encode_jpeg(f)) for f in srcs_a], 24, 16)
    avi_b = _mux_avi([(b"00db", _dib_body(f)) for f in srcs_b], 10, 10)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(avi_a), None),
            (2, "video", bytearray(avi_b), None),
            (3, "video", bytearray(b"junk payload"), None),
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<width:long,height:long,sample_rate:long,n_frames:long>",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in sample_video_frames(media, every_k=2).collect()
    }
    assert set(rows) == {(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)}
    # DIB frames are bit-exact: mean and md5 must match the source raster
    import hashlib

    for idx in (0, 2):
        src = srcs_b[idx]
        r = rows[(2, idx)]
        assert (r["height"], r["width"]) == (10, 10)
        assert r["mean_milli"] == int(src.reshape(-1).sum()) * 1000 // src.size
        assert r["frame_md5"] == hashlib.md5(src.tobytes()).hexdigest()
    # MJPEG frames: within DCT round-off of the source mean
    for idx in (0, 2, 4):
        src = srcs_a[idx]
        got = rows[(1, idx)]["mean_milli"] / 1000.0
        assert abs(got - src.mean()) < 2.5


def test_sample_video_frames_plan_no_shuffle(spark):
    """Scale shape: payload bytes go scan -> MapInPandas with no
    Exchange in between (container bytes never cross a shuffle)."""
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"x"), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<width:long,height:long,sample_rate:long,n_frames:long>",
    )
    plan = sample_video_frames(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan
