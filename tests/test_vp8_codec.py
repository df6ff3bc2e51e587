"""Lossy-VP8 (WebP keyframe) golden tests (VERDICT r09 Next #7).

The oracle here is stronger than the other codec suites' in-test
encoders: the sandbox ships the system libwebp (Google's public
reference implementation of the same RFC 6386 spec), bound via ctypes
in operators/webp_native.py.  Every test encodes pixels through
libwebp's REAL VP8 encoder and requires the pure-Python decoder in
operators/vp8.py to reproduce libwebp's own decode BIT-EXACT on the
raw YUV 4:2:0 planes — two independent implementations of the
published spec agreeing on every byte, across:

- all intra prediction paths (16x16 DC/V/H/TM and the ten 4x4
  B-modes via noise content, which the encoder codes B_PRED-heavy);
- the keyframe B-mode contexts (the RFC-vs-libwebp mode-numbering
  permutation of kf_bmode_prob is pinned by a dedicated test);
- coefficient token decode incl. the large-value categories, the
  Y2/WHT path, segmentation (2-4 segments), multiple token
  partitions (1/4/8), and quantizer extremes (quality 5..95);
- both loop filters (simple + normal) across strength/sharpness,
  including the common_adjust return-value subtlety (RFC 15.3: the
  subblock filter's outer taps derive from F=c(a+4)>>3, not raw a);
- partial macroblocks (odd dimensions) and 1x1/3x5 degenerates.

Skips (rather than fails) only if the system libwebp is absent.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators import webp_native as wn
from rust_near_indexer_spark.operators.vp8 import (
    KF_B_MODE_PROBS,
    decode_vp8,
    decode_webp_vp8,
)
from rust_near_indexer_spark.operators.webp import decode_webp

pytestmark = pytest.mark.skipif(
    not wn.available(), reason="system libwebp not present"
)


def _mix(h: int, w: int, rng) -> np.ndarray:
    """Smooth gradients (16x16 modes, skip MBs) + a noise patch
    (B_PRED-heavy) — exercises mode diversity inside one frame."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 255 // max(w - 1, 1) + y * 128 // max(h - 1, 1)) // 2).astype(
        np.uint8
    )
    img = np.stack([base, 255 - base, (base * 3).astype(np.uint8)], axis=2)
    img[h // 4 : h // 2, w // 4 : w // 2] = rng.integers(
        0, 256, (h // 2 - h // 4, w // 2 - w // 4, 3)
    )
    return img


def _assert_yuv_exact(data: bytes) -> None:
    ys, us, vs = wn.decode_yuv(data)
    my, mu, mv = decode_webp_vp8(data)
    np.testing.assert_array_equal(ys, my)
    np.testing.assert_array_equal(us, mu)
    np.testing.assert_array_equal(vs, mv)


@pytest.mark.parametrize(
    "shape", [(64, 64), (48, 80), (37, 53), (16, 16), (8, 8), (1, 1), (3, 5)]
)
@pytest.mark.parametrize("kind", ["noise", "mix", "flat"])
def test_default_config_bit_exact(shape, kind):
    h, w = shape
    rng = np.random.default_rng(h * 1000 + w)
    if kind == "noise":
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    elif kind == "mix":
        img = _mix(h, w, rng)
    else:
        img = np.full((h, w, 3), 90, np.uint8)
    _assert_yuv_exact(wn.encode_rgb_advanced(img))


@pytest.mark.parametrize(
    "cfg",
    [
        dict(quality=5.0),
        dict(quality=50.0),
        dict(quality=95.0),
        dict(filter_strength=60, filter_sharpness=3),
        dict(filter_strength=30, filter_sharpness=7, filter_type=0),
        dict(autofilter=1),
        dict(partitions=2),
        dict(partitions=3),
        dict(segments=4, sns_strength=80),
        dict(segments=2, sns_strength=50, quality=30.0),
        dict(method=0),
        dict(method=6),
    ],
    ids=lambda c: ",".join(f"{k}={v}" for k, v in c.items()),
)
def test_encoder_settings_bit_exact(cfg):
    rng = np.random.default_rng(11)
    for img in (
        rng.integers(0, 256, (64, 64, 3)).astype(np.uint8),
        _mix(129, 65, rng),
        _mix(37, 53, rng),
    ):
        _assert_yuv_exact(wn.encode_rgb_advanced(img, **cfg))


def test_simple_api_encode_bit_exact():
    rng = np.random.default_rng(5)
    img = _mix(96, 112, rng)
    for q in (20.0, 75.0):
        _assert_yuv_exact(wn.encode_rgb(img, quality=q))


def test_bmode_prob_table_is_rfc_numbered():
    """kf_bmode_prob[0][0] is quoted in RFC 6386 13.5; and the table
    must be stored in the RFC's B-mode numbering (B_LD=4, B_RD=5,
    B_VR=6) — libwebp's copy permutes those three axes (its enum
    swaps RD/VR/LD), which round 10 caught as a partition-0 desync on
    exactly the mode-diverse (noise) frames."""
    assert list(KF_B_MODE_PROBS[0][0]) == [231, 120, 48, 89, 115, 113, 120, 152, 112]
    # Functional pin of the numbering: a B_PRED-heavy frame decodes
    # bit-exact (any outer-axis permutation desyncs partition 0).
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    _assert_yuv_exact(wn.encode_rgb_advanced(img, filter_strength=0))


def test_router_rgb_path(monkeypatch):
    """decode_webp's two lossy routes — native libwebp when present,
    pure-Python (spec decoder + limited-range vp8_yuv_to_rgb + fancy
    upsampler) otherwise — must BOTH be bit-exact against libwebp's
    RGB.  r11 tightening (ADVICE r10 high): the old full-range BT.601
    conversion skewed every pixel (flat black → 16) under a loose
    mean<8 bound that misattributed the error to chroma upsampling;
    the pure path now reproduces libwebp's fixed-point constants AND
    its fancy upsampler, so the gate is exact equality."""
    rng = np.random.default_rng(9)
    img = _mix(40, 56, rng)
    data = bytes(wn.encode_rgb_advanced(img))
    lib_rgb = wn.decode_rgba(data)[:, :, :3]
    out = decode_webp(data)  # native route (libwebp present under the suite skipif)
    assert out.shape == (40, 56, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, lib_rgb)
    monkeypatch.setattr(wn, "available", lambda: False)
    pure = decode_webp(data)
    np.testing.assert_array_equal(pure, lib_rgb)


@pytest.mark.parametrize("quality", [20.0, 75.0, 95.0])
@pytest.mark.parametrize(
    "shape", [(40, 56), (33, 17), (16, 16), (2, 3), (1, 1)]
)
def test_pure_rgb_bit_exact(quality, shape):
    """The pure RGB path (vp8_yuv_to_rgb) is bit-exact vs libwebp's
    WebPDecodeRGBA across qualities and odd/degenerate shapes — the
    limited-range fixed-point constants and the (9,3,3,1)/16 fancy
    upsampler, including its edge replication, all match exactly."""
    from rust_near_indexer_spark.operators.webp import _decode_lossy_rgb

    rng = np.random.default_rng(int(quality) * 100 + shape[0])
    img = rng.integers(0, 256, shape + (3,)).astype(np.uint8)
    data = bytes(wn.encode_rgb(img, quality=quality))
    pos = data.index(b"VP8 ")
    import struct

    (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
    pure = _decode_lossy_rgb(data[pos + 8 : pos + 8 + size])
    np.testing.assert_array_equal(pure, wn.decode_rgba(data)[:, :, :3])


def test_fixture_pins_path_independent():
    """The six committed gate fixtures decode to identical RGB through
    the native and pure routes — the image_webp_lossy_stats pins
    therefore hold on machines with or without libwebp."""
    from rust_near_indexer_spark.operators.vp8_fixtures import VP8_FIXTURES
    from rust_near_indexer_spark.operators.webp import _decode_lossy_rgb

    import struct

    for name, data in VP8_FIXTURES:
        pos = data.index(b"VP8 ")
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        pure = _decode_lossy_rgb(data[pos + 8 : pos + 8 + size])
        np.testing.assert_array_equal(
            pure, wn.decode_rgba(data)[:, :, :3], err_msg=name
        )


def test_alph_without_vp8x_falls_back_to_pure():
    """libwebp rejects ALPH+VP8 containers lacking a VP8X header, but
    the animation path's _decode_frame_payload re-mux produces exactly
    that shape for lossy+alpha ANMF frames — decode_webp must fall back
    to the pure route and still produce libwebp's RGBA for the original
    (VP8X-bearing) container."""
    import struct

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 24, 4)).astype(np.uint8)
    data = bytes(wn.encode_rgb_advanced(img))
    pos, chunks = 12, []
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc in (b"ALPH", b"VP8 "):
            chunks.append(
                data[pos : pos + 8 + size] + (b"\x00" if size & 1 else b"")
            )
        pos += 8 + size + (size & 1)
    body = b"WEBP" + b"".join(chunks)
    minimal = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        wn.decode_rgba(minimal)  # the strictness this test documents
    out = decode_webp(minimal)
    np.testing.assert_array_equal(out, wn.decode_rgba(data))


def test_limited_range_extremes():
    """The studio-swing endpoints decode to full-range RGB: a flat
    black encode comes back 0 (not 16) and flat white 255 (not 235) —
    the exact symptom of the r10 full-range bug."""
    for val, want in ((0, 0), (255, 255)):
        img = np.full((16, 16, 3), val, np.uint8)
        data = bytes(wn.encode_rgb_advanced(img, quality=95.0))
        lib = wn.decode_rgba(data)[:, :, :3]
        assert int(lib.mean().round()) == want  # oracle self-check
        np.testing.assert_array_equal(decode_webp(data), lib)


def test_non_keyframe_contract():
    # keyframe flag is tag bit 0 == 0; flip it on a real stream
    rng = np.random.default_rng(1)
    data = bytearray(wn.encode_rgb_advanced(_mix(16, 16, rng)))
    pos = data.index(b"VP8 ") + 8
    data[pos] |= 1
    with pytest.raises(NotImplementedError):
        decode_webp_vp8(bytes(data))


def test_truncation_contract():
    rng = np.random.default_rng(2)
    data = bytes(wn.encode_rgb_advanced(_mix(16, 16, rng)))
    pos = data.index(b"VP8 ") + 8
    with pytest.raises(ValueError):
        decode_vp8(data[pos : pos + 8])
    bad = bytearray(data)
    bad[pos + 3] ^= 0xFF  # break the start code
    with pytest.raises(ValueError):
        decode_webp_vp8(bytes(bad))


# --- lossy + alpha (ALPH chunk) ---------------------------------------------


def _forward_filter(a, filt):
    """Encoder-side alpha filtering (the inverse of webp._decode_alpha's
    predictors) — implemented here independently for the synthetic
    golden cases below."""
    h, w = a.shape
    res = np.zeros_like(a, dtype=np.int32)
    ai = a.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif filt == 1:
                pred = ai[y, x - 1] if x else ai[y - 1, x]
            elif filt == 2:
                pred = ai[y - 1, x] if y else ai[y, x - 1]
            else:
                if y == 0:
                    pred = ai[y, x - 1]
                elif x == 0:
                    pred = ai[y - 1, x]
                else:
                    pred = min(255, max(0, int(ai[y, x - 1]) + int(ai[y - 1, x])
                                        - int(ai[y - 1, x - 1])))
            res[y, x] = (ai[y, x] - pred) & 0xFF
    return res.astype(np.uint8)


def _replace_alph(container: bytes, new_alph: bytes) -> bytes:
    import struct

    pos, out = 12, bytearray(container[:12])
    while pos + 8 <= len(container):
        fourcc = container[pos : pos + 4]
        (size,) = struct.unpack("<I", container[pos + 4 : pos + 8])
        payload = container[pos + 8 : pos + 8 + size]
        if fourcc == b"ALPH":
            payload = new_alph
        out += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            out += b"\x00"
        pos += 8 + size + (size & 1)
    full = bytes(out)
    return full[:4] + struct.pack("<I", len(full) - 8) + full[8:]


@pytest.mark.parametrize("alpha_compression", [0, 1])
@pytest.mark.parametrize("kind", ["smooth", "noisy", "mask"])
def test_alpha_plane_exact(alpha_compression, kind):
    """Lossy WebP with alpha: the ALPH plane (raw and VP8L-compressed)
    must decode byte-exact vs libwebp's own RGBA output."""
    rng = np.random.default_rng(hash((alpha_compression, kind)) % 2**31)
    h, w = 40, 56
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    if kind == "smooth":
        a = np.repeat(np.linspace(0, 255, h).astype(np.uint8).reshape(h, 1), w, 1)
    elif kind == "noisy":
        a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    else:
        a = ((np.add.outer(np.arange(h), np.arange(w)) % 7 < 3)
             .astype(np.uint8) * 255)
    img = np.concatenate([rgb, a[:, :, None]], 2)
    data = bytes(
        wn.encode_rgb_advanced(img, alpha_compression=alpha_compression)
    )
    assert b"ALPH" in data
    ref = wn.decode_rgba(data)
    out = decode_webp(data)  # native route
    assert out.shape == (h, w, 4)
    np.testing.assert_array_equal(ref, out)
    # and the pure route (spec VP8 + vp8_yuv_to_rgb + _decode_alpha)
    # must produce the identical RGBA raster (r11: exact, was mean<16)
    import unittest.mock as mock

    with mock.patch.object(wn, "available", lambda: False):
        pure = decode_webp(data)
    np.testing.assert_array_equal(ref, pure)


@pytest.mark.parametrize("filt", [1, 2, 3])
def test_alpha_filters_match_libwebp(filt):
    """The system encoder never emits filtered ALPH chunks for our
    content, so the three predictor inversions are pinned with
    synthetic chunks (independent forward filter, raw method) that
    LIBWEBP ITSELF must also decode back to the original plane."""
    rng = np.random.default_rng(4)
    h, w = 33, 47
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    alpha = ((np.add.outer(np.arange(h) * 3, np.arange(w) * 2)) % 256).astype(
        np.uint8
    )
    base = bytes(
        wn.encode_rgb_advanced(
            np.concatenate([rgb, alpha[:, :, None]], 2), quality=60.0
        )
    )
    alph = bytes([filt << 2]) + _forward_filter(alpha, filt).tobytes()
    data = _replace_alph(base, alph)
    ref = wn.decode_rgba(data)
    np.testing.assert_array_equal(ref[:, :, 3], alpha)  # oracle self-check
    # force the pure route: _decode_alpha's predictor inversion is the
    # code under test and the native route would bypass it entirely
    import unittest.mock as mock

    with mock.patch.object(wn, "available", lambda: False):
        out = decode_webp(data)
    np.testing.assert_array_equal(out[:, :, 3], alpha)
    np.testing.assert_array_equal(out, ref)
