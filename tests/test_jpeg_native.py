"""Differential gate: pure T.81 decoder ≡ system-libjpeg shim, BIT-EXACT.

The r12 contract (VERDICT r11 #3, mirroring the lossy-WebP pattern):
``decode_image``'s JPEG branch routes through the compiled libjpeg
shim when available, with the pure decoder as fallback and
differential oracle.  Both must produce IDENTICAL pixels — the shim
pins the one cross-build-stable convention (islow IDCT, plain box
chroma upsample via ``do_fancy_upsampling=FALSE``, fixed-point color
tables) and the pure decoder reimplements it integer-for-integer.

The matrix here generates payloads through libjpeg's OWN encoder
(jpeg_native.encode — a genuinely independent producer) across
sampling (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 / 4:1:1) × entropy (Huffman /
arithmetic) × scan (sequential / progressive) × quality × odd and
tiny sizes × gray/color, and requires np.array_equal on every cell.

Skips when gcc or libjpeg are absent (the shim reports unavailable);
test_jpeg_fixtures.test_fixture_pins_path_independent keeps the
committed-fixture truth pinned on such machines.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators import jpeg_native
from rust_near_indexer_spark.operators.multimodal import _decode_jpeg

pytestmark = pytest.mark.skipif(
    not jpeg_native.available(),
    reason=f"libjpeg shim unavailable: {jpeg_native.why_unavailable()}",
)


def _rng():
    return np.random.default_rng(0xC0FFEE)


SIZES = [(24, 24), (17, 9), (33, 17), (2, 3), (1, 1), (15, 31), (64, 48)]
SAMPLINGS = [(0, 0), (1, 1), (2, 1), (1, 2), (2, 2), (4, 1)]


@pytest.mark.parametrize("hs,vs", SAMPLINGS, ids=lambda v: str(v))
def test_color_matrix_bit_exact(hs, vs):
    rng = _rng()
    for h, w in SIZES:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for q in (30, 75, 95):
            payload = jpeg_native.encode(img, quality=q, h_samp=hs, v_samp=vs)
            pure = _decode_jpeg(payload)
            nat = jpeg_native.decode(payload)
            assert pure.shape == nat.shape == (h, w, 3)
            assert np.array_equal(pure, nat), (h, w, q, hs, vs)


@pytest.mark.parametrize(
    "arith,prog", [(0, 1), (1, 0), (1, 1)], ids=["prog", "arith", "arith-prog"]
)
def test_entropy_modes_bit_exact(arith, prog):
    rng = _rng()
    for h, w in [(24, 24), (17, 9), (33, 17)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = jpeg_native.encode(
            img, quality=75, arith=bool(arith), progressive=bool(prog)
        )
        assert np.array_equal(_decode_jpeg(payload), jpeg_native.decode(payload))


def test_restart_markers_bit_exact():
    rng = _rng()
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    for restart in (1, 2, 5):
        payload = jpeg_native.encode(img, quality=50, restart=restart)
        assert np.array_equal(_decode_jpeg(payload), jpeg_native.decode(payload))


def test_grayscale_bit_exact():
    rng = _rng()
    for h, w in SIZES:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for q in (30, 90):
            payload = jpeg_native.encode(img, quality=q)
            pure = _decode_jpeg(payload)
            nat = jpeg_native.decode(payload)
            assert pure.shape == nat.shape == (h, w, 1)
            assert np.array_equal(pure, nat)


def test_smooth_content_bit_exact():
    """Smooth gradients hit different IDCT descale paths (mostly-DC
    blocks) than noise; pin both."""
    for h, w in [(48, 64), (17, 23)]:
        g = np.clip(
            np.add.outer(np.arange(h) * 3, np.arange(w) * 5)[..., None]
            + np.array([0, 60, 120]),
            0,
            255,
        ).astype(np.uint8)
        for q in (40, 85):
            payload = jpeg_native.encode(g, quality=q)
            assert np.array_equal(_decode_jpeg(payload), jpeg_native.decode(payload))


def test_native_route_is_wired(monkeypatch):
    """decode_image must actually call the shim when available — pin
    the wiring, not just the agreement (the WebP lesson: an unwired
    native route decays silently)."""
    from rust_near_indexer_spark.operators import multimodal

    rng = _rng()
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = jpeg_native.encode(img, quality=75)
    called = {"n": 0}
    real = jpeg_native.decode

    def spy(data):
        called["n"] += 1
        return real(data)

    monkeypatch.setattr(jpeg_native, "decode", spy)
    out = multimodal.decode_image(payload, {})
    assert called["n"] == 1
    assert np.array_equal(out, real(payload))


def test_lossless_falls_back_to_pure(monkeypatch):
    """libjpeg never implemented lossless SOF3: the native route must
    raise ValueError and decode_image must fall back to the pure
    decoder, which handles it exactly."""
    from rust_near_indexer_spark.operators import multimodal
    from tests.test_jpeg_codec import _encode_lossless_jpeg

    img = np.arange(63, dtype=np.uint8).reshape(9, 7)
    payload = _encode_lossless_jpeg(img, predictor=4)
    with pytest.raises(ValueError):
        jpeg_native.decode(payload)
    out = multimodal.decode_image(payload, {})
    assert np.array_equal(out[:, :, 0], img)


def test_corrupt_payload_error_comes_from_pure_path():
    """A truncated payload must fail on BOTH routes — the native
    ValueError triggers fallback, and the pure decoder then raises
    with its own diagnostics (the error contract callers see is
    path-independent)."""
    from rust_near_indexer_spark.operators import multimodal

    rng = _rng()
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = jpeg_native.encode(img, quality=75)[:40]
    with pytest.raises((ValueError, NotImplementedError)):
        multimodal.decode_image(payload, {})
