"""Pins for the committed lossy-WebP fixtures behind
queries/multimodal.image_webp_lossy_stats.

Two layers: (1) the spec decoder reproduces the stats the query's
oracle VALUES list pins (catches any drift in decoder, router, or RGB
conversion); (2) when the system libwebp is present, the committed
bytes still decode bit-exact in YUV against it — re-verifying at test
time the independence argument the fixtures were generated under.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators import webp_native as wn
from rust_near_indexer_spark.operators.multimodal import decode_image
from rust_near_indexer_spark.operators.vp8 import decode_webp_vp8
from rust_near_indexer_spark.operators.vp8_fixtures import VP8_FIXTURES

# mirror of the oracle VALUES list in image_webp_lossy_stats
PINS = {
    "flat_q75": (24, 24, 1728, 130000),
    "noise_q40": (19, 21, 1197, 128568),
    "mix_seg4": (32, 48, 4608, 127449),
    "mix_parts4": (29, 35, 3045, 126019),
    "grad_simplef": (16, 24, 1152, 125194),
    "noise_q90": (16, 16, 768, 126079),
}


def test_fixture_set_shape():
    assert [n for n, _ in VP8_FIXTURES] == list(PINS)
    assert all(d[:4] == b"RIFF" and d[8:12] == b"WEBP" for _, d in VP8_FIXTURES)


@pytest.mark.parametrize("name,payload", VP8_FIXTURES, ids=[n for n, _ in VP8_FIXTURES])
def test_fixture_decode_matches_oracle_pins(name, payload):
    img = decode_image(payload, {})
    h, w, c = img.shape
    vals = img.reshape(-1).astype(np.int64)
    assert (h, w, int(vals.size), int(vals.sum() * 1000 // vals.size)) == PINS[name]
    assert c == 3 and img.dtype == np.uint8


@pytest.mark.skipif(not wn.available(), reason="system libwebp not present")
@pytest.mark.parametrize("name,payload", VP8_FIXTURES, ids=[n for n, _ in VP8_FIXTURES])
def test_fixture_yuv_bit_exact_vs_libwebp(name, payload):
    ys, us, vs = wn.decode_yuv(bytes(payload))
    my, mu, mv = decode_webp_vp8(bytes(payload))
    np.testing.assert_array_equal(ys, my)
    np.testing.assert_array_equal(us, mu)
    np.testing.assert_array_equal(vs, mv)
