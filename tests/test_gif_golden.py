"""GIF golden suite vs the SYSTEM giflib (round 11).

The GIF decoder's LZW path (variable code width, clear codes, the
KwKwK case, sub-block framing, interlace) was gated against the
in-test encoder — same-author implementations can share one
misunderstanding (the ADVICE r10 VP8 failure class).
tests/libgif_oracle.py binds ``libgif.so.7`` via ctypes; the
comparison runs in BOTH directions:

- giflib ENCODES fresh rasters — its real LZW code-width growth
  through 12 bits, its own clear-code policy on rasters big enough to
  exhaust the dictionary, small palettes down to min-code-size 2, and
  interlaced files — and the pure-Python decoder must reproduce the
  palette-applied pixels exactly;
- the in-test encoder's files (greedy spec LZW, local-palette
  override, KwKwK streams, interlace) must slurp back through giflib
  to the same rasters the pure decoder reports.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators.gif import decode_gif, synth_gif_gray

from . import libgif_oracle as lg
from .test_gif_codec import _gray_pal, encode_gif

pytestmark = pytest.mark.skipif(
    not lg.available(), reason="system giflib not present"
)


@pytest.mark.parametrize("interlace", [False, True], ids=["linear", "adam"])
@pytest.mark.parametrize(
    "ncol,shape",
    [(256, (37, 53)), (256, (96, 96)), (16, (13, 9)), (4, (11, 7)),
     (2, (8, 21)), (256, (1, 1)), (256, (3, 2))],
    ids=["noise256", "dict-exhaust", "pal16", "pal4", "pal2", "1x1", "tiny"],
)
def test_giflib_encodes_we_decode(ncol, shape, interlace):
    h, w = shape
    rng = np.random.default_rng(ncol + h * 31 + interlace)
    palette = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    idx = rng.integers(0, ncol, (h, w)).astype(np.uint8)
    data = lg.encode(idx, palette, interlace=interlace)
    np.testing.assert_array_equal(decode_gif(data), palette[idx])


def test_giflib_encodes_long_matches_we_decode():
    """Smooth content drives giflib's LZW into long match codes rather
    than literals — the opposite stress from noise."""
    grad = np.repeat(np.arange(96, dtype=np.uint8)[None, :], 64, 0)
    palette = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
    data = lg.encode(grad, palette)
    np.testing.assert_array_equal(decode_gif(data), palette[grad])


def _giflib_pixels(data: bytes) -> np.ndarray:
    """First image block via giflib, palette applied.  DGifSlurp
    de-interlaces internally (it reads the four passes into their
    display rows), so the raster is already in display order."""
    f = lg.decode_frames(data)[0]
    return f["palette"][f["raster"]]


def test_giflib_decodes_our_encoder():
    rng = np.random.default_rng(2)
    pal = _gray_pal(256)
    idx = rng.integers(0, 256, (23, 17)).astype(np.uint8)
    for interlace in (False, True):
        data = encode_gif(
            [{"indices": idx, "interlace": interlace}], 17, 23,
            global_palette=pal,
        )
        np.testing.assert_array_equal(_giflib_pixels(data), decode_gif(data))
        np.testing.assert_array_equal(decode_gif(data), np.stack([idx] * 3, 2))


def test_giflib_decodes_our_small_palette_and_local_override():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, (9, 11)).astype(np.uint8)
    data = encode_gif(
        [{"indices": idx}], 11, 9, global_palette=_gray_pal(4)
    )
    np.testing.assert_array_equal(_giflib_pixels(data), decode_gif(data))
    local = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    data = encode_gif(
        [{"indices": idx, "palette": local}], 11, 9, global_palette=_gray_pal(4)
    )
    np.testing.assert_array_equal(_giflib_pixels(data), decode_gif(data))


def test_giflib_decodes_product_synth():
    for seed, w, h in ((5, 9, 7), (1, 16, 4)):
        data = synth_gif_gray(seed, w, h)
        np.testing.assert_array_equal(_giflib_pixels(data), decode_gif(data))


def test_giflib_agrees_on_animation_frames():
    """Multi-frame GIF: per-image geometry (Left/Top/Width/Height) and
    raw index rasters through giflib must match parse_gif's pre-
    composition view — the comparison deliberately happens BEFORE
    disposal/transparency compositing, which is renderer convention."""
    from rust_near_indexer_spark.operators.gif import parse_gif

    rng = np.random.default_rng(8)
    pal = _gray_pal(256)
    base = rng.integers(0, 256, (12, 16)).astype(np.uint8)
    patch = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    data = encode_gif(
        [
            {"indices": base, "disposal": 1, "delay_cs": 4},
            {"indices": patch, "x": 3, "y": 2, "transparent": 0,
             "disposal": 2, "delay_cs": 6},
        ],
        16, 12, global_palette=pal, loop=0,
    )
    ref = lg.decode_frames(data)
    ours = parse_gif(data)["frames"]
    assert len(ref) == len(ours) == 2
    for rf, of in zip(ref, ours):
        assert (rf["left"], rf["top"]) == (of["x"], of["y"])
        np.testing.assert_array_equal(rf["raster"], of["indices"])
    np.testing.assert_array_equal(ref[0]["raster"], base)
    np.testing.assert_array_equal(ref[1]["raster"], patch)


def test_giflib_decodes_kwkwk_stream():
    """The KwKwK corner (code == next-to-assign) through giflib's
    reader: our encoder emits it for abab... content."""
    idx = np.tile(np.array([[0, 1]], np.uint8), (1, 32))  # ababab...
    data = encode_gif([{"indices": idx}], 64, 1, global_palette=_gray_pal(2))
    np.testing.assert_array_equal(_giflib_pixels(data), decode_gif(data))
