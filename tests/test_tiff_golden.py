"""TIFF golden suite vs the SYSTEM libtiff (round 11).

The TIFF decoder's LZW (with the early-change rule) and PackBits paths
were gated against the in-test encoder — same-author implementations
can share one misunderstanding (the ADVICE r10 VP8 failure class).
tests/libtiff_oracle.py binds ``libtiff.so.6`` via ctypes and the
comparison runs in BOTH directions:

- libtiff ENCODES fresh rasters (its real LZW dictionary/early-change
  serialization, its PackBits runs, horizontal predictor, multi-strip
  layout) and the pure-Python decoder must reproduce the source
  samples exactly — including images large and noisy enough to push
  the LZW code width through 9→10→11→12 bits, where an early-change
  off-by-one desyncs immediately;
- the in-test encoder's files (spec-derived LZW/PackBits, both
  endians, palette/colormap) must read back through libtiff's own full
  pipeline to the same pixels the pure decoder reports.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators.tiff import decode_tiff, synth_tiff_gray

from . import libtiff_oracle as lt
from .test_tiff_codec import (
    _lzw_encode,
    _packbits_encode,
    _strip_rows,
    encode_tiff,
)

pytestmark = pytest.mark.skipif(
    not lt.available(), reason="system libtiff not present"
)


def _rgba_of_ours(img: np.ndarray) -> np.ndarray:
    """decode_tiff output (h,w,1|3) → the RGBA libtiff reports."""
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    a = np.full(img.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([img, a], axis=2)


@pytest.mark.parametrize("compression", [1, 5, 32773], ids=["none", "lzw", "packbits"])
@pytest.mark.parametrize("kind", ["gray", "rgb"])
def test_libtiff_encodes_we_decode(compression, kind):
    rng = np.random.default_rng(compression + (kind == "rgb"))
    shape = (13, 9) if kind == "gray" else (11, 7, 3)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = lt.encode(img, compression=compression, rows_per_strip=4)
    out = decode_tiff(data)
    want = img[:, :, None] if kind == "gray" else img
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("kind", ["gray", "rgb"])
def test_libtiff_lzw_predictor_we_decode(predictor, kind):
    """Horizontal differencing (predictor 2) across 1 and 3 samples —
    libtiff's own serialization of TIFF6 §14."""
    rng = np.random.default_rng(predictor * 7)
    shape = (10, 16) if kind == "gray" else (10, 16, 3)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = lt.encode(img, compression=5, rows_per_strip=3, predictor=predictor)
    out = decode_tiff(data)
    want = img[:, :, None] if kind == "gray" else img
    np.testing.assert_array_equal(out, want)


def test_libtiff_lzw_code_width_growth_we_decode():
    """A 96x96 noise raster pushes libtiff's LZW dictionary through the
    9→10→11→12-bit code widths and a table clear; any early-change
    off-by-one in the pure decoder desyncs the stream immediately."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    data = lt.encode(img, compression=5, rows_per_strip=96)
    np.testing.assert_array_equal(decode_tiff(data)[:, :, 0], img)
    # smooth content reaches long match codes instead of literals
    grad = np.repeat(np.arange(96, dtype=np.uint8)[None, :], 96, 0)
    data = lt.encode(grad, compression=5, rows_per_strip=96)
    np.testing.assert_array_equal(decode_tiff(data)[:, :, 0], grad)


def test_libtiff_decodes_our_synth():
    for seed, w, h in ((7, 9, 13), (1, 16, 5)):
        data = synth_tiff_gray(seed, w, h)
        np.testing.assert_array_equal(
            lt.decode_rgba(data), _rgba_of_ours(decode_tiff(data))
        )


@pytest.mark.parametrize("endian", ["<", ">"])
def test_libtiff_decodes_our_lzw_and_packbits(endian):
    rng = np.random.default_rng(9 + (endian == ">"))
    img = rng.integers(0, 256, (12, 11, 1)).astype(np.uint8)
    lzw = encode_tiff(
        w=11, h=12, bits=8, photometric=1, endian=endian, compression=5,
        strips=[_lzw_encode(bytes(s.tobytes())) for s in _strip_rows(img, 5)],
        rows_per_strip=5,
    )
    np.testing.assert_array_equal(
        lt.decode_rgba(lzw), _rgba_of_ours(decode_tiff(lzw))
    )
    pb = encode_tiff(
        w=11, h=12, bits=8, photometric=1, endian=endian, compression=32773,
        strips=[_packbits_encode(s.tobytes()) for s in _strip_rows(img, 4)],
        rows_per_strip=4,
    )
    np.testing.assert_array_equal(
        lt.decode_rgba(pb), _rgba_of_ours(decode_tiff(pb))
    )


@pytest.mark.parametrize("compression", [1, 5, 32773], ids=["none", "lzw", "packbits"])
@pytest.mark.parametrize("kind", ["gray", "rgb"])
def test_libtiff_tiled_we_decode(compression, kind):
    """Tiled TIFF (TIFF6 §15) — retired from NotImplementedError in
    r11: libtiff writes 16x16 tiles (edge tiles padded), our decoder
    crops and reassembles exactly, including the horizontal predictor
    applied per TILE row rather than per image row."""
    rng = np.random.default_rng(compression)
    shape = (37, 45) if kind == "gray" else (37, 45, 3)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    want = img[:, :, None] if kind == "gray" else img
    data = lt.encode(img, compression=compression, tile=(16, 16))
    np.testing.assert_array_equal(decode_tiff(data), want)
    if compression == 5:
        data = lt.encode(img, compression=5, tile=(16, 16), predictor=2)
        np.testing.assert_array_equal(decode_tiff(data), want)


@pytest.mark.parametrize("compression", [1, 5, 32773], ids=["none", "lzw", "packbits"])
def test_libtiff_planar_we_decode(compression):
    """PlanarConfiguration=2 (separate planes, sample-major segment
    order) — retired from NotImplementedError in r11."""
    rng = np.random.default_rng(40 + compression)
    img = rng.integers(0, 256, (13, 9, 3)).astype(np.uint8)
    data = lt.encode(img, compression=compression, rows_per_strip=4,
                     planar=True)
    np.testing.assert_array_equal(decode_tiff(data), img)


def test_libtiff_planar_tiled_predictor_we_decode():
    """The stacked corner: separate planes x tile grid x LZW x
    horizontal predictor, against libtiff's own writer — and libtiff's
    reader agrees with ours on the same file."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 45, 3)).astype(np.uint8)
    data = lt.encode(img, compression=5, tile=(16, 32), planar=True,
                     predictor=2)
    np.testing.assert_array_equal(decode_tiff(data), img)
    np.testing.assert_array_equal(
        lt.decode_rgba(data), _rgba_of_ours(decode_tiff(data))
    )


@pytest.mark.parametrize("compression", [1, 5], ids=["none", "lzw"])
@pytest.mark.parametrize(
    "layout", ["tiled", "planar", "tiled-planar", "rgb-strips"]
)
def test_libtiff_16bit_tiled_planar_we_decode(compression, layout):
    """16-bit through the new segment assembler (r11 self-review: the
    8-bit matrix was golden-gated, the 16-bit branch was not): libtiff
    writes native-endian 16-bit samples; our decoder must reduce to the
    high byte after correct endian interpretation, predictor included."""
    rng = np.random.default_rng(60 + compression)
    img16 = rng.integers(0, 65536, (20, 33)).astype(np.uint16)
    kw = dict(compression=compression, bits=16)
    if layout == "tiled":
        kw["tile"] = (16, 16)
    elif layout == "planar":
        img16 = rng.integers(0, 65536, (20, 33, 3)).astype(np.uint16)
        kw.update(planar=True, rows_per_strip=7)
    elif layout == "rgb-strips":  # 16-bit RGB chunky (also new in r11)
        img16 = rng.integers(0, 65536, (20, 33, 3)).astype(np.uint16)
        kw.update(rows_per_strip=6)
    else:
        img16 = rng.integers(0, 65536, (20, 33, 3)).astype(np.uint16)
        kw.update(planar=True, tile=(16, 16))
    if compression == 5:
        kw["predictor"] = 2
    data = lt.encode(img16, **kw)
    want = (img16 >> 8).astype(np.uint8)
    if want.ndim == 2:
        want = want[:, :, None]
    np.testing.assert_array_equal(decode_tiff(data), want)


def test_big_endian_16bit_tiled_hand_built():
    """libtiff always writes the host's endianness ('II' on x86), so
    the big-endian 16-bit tile path is pinned with a hand-built 'MM'
    file: one uncompressed 16x16 tile, samples stored big-endian."""
    import struct

    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 65536, (10, 12)).astype(np.uint16)
    tile = np.zeros((16, 16), np.uint16)
    tile[:10, :12] = img16
    raster = tile.astype(">u2").tobytes()
    entries = [  # (tag, type, values)
        (256, 3, [12]), (257, 3, [10]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]), (284, 3, [1]),
        (322, 3, [16]), (323, 3, [16]), (324, 4, [None]), (325, 4, [len(raster)]),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", len(entries))
    for tag, typ, vals in entries:
        v = data_off if vals == [None] else vals[0]
        if typ == 3:
            packed = struct.pack(">HH", v, 0)
        else:
            packed = struct.pack(">I", v)
        out += struct.pack(">HHI", tag, typ, 1) + packed
    out += struct.pack(">I", 0)  # next IFD
    assert len(out) == data_off
    out += raster
    got = decode_tiff(bytes(out))
    np.testing.assert_array_equal(got, (img16 >> 8).astype(np.uint8)[:, :, None])


def test_tiled_geometry_contracts():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (20, 33)).astype(np.uint8)
    data = bytearray(lt.encode(img, compression=5, tile=(16, 16)))
    # truncate the last tile's bytes: must flag the container
    from rust_near_indexer_spark.operators.tiff import _read_ifd

    f = _read_ifd(bytes(data), "<")
    with pytest.raises(ValueError):
        decode_tiff(bytes(data[: f[324][-1] + 2]))


def test_our_lzw_encoder_matches_libtiff_bytes():
    """Strongest form: the in-test spec-derived LZW encoder and
    libtiff's encoder produce the IDENTICAL compressed stream for the
    same input (TIFF LZW is deterministic: greedy longest-match with a
    fixed clear policy), pinning the early-change rule byte-for-byte."""
    rng = np.random.default_rng(4)
    for raster in (
        rng.integers(0, 256, (13, 9)).astype(np.uint8),
        np.repeat(np.arange(64, dtype=np.uint8)[None, :], 64, 0),
    ):
        h, w = raster.shape
        ours = _lzw_encode(raster.tobytes())
        data = lt.encode(raster, compression=5, rows_per_strip=h)
        # pull libtiff's single strip back out of its own file
        from rust_near_indexer_spark.operators.tiff import _read_ifd

        f = _read_ifd(data, "<")
        strip = data[f[273][0] : f[273][0] + f[279][0]]
        assert strip == ours, (h, w)
