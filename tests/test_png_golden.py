"""PNG golden suite vs the SYSTEM libpng (round 11).

Until now the PNG decoder was gated against the in-test encoder only —
two implementations by the same author can share one misunderstanding
(the failure class ADVICE r10 caught in the VP8 RGB conversion, where a
loose bound hid a systematic error).  This suite adds the independent
side: tests/golden/png_tool.c wraps Debian's libpng16 (compiled on
demand; skips when gcc or png.h is absent) and the comparison runs in
BOTH directions —

- libpng ENCODES fresh rasters (its own adaptive per-row filter
  choices, its own Adam7 serialization) across every color type /
  legal bit depth / interlace combination, and the pure-Python decoder
  must reproduce the source samples exactly (16-bit -> high byte,
  sub-byte gray -> bit-replicated 8-bit — the documented conventions,
  which are also libpng's png_set_strip_16 / png_set_expand);
- the in-test encoders (explicit per-filter streams, hand-built Adam7,
  packed sub-byte, palette) produce files libpng must read back to the
  same pixels the pure decoder reports.
"""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from rust_near_indexer_spark.operators import multimodal
from rust_near_indexer_spark.operators.multimodal import _decode_png

from .test_png_codec import _png, _png16, _png_interlaced, _png_subbyte, _raster


@pytest.fixture(scope="module")
def tool(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available")
    exe = tmp_path_factory.mktemp("pngtool") / "png_tool"
    src = __file__.rsplit("/", 1)[0] + "/golden/png_tool.c"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, "-lpng"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libpng tool does not build: {r.stderr[:200]!r}")
    return str(exe)


def _enc(tool, raw: bytes, w: int, h: int, color: int, depth: int,
         interlace: int) -> bytes:
    r = subprocess.run(
        [tool, "enc", str(w), str(h), str(color), str(depth), str(interlace)],
        input=raw, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def _dec(tool, png: bytes) -> np.ndarray:
    r = subprocess.run([tool, "dec"], input=png, capture_output=True)
    assert r.returncode == 0, r.stderr
    hd, rest = r.stdout.split(b"\n", 1)
    w, h, ch = map(int, hd.split())
    return np.frombuffer(rest[: w * h * ch], np.uint8).reshape(h, w, ch)


_CH = {0: 1, 2: 3, 4: 2, 6: 4}


@pytest.mark.parametrize("interlace", [0, 1], ids=["linear", "adam7"])
@pytest.mark.parametrize(
    "color,depth",
    [(0, 8), (0, 16), (2, 8), (2, 16), (4, 8), (4, 16), (6, 8), (6, 16)],
    ids=lambda v: str(v),
)
@pytest.mark.parametrize("shape", [(13, 17), (3, 2)], ids=["odd", "tiny"])
def test_libpng_encodes_we_decode(tool, color, depth, interlace, shape):
    h, w = shape
    ch = _CH[color]
    rng = np.random.default_rng(color * 100 + depth + interlace + h)
    if depth == 8:
        src = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        raw = src.tobytes()
        want = src
    else:
        src16 = rng.integers(0, 65536, (h, w, ch)).astype(np.uint16)
        raw = src16.astype(">u2").tobytes()
        want = (src16 >> 8).astype(np.uint8)  # high byte, the 16->8 convention
    png = _enc(tool, raw, w, h, color, depth, interlace)
    assert (png[28] == 1) == bool(interlace)  # IHDR interlace byte
    out = _decode_png(png)
    np.testing.assert_array_equal(out, want)
    np.testing.assert_array_equal(_dec(tool, png), want)  # oracle self-check


@pytest.mark.parametrize("interlace", [0, 1], ids=["linear", "adam7"])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_libpng_encodes_subbyte_gray_we_decode(tool, depth, interlace):
    h, w = 11, 19
    rng = np.random.default_rng(depth + interlace)
    vals = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(
        np.uint8
    ).reshape(h, w * depth)
    stride = (w * depth + 7) // 8
    padded = np.zeros((h, stride * 8), np.uint8)
    padded[:, : w * depth] = bits
    raw = np.packbits(padded, axis=1).tobytes()
    png = _enc(tool, raw, w, h, 0, depth, interlace)
    want = (vals * (255 // ((1 << depth) - 1)))[:, :, None]  # bit replication
    out = _decode_png(png)
    np.testing.assert_array_equal(out, want)
    np.testing.assert_array_equal(_dec(tool, png), want)


def test_libpng_decodes_our_filtered_streams(tool):
    """Every explicit filter type (0..4) and a mixed-filter stream, all
    color types: the in-test encoder's files must read back identically
    through libpng and the pure decoder."""
    for color, c in ((0, 1), (2, 3), (4, 2), (6, 4)):
        img = _raster(9, 7, c)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = _png(img, filters, color)
            np.testing.assert_array_equal(_dec(tool, png), _decode_png(png))
            np.testing.assert_array_equal(_decode_png(png), img)


def test_libpng_decodes_our_16bit_and_interlaced(tool):
    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 65536, (8, 6, 3)).astype(np.uint16)
    png = _png16(img16, [0, 1, 2, 3, 4], 2)
    np.testing.assert_array_equal(_dec(tool, png), _decode_png(png))
    img = _raster(13, 5, 3)
    png = _png_interlaced(img, [0, 1, 2, 3, 4], 2)
    np.testing.assert_array_equal(_dec(tool, png), img)
    np.testing.assert_array_equal(_decode_png(png), img)


def _with_trns(png: bytes, payload: bytes) -> bytes:
    """Splice a tRNS chunk immediately before the first IDAT."""
    import zlib

    pos = 8
    while pos + 8 <= len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        if png[pos + 4 : pos + 8] == b"IDAT":
            chunk = (
                struct.pack(">I", len(payload)) + b"tRNS" + payload
                + struct.pack(">I", zlib.crc32(b"tRNS" + payload))
            )
            return png[:pos] + chunk + png[pos:]
        pos += 12 + length
    raise AssertionError("no IDAT")


def test_trns_palette_alpha(tool):
    """Palette tRNS: per-entry alpha, entries past the chunk opaque —
    both decoders must produce the identical RGBA raster."""
    rng = np.random.default_rng(11)
    plte = bytes(rng.integers(0, 256, 24, dtype=np.uint8))  # 8 entries
    idx = rng.integers(0, 8, (9, 13, 1)).astype(np.uint8)
    png = _with_trns(
        _png_subbyte(idx, 4, 3, [0, 1, 2, 3, 4], plte=plte),
        bytes([0, 128, 255]),  # alpha for entries 0..2; 3..7 opaque
    )
    ours = _decode_png(png)
    assert ours.shape == (9, 13, 4)
    np.testing.assert_array_equal(_dec(tool, png), ours)
    alut = np.array([0, 128, 255, 255, 255, 255, 255, 255], np.uint8)
    np.testing.assert_array_equal(ours[:, :, 3], alut[idx[:, :, 0]])


@pytest.mark.parametrize("color,ch", [(0, 1), (2, 3)], ids=["gray", "rgb"])
def test_trns_colorkey_8bit(tool, color, ch):
    rng = np.random.default_rng(13 + color)
    img = rng.integers(0, 4, (11, 7, ch)).astype(np.uint8) * 80
    key = tuple(img[0, 0])  # guaranteed present
    png = _with_trns(
        _png(img, [0, 1, 2, 3, 4], color), struct.pack(f">{ch}H", *key)
    )
    ours = _decode_png(png)
    assert ours.shape == (11, 7, ch + 1)
    np.testing.assert_array_equal(_dec(tool, png), ours)
    assert (ours[:, :, ch] == 0).any() and (ours[:, :, ch] == 255).any()


def test_trns_colorkey_16bit_native_depth(tool):
    """The reduction trap: a 16-bit colorkey with NONZERO low bytes
    must be compared at native depth — matching on the high byte after
    the 16→8 cut would make extra pixels transparent."""
    img16 = np.zeros((6, 5, 3), np.uint16)
    img16[..., :] = (0x1234, 0x5678, 0x9ABC)       # the key, everywhere
    img16[2, 3] = (0x1200, 0x5600, 0x9A00)         # same HIGH bytes only
    img16[4, 1] = (0x1111, 0x2222, 0x3333)         # unrelated
    png = _with_trns(
        _png16(img16, [0, 2], 2), struct.pack(">3H", 0x1234, 0x5678, 0x9ABC)
    )
    ours = _decode_png(png)
    np.testing.assert_array_equal(_dec(tool, png), ours)
    assert ours[2, 3, 3] == 255 and ours[4, 1, 3] == 255  # NOT keyed
    assert ours[0, 0, 3] == 0                             # keyed


def test_trns_colorkey_subbyte_and_interlaced(tool):
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 4, (10, 9, 1)).astype(np.uint8)
    png = _with_trns(
        _png_subbyte(vals, 2, 0, [0, 1, 2]), struct.pack(">H", 3)
    )
    ours = _decode_png(png)
    assert ours.shape == (10, 9, 2)
    np.testing.assert_array_equal(_dec(tool, png), ours)
    np.testing.assert_array_equal(
        ours[:, :, 1], np.where(vals[:, :, 0] == 3, 0, 255)
    )
    img = _raster(13, 5, 3)
    key = tuple(img[3, 3])
    png = _with_trns(
        _png_interlaced(img, [0, 1, 2, 3, 4], 2),
        struct.pack(">3H", *key),
    )
    np.testing.assert_array_equal(_dec(tool, png), _decode_png(png))


def test_libpng_decodes_product_synth(tool):
    """The gate query's synthesizer (full filter cycle per row) reads
    back through libpng to the exact generator formula."""
    from rust_near_indexer_spark.operators.multimodal import synth_png_gray

    for seed, w, h in ((0, 5, 6), (7, 10, 10), (123, 8, 7)):
        png = synth_png_gray(seed, w, h)
        y, x = np.mgrid[0:h, 0:w]
        want = ((seed * 23 + y * 7 + x * 3) % 251).astype(np.uint8)[:, :, None]
        np.testing.assert_array_equal(_dec(tool, png), want)
        np.testing.assert_array_equal(_decode_png(png), want)


def test_libpng_decodes_our_palette(tool):
    rng = np.random.default_rng(6)
    plte = bytes(rng.integers(0, 256, 48, dtype=np.uint8))  # 16 entries
    idx = rng.integers(0, 16, (10, 9, 1)).astype(np.uint8)
    png = _png_subbyte(idx, 4, 3, [0, 1, 2, 3, 4], plte=plte)
    want = np.frombuffer(plte, np.uint8).reshape(16, 3)[idx[:, :, 0]]
    np.testing.assert_array_equal(_dec(tool, png), want)
    np.testing.assert_array_equal(_decode_png(png), want)
