"""Round-7 PNG decode path (VERDICT r06 #3): non-interlaced 8-bit PNG
via stdlib zlib — IDAT inflate + per-scanline unfilter.

The encoder below is written in-test (chunk framing + FORWARD filters
0-4 applied per row), so the decoder must exactly invert every filter
type against a known raster; golden byte fixtures aren't needed because
the encoding itself is pinned here.  The end-to-end test pushes PNG
payloads through the real mapInPandas ``decoded_stats`` path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rust_near_indexer_spark.operators import multimodal


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Apply the spec's FORWARD filters row-by-row (the inverse of what
    the decoder does)."""
    h, _w, c = img.shape
    stride = img.shape[1] * c
    flat = img.reshape(h, stride).astype(np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        row = flat[y]
        ft = filters[y % len(filters)]
        filt = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = row[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[i] = (row[i] - pred) & 0xFF
        out += bytes([ft]) + bytes(filt.astype(np.uint8))
        prev = row
    return bytes(out)


def _png(img: np.ndarray, filters: list[int], color: int, plte: bytes = b"") -> bytes:
    h, w, _c = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(_forward_filter(img, filters)))
    body += _chunk(b"IEND", b"")
    return multimodal.PNG_MAGIC + body


def _raster(h: int, w: int, c: int, mul: int = 37) -> np.ndarray:
    return (
        (np.arange(h * w * c, dtype=np.int64) * mul % 256)
        .astype(np.uint8)
        .reshape(h, w, c)
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_each_filter_type_inverts(ft):
    img = _raster(6, 5, 3)
    got = multimodal.decode_image(_png(img, [ft], color=2), {})
    assert np.array_equal(got, img), f"filter {ft} not inverted"


def test_png_mixed_filters_rgb():
    img = _raster(10, 7, 3, mul=113)
    got = multimodal.decode_image(_png(img, [0, 1, 2, 3, 4], color=2), {})
    assert np.array_equal(got, img)


def test_png_grayscale_and_rgba_and_gray_alpha():
    g = _raster(4, 9, 1)
    assert np.array_equal(multimodal.decode_image(_png(g, [1, 4], color=0), {}), g)
    ga = _raster(5, 3, 2)
    assert np.array_equal(multimodal.decode_image(_png(ga, [2, 3], color=4), {}), ga)
    rgba = _raster(3, 8, 4, mul=201)
    assert np.array_equal(multimodal.decode_image(_png(rgba, [4], color=6), {}), rgba)


def test_png_palette_resolves_to_rgb():
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = (np.arange(12, dtype=np.int64) % 4).astype(np.uint8).reshape(3, 4, 1)
    png = _png(idx, [0, 2], color=3, plte=pal.tobytes())
    got = multimodal.decode_image(png, {})
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got, pal[idx[:, :, 0]])


def _png16(img16: np.ndarray, filters: list[int], color: int) -> bytes:
    """16-bit encoder: big-endian sample bytes, filtered with bpp=2c
    (viewing the raster as 2c byte-channels makes _forward_filter's
    channel offset exactly the spec's bpp)."""
    h, w, c = img16.shape
    as_bytes = (
        img16.astype(">u2").view(np.uint8).reshape(h, w, 2 * c)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    body += _chunk(b"IDAT", zlib.compress(_forward_filter(as_bytes, filters)))
    body += _chunk(b"IEND", b"")
    return multimodal.PNG_MAGIC + body


def _png_interlaced(img: np.ndarray, filters: list[int], color: int) -> bytes:
    """Adam7 encoder: each pass extracted with the spec's pass grid and
    FORWARD-filtered independently (prev-row state resets per pass)."""
    h, w, _c = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    raw = b""
    for x0, y0, dx, dy in multimodal._ADAM7:
        sub = img[y0::dy, x0::dx, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _forward_filter(np.ascontiguousarray(sub), filters)
    body = _chunk(b"IHDR", ihdr)
    body += _chunk(b"IDAT", zlib.compress(raw))
    body += _chunk(b"IEND", b"")
    return multimodal.PNG_MAGIC + body


def test_png_adam7_interlaced_roundtrip():
    """Adam7 gray + RGB, odd sizes, ALL filter types across pass rows —
    if the decoder carried filter state across passes (instead of
    resetting prev per pass), Up/Average/Paeth rows would corrupt."""
    for c, color in ((1, 0), (3, 2)):
        img = _raster(13, 11, c, mul=41)
        out = multimodal._decode_png(_png_interlaced(img, [0, 1, 2, 3, 4], color))
        assert np.array_equal(out, img)


def test_png_adam7_tiny_images_skip_empty_passes():
    """Sizes below the pass grid (e.g. 1x1, 3x2) leave several Adam7
    passes empty — the decoder must consume exactly the present ones."""
    for hw in ((1, 1), (3, 2), (2, 5), (8, 8)):
        img = _raster(hw[0], hw[1], 3, mul=29)
        out = multimodal._decode_png(_png_interlaced(img, [4], color=2))
        assert np.array_equal(out, img)


def test_png_16bit_high_byte():
    """16-bit samples decode to their high byte (the standard 16→8
    reduction); low bytes are deliberately noisy to catch accidental
    low-byte reads."""
    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, (7, 9, 3), dtype=np.uint16)
    out = multimodal._decode_png(_png16(img16, [0, 2, 4], color=2))
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))
    gray16 = rng.integers(0, 65536, (5, 4, 1), dtype=np.uint16)
    out = multimodal._decode_png(_png16(gray16, [1, 3], color=0))
    assert np.array_equal(out, (gray16 >> 8).astype(np.uint8))


def _png_subbyte(
    vals: np.ndarray, depth: int, color: int, filters: list[int], plte: bytes = b""
) -> bytes:
    """Sub-byte encoder: pack `depth`-bit samples MSB-first per row,
    then FORWARD-filter the packed bytes (spec: filters operate on
    bytes with bpp=1 at sub-byte depths)."""
    h, w, _one = vals.shape
    stride = (w * depth + 7) // 8
    bits = ((vals[:, :, 0:1] >> np.arange(depth - 1, -1, -1)) & 1).astype(
        np.uint8
    )  # (h, w, depth)
    bits = bits.reshape(h, w * depth)
    padded = np.zeros((h, stride * 8), np.uint8)
    padded[:, : w * depth] = bits
    packed = np.packbits(padded, axis=1)  # (h, stride)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(
        b"IDAT", zlib.compress(_forward_filter(packed[:, :, None], filters))
    )
    body += _chunk(b"IEND", b"")
    return multimodal.PNG_MAGIC + body


def test_png_subbyte_gray_depths():
    """1/2/4-bit packed grayscale: decode scales to the full 8-bit range
    (255/85/17 exact factors); mixed filter types run over the PACKED
    bytes with bpp=1."""
    rng = np.random.default_rng(3)
    for depth in (1, 2, 4):
        vmax = (1 << depth) - 1
        vals = rng.integers(0, vmax + 1, (9, 13, 1), dtype=np.uint8)
        out = multimodal._decode_png(
            _png_subbyte(vals, depth, color=0, filters=[0, 1, 2, 3, 4])
        )
        assert np.array_equal(out, vals * (255 // vmax))


def test_png_subbyte_interlaced():
    """Adam7 at 2-bit depth: per-pass strides are ceil(wp*2/8), so the
    bit packing restarts at every pass boundary."""
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 4, (11, 9, 1), dtype=np.uint8)
    h, w, _ = vals.shape
    raw = b""
    for x0, y0, dx, dy in multimodal._ADAM7:
        sub = vals[y0::dy, x0::dx, :]
        hp, wp, _one = sub.shape
        if hp == 0 or wp == 0:
            continue
        stride = (wp * 2 + 7) // 8
        bits = ((sub[:, :, 0:1] >> np.arange(1, -1, -1)) & 1).astype(np.uint8)
        bits = bits.reshape(hp, wp * 2)
        padded = np.zeros((hp, stride * 8), np.uint8)
        padded[:, : wp * 2] = bits
        packed = np.packbits(padded, axis=1)
        raw += _forward_filter(np.ascontiguousarray(packed[:, :, None]), [0, 2])
    ihdr = struct.pack(">IIBBBBB", w, h, 2, 0, 0, 0, 1)
    body = _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw))
    body += _chunk(b"IEND", b"")
    out = multimodal._decode_png(multimodal.PNG_MAGIC + body)
    assert np.array_equal(out, vals * 85)


def test_png_subbyte_palette():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 11, 1), dtype=np.uint8)
    out = multimodal._decode_png(
        _png_subbyte(idx, 4, color=3, filters=[0, 2, 4], plte=pal.tobytes())
    )
    assert np.array_equal(out, pal[idx[:, :, 0]])


def test_png_contract_boundaries():
    img = _raster(2, 2, 3)
    # sub-byte depth with a TRUECOLOR type is illegal, not unsupported
    four_bit = _png(img, [0], color=2)
    four_bit = four_bit[:24] + b"\x04" + four_bit[25:]
    with pytest.raises(ValueError, match="not legal for color type 2"):
        multimodal.decode_image(four_bit, {})
    three_bit = _png(img, [0], color=2)
    three_bit = three_bit[:24] + b"\x03" + three_bit[25:]
    with pytest.raises(ValueError, match="illegal PNG bit depth"):
        multimodal.decode_image(three_bit, {})
    # depth 16 is now REAL — a stream merely patched to claim 16-bit
    # has half the required bytes and must fail loudly, not decode
    sixteen = _png(img, [0], color=2)
    sixteen = sixteen[:24] + b"\x10" + sixteen[25:]
    with pytest.raises(ValueError, match="IDAT length"):
        multimodal.decode_image(sixteen, {})
    bad_interlace = _png(img, [0], color=2)
    bad_interlace = bad_interlace[:28] + b"\x02" + bad_interlace[29:]
    with pytest.raises(NotImplementedError, match="interlace method"):
        multimodal.decode_image(bad_interlace, {})
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.decode_image(multimodal.PNG_MAGIC + _chunk(b"IEND", b""), {})


def test_png_decoded_stats_end_to_end(spark):
    """PNG payloads through the real Spark mapInPandas decode path,
    features checked against the source raster."""
    img = _raster(9, 11, 3, mul=59)
    png = _png(img, [0, 1, 2, 3, 4], color=2)
    rows = [(7, "image", bytearray(png), None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.decoded_stats(media).collect()
    assert len(got) == 1
    vals = img.reshape(-1).astype(np.int64)
    assert got[0].asDict() == {
        "media_id": 7,
        "kind": "image",
        "dim0": 9,
        "dim1": 11,
        "n_values": int(vals.size),
        "mean_milli": int(vals.sum() * 1000 // vals.size),
    }
