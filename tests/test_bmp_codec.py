"""Golden tests for the BMP decoder (operators/bmp.py).

Per the repo's codec policy: the encoder below is written
independently from the decoder (its own stride math, its own RLE
emitter that uses runs + absolute mode + deltas), so a shared
misreading cannot cancel out.  All assertions are bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.bmp import decode_bmp, synth_bmp_gray


def _rng(seed):
    return np.random.default_rng(seed)


def _pack_rows(rows: list[bytes]) -> bytes:
    out = bytearray()
    for r in rows:
        pad = (4 - len(r) % 4) % 4
        out += r + b"\x00" * pad
    return bytes(out)


def encode_bmp(
    img=None,
    *,
    indices=None,
    palette=None,
    bpp=24,
    top_down=False,
    compression=0,
    masks=None,
    rle_stream=None,
    w=None,
    h=None,
):
    """Minimal independent BMP writer.  ``img``: HWC RGB uint8 for
    16/24/32 bpp; ``indices``+``palette`` for <=8 bpp; ``rle_stream``
    bypasses raster packing for RLE tests."""
    if img is not None:
        h_, w_ = img.shape[:2]
    else:
        h_, w_ = (h, w) if indices is None else indices.shape
    rows = []
    if rle_stream is None:
        if bpp == 24:
            for y in range(h_):
                row = bytearray()
                for x in range(w_):
                    r, g, b = img[y, x]
                    row += bytes([b, g, r])
                rows.append(bytes(row))
        elif bpp == 32:
            for y in range(h_):
                row = bytearray()
                for x in range(w_):
                    r, g, b = img[y, x]
                    row += bytes([b, g, r, 0xAA])
                rows.append(bytes(row))
        elif bpp == 16:
            rm, gm, bm = masks or (0x7C00, 0x03E0, 0x001F)

            def put(v, mask):
                sh = (mask & -mask).bit_length() - 1
                wd = (mask >> sh).bit_length()
                return ((v >> (8 - wd)) << sh) & mask

            for y in range(h_):
                row = bytearray()
                for x in range(w_):
                    r, g, b = (int(c) for c in img[y, x])
                    v = put(r, rm) | put(g, gm) | put(b, bm)
                    row += struct.pack("<H", v)
                rows.append(bytes(row))
        elif bpp in (1, 4, 8):
            per = 8 // bpp
            for y in range(h_):
                row = bytearray()
                acc, nacc = 0, 0
                for x in range(w_):
                    acc = (acc << bpp) | int(indices[y, x])
                    nacc += 1
                    if nacc == per:
                        row.append(acc)
                        acc, nacc = 0, 0
                if nacc:
                    row.append(acc << (bpp * (per - nacc)))
                rows.append(bytes(row))
        else:
            raise AssertionError(bpp)
        if not top_down:
            rows = rows[::-1]
        raster = _pack_rows(rows)
    else:
        raster = rle_stream
    pal_bytes = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pb = bytearray()
        for r, g, b in palette:
            pb += bytes([b, g, r, 0])
        pal_bytes = bytes(pb)
    extra = b""
    if compression == 3:
        extra = struct.pack("<III", *masks)
    pix_off = 14 + 40 + len(extra) + len(pal_bytes)
    head = b"BM" + struct.pack("<IHHI", pix_off + len(raster), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w_,
        -h_ if top_down else h_,
        1,
        bpp,
        compression,
        len(raster),
        2835,
        2835,
        n_colors,
        0,
    )
    return head + info + extra + pal_bytes + raster


def _gray_pal(n=256):
    return [(i, i, i) for i in range(n)]


def test_bmp_24bit_roundtrip_bottom_up():
    img = _rng(1).integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_24bit_top_down():
    img = _rng(2).integers(0, 256, size=(4, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img, top_down=True)), img)


def test_bmp_24bit_odd_width_padding():
    for w in (1, 2, 3, 5, 6, 7):
        img = _rng(w).integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), f"w={w}"


def test_bmp_32bit_ignores_filler():
    img = _rng(3).integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img, bpp=32)), img)


def test_bmp_8bit_palette():
    idx = _rng(4).integers(0, 256, size=(5, 11), dtype=np.uint8)
    pal = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    out = decode_bmp(encode_bmp(indices=idx, palette=pal, bpp=8))
    assert np.array_equal(out, np.array(pal, dtype=np.uint8)[idx])


def test_bmp_4bit_and_1bit_packing():
    idx4 = _rng(5).integers(0, 16, size=(3, 7), dtype=np.uint8)
    pal16 = [(i * 16, i * 16, i * 16) for i in range(16)]
    out = decode_bmp(encode_bmp(indices=idx4, palette=pal16, bpp=4))
    assert np.array_equal(out[:, :, 0], (idx4 * 16).astype(np.uint8))

    idx1 = _rng(6).integers(0, 2, size=(4, 19), dtype=np.uint8)
    out = decode_bmp(
        encode_bmp(indices=idx1, palette=[(0, 0, 0), (255, 255, 255)], bpp=1)
    )
    assert np.array_equal(out[:, :, 0], (idx1 * 255).astype(np.uint8))


def test_bmp_16bit_555_default():
    # use channel values exactly representable in 5 bits after the
    # encoder's >>3 then the decoder's bit replication: v = k*8 + k>>2
    base = np.arange(32, dtype=np.uint8)
    rep = ((base.astype(int) << 3) | (base.astype(int) >> 2)).astype(np.uint8)
    img = np.zeros((2, 32, 3), dtype=np.uint8)
    img[0, :, 0] = rep
    img[1, :, 2] = rep
    out = decode_bmp(encode_bmp(img, bpp=16))
    assert np.array_equal(out, img)


def test_bmp_16bit_565_bitfields():
    masks = (0xF800, 0x07E0, 0x001F)
    g6 = np.arange(64, dtype=int)
    rep = ((g6 << 2) | (g6 >> 4)).astype(np.uint8)
    img = np.zeros((1, 64, 3), dtype=np.uint8)
    img[0, :, 1] = rep
    out = decode_bmp(encode_bmp(img, bpp=16, compression=3, masks=masks))
    assert np.array_equal(out, img)


def test_bmp_rle8_runs_absolute_delta_eol():
    # hand-built RLE8 stream over a 4x8 bottom-up raster
    pal = _gray_pal()
    stream = bytes(
        [
            5, 7,               # run: 7 x5
            0, 3, 1, 2, 3, 0,   # absolute: 1,2,3 (+pad byte)
            0, 0,               # EOL -> row 1
            0, 2, 2, 1,         # delta: skip 2 right, 1 up -> (2, 2)
            4, 9,               # run: 9 x4
            0, 1,               # EOB
        ]
    )
    out = decode_bmp(
        encode_bmp(
            indices=None,
            palette=pal,
            bpp=8,
            compression=1,
            rle_stream=stream,
            w=8,
            h=4,
        )
    )
    # bottom-up: stored row 0 is display row 3
    assert list(out[3, :, 0]) == [7, 7, 7, 7, 7, 1, 2, 3]
    assert list(out[1, :, 0]) == [0, 0, 9, 9, 9, 9, 0, 0]
    assert out[2, :, 0].max() == 0  # delta-skipped row stays 0-filled


def test_bmp_rle4_runs_alternate_pixels():
    pal16 = [(i, i, i) for i in range(16)]
    stream = bytes([6, 0x5A, 0, 1])  # 6 pixels alternating 5, 10; EOB
    out = decode_bmp(
        encode_bmp(
            indices=None,
            palette=pal16,
            bpp=4,
            compression=2,
            rle_stream=stream,
            w=6,
            h=1,
        )
    )
    assert list(out[0, :, 0]) == [5, 10, 5, 10, 5, 10]


def test_bmp_truncated_and_bad_magic_raise():
    img = _rng(7).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = encode_bmp(img)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + data[2:])
    with pytest.raises(ValueError):
        decode_bmp(data[: len(data) - 8])


def test_synth_bmp_matches_formula():
    for seed, w, h in ((0, 4, 3), (9, 7, 2), (77, 5, 5)):
        img = decode_bmp(synth_bmp_gray(seed, w, h))
        assert img.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                g = (seed * 29 + y * 11 + x * 5) % 241
                assert tuple(img[y, x]) == (g, g, g)
