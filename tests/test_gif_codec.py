"""Golden tests for the GIF decoder (operators/gif.py).

Per the repo's codec policy (PNG/JPEG/FLAC/WebP pattern): the encoder
below is written INDEPENDENTLY from the decoder — full greedy
dictionary LZW with width growth to 12 bits and end-of-dictionary
clears, the opposite strategy from the product synthesizer's
literal-only form — so a shared misreading of the spec cannot cancel
out.  Every assertion is bit-exact on palette indices / RGB rasters.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    parse_gif,
    synth_gif_gray,
)


# ---------------------------------------------------------------------------
# Independent in-test encoder
# ---------------------------------------------------------------------------


class _BW:
    """LSB-first bit writer (independent of the module's)."""

    def __init__(self):
        self.bits = []

    def put(self, code, width):
        for k in range(width):
            self.bits.append((code >> k) & 1)

    def done(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i : i + 8]):
                byte |= b << j
            out.append(byte)
        return bytes(out)


def _greedy_lzw(indices: bytes, min_code_size: int) -> bytes:
    """Textbook greedy LZW with the GIF width-growth rule: the encoder
    widens when the NEXT code it could assign reaches 2**width, and
    emits CLEAR when the table hits 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BW()

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    bw.put(clear, width)
    cur = b""
    for b in bytes(indices):
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        bw.put(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # GIF has NO early change (unlike TIFF LZW): the width grows
            # only after a code is ASSIGNED past the current width — the
            # decoder, which lags one table entry behind, widens at the
            # same emission boundary (when ITS table reaches 2**width)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.put(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        bw.put(table[cur], width)
    bw.put(eoi, width)
    return bw.done()


def _blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _interlace_rows(h):
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def encode_gif(
    frames,
    w,
    h,
    global_palette=None,
    bg_index=0,
    loop=None,
    version=b"GIF89a",
):
    """frames: list of dicts with keys indices (2-D uint8), palette
    (N,3) or None to use global, x, y, transparent, disposal, delay_cs,
    interlace."""
    out = bytearray(version)
    out += struct.pack("<HH", w, h)
    if global_palette is not None:
        n = len(global_palette)
        bits = max(1, (n - 1).bit_length())
        out += bytes([0x80 | (bits - 1), bg_index, 0])
        pal = bytearray()
        for r, g, b in global_palette:
            pal += bytes([r, g, b])
        pal += b"\x00" * (3 * ((1 << bits) - n))
        out += pal
    else:
        out += bytes([0x00, bg_index, 0])
    if loop is not None:
        out += b"\x21\xff" + bytes([11]) + b"NETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        fh, fw = idx.shape
        if fr.get("transparent") is not None or fr.get("disposal") or fr.get(
            "delay_cs"
        ):
            flags = (fr.get("disposal", 0) & 7) << 2
            t = fr.get("transparent")
            if t is not None:
                flags |= 1
            out += b"\x21\xf9" + bytes([4, flags])
            out += struct.pack("<H", fr.get("delay_cs", 0))
            out += bytes([t if t is not None else 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHH", fr.get("x", 0), fr.get("y", 0), fw, fh
        )
        pal = fr.get("palette")
        interlace = 0x40 if fr.get("interlace") else 0
        if pal is not None:
            n = len(pal)
            bits = max(1, (n - 1).bit_length())
            out += bytes([0x80 | interlace | (bits - 1)])
            pb = bytearray()
            for r, g, b in pal:
                pb += bytes([r, g, b])
            pb += b"\x00" * (3 * ((1 << bits) - n))
            out += pb
            ncolors = 1 << bits
        else:
            out += bytes([interlace])
            ncolors = len(global_palette)
            bits = max(1, (ncolors - 1).bit_length())
            ncolors = 1 << bits
        if fr.get("interlace"):
            idx = idx[_interlace_rows(fh)]
        mcs = max(2, (ncolors - 1).bit_length())
        out += bytes([mcs])
        out += _blocks(_greedy_lzw(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def _gray_pal(n=256):
    return [(i, i, i) for i in range(n)]


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


def test_gif_roundtrip_random_256():
    idx = _rng(1).integers(0, 256, size=(23, 31), dtype=np.uint8)
    data = encode_gif([{"indices": idx}], 31, 23, global_palette=_gray_pal())
    img = decode_gif(data)
    assert img.shape == (23, 31, 3)
    assert np.array_equal(img[:, :, 0], idx)
    assert np.array_equal(img[:, :, 1], idx)


def test_gif_small_palettes_all_code_sizes():
    # 2/4/8/16/32-color tables exercise min code sizes 2..5
    for ncol in (2, 4, 8, 16, 32):
        pal = [(i * 7 % 256, i * 13 % 256, i * 29 % 256) for i in range(ncol)]
        idx = _rng(ncol).integers(0, ncol, size=(9, 14), dtype=np.uint8)
        data = encode_gif([{"indices": idx}], 14, 9, global_palette=pal)
        img = decode_gif(data)
        expect = np.array(pal, dtype=np.uint8)[idx]
        assert np.array_equal(img, expect), f"ncol={ncol}"


def test_gif_width_growth_to_12_bits():
    # a long high-entropy raster forces the dictionary through every
    # width 9..12 and past a 4096-entry CLEAR
    idx = _rng(7).integers(0, 256, size=(64, 150), dtype=np.uint8)
    data = encode_gif([{"indices": idx}], 150, 64, global_palette=_gray_pal())
    img = decode_gif(data)
    assert np.array_equal(img[:, :, 0], idx)


def test_gif_kwkwk_case():
    # 'aaaa...' makes the encoder emit a code equal to the table size —
    # the KwKwK special the decoder must synthesize
    idx = np.zeros((4, 16), dtype=np.uint8)
    idx[1, :] = 1
    data = encode_gif([{"indices": idx}], 16, 4, global_palette=_gray_pal(4))
    img = decode_gif(data)
    assert np.array_equal(img[:, :, 0], idx * 1)


def test_gif_interlaced_roundtrip():
    idx = _rng(3).integers(0, 256, size=(17, 11), dtype=np.uint8)
    data = encode_gif(
        [{"indices": idx, "interlace": True}], 11, 17, global_palette=_gray_pal()
    )
    img = decode_gif(data)
    assert np.array_equal(img[:, :, 0], idx)


def test_gif_interlaced_heights_cover_all_passes():
    for h in (1, 2, 3, 4, 5, 8, 9):
        idx = _rng(h).integers(0, 16, size=(h, 6), dtype=np.uint8)
        pal = _gray_pal(16)
        data = encode_gif(
            [{"indices": idx, "interlace": True}], 6, h, global_palette=pal
        )
        assert np.array_equal(decode_gif(data)[:, :, 0], idx), f"h={h}"


def test_gif_local_palette_overrides_global():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    local = [(255, 0, 0), (0, 0, 255)]
    data = encode_gif(
        [{"indices": idx, "palette": local}], 2, 2, global_palette=_gray_pal(4)
    )
    img = decode_gif(data)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 0, 255)


def test_gif87a_accepted():
    idx = np.array([[5]], dtype=np.uint8)
    data = encode_gif(
        [{"indices": idx}], 1, 1, global_palette=_gray_pal(8), version=b"GIF87a"
    )
    g = parse_gif(data)
    assert g["version"] == "87a"
    assert decode_gif(data)[0, 0, 0] == 5


# ---------------------------------------------------------------------------
# Animation: transparency + disposal compositing
# ---------------------------------------------------------------------------


def test_gif_transparency_keeps_canvas():
    base = np.full((4, 4), 9, dtype=np.uint8)
    patch = np.array([[1, 0], [0, 1]], dtype=np.uint8)  # 0 = transparent
    data = encode_gif(
        [
            {"indices": base},
            {"indices": patch, "x": 1, "y": 1, "transparent": 0},
        ],
        4,
        4,
        global_palette=_gray_pal(16),
    )
    frames = decode_gif_frames(data)
    assert len(frames) == 2
    f2 = frames[1][:, :, 0]
    assert f2[1, 1] == 1 and f2[2, 2] == 1  # opaque pixels drawn
    assert f2[1, 2] == 9 and f2[2, 1] == 9  # transparent kept canvas


def test_gif_disposal_restore_background():
    pal = _gray_pal(16)
    data = encode_gif(
        [
            {"indices": np.full((2, 2), 3, dtype=np.uint8), "disposal": 2},
            {
                "indices": np.full((1, 1), 7, dtype=np.uint8),
                "x": 1,
                "y": 1,
            },
        ],
        2,
        2,
        global_palette=pal,
        bg_index=12,
    )
    frames = decode_gif_frames(data)
    # frame 1 drew 3s; disposal=2 restored its rect to bg (12) before f2
    f2 = frames[1][:, :, 0]
    assert f2[0, 0] == 12 and f2[1, 1] == 7


def test_gif_disposal_restore_previous():
    pal = _gray_pal(16)
    data = encode_gif(
        [
            {"indices": np.full((2, 2), 3, dtype=np.uint8)},
            {
                "indices": np.full((2, 2), 8, dtype=np.uint8),
                "disposal": 3,
            },
            {
                "indices": np.full((1, 1), 1, dtype=np.uint8),
            },
        ],
        2,
        2,
        global_palette=pal,
    )
    frames = decode_gif_frames(data)
    f3 = frames[2][:, :, 0]
    # frame 2's 8s were reverted to frame 1's 3s before frame 3 drew
    assert f3[0, 0] == 1 and f3[1, 1] == 3


def test_gif_loop_count_and_delay_parse():
    idx = np.zeros((1, 1), dtype=np.uint8)
    data = encode_gif(
        [{"indices": idx, "delay_cs": 25, "transparent": None}],
        1,
        1,
        global_palette=_gray_pal(2),
        loop=4,
    )
    g = parse_gif(data)
    assert g["loop_count"] == 4
    assert g["frames"][0]["delay_cs"] == 25


# ---------------------------------------------------------------------------
# Contract corners
# ---------------------------------------------------------------------------


def test_gif_truncated_raises():
    idx = _rng(2).integers(0, 256, size=(8, 8), dtype=np.uint8)
    data = encode_gif([{"indices": idx}], 8, 8, global_palette=_gray_pal())
    for cut in (5, 12, len(data) // 2, len(data) - 2):
        with pytest.raises(ValueError):
            parse_gif(data[:cut])


def test_gif_bad_magic_raises():
    with pytest.raises(ValueError):
        parse_gif(b"NOTGIF" + b"\x00" * 20)


def test_gif_frame_outside_screen_raises():
    idx = np.zeros((3, 3), dtype=np.uint8)
    data = encode_gif(
        [{"indices": idx, "x": 1, "y": 1}], 3, 3, global_palette=_gray_pal(2)
    )
    with pytest.raises(ValueError):
        parse_gif(data)


def test_gif_index_outside_palette_raises():
    # 4-entry table but an index of 3 is fine; hand-build one with a
    # 2-entry logical table via a local palette of 2 and index 1 OK,
    # index 2 must raise — construct by encoding with a wider table
    # then shrinking the descriptor's table bits is invasive; instead
    # use indices beyond the declared palette length directly.
    idx = np.array([[3]], dtype=np.uint8)
    data = encode_gif(
        [{"indices": idx, "palette": [(0, 0, 0), (1, 1, 1)]}], 1, 1
    )
    # palette padded to 2 entries; index 3 lands outside
    with pytest.raises(ValueError):
        parse_gif(data)


# ---------------------------------------------------------------------------
# The product synthesizer decodes through the same public API
# ---------------------------------------------------------------------------


def test_synth_gif_matches_formula():
    for seed, w, h in ((0, 4, 3), (11, 7, 5), (123, 9, 4)):
        img = decode_gif(synth_gif_gray(seed, w, h))
        assert img.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                g = (seed * 29 + y * 11 + x * 5) % 241
                assert tuple(img[y, x]) == (g, g, g)


def test_synth_gif_long_raster_crosses_clears():
    # >254 pixels forces the literal encoder through its periodic CLEAR
    img = decode_gif(synth_gif_gray(5, 40, 30))
    g = (5 * 29 + 29 * 11 + 39 * 5) % 241
    assert img[29, 39, 0] == g
