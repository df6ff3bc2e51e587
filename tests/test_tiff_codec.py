"""Golden tests for the TIFF decoder (operators/tiff.py).

Independent in-test TIFF writer: its own IFD serialization (including
big-endian), its own PackBits emitter, and its own LZW encoder that
re-derives TIFF's early-change rule — written against the spec, not
against the decoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.tiff import decode_tiff, synth_tiff_gray


# ---------------------------------------------------------------------------
# Independent encoders
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits: repeat runs >= 3 become repeats, else literals."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        j = i
        lit = bytearray()
        while j < n and len(lit) < 128:
            run = 1
            while j + run < n and row[j + run] == row[j] and run < 128:
                run += 1
            if run >= 3:
                break
            lit += row[j : j + run]
            j += run
        out += bytes([len(lit) - 1]) + lit
        i = j
    return bytes(out)


class _MsbBW:
    def __init__(self):
        self.bits = []

    def put(self, code, width):
        for k in range(width - 1, -1, -1):
            self.bits.append((code >> k) & 1)

    def done(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            chunk = self.bits[i : i + 8]
            for j, b in enumerate(chunk):
                byte |= b << (7 - j)
            out.append(byte)
        return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW with early change: width grows when the NEXT code to
    assign is 2**width - 1 ... i.e. after assigning code 2**width - 2?
    Spec (TIFF6, p.61): the encoder switches one code early — it emits
    at width+1 as soon as it has USED code value 2**width - 1 in the
    table.  Derived here independently: widen when next_code reaches
    (1 << width) - 1 after an assignment, mirroring the decoder's
    table-size trigger at 2**width - 1 with its one-entry lag."""
    CLEAR, EOI = 256, 257
    bw = _MsbBW()

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    bw.put(CLEAR, width)
    cur = b""
    for b in bytes(data):
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        bw.put(table[cur], width)
        if next_code < 4094:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            bw.put(CLEAR, width)
            table = fresh()
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        bw.put(table[cur], width)
    bw.put(EOI, width)
    return bw.done()


def encode_tiff(
    *,
    w,
    h,
    bits,
    photometric,
    spp=1,
    strips,
    endian="<",
    rows_per_strip=None,
    compression=1,
    predictor=None,
    colormap=None,
):
    """strips: list of raw (already compressed) strip byte strings."""
    e = endian
    entries = []  # (tag, type, count, values list)
    entries.append((256, 3, [w]))
    entries.append((257, 3, [h]))
    entries.append((258, 3, [bits] * spp))
    entries.append((259, 3, [compression]))
    entries.append((262, 3, [photometric]))
    entries.append((277, 3, [spp]))
    entries.append((278, 3, [rows_per_strip or h]))
    if predictor:
        entries.append((317, 3, [predictor]))
    if colormap is not None:
        entries.append((320, 3, list(colormap)))
    # strip offsets/counts patched after layout
    n_fixed = len(entries) + 2
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_fixed + 4
    # out-of-line value area
    tail = bytearray()

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    # compute where strips land: after IFD + all out-of-line values
    # first pass: sizes of out-of-line data for fixed entries
    pending = []
    for tag, typ, vals in entries:
        raw = value_bytes(typ, vals)
        pending.append((tag, typ, vals, raw))
    n_strips = len(strips)
    strip_count_vals = [len(s) for s in strips]
    oversize = sum(len(r) for _, _, _, r in pending if len(r) > 4)
    for arr in (strip_count_vals, [0] * n_strips):
        if n_strips * 4 > 4:
            oversize += n_strips * 4
    strips_off = after_ifd + oversize
    offs = []
    pos = strips_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    all_entries = pending + [
        (273, 4, offs, value_bytes(4, offs)),
        (279, 4, strip_count_vals, value_bytes(4, strip_count_vals)),
    ]
    all_entries.sort(key=lambda t: t[0])
    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(all_entries))
    tail_pos = after_ifd
    tail = bytearray()
    for tag, typ, vals, raw in all_entries:
        out += struct.pack(e + "HH", tag, typ)
        out += struct.pack(e + "I", len(vals))
        if len(raw) <= 4:
            out += raw + b"\x00" * (4 - len(raw))
        else:
            out += struct.pack(e + "I", tail_pos)
            tail += raw
            tail_pos += len(raw)
    out += struct.pack(e + "I", 0)
    out += tail
    assert len(out) == strips_off, (len(out), strips_off)
    for s in strips:
        out += s
    return bytes(out)


def _rng(seed):
    return np.random.default_rng(seed)


def _strip_rows(raster: np.ndarray, rps: int):
    h = raster.shape[0]
    return [raster[i : i + rps] for i in range(0, h, rps)]


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


def test_tiff_gray8_both_endians():
    img = _rng(1).integers(0, 256, size=(6, 9), dtype=np.uint8)
    for e in ("<", ">"):
        data = encode_tiff(
            w=9, h=6, bits=8, photometric=1, strips=[img.tobytes()], endian=e
        )
        out = decode_tiff(data)
        assert out.shape == (6, 9, 1)
        assert np.array_equal(out[:, :, 0], img), f"endian={e}"


def test_tiff_gray8_white_is_zero():
    img = _rng(2).integers(0, 256, size=(3, 4), dtype=np.uint8)
    data = encode_tiff(
        w=4, h=3, bits=8, photometric=0, strips=[img.tobytes()]
    )
    assert np.array_equal(decode_tiff(data)[:, :, 0], 255 - img)


def test_tiff_rgb_multi_strip():
    img = _rng(3).integers(0, 256, size=(10, 5, 3), dtype=np.uint8)
    strips = [s.tobytes() for s in _strip_rows(img, 4)]
    data = encode_tiff(
        w=5,
        h=10,
        bits=8,
        photometric=2,
        spp=3,
        strips=strips,
        rows_per_strip=4,
    )
    assert np.array_equal(decode_tiff(data), img)


def test_tiff_rgba_extrasamples_dropped():
    img = _rng(4).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    data = encode_tiff(
        w=4, h=4, bits=8, photometric=2, spp=4, strips=[img.tobytes()]
    )
    assert np.array_equal(decode_tiff(data), img[:, :, :3])


def test_tiff_bilevel_both_photometrics():
    bits = _rng(5).integers(0, 2, size=(5, 11), dtype=np.uint8)
    packed = bytearray()
    for y in range(5):
        row = 0
        acc = bytearray()
        for x in range(11):
            row = (row << 1) | int(bits[y, x])
            if x % 8 == 7:
                acc.append(row)
                row = 0
        acc.append(row << (8 - (11 % 8)))
        packed += acc
    for photo, expect in ((1, bits * 255), (0, (1 - bits) * 255)):
        data = encode_tiff(
            w=11, h=5, bits=1, photometric=photo, strips=[bytes(packed)]
        )
        assert np.array_equal(decode_tiff(data)[:, :, 0], expect)


def test_tiff_gray16_high_byte_both_endians():
    img16 = _rng(6).integers(0, 65536, size=(3, 7), dtype=np.uint16)
    for e, dt in (("<", "<u2"), (">", ">u2")):
        data = encode_tiff(
            w=7,
            h=3,
            bits=16,
            photometric=1,
            strips=[img16.astype(dt).tobytes()],
            endian=e,
        )
        assert np.array_equal(decode_tiff(data)[:, :, 0], (img16 >> 8))


def test_tiff_palette_colormap_high_byte():
    idx = _rng(7).integers(0, 256, size=(4, 6), dtype=np.uint8)
    cmap = []
    for ch in range(3):
        cmap += [((i * (ch + 3)) % 256) << 8 for i in range(256)]
    data = encode_tiff(
        w=6, h=4, bits=8, photometric=3, strips=[idx.tobytes()], colormap=cmap
    )
    out = decode_tiff(data)
    for ch in range(3):
        assert np.array_equal(
            out[:, :, ch], ((idx.astype(int) * (ch + 3)) % 256).astype(np.uint8)
        )


def test_tiff_packbits_roundtrip():
    img = np.zeros((8, 40), dtype=np.uint8)
    img[:, 5:20] = 200  # long runs exercise the repeat branch
    img[:, 25:30] = _rng(8).integers(0, 256, size=(8, 5), dtype=np.uint8)
    strips = [
        _packbits_encode(s.tobytes()) for s in _strip_rows(img, 3)
    ]
    data = encode_tiff(
        w=40,
        h=8,
        bits=8,
        photometric=1,
        strips=strips,
        rows_per_strip=3,
        compression=32773,
    )
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_tiff_lzw_roundtrip_random():
    img = _rng(9).integers(0, 256, size=(20, 64), dtype=np.uint8)
    data = encode_tiff(
        w=64,
        h=20,
        bits=8,
        photometric=1,
        strips=[_lzw_encode(img.tobytes())],
        compression=5,
    )
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_tiff_lzw_early_change_boundary():
    # enough distinct pairs to push the table through 511/1023/2047
    # width boundaries — the early-change divergence from GIF shows up
    # exactly at these codes if either side got the rule wrong
    img = _rng(10).integers(0, 256, size=(40, 120), dtype=np.uint8)
    data = encode_tiff(
        w=120,
        h=40,
        bits=8,
        photometric=1,
        strips=[_lzw_encode(img.tobytes())],
        compression=5,
    )
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_tiff_lzw_with_horizontal_predictor():
    img = _rng(11).integers(0, 256, size=(6, 30), dtype=np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:] = (img[:, 1:].astype(np.int16) - img[:, :-1].astype(np.int16))
    diff = (diff % 256).astype(np.uint8)
    data = encode_tiff(
        w=30,
        h=6,
        bits=8,
        photometric=1,
        strips=[_lzw_encode(diff.tobytes())],
        compression=5,
        predictor=2,
    )
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)


def test_tiff_predictor_rgb_per_sample():
    img = _rng(12).integers(0, 256, size=(3, 8, 3), dtype=np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:, :] = img[:, 1:, :].astype(np.int16) - img[:, :-1, :].astype(
        np.int16
    )
    diff = (diff % 256).astype(np.uint8)
    data = encode_tiff(
        w=8,
        h=3,
        bits=8,
        photometric=2,
        spp=3,
        strips=[diff.tobytes()],
        predictor=2,
    )
    assert np.array_equal(decode_tiff(data), img)


# ---------------------------------------------------------------------------
# Contract corners
# ---------------------------------------------------------------------------


def test_tiff_bad_magic_and_truncation():
    img = _rng(13).integers(0, 256, size=(4, 4), dtype=np.uint8)
    data = encode_tiff(w=4, h=4, bits=8, photometric=1, strips=[img.tobytes()])
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + data[2:])
    with pytest.raises(ValueError):
        decode_tiff(data[: len(data) - 6])


def test_tiff_unsupported_compression_raises():
    data = encode_tiff(
        w=2, h=2, bits=8, photometric=1, strips=[b"\x00" * 4], compression=7
    )
    with pytest.raises(NotImplementedError):
        decode_tiff(data)


def test_synth_tiff_matches_formula():
    for seed, w, h in ((0, 4, 3), (21, 6, 5)):
        img = decode_tiff(synth_tiff_gray(seed, w, h))
        assert img.shape == (h, w, 1)
        for y in range(h):
            for x in range(w):
                assert img[y, x, 0] == (seed * 29 + y * 11 + x * 5) % 241
