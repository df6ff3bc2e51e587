"""Round-7+ baseline-JPEG decode path: canonical-Huffman entropy decode,
dequantize + orthonormal-matrix IDCT, chroma upsample, YCbCr→RGB.

Three independent angles, so an encoder/decoder pair of complementary
bugs can't pass silently:

1. the IDCT basis is checked against a naive O(n^4) textbook DCT
   written here (no shared code with the decoder);
2. a single-MCU flat grayscale JPEG is HAND-ASSEMBLED bit-by-bit in
   the test (no encoder involved) and must decode to the exact flat
   value — an encoder-independent golden;
3. the in-test FORWARD pipeline (level-shift → DCT → quantize →
   zigzag → Huffman with custom uniform-length tables → byte
   stuffing → restart markers) round-trips through the decoder within
   the quantization-error bound, across gray/RGB/4:2:0/odd sizes.

The custom DHT tables (12 DC symbols at 4 bits, 162 AC symbols at
8 bits — canonical, all-ones codes unused) also exercise the decoder's
generic table construction rather than baking in the Annex-K tables.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators import multimodal
from rust_near_indexer_spark.operators.multimodal import _JPEG_ZIGZAG

# --- custom canonical Huffman tables (see module docstring) ---------------

DC_SYMS = bytes(range(12))  # categories 0..11, all at code length 4
AC_SYMS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 13)]
)  # EOB, ZRL, and every (run, size<=12) pair, all at code length 8
# (size up to 12, not the Annex-K 10: a flat quant table of 1s keeps
# full-magnitude AC coefficients, which reach category 11-12)
DC_BITS = [0, 0, 0, 12] + [0] * 12
AC_BITS = [0] * 7 + [len(AC_SYMS)] + [0] * 8

DC_CODE = {sym: (4, i) for i, sym in enumerate(DC_SYMS)}
AC_CODE = {sym: (8, i) for i, sym in enumerate(AC_SYMS)}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self) -> None:
        while self.n:
            self.put(1, 1)

    def marker(self, m: int) -> None:
        self.pad()
        self.out += bytes([0xFF, m])


def _category(v: int) -> int:
    return abs(v).bit_length()


def _magnitude(v: int, n: int) -> int:
    return v if v >= 0 else v + (1 << n) - 1


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(0.5) if k == 0 else 1.0
        for n in range(8):
            a[k, n] = 0.5 * c * math.cos((2 * n + 1) * k * math.pi / 16)
    return a


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    a = _dct_matrix()
    coef = np.round((a @ (block.astype(np.float64) - 128.0) @ a.T) / q).astype(int)
    diff = int(coef[0, 0]) - pred
    n = _category(diff)
    ln, code = DC_CODE[n]
    bw.put(code, ln)
    if n:
        bw.put(_magnitude(diff, n), n)
    zz = [int(coef.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64)]
    k, run = 1, 0
    while k < 64:
        if zz[k] == 0:
            run += 1
        else:
            while run >= 16:
                ln, code = AC_CODE[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _category(zz[k])
            ln, code = AC_CODE[(run << 4) | s]
            bw.put(code, ln)
            bw.put(_magnitude(zz[k], s), s)
            run = 0
        k += 1
    if run:
        ln, code = AC_CODE[0x00]
        bw.put(code, ln)
    return int(coef[0, 0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc: int, tid: int, bits: list[int], vals: bytes) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + vals)


def _encode_jpeg(
    img: np.ndarray,
    subsample: bool = False,
    q_dc: int = 1,
    restart_interval: int = 0,
    sof: int = 0xC0,
) -> bytes:
    """Baseline JPEG encoder: grayscale (HW1) or RGB (HW3); RGB is
    4:4:4, or 4:2:0 with ``subsample`` (chroma = 2x2 block mean)."""
    h, w, nc = img.shape
    q = np.ones((8, 8), np.int64)
    q[0, 0] = q_dc
    head = bytearray(b"\xff\xd8")
    zzq = bytes(int(q.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    head += _seg(0xDB, b"\x00" + zzq)
    if nc == 1:
        comps, samp = [(1, 1, 1, 0)], [(1, 1)]
    elif subsample:
        comps, samp = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)], None
    else:
        comps, samp = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)], None
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv, qid in comps:
        sof_body += bytes([cid, (ch << 4) | cv, qid])
    head += _seg(sof, sof_body)
    head += _dht(0, 0, DC_BITS, DC_SYMS) + _dht(1, 0, AC_BITS, AC_SYMS)
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    sos_body = bytes([len(comps)])
    for cid, *_ in comps:
        sos_body += bytes([cid, 0x00])
    sos_body += bytes([0, 63, 0])
    head += _seg(0xDA, sos_body)

    # planes in YCbCr (BT.601), edge-padded to MCU multiples
    if nc == 1:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    hmax = 2 if subsample else 1
    mh, mw = 8 * hmax, 8 * hmax
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    padded = []
    for i, p in enumerate(planes):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if subsample and i > 0:  # chroma 2x2 mean
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        padded.append(np.round(p).astype(np.int64))

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcux, mcuy = pw // mw, ph // mh
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + (n_rst & 7))
            n_rst += 1
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (_cid, ch, cv, _qid) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(bw, block, q, pred[ci])
    bw.pad()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def _raster(h: int, w: int, c: int, mul: int = 37) -> np.ndarray:
    return (
        (np.arange(h * w * c, dtype=np.int64) * mul % 256)
        .astype(np.uint8)
        .reshape(h, w, c)
    )


# --- 1. the IDCT basis vs a naive textbook DCT ----------------------------


def test_jpeg_idct_matches_naive_dct():
    """A is orthonormal and Aᵀ·(A f Aᵀ)·A == f; the forward transform is
    re-derived here with the O(n^4) direct formula — no shared code."""
    a = multimodal._jpeg_idct_matrix()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(7)
    f = rng.integers(-128, 128, (8, 8)).astype(np.float64)
    naive = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            naive[u, v] = 0.25 * cu * cv * s
    assert np.allclose(a @ f @ a.T, naive, atol=1e-9)
    assert np.allclose(a.T @ naive @ a, f, atol=1e-9)


# --- 2. hand-assembled single-MCU golden (no encoder involved) ------------


def test_jpeg_handrolled_flat_golden():
    """An 8x8 flat gray-160 JPEG assembled bit-by-bit: DC coef =
    8·(160−128) = 256 → category 9, code 1001₂ (symbol 9 at canonical
    4-bit code 9), 9 magnitude bits 100000000₂, EOB = 8 zero bits,
    3 pad one-bits.  Entropy bytes: 10011000 00000000 01111111."""
    zzq = bytes(1 for _ in range(64))
    data = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + zzq)
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + _dht(0, 0, DC_BITS, DC_SYMS)
        + _dht(1, 0, AC_BITS, AC_SYMS)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0b10011000, 0b00000000, 0b00000111])
        + b"\xff\xd9"
    )
    got = multimodal.decode_image(data, {})
    assert got.shape == (8, 8, 1)
    assert np.array_equal(got, np.full((8, 8, 1), 160, np.uint8))


# --- 3. forward-pipeline round trips --------------------------------------


def test_jpeg_flat_gray_exact():
    img = np.full((16, 24, 1), 97, np.uint8)
    got = multimodal.decode_image(_encode_jpeg(img), {})
    assert np.array_equal(got, img)


def test_jpeg_gray_roundtrip_within_quant_error():
    img = _raster(24, 16, 1)
    got = multimodal.decode_image(_encode_jpeg(img), {})
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rgb444_roundtrip():
    img = _raster(16, 16, 3, mul=59)
    got = multimodal.decode_image(_encode_jpeg(img), {})
    assert got.shape == img.shape
    # quant error + YCbCr forward/inverse rounding
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_rgb420_chroma_constant_and_odd_size():
    """4:2:0 with spatially-constant chroma (gray ramp): subsampling is
    lossless, odd dimensions exercise MCU padding + crop."""
    luma = _raster(19, 13, 1, mul=41)
    img = np.repeat(luma, 3, axis=2)
    got = multimodal.decode_image(_encode_jpeg(img, subsample=True), {})
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_restart_interval():
    img = _raster(16, 40, 1, mul=83)
    plain = multimodal.decode_image(_encode_jpeg(img), {})
    rst = multimodal.decode_image(_encode_jpeg(img, restart_interval=2), {})
    assert np.array_equal(plain, rst)
    assert np.abs(rst.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_dc_quantization_applies():
    """q_dc = 32: a flat value decodes to the quantized reconstruction
    (32·round(8·(v−128)/32)/8 + 128), proving the dequantize multiply
    actually happens.  (8·13 = 104; 104/32 = 3.25 → 3 — chosen off the
    .5 boundary so float DCT noise can't flip the rounding.)"""
    img = np.full((8, 8, 1), 141, np.uint8)
    got = multimodal.decode_image(_encode_jpeg(img, q_dc=32), {})
    expect = round(32 * round(8 * (141 - 128) / 32) / 8 + 128)
    assert np.array_equal(got, np.full((8, 8, 1), expect, np.uint8))


def test_jpeg_remaining_sof_contract():
    """Lossless (SOF3) and arithmetic-sequential (SOF9,
    tests/test_jpeg_arith.py) are decoded for real now;
    hierarchical/differential still raise the documented contract."""
    img = _raster(8, 8, 1)
    with pytest.raises(NotImplementedError, match="arithmetic-sequential"):
        multimodal.decode_image(_encode_jpeg(img, sof=0xC5), {})
    with pytest.raises(NotImplementedError, match="arithmetic-sequential"):
        multimodal.decode_image(_encode_jpeg(img, sof=0xCE), {})


# --- progressive JPEG: spectral selection + successive approximation ------

AL = 1  # successive-approximation split: first scans at Al=1, refine to 0


def _plane_coef_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Full quantized DCT coefficients for one padded plane:
    (by, bx, 64) int64 in NATURAL (row-major) order."""
    a = _dct_matrix()
    ph, pw = plane.shape
    by_n, bx_n = ph // 8, pw // 8
    out = np.zeros((by_n, bx_n, 64), np.int64)
    for by in range(by_n):
        for bx in range(bx_n):
            block = plane[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8]
            out[by, bx] = np.round(
                (a @ (block.astype(np.float64) - 128.0) @ a.T) / q
            ).astype(np.int64).reshape(-1)
    return out


def _put_dc_diff(bw: _BitWriter, diff: int) -> None:
    n = _category(diff)
    ln, code = DC_CODE[n]
    bw.put(code, ln)
    if n:
        bw.put(_magnitude(diff, n), n)


def _ac_first_scan_bits(bw, coef, ss, se, al):
    """AC first scan (Ah=0) bits for one block: runs over the
    point-transformed band, EOB per block."""
    run = 0
    for k in range(ss, se + 1):
        v = int(coef[_JPEG_ZIGZAG[k]])
        u = (abs(v) >> al) * (1 if v > 0 else -1)
        if u == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = AC_CODE[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(u)
        ln, code = AC_CODE[(run << 4) | s]
        bw.put(code, ln)
        bw.put(_magnitude(u, s), s)
        run = 0
    if run:
        ln, code = AC_CODE[0x00]  # EOB (EOBRUN = 1: this block only)
        bw.put(code, ln)


def _ac_refine_scan_bits(bw, coef, ss, se, ah, al):
    """AC refinement (Ah>0) bits for one block: the encoder dual of the
    decoder's correction-bit traversal — new ±1<<al coefficients as
    (run, 1) symbols, correction bits interleaved in positional order."""
    zz = _JPEG_ZIGZAG

    def hist_nz(k):  # visible after the previous (Ah) scans
        return (abs(int(coef[zz[k]])) >> ah) != 0

    def corr(k):
        return (abs(int(coef[zz[k]])) >> al) & 1

    def is_new(k):
        v = int(coef[zz[k]])
        return (abs(v) >> ah) == 0 and (abs(v) >> al) != 0

    k = ss
    while k <= se:
        # find the next newly-nonzero coefficient
        nk, r, j = None, 0, k
        while j <= se:
            if is_new(j):
                nk = j
                break
            if not hist_nz(j):
                r += 1
            j += 1
        if nk is None:
            ln, code = AC_CODE[0x00]  # EOB, then tail correction bits
            bw.put(code, ln)
            for j2 in range(k, se + 1):
                if hist_nz(j2):
                    bw.put(corr(j2), 1)
            return
        while r > 15:
            ln, code = AC_CODE[0xF0]  # ZRL: 16 zero-history skips
            bw.put(code, ln)
            skipped = 0
            while skipped < 16:
                if hist_nz(k):
                    bw.put(corr(k), 1)
                else:
                    skipped += 1
                k += 1
            r -= 16
        ln, code = AC_CODE[(r << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if int(coef[zz[nk]]) > 0 else 0, 1)  # sign bit
        while k < nk:  # corrections the decoder reads while skipping
            if hist_nz(k):
                bw.put(corr(k), 1)
            k += 1
        k = nk + 1


def _encode_progressive_jpeg(
    img: np.ndarray,
    q_dc: int = 1,
    bands=((1, 5), (6, 63)),
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG encoder (grayscale or 4:4:4 RGB): DC first scan
    (interleaved, Al=AL), per-component AC first scans over the spectral
    bands (Al=AL), then DC + AC refinement scans down to Al=0 — every
    progressive decode path (DC first/refine, AC first/refine, EOB,
    ZRL-in-refinement, and with ``restart_interval`` the RSTn resync +
    per-scan predictor/EOBRUN reset) gets exercised."""
    h, w, nc = img.shape
    q = np.ones((8, 8), np.int64)
    q[0, 0] = q_dc
    head = bytearray(b"\xff\xd8")
    zzq = bytes(int(q.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    head += _seg(0xDB, b"\x00" + zzq)
    comps = [(i + 1, 1, 1, 0) for i in range(nc)]
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid, ch, cv, qid in comps:
        sof_body += bytes([cid, (ch << 4) | cv, qid])
    head += _seg(0xC2, sof_body)
    head += _dht(0, 0, DC_BITS, DC_SYMS) + _dht(1, 0, AC_BITS, AC_SYMS)
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))

    if nc == 1:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    coefs = [
        _plane_coef_blocks(
            np.round(np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")).astype(
                np.int64
            ),
            q,
        )
        for p in planes
    ]
    by_n, bx_n = ph // 8, pw // 8

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(head)

    def maybe_rst(bw: _BitWriter, m: int, state: list[int]) -> bool:
        # per-scan restart marker (modulo-8 index restarts at each scan)
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + (state[0] & 7))
            state[0] += 1
            return True
        return False

    # scan 1: DC first, interleaved over all components
    out += sos([c[0] for c in comps], 0, 0, 0, AL)
    bw = _BitWriter()
    pred = [0] * nc
    rst = [0]
    for m in range(bx_n * by_n):
        if maybe_rst(bw, m, rst):
            pred = [0] * nc  # restart resets the DC predictor
        my, mx = divmod(m, bx_n)
        for ci in range(nc):
            v = int(coefs[ci][my, mx, 0]) >> AL  # arithmetic point transform
            _put_dc_diff(bw, v - pred[ci])
            pred[ci] = v
    bw.pad()
    out += bytes(bw.out)
    # AC first scans: per component, per band
    for ci, (cid, *_rest) in enumerate(comps):
        for ss, se in bands:
            out += sos([cid], ss, se, 0, AL)
            bw = _BitWriter()
            rst = [0]
            for m in range(bx_n * by_n):
                maybe_rst(bw, m, rst)  # EOBRUN is per-block here anyway
                my, mx = divmod(m, bx_n)
                _ac_first_scan_bits(bw, coefs[ci][my, mx], ss, se, AL)
            bw.pad()
            out += bytes(bw.out)
    # DC refinement (interleaved): one bit per block
    out += sos([c[0] for c in comps], 0, 0, AL, 0)
    bw = _BitWriter()
    rst = [0]
    for m in range(bx_n * by_n):
        maybe_rst(bw, m, rst)
        my, mx = divmod(m, bx_n)
        for ci in range(nc):
            bw.put(int(coefs[ci][my, mx, 0]) & 1, 1)
    bw.pad()
    out += bytes(bw.out)
    # AC refinement scans
    for ci, (cid, *_rest) in enumerate(comps):
        for ss, se in bands:
            out += sos([cid], ss, se, AL, 0)
            bw = _BitWriter()
            rst = [0]
            for m in range(bx_n * by_n):
                maybe_rst(bw, m, rst)
                my, mx = divmod(m, bx_n)
                _ac_refine_scan_bits(bw, coefs[ci][my, mx], ss, se, AL, 0)
            bw.pad()
            out += bytes(bw.out)
    return bytes(out) + b"\xff\xd9"


def test_jpeg_progressive_gray_equals_baseline_decode():
    """All scans together carry every coefficient bit, so the
    progressive decode must equal the BASELINE decode of the same image
    bit-for-bit (same coefficients → same IDCT → same pixels)."""
    img = _raster(16, 16, 1)
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(_encode_progressive_jpeg(img))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_jpeg_progressive_odd_size_gray():
    img = _raster(20, 12, 1)
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(_encode_progressive_jpeg(img))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_rgb444():
    img = _raster(17, 23, 3)
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(_encode_progressive_jpeg(img))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_sparse_exercises_zrl_and_eob():
    """A nearly-flat image with a few isolated hot pixels produces long
    zero runs in the wide 6..63 band — ZRL symbols in both first and
    refinement AC scans, plus EOB tails with correction bits."""
    img = np.full((24, 24, 1), 128, np.uint8)
    img[3, 5, 0] = 255
    img[10, 19, 0] = 0
    img[21, 2, 0] = 200
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(_encode_progressive_jpeg(img))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_roundtrip_within_quant_error():
    """And against the ORIGINAL image (not just the baseline decode):
    flat quant tables bound the spatial error like the baseline suite."""
    img = _raster(16, 16, 3)
    prog = multimodal._decode_jpeg(_encode_progressive_jpeg(img))
    assert np.max(np.abs(prog.astype(int) - img.astype(int))) <= 24


def test_jpeg_progressive_three_bands():
    """A 3-band spectral script (1..2, 3..20, 21..63) reshuffles which
    scan carries which coefficients; the reconstruction must not care."""
    img = _raster(16, 24, 1)
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(
        _encode_progressive_jpeg(img, bands=((1, 2), (3, 20), (21, 63)))
    )
    assert np.array_equal(prog, base)


def test_jpeg_decoded_stats_end_to_end(spark):
    """JPEG payloads through the real Spark mapInPandas decode path —
    dims exact, mean within the quantization error of the source."""
    img = _raster(24, 17, 3, mul=29)
    payload = _encode_jpeg(img)
    media = spark.createDataFrame(
        [(3, "image", bytearray(payload), None)], multimodal.MEDIA_SCHEMA
    )
    got = multimodal.decoded_stats(media).collect()
    assert len(got) == 1
    r = got[0].asDict()
    vals = img.reshape(-1).astype(np.int64)
    assert (r["dim0"], r["dim1"], r["n_values"]) == (24, 17, int(vals.size))
    assert abs(r["mean_milli"] - int(vals.sum() * 1000 // vals.size)) <= 4000


def test_jpeg_progressive_restart_intervals():
    """Restart markers inside EVERY progressive scan type (DC first,
    AC first, DC refine, AC refine): the decoder must byte-align,
    consume RSTn with the per-scan modulo-8 index, and reset the DC
    predictor — still bit-identical to the baseline decode."""
    img = _raster(32, 24, 1, mul=53)
    base = multimodal._decode_jpeg(_encode_jpeg(img))
    prog = multimodal._decode_jpeg(
        _encode_progressive_jpeg(img, restart_interval=3)
    )
    assert np.array_equal(prog, base)
    # and for RGB with a different interval
    img3 = _raster(16, 16, 3, mul=31)
    base3 = multimodal._decode_jpeg(_encode_jpeg(img3))
    prog3 = multimodal._decode_jpeg(
        _encode_progressive_jpeg(img3, restart_interval=2)
    )
    assert np.array_equal(prog3, base3)


# --- lossless JPEG (SOF3, T.81 process 14 / annex H) -----------------------
#
# Independent in-test encoder: prediction rules re-derived from the spec
# text (H.1.2.1), its own canonical DC table (17 categories at length
# 5), restart markers, byte stuffing via the shared _BitWriter.

_LL_DC_BITS = [0, 0, 0, 0, 17] + [0] * 11  # categories 0..16, all len 5
_LL_DC_VALS = bytes(range(17))


def _ll_predict(plane, y, x, predictor, default, rst_y, rst_x):
    if (y, x) == (rst_y, rst_x):
        return default
    if y == rst_y:  # rest of the interval's first line: Ra
        return int(plane[y, x - 1])
    if x == 0:  # later lines start from Rb
        return int(plane[y - 1, x])
    a, b, c = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    return {
        1: a,
        2: b,
        3: c,
        4: a + b - c,
        5: a + ((b - c) >> 1),
        6: b + ((a - c) >> 1),
        7: (a + b) >> 1,
    }[predictor]


def _encode_lossless_jpeg(
    img: np.ndarray, predictor: int = 1, pt: int = 0, restart: int = 0,
    sampling: int = 0x11,
) -> bytes:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    planes = [(img[:, :, c].astype(np.int64) >> pt) for c in range(nc)]
    head = bytearray(b"\xff\xd8")
    head += _dht(0, 0, _LL_DC_BITS, _LL_DC_VALS)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, sampling, 0])
    head += _seg(0xC3, bytes(sof))
    if restart:
        head += _seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    head += _seg(0xDA, bytes(sos))
    bw = _BitWriter()
    default = 1 << (8 - 1 - pt)
    rst_y, rst_x, mcu, rst = 0, 0, 0, 0
    for y in range(h):
        for x in range(w):
            if restart and mcu and mcu % restart == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                rst_y, rst_x = y, x
            for plane in planes:
                p = _ll_predict(plane, y, x, predictor, default, rst_y, rst_x)
                d = int(plane[y, x]) - p
                n = _category(d)
                bw.put(n, 5)  # canonical len-5 code for category n is n
                if n:
                    bw.put(_magnitude(d, n), n)
            mcu += 1
    bw.pad()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_jpeg_lossless_gray_exact_all_predictors(predictor):
    rng = np.random.RandomState(predictor)
    img = rng.randint(0, 256, size=(9, 7)).astype(np.uint8)
    got = multimodal.decode_image(_encode_lossless_jpeg(img, predictor), {})
    assert got.shape == (9, 7, 1)
    assert np.array_equal(got[:, :, 0], img)


def test_jpeg_lossless_rgb_interleaved_exact():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(6, 11, 3)).astype(np.uint8)
    got = multimodal.decode_image(_encode_lossless_jpeg(img, predictor=4), {})
    # no color transform: T.81 defines none for lossless — planes verbatim
    assert np.array_equal(got, img)


@pytest.mark.parametrize("restart", [3, 5, 8])
def test_jpeg_lossless_restart_intervals(restart):
    """Restart both at row boundaries and mid-row: the sample after each
    RSTn uses the default prediction and the rest of that line uses Ra."""
    rng = np.random.RandomState(restart)
    img = rng.randint(0, 256, size=(8, 6)).astype(np.uint8)
    got = multimodal.decode_image(
        _encode_lossless_jpeg(img, predictor=2, restart=restart), {}
    )
    assert np.array_equal(got[:, :, 0], img)


def test_jpeg_lossless_point_transform():
    """Pt=1: samples are stored >>1 and reconstructed <<1 — exact when
    the source is even-valued."""
    rng = np.random.RandomState(7)
    img = (rng.randint(0, 128, size=(5, 5)) * 2).astype(np.uint8)
    got = multimodal.decode_image(_encode_lossless_jpeg(img, 1, pt=1), {})
    assert np.array_equal(got[:, :, 0], img)


def test_jpeg_lossless_contract_corners():
    img = _raster(8, 8, 1)
    with pytest.raises(NotImplementedError, match="subsampled lossless"):
        multimodal.decode_image(
            _encode_lossless_jpeg(img[:, :, 0], sampling=0x21), {}
        )
    bad = _encode_lossless_jpeg(img[:, :, 0], predictor=1)
    # corrupt the SOS predictor selector to 0 (out of the 1..7 domain):
    # Ss is the 3rd byte from the end of the SOS header
    idx = bad.index(b"\xff\xda") + 2 + 2 + 1 + 2
    with pytest.raises(ValueError, match="predictor"):
        multimodal.decode_image(bad[:idx] + b"\x00" + bad[idx + 1 :], {})
