"""VP8 keyframe (intra) decoder — RFC 6386, the WebP lossy path.

Pure-Python implementation of the complete VP8 key-frame decode:
boolean arithmetic decoder (SS 7), frame/segmentation/loop-filter
headers (SS 9), token-partition handling (SS 9.5), per-macroblock
intra mode parsing with the keyframe mode contexts (SS 11.5), DCT/WHT
coefficient token decode with per-band contexts (SS 13), dequantization
(SS 14.1), inverse WHT/DCT (SS 14.3), all intra prediction modes incl.
the ten 4x4 B-modes (SS 12), and both normal and simple in-loop
deblocking filters (SS 15).

Output is the native YUV 4:2:0 of the codec.  Correctness gate:
tests/test_vp8_codec.py golden-compares this decoder BIT-EXACT in YUV
against the system libwebp (operators/webp_native.py) across encoder
settings that exercise segmentation, multiple token partitions, both
filter types and B_PRED-heavy content — two independent
implementations of the published spec agreeing on every byte.

Non-keyframe streams raise NotImplementedError (WebP never contains
them; a VP8 chunk is a keyframe by construction).  Constant tables
live in vp8_tables.py (RFC 6386 SS 13.4-13.5/SS 14.1 values).

Reference parity note: the reference engine (rust-near-indexer) has no
media surface at all; this module belongs to the beyond-reference LLM
training-data pipeline (SURVEY SS 2B multimodal), replacing the former
NotImplementedError for lossy WebP in operators/webp.py.
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_B_MODE_PROBS,
)

# ---------------------------------------------------------------------------
# Mode enums (RFC 6386 SS 11.2-11.5)
# ---------------------------------------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
B_MODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
    -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# 16x16/chroma mode of a non-B_PRED neighbor, as seen by the 4x4
# keyframe mode context (RFC 6386 SS 11.5)
_MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# DCT token categories: (base value, extra-bit probabilities)
_CAT_PROBS = (
    (5, (159,)),
    (7, (165, 145)),
    (11, (173, 148, 140)),
    (19, (176, 155, 140, 135)),
    (35, (180, 157, 141, 134, 130)),
    (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
)


class BoolDecoder:
    """RFC 6386 SS 7.3 boolean arithmetic decoder."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        if len(data) < 2:
            data = data + b"\x00" * (2 - len(data))
        self.data = data
        self.value = (data[0] << 8) | data[1]
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, n: int) -> int:
        """Magnitude-then-sign (the 'L(n) + sign' header fields)."""
        v = self.literal(n)
        return -v if self.bit(128) else v

    def flagged_signed(self, n: int) -> int:
        """Optional field: present-flag, then magnitude+sign."""
        return self.signed(n) if self.bit(128) else 0

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


class _Quant:
    __slots__ = ("y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac")

    def __init__(self, q, ydc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d):
        self.y1dc = DC_QLOOKUP[_clamp_q(q + ydc_d)]
        self.y1ac = AC_QLOOKUP[_clamp_q(q)]
        self.y2dc = DC_QLOOKUP[_clamp_q(q + y2dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + y2ac_d)] * 155 // 100
        self.y2ac = max(y2ac, 8)
        uvdc = DC_QLOOKUP[_clamp_q(q + uvdc_d)]
        self.uvdc = min(uvdc, 132)
        self.uvac = AC_QLOOKUP[_clamp_q(q + uvac_d)]


def _read_coeffs(bd, probs_type, ctx, first, dq_dc, dq_ac):
    """Token-decode one 4x4 block → (coeffs16 np.int32 in raster
    order, dequantized; has_nonzero)."""
    out = np.zeros(16, dtype=np.int32)
    i = first
    eob_allowed = True
    nonzero = False
    while i < 16:
        pr = probs_type[COEFF_BANDS[i]][ctx]
        if eob_allowed and not _bit(bd, pr[0]):
            break
        if not _bit(bd, pr[1]):  # DCT_0
            i += 1
            ctx = 0
            eob_allowed = False
            continue
        eob_allowed = True
        if not _bit(bd, pr[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not _bit(bd, pr[3]):
                if not _bit(bd, pr[4]):
                    val = 2
                else:
                    val = 4 if _bit(bd, pr[5]) else 3
            else:
                if not _bit(bd, pr[6]):
                    cat = 1 if _bit(bd, pr[7]) else 0
                elif not _bit(bd, pr[8]):
                    cat = 3 if _bit(bd, pr[9]) else 2
                else:
                    cat = 5 if _bit(bd, pr[10]) else 4
                base, cps = _CAT_PROBS[cat]
                extra = 0
                for p in cps:
                    extra = (extra << 1) | _bit(bd, p)
                val = base + extra
        if _bit(bd, 128):
            val = -val
        out[ZIGZAG[i]] = val * (dq_dc if i == 0 else dq_ac)
        nonzero = True
        i += 1
    return out, nonzero


def _bit(bd, prob):
    return bd.bit(prob)


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 SS 14.3) — exact integer arithmetic
# ---------------------------------------------------------------------------
_C1 = 20091  # (cos(pi/8)*sqrt(2) - 1) << 16
_C2 = 35468  # sin(pi/8)*sqrt(2) << 16
_ZERO4 = np.zeros((4, 4), dtype=np.int32)


def _idct4x4(block):
    """16 dequantized coeffs (raster) → 4x4 residual (int).  Zero and
    DC-only blocks take constant fast paths (exact: with only ip[0]
    set, both passes reduce to (dc + 4) >> 3 in every cell — the same
    shortcut libwebp's TransformDC takes)."""
    ip = [int(v) for v in block]
    if not any(ip[1:]):
        if not ip[0]:
            return _ZERO4
        return np.full((4, 4), (ip[0] + 4) >> 3, dtype=np.int32)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = tmp[4 * i : 4 * i + 4]
        a1 = r[0] + r[2]
        b1 = r[0] - r[2]
        t1 = (r[1] * _C2) >> 16
        t2 = r[3] + ((r[3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = r[1] + ((r[1] * _C1) >> 16)
        t2 = (r[3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(block):
    """Inverse Walsh-Hadamard for the Y2 block → 16 DC values (raster)."""
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = tmp[4 * i : 4 * i + 4]
        a1 = r[0] + r[3]
        b1 = r[1] + r[2]
        c1 = r[1] - r[2]
        d1 = r[0] - r[3]
        out[4 * i + 0] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 SS 12)
# ---------------------------------------------------------------------------
def _pred_dc(above, left, have_a, have_l, size):
    if have_a and have_l:
        s = int(above.sum()) + int(left.sum())
        return (s + size) >> (5 if size == 16 else 4)
    if have_a:
        return (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
    if have_l:
        return (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
    return 128


def _pred_block(mode, above, left, al, size, have_a, have_l):
    """Whole-block (16x16 luma / 8x8 chroma) prediction."""
    if mode == DC_PRED:
        return np.full((size, size), _pred_dc(above, left, have_a, have_l, size), dtype=np.int32)
    if mode == V_PRED:
        return np.tile(above.astype(np.int32), (size, 1))
    if mode == H_PRED:
        return np.tile(left.astype(np.int32).reshape(size, 1), (1, size))
    # TM_PRED
    p = left.astype(np.int32).reshape(size, 1) + above.astype(np.int32) - int(al)
    return np.clip(p, 0, 255)


def _avg2(a, b):
    return (int(a) + int(b) + 1) >> 1


def _avg3(a, b, c):
    return (int(a) + 2 * int(b) + int(c) + 2) >> 2


def _pred_b(mode, A, L, P):
    """4x4 subblock prediction.  A = 8 above pixels (incl. above-right),
    L = 4 left, P = above-left."""
    out = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        out[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
        return out
    if mode == B_TM:
        p = L.astype(np.int32).reshape(4, 1) + A[:4].astype(np.int32) - int(P)
        return np.clip(p, 0, 255)
    if mode == B_VE:
        row = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        out[:] = row
        return out
    if mode == B_HE:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        for r in range(4):
            out[r, :] = col[r]
        return out
    if mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    out[r, c] = _avg3(A[6], A[7], A[7])
        return out
    # modes using the 9-pixel edge array E = L[3..0], P, A[0..3]
    E = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), int(P),
         int(A[0]), int(A[1]), int(A[2]), int(A[3])]
    if mode == B_RD:
        for r in range(4):
            for c in range(4):
                i = 3 + c - r
                out[r, c] = _avg3(E[i], E[i + 1], E[i + 2])
        return out
    if mode == B_VR:
        out[3, 0] = _avg3(E[1], E[2], E[3])
        out[2, 0] = _avg3(E[2], E[3], E[4])
        out[3, 1] = out[1, 0] = _avg3(E[3], E[4], E[5])
        out[2, 1] = out[0, 0] = _avg2(E[4], E[5])
        out[3, 2] = out[1, 1] = _avg3(E[4], E[5], E[6])
        out[2, 2] = out[0, 1] = _avg2(E[5], E[6])
        out[3, 3] = out[1, 2] = _avg3(E[5], E[6], E[7])
        out[2, 3] = out[0, 2] = _avg2(E[6], E[7])
        out[1, 3] = _avg3(E[6], E[7], E[8])
        out[0, 3] = _avg2(E[7], E[8])
        return out
    if mode == B_VL:
        out[0, 0] = _avg2(A[0], A[1])
        out[1, 0] = _avg3(A[0], A[1], A[2])
        out[2, 0] = out[0, 1] = _avg2(A[1], A[2])
        out[1, 1] = out[3, 0] = _avg3(A[1], A[2], A[3])
        out[2, 1] = out[0, 2] = _avg2(A[2], A[3])
        out[3, 1] = out[1, 2] = _avg3(A[2], A[3], A[4])
        out[2, 2] = out[0, 3] = _avg2(A[3], A[4])
        out[3, 2] = out[1, 3] = _avg3(A[3], A[4], A[5])
        out[2, 3] = _avg3(A[4], A[5], A[6])
        out[3, 3] = _avg3(A[5], A[6], A[7])
        return out
    if mode == B_HD:
        out[3, 0] = _avg2(E[0], E[1])
        out[3, 1] = _avg3(E[0], E[1], E[2])
        out[2, 0] = out[3, 2] = _avg2(E[1], E[2])
        out[2, 1] = out[3, 3] = _avg3(E[1], E[2], E[3])
        out[2, 2] = out[1, 0] = _avg2(E[2], E[3])
        out[2, 3] = out[1, 1] = _avg3(E[2], E[3], E[4])
        out[1, 2] = out[0, 0] = _avg2(E[3], E[4])
        out[1, 3] = out[0, 1] = _avg3(E[3], E[4], E[5])
        out[0, 2] = _avg3(E[4], E[5], E[6])
        out[0, 3] = _avg3(E[5], E[6], E[7])
        return out
    if mode == B_HU:
        out[0, 0] = _avg2(L[0], L[1])
        out[0, 1] = _avg3(L[0], L[1], L[2])
        out[0, 2] = out[1, 0] = _avg2(L[1], L[2])
        out[0, 3] = out[1, 1] = _avg3(L[1], L[2], L[3])
        out[1, 2] = out[2, 0] = _avg2(L[2], L[3])
        out[1, 3] = out[2, 1] = _avg3(L[2], L[3], L[3])
        out[2, 2] = out[2, 3] = int(L[3])
        out[3, :] = int(L[3])
        return out
    raise ValueError(f"bad 4x4 mode {mode}")


# ---------------------------------------------------------------------------
# Frame-level decode
# ---------------------------------------------------------------------------
class _Header:
    pass


def _parse_header(bd: BoolDecoder, keyframe: bool) -> _Header:
    h = _Header()
    if keyframe:
        h.color_space = bd.literal(1)
        h.clamping = bd.literal(1)
    h.seg_enabled = bd.literal(1)
    h.seg_probs = [255, 255, 255]
    h.update_map = 0
    h.seg_abs = 1
    h.seg_quant = [0, 0, 0, 0]
    h.seg_filter = [0, 0, 0, 0]
    if h.seg_enabled:
        h.update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            h.seg_abs = bd.literal(1)
            for i in range(4):
                h.seg_quant[i] = bd.flagged_signed(7)
            for i in range(4):
                h.seg_filter[i] = bd.flagged_signed(6)
        if h.update_map:
            for i in range(3):
                h.seg_probs[i] = bd.literal(8) if bd.bit(128) else 255
    h.filter_type = bd.literal(1)
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.literal(1)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.literal(1):  # update
            for i in range(4):
                if bd.bit(128):
                    h.ref_lf_deltas[i] = bd.signed(6)
            for i in range(4):
                if bd.bit(128):
                    h.mode_lf_deltas[i] = bd.signed(6)
    h.n_parts = 1 << bd.literal(2)
    h.y_ac_qi = bd.literal(7)
    h.ydc_d = bd.flagged_signed(4)
    h.y2dc_d = bd.flagged_signed(4)
    h.y2ac_d = bd.flagged_signed(4)
    h.uvdc_d = bd.flagged_signed(4)
    h.uvac_d = bd.flagged_signed(4)
    h.refresh_entropy = bd.literal(1)
    # coefficient probability updates
    probs = [[[list(c) for c in b] for b in t] for t in COEFF_PROBS]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p in range(11):
                    if bd.bit(up[p]):
                        row[p] = bd.literal(8)
    h.coeff_probs = probs
    h.mb_no_skip = bd.literal(1)
    h.prob_skip_false = bd.literal(8) if h.mb_no_skip else 0
    return h


def decode_vp8(data: bytes):
    """VP8 frame bytes (the WebP 'VP8 ' chunk payload) → (Y, U, V)
    uint8 planes (Y is h x w; U/V are ceil-half dimensions)."""
    data = bytes(data)
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    keyframe = not (tag & 1)
    part0 = tag >> 5
    if not keyframe:
        raise NotImplementedError(
            "VP8 interframe (WebP stills are always keyframes)"
        )
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero VP8 dimensions")
    if 10 + part0 > len(data):
        raise ValueError("truncated VP8 first partition")
    bd = BoolDecoder(data[10 : 10 + part0])
    hd = _parse_header(bd, keyframe)

    # token partitions
    rest = data[10 + part0 :]
    sizes_len = 3 * (hd.n_parts - 1)
    if len(rest) < sizes_len:
        raise ValueError("truncated VP8 partition size table")
    parts = []
    off = sizes_len
    for i in range(hd.n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        if off + sz > len(rest):
            raise ValueError("truncated VP8 token partition")
        parts.append(BoolDecoder(rest[off : off + sz]))
        off += sz
    parts.append(BoolDecoder(rest[off:]))

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    quants = []
    for s in range(4):
        if hd.seg_enabled:
            q = hd.seg_quant[s] if hd.seg_abs else hd.y_ac_qi + hd.seg_quant[s]
        else:
            q = hd.y_ac_qi
        quants.append(
            _Quant(_clamp_q(q), hd.ydc_d, hd.y2dc_d, hd.y2ac_d,
                   hd.uvdc_d, hd.uvac_d)
        )

    # reconstruction buffers with 1-pixel top/left borders (above row =
    # 127, left col = 129, RFC SS 12.2) and 4 extra right columns for
    # above-right prediction
    Y = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 127, dtype=np.uint8)
    U = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, dtype=np.uint8)
    V = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, dtype=np.uint8)
    Y[1:, 0] = 129
    U[1:, 0] = 129
    V[1:, 0] = 129

    # nonzero contexts
    above_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_y2 = np.zeros(mb_w, dtype=np.int8)
    # per-MB info for the loop filter
    mb_info = []
    # keyframe B-mode contexts
    above_bmodes = np.full((mb_w, 4), B_DC, dtype=np.int8)

    cp = hd.coeff_probs
    for my in range(mb_h):
        left_y = np.zeros(4, dtype=np.int8)
        left_u = np.zeros(2, dtype=np.int8)
        left_v = np.zeros(2, dtype=np.int8)
        left_y2 = 0
        left_bmodes = np.full(4, B_DC, dtype=np.int8)
        tb = parts[my % hd.n_parts]
        for mx in range(mb_w):
            seg = 0
            if hd.seg_enabled and hd.update_map:
                seg = bd.tree(SEGMENT_TREE, hd.seg_probs)
            skip = bd.bit(hd.prob_skip_false) if hd.mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = np.empty((4, 4), dtype=np.int8)
                for r in range(4):
                    for c in range(4):
                        a = above_bmodes[mx][c] if r == 0 else bmodes[r - 1][c]
                        l = (left_bmodes[r] if c == 0 else bmodes[r][c - 1])
                        bmodes[r][c] = bd.tree(
                            B_MODE_TREE, KF_B_MODE_PROBS[a][l]
                        )
                above_bmodes[mx] = bmodes[3]
                left_bmodes[:] = bmodes[:, 3]
            else:
                bm = _MODE_TO_BMODE[ymode]
                bmodes = None
                above_bmodes[mx] = bm
                left_bmodes[:] = bm
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            q = quants[seg]
            has_y2 = ymode != B_PRED
            ycoeffs = np.zeros((16, 16), dtype=np.int32)
            ucoeffs = np.zeros((4, 16), dtype=np.int32)
            vcoeffs = np.zeros((4, 16), dtype=np.int32)
            mb_nonzero = False
            if skip:
                left_y[:] = 0
                left_u[:] = 0
                left_v[:] = 0
                above_y[mx] = 0
                above_u[mx] = 0
                above_v[mx] = 0
                if has_y2:
                    left_y2 = 0
                    above_y2[mx] = 0
            else:
                if has_y2:
                    ctx = int(above_y2[mx]) + int(left_y2)
                    y2c, nz = _read_coeffs(tb, cp[1], ctx, 0, q.y2dc, q.y2ac)
                    above_y2[mx] = left_y2 = 1 if nz else 0
                    dcs = _iwht4x4(y2c)
                    mb_nonzero |= nz
                    ytype, yfirst = 0, 1
                else:
                    dcs = None
                    ytype, yfirst = 3, 0
                for b in range(16):
                    r, c = b >> 2, b & 3
                    ctx = int(above_y[mx][c]) + int(left_y[r])
                    coeffs, nz = _read_coeffs(
                        tb, cp[ytype], ctx, yfirst, q.y1dc, q.y1ac
                    )
                    if dcs is not None:
                        coeffs[0] = dcs[b]
                    ycoeffs[b] = coeffs
                    above_y[mx][c] = left_y[r] = 1 if nz else 0
                    mb_nonzero |= nz
                for plane, coeff_arr, actx, lctx in (
                    (0, ucoeffs, above_u, left_u),
                    (1, vcoeffs, above_v, left_v),
                ):
                    for b in range(4):
                        r, c = b >> 1, b & 1
                        ctx = int(actx[mx][c]) + int(lctx[r])
                        coeffs, nz = _read_coeffs(
                            tb, cp[2], ctx, 0, q.uvdc, q.uvac
                        )
                        coeff_arr[b] = coeffs
                        actx[mx][c] = lctx[r] = 1 if nz else 0
                        mb_nonzero |= nz
                if has_y2 and dcs is not None:
                    mb_nonzero |= any(d != 0 for d in dcs)

            # ---- reconstruction ----
            y0, x0 = 1 + my * 16, 1 + mx * 16
            have_a, have_l = my > 0, mx > 0
            if has_y2:
                above = Y[y0 - 1, x0 : x0 + 16]
                left = Y[y0 : y0 + 16, x0 - 1]
                al = Y[y0 - 1, x0 - 1]
                pred = _pred_block(ymode, above, left, al, 16, have_a, have_l)
                for b in range(16):
                    r, c = b >> 2, b & 3
                    res = _idct4x4(ycoeffs[b])
                    blk = pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + res
                    Y[y0 + 4 * r : y0 + 4 * r + 4, x0 + 4 * c : x0 + 4 * c + 4] = np.clip(blk, 0, 255)
            else:
                # B_PRED: subblocks predicted from reconstructed pixels
                if mx == mb_w - 1:
                    # rightmost MB: above-right pixels beyond the frame
                    # replicate the last above pixel of this MB row
                    Y[y0 - 1, x0 + 16 : x0 + 20] = Y[y0 - 1, x0 + 15]
                tr_row = Y[y0 - 1, x0 + 16 : x0 + 20].copy()
                for b in range(16):
                    r, c = b >> 2, b & 3
                    by, bx = y0 + 4 * r, x0 + 4 * c
                    if c == 3 and r > 0:
                        A = np.concatenate([Y[by - 1, bx : bx + 4], tr_row])
                    else:
                        A = Y[by - 1, bx : bx + 8]
                    L = Y[by : by + 4, bx - 1]
                    P = Y[by - 1, bx - 1]
                    pred = _pred_b(int(bmodes[r][c]), A, L, P)
                    res = _idct4x4(ycoeffs[b])
                    Y[by : by + 4, bx : bx + 4] = np.clip(pred + res, 0, 255)
            cy0, cx0 = 1 + my * 8, 1 + mx * 8
            for plane, coeff_arr in ((U, ucoeffs), (V, vcoeffs)):
                above = plane[cy0 - 1, cx0 : cx0 + 8]
                left = plane[cy0 : cy0 + 8, cx0 - 1]
                al = plane[cy0 - 1, cx0 - 1]
                pred = _pred_block(uvmode, above, left, al, 8, have_a, have_l)
                for b in range(4):
                    r, c = b >> 1, b & 1
                    res = _idct4x4(coeff_arr[b])
                    blk = pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + res
                    plane[cy0 + 4 * r : cy0 + 4 * r + 4, cx0 + 4 * c : cx0 + 4 * c + 4] = np.clip(blk, 0, 255)

            mb_info.append((seg, ymode, mb_nonzero))

    if hd.filter_level:
        _loop_filter(Y, U, V, mb_w, mb_h, hd, mb_info)

    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (
        Y[1 : 1 + h, 1 : 1 + w].copy(),
        U[1 : 1 + ch, 1 : 1 + cw].copy(),
        V[1 : 1 + ch, 1 : 1 + cw].copy(),
    )


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 SS 15)
# ---------------------------------------------------------------------------
def _s(v):
    return int(v) - 128


def _u(v):
    return np.uint8((max(-128, min(127, v))) + 128)


def _c7(v):
    return max(-128, min(127, v))


def _common_adjust(px, i, step, use_outer):
    p1, p0, q0, q1 = (_s(px[i - 2 * step]), _s(px[i - step]),
                      _s(px[i]), _s(px[i + step]))
    a = _c7((_c7(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    # RFC 6386 15.3: F = c(a+4)>>3 adjusts q0, E = c(a+3)>>3 adjusts
    # p0, and the RETURN is F (the subblock filter derives its outer
    # q1/p1 taps from (F+1)>>1, not from the raw clamped a).
    f = _c7(a + 4) >> 3
    e = _c7(a + 3) >> 3
    px[i] = _u(q0 - f)
    px[i - step] = _u(p0 + e)
    return f


def _filter_yes(px, i, step, interior, edge):
    p3, p2, p1, p0 = (_s(px[i - 4 * step]), _s(px[i - 3 * step]),
                      _s(px[i - 2 * step]), _s(px[i - step]))
    q0, q1, q2, q3 = (_s(px[i]), _s(px[i + step]),
                      _s(px[i + 2 * step]), _s(px[i + 3 * step]))
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q3 - q2) <= interior
        and abs(q2 - q1) <= interior and abs(q1 - q0) <= interior
    )


def _hev(px, i, step, thresh):
    p1, p0 = _s(px[i - 2 * step]), _s(px[i - step])
    q0, q1 = _s(px[i]), _s(px[i + step])
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _mb_filter(px, i, step, hev_t, interior, edge):
    if not _filter_yes(px, i, step, interior, edge):
        return
    if _hev(px, i, step, hev_t):
        _common_adjust(px, i, step, True)
        return
    p2, p1, p0 = (_s(px[i - 3 * step]), _s(px[i - 2 * step]), _s(px[i - step]))
    q0, q1, q2 = (_s(px[i]), _s(px[i + step]), _s(px[i + 2 * step]))
    w = _c7(_c7(p1 - q1) + 3 * (q0 - p0))
    a = _c7((27 * w + 63) >> 7)
    px[i] = _u(q0 - a)
    px[i - step] = _u(p0 + a)
    a = _c7((18 * w + 63) >> 7)
    px[i + step] = _u(q1 - a)
    px[i - 2 * step] = _u(p1 + a)
    a = _c7((9 * w + 63) >> 7)
    px[i + 2 * step] = _u(q2 - a)
    px[i - 3 * step] = _u(p2 + a)


def _sb_filter(px, i, step, hev_t, interior, edge):
    if not _filter_yes(px, i, step, interior, edge):
        return
    hv = _hev(px, i, step, hev_t)
    a = (_common_adjust(px, i, step, hv) + 1) >> 1
    if not hv:
        q1, p1 = _s(px[i + step]), _s(px[i - 2 * step])
        px[i + step] = _u(q1 - a)
        px[i - 2 * step] = _u(p1 + a)


def _simple_filter(px, i, step, edge):
    p1, p0, q0, q1 = (_s(px[i - 2 * step]), _s(px[i - step]),
                      _s(px[i]), _s(px[i + step]))
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge:
        _common_adjust(px, i, step, True)


def _filter_edge(plane, x_edge, y_range, x_range, vertical, fn, *args):
    """Apply a 1-D filter function along an edge.  plane is the padded
    2-D array; the function sees a flat view with the right step."""
    flat = plane.reshape(-1)
    stride = plane.shape[1]
    if vertical:  # vertical edge: filter horizontally across column x_edge
        for y in y_range:
            fn(flat, y * stride + x_edge, 1, *args)
    else:  # horizontal edge at row x_edge
        for x in x_range:
            fn(flat, x_edge * stride + x, stride, *args)


def _loop_filter(Y, U, V, mb_w, mb_h, hd, mb_info):
    sharp = hd.sharpness
    for my in range(mb_h):
        for mx in range(mb_w):
            seg, ymode, nonzero = mb_info[my * mb_w + mx]
            lvl = hd.filter_level
            if hd.seg_enabled:
                lvl = (hd.seg_filter[seg] if hd.seg_abs
                       else lvl + hd.seg_filter[seg])
            if hd.lf_delta_enabled:
                lvl += hd.ref_lf_deltas[0]  # intra frame
                if ymode == B_PRED:
                    lvl += hd.mode_lf_deltas[0]
            lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            interior = lvl
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                interior = min(interior, 9 - sharp)
            interior = max(interior, 1)
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_edge = (lvl + 2) * 2 + interior
            sb_edge = lvl * 2 + interior
            inner = nonzero or ymode == B_PRED
            y0, x0 = 1 + my * 16, 1 + mx * 16
            cy0, cx0 = 1 + my * 8, 1 + mx * 8
            yr = range(y0, y0 + 16)
            cyr = range(cy0, cy0 + 8)
            if hd.filter_type == 1:  # simple: luma edges only
                if mx > 0:
                    _filter_edge(Y, x0, yr, None, True, _simple_filter, mb_edge)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(Y, x0 + dx, yr, None, True,
                                     _simple_filter, sb_edge)
                if my > 0:
                    _filter_edge(Y, y0, None, range(x0, x0 + 16), False,
                                 _simple_filter, mb_edge)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(Y, y0 + dy, None, range(x0, x0 + 16),
                                     False, _simple_filter, sb_edge)
                continue
            # normal filter: luma + chroma
            if mx > 0:
                _filter_edge(Y, x0, yr, None, True, _mb_filter,
                             hev_t, interior, mb_edge)
                for P in (U, V):
                    _filter_edge(P, cx0, cyr, None, True, _mb_filter,
                                 hev_t, interior, mb_edge)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, x0 + dx, yr, None, True, _sb_filter,
                                 hev_t, interior, sb_edge)
                for P in (U, V):
                    _filter_edge(P, cx0 + 4, cyr, None, True, _sb_filter,
                                 hev_t, interior, sb_edge)
            if my > 0:
                _filter_edge(Y, y0, None, range(x0, x0 + 16), False,
                             _mb_filter, hev_t, interior, mb_edge)
                for P in (U, V):
                    _filter_edge(P, cy0, None, range(cx0, cx0 + 8), False,
                                 _mb_filter, hev_t, interior, mb_edge)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, y0 + dy, None, range(x0, x0 + 16), False,
                                 _sb_filter, hev_t, interior, sb_edge)
                for P in (U, V):
                    _filter_edge(P, cy0 + 4, None, range(cx0, cx0 + 8), False,
                                 _sb_filter, hev_t, interior, sb_edge)


def decode_webp_vp8(data: bytes):
    """RIFF/WEBP container with a lossy 'VP8 ' chunk → (Y, U, V)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            # a lying/truncated size field is a container defect — flag
            # it here rather than hand a short payload to decode_vp8 and
            # let it mis-blame the bitstream (ADVICE r10)
            raise ValueError("truncated RIFF chunk")
        if fourcc == b"VP8 ":
            return decode_vp8(data[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size & 1)
    raise ValueError("RIFF/WEBP without a VP8 chunk")
