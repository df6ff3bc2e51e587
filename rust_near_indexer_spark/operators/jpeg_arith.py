"""Arithmetic-coded JPEG entropy decode — ITU T.81 Annexes D and F.

The QM arithmetic decoder (T.81 SS D.2: 114-state probability
estimation, Table D.3, with conditional MPS/LPS exchange and the
0xFF00 byte-stuffing convention) plus the sequential-DCT decision
models of SS F.2.4 (DC difference conditioning with DAC L/U bounds,
per-index AC bins with the Kx high/low-frequency split, the fixed
non-adapting sign bin).  Output is the EXACT quantized coefficient
grid, which operators/multimodal._jpeg_from_coefs renders through the
same dequant/IDCT tail as the progressive path.

Correctness gate: tests/test_jpeg_arith.py compiles a tiny C helper
against the SYSTEM libjpeg (an independent implementation of the same
published spec), encodes images with arithmetic coding enabled, and
requires this decoder to reproduce libjpeg's own
``jpeg_read_coefficients`` dump EXACTLY — entropy-layer truth, free of
IDCT rounding conventions.  The state-transition table below is the
published Table D.3 (transcribed via the system library's copy and
cross-checked against the spec's first/last rows); any wrong entry
desynchronizes the arithmetic decoder and fails that gate.

Reference parity note: the reference engine (rust-near-indexer) has no
media surface; this closes the arithmetic-JPEG contract raiser in
operators/multimodal.py (SURVEY SS 2B multimodal).
"""

from __future__ import annotations

# (Qe, next-LPS index | switch<<7, next-MPS index) — T.81 Table D.3;
# row 113 is the non-adapting "fixed" bin (self-looping equiprobable
# state) the AC sign decision uses.
ARITH_STATE_TABLE = (
    (0x5A1D, 0x81, 1),
    (0x2586, 0x0E, 2),
    (0x1114, 0x10, 3),
    (0x080B, 0x12, 4),
    (0x03D8, 0x14, 5),
    (0x01DA, 0x17, 6),
    (0x00E5, 0x19, 7),
    (0x006F, 0x1C, 8),
    (0x0036, 0x1E, 9),
    (0x001A, 0x21, 10),
    (0x000D, 0x23, 11),
    (0x0006, 0x09, 12),
    (0x0003, 0x0A, 13),
    (0x0001, 0x0C, 13),
    (0x5A7F, 0x8F, 15),
    (0x3F25, 0x24, 16),
    (0x2CF2, 0x26, 17),
    (0x207C, 0x27, 18),
    (0x17B9, 0x28, 19),
    (0x1182, 0x2A, 20),
    (0x0CEF, 0x2B, 21),
    (0x09A1, 0x2D, 22),
    (0x072F, 0x2E, 23),
    (0x055C, 0x30, 24),
    (0x0406, 0x31, 25),
    (0x0303, 0x33, 26),
    (0x0240, 0x34, 27),
    (0x01B1, 0x36, 28),
    (0x0144, 0x38, 29),
    (0x00F5, 0x39, 30),
    (0x00B7, 0x3B, 31),
    (0x008A, 0x3C, 32),
    (0x0068, 0x3E, 33),
    (0x004E, 0x3F, 34),
    (0x003B, 0x20, 35),
    (0x002C, 0x21, 9),
    (0x5AE1, 0xA5, 37),
    (0x484C, 0x40, 38),
    (0x3A0D, 0x41, 39),
    (0x2EF1, 0x43, 40),
    (0x261F, 0x44, 41),
    (0x1F33, 0x45, 42),
    (0x19A8, 0x46, 43),
    (0x1518, 0x48, 44),
    (0x1177, 0x49, 45),
    (0x0E74, 0x4A, 46),
    (0x0BFB, 0x4B, 47),
    (0x09F8, 0x4D, 48),
    (0x0861, 0x4E, 49),
    (0x0706, 0x4F, 50),
    (0x05CD, 0x30, 51),
    (0x04DE, 0x32, 52),
    (0x040F, 0x32, 53),
    (0x0363, 0x33, 54),
    (0x02D4, 0x34, 55),
    (0x025C, 0x35, 56),
    (0x01F8, 0x36, 57),
    (0x01A4, 0x37, 58),
    (0x0160, 0x38, 59),
    (0x0125, 0x39, 60),
    (0x00F6, 0x3A, 61),
    (0x00CB, 0x3B, 62),
    (0x00AB, 0x3D, 63),
    (0x008F, 0x3D, 32),
    (0x5B12, 0xC1, 65),
    (0x4D04, 0x50, 66),
    (0x412C, 0x51, 67),
    (0x37D8, 0x52, 68),
    (0x2FE8, 0x53, 69),
    (0x293C, 0x54, 70),
    (0x2379, 0x56, 71),
    (0x1EDF, 0x57, 72),
    (0x1AA9, 0x57, 73),
    (0x174E, 0x48, 74),
    (0x1424, 0x48, 75),
    (0x119C, 0x4A, 76),
    (0x0F6B, 0x4A, 77),
    (0x0D51, 0x4B, 78),
    (0x0BB6, 0x4D, 79),
    (0x0A40, 0x4D, 48),
    (0x5832, 0xD0, 81),
    (0x4D1C, 0x58, 82),
    (0x438E, 0x59, 83),
    (0x3BDD, 0x5A, 84),
    (0x34EE, 0x5B, 85),
    (0x2EAE, 0x5C, 86),
    (0x299A, 0x5D, 87),
    (0x2516, 0x56, 71),
    (0x5570, 0xD8, 89),
    (0x4CA9, 0x5F, 90),
    (0x44D9, 0x60, 91),
    (0x3E22, 0x61, 92),
    (0x3824, 0x63, 93),
    (0x32B4, 0x63, 94),
    (0x2E17, 0x5D, 86),
    (0x56A8, 0xDF, 96),
    (0x4F46, 0x65, 97),
    (0x47E5, 0x66, 98),
    (0x41CF, 0x67, 99),
    (0x3C3D, 0x68, 100),
    (0x375E, 0x63, 93),
    (0x5231, 0x69, 102),
    (0x4C0F, 0x6A, 103),
    (0x4639, 0x6B, 104),
    (0x415E, 0x67, 99),
    (0x5627, 0xE9, 106),
    (0x50E7, 0x6C, 107),
    (0x4B85, 0x6D, 103),
    (0x5597, 0x6E, 109),
    (0x504F, 0x6F, 107),
    (0x5A10, 0xEE, 111),
    (0x5522, 0x70, 109),
    (0x59EB, 0xF0, 111),
    (0x5A1D, 0x71, 113),
)

DC_STAT_BINS = 64
AC_STAT_BINS = 256


class ArithDecoder:
    """T.81 D.2 QM decoder over one entropy-coded segment.

    ``data`` is the whole JPEG byte string; ``pos`` the first entropy
    byte.  A 0xFF data byte is stuffed as FF 00; any other FF-marker
    ends the segment, after which the decoder feeds zero bytes (the
    convention T.81 D.2.7 prescribes — unlike Huffman scans, hitting
    the trailing marker mid-decode is legal)."""

    __slots__ = ("data", "pos", "c", "a", "ct", "marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.marker = None
        # the first two entropy bytes form the 16-bit code-value
        # fraction, aligned with A's initial 1.0 = 0x10000 at C bits
        # 16..31; CT=0 so the first renormalization feeds byte 3
        self.c = (self._next_byte() << 24) | (self._next_byte() << 16)
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker is not None:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self.marker = -1  # ran off the segment: feed zeros
            return 0
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0:
                self.pos = p + 2
                return 0xFF
            self.marker = d[p + 1] if p + 1 < len(d) else -1
            return 0
        self.pos = p + 1
        return b

    def _byte_in(self) -> None:
        self.c += self._next_byte() << 8
        self.ct = 8

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against context byte st[i]
        (bit 7 = current MPS, bits 0-6 = Table D.3 state index)."""
        sv = st[i]
        qe, nlps_sw, nmps = ARITH_STATE_TABLE[sv & 0x7F]
        self.a -= qe
        if (self.c >> 16) < self.a:
            # code value in the BOTTOM subinterval (size A-Qe): the MPS
            # side, unless conditional exchange gave the larger Qe-sized
            # top interval to the MPS (A-Qe < Qe)
            if self.a & 0x8000:
                return sv >> 7  # no renormalization, no estimation
            if self.a < qe:  # conditional exchange: bottom decodes LPS
                d = (sv >> 7) ^ 1
                st[i] = (sv & 0x80) ^ nlps_sw
            else:
                d = sv >> 7
                st[i] = (sv & 0x80) ^ nmps
        else:
            # TOP subinterval (size Qe): nominal LPS side
            self.c -= self.a << 16
            if self.a < qe:  # conditional exchange: top decodes MPS
                d = sv >> 7
                st[i] = (sv & 0x80) ^ nmps
            else:
                d = (sv >> 7) ^ 1
                st[i] = (sv & 0x80) ^ nlps_sw
            self.a = qe
        while True:  # RENORMD
            if self.ct == 0:
                self._byte_in()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d

def _find_restart(data: bytes, pos: int) -> int:
    """Scan forward for the next RSTn marker, return the offset just
    past it (T.81 E.2.4: the arithmetic decoder may not have consumed
    every pad byte before the marker)."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
            return p + 2
        p += 1
    raise ValueError("JPEG restart marker not found in arithmetic scan")


def decode_sequential_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    dc_cond,
    ac_cond,
    restart_interval: int,
    coefs,
    zigzag,
) -> None:
    """One sequential arithmetic SOS (T.81 F.2.4) → fill ``coefs``
    (per-component (by, bx, 64) int grids, natural order).

    ``scan``: (comp_index, dc_table_id, ac_table_id) triples in scan
    order; ``dc_cond``: table id → (L, U) conditioning bounds from DAC
    (default 0, 1); ``ac_cond``: table id → Kx (default 5)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def fresh_stats():
        return (
            {t: bytearray(DC_STAT_BINS) for _ci, t, _a in scan},
            {t: bytearray(AC_STAT_BINS) for _ci, _d, t in scan},
        )

    dec = ArithDecoder(data, pos)
    dc_stats, ac_stats = fresh_stats()
    fixed = bytearray([113])
    dc_ctx = [0] * len(comps)
    last_dc = [0] * len(comps)
    for m_i in range(mcux * mcuy):
        if restart_interval and m_i and m_i % restart_interval == 0:
            dec = ArithDecoder(data, _find_restart(data, dec.pos))
            dc_stats, ac_stats = fresh_stats()
            fixed = bytearray([113])
            dc_ctx = [0] * len(comps)
            last_dc = [0] * len(comps)
        my, mx = divmod(m_i, mcux)
        for ci, dc_tbl, ac_tbl in scan:
            _cid, ch, cv, _qid = comps[ci]
            dst = dc_stats[dc_tbl]
            ast = ac_stats[ac_tbl]
            L, U = dc_cond.get(dc_tbl, (0, 1))
            kx = ac_cond.get(ac_tbl, 5)
            for by in range(cv):
                for bx in range(ch):
                    block = coefs[ci][my * cv + by][mx * ch + bx]
                    # ---- DC (F.2.4.1): difference from conditioning ctx
                    diff, dc_ctx[ci] = _decode_dc_diff(
                        dec, dst, dc_ctx[ci], L, U
                    )
                    last_dc[ci] += diff
                    block[0] = last_dc[ci]
                    # ---- AC (F.2.4.2): per-index three-bin contexts
                    k = 1
                    while k <= 63:
                        base = 3 * (k - 1)
                        if dec.decode(ast, base):
                            break  # EOB
                        while dec.decode(ast, base + 1) == 0:
                            k += 1
                            if k > 63:
                                raise ValueError(
                                    "JPEG arithmetic AC index out of range"
                                )
                            base = 3 * (k - 1)
                        sign = dec.decode(fixed, 0)
                        sti = base + 2
                        m = dec.decode(ast, sti)
                        if m:
                            if dec.decode(ast, sti):
                                m <<= 1
                                sti = 189 if k <= kx else 217
                                while dec.decode(ast, sti):
                                    m <<= 1
                                    if m == 0x8000:
                                        raise ValueError(
                                            "JPEG arithmetic AC magnitude "
                                            "overflow"
                                        )
                                    sti += 1
                        v = m
                        sti += 14
                        mm = m
                        while mm > 1:
                            mm >>= 1
                            if dec.decode(ast, sti):
                                v |= mm
                        v += 1
                        block[zigzag[k]] = -v if sign else v
                        k += 1

def _next_marker(data: bytes, pos: int) -> int:
    """Advance to the next non-RST marker after an arithmetic scan,
    with the same under-consumption guard as the Huffman progressive
    path (the QM decoder legitimately leaves the encoder's final flush
    bytes unread; a large gap means a corrupt scan)."""
    p = start = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            if p - start > 16:
                raise ValueError(
                    f"malformed JPEG: {p - start} unconsumed entropy "
                    "bytes before next marker (truncated/corrupt scan)"
                )
            return p
        p += 1
    return p


def _decode_dc_diff(dec, dst, base, L, U):
    """Shared DC-difference decode (F.2.4.1): returns (diff, new_ctx)."""
    if dec.decode(dst, base) == 0:
        return 0, 0
    sign = dec.decode(dst, base + 1)
    sti = base + 2 + sign
    m = dec.decode(dst, sti)
    if m:
        sti = 20  # Table F.4: X1 bin
        while dec.decode(dst, sti):
            m <<= 1
            if m == 0x8000:
                raise ValueError("JPEG arithmetic DC magnitude overflow")
            sti += 1
    if m < (1 << L) >> 1:
        ctx = 0
    elif m > (1 << U) >> 1:
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    v = m
    sti += 14
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(dst, sti):
            v |= mm
    v += 1
    return (-v if sign else v), ctx


def decode_progressive_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_cond,
    ac_cond,
    restart_interval: int,
    coefs,
    zigzag,
) -> int:
    """One progressive arithmetic SOS (T.81 G.1.3 models over the
    SS F.2.4 decision trees) → accumulate into ``coefs``; returns the
    offset of the next marker.  Each SOS is its own arithmetic segment:
    fresh decoder state and statistics (and again at every restart)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dec = ArithDecoder(data, pos)
    fixed = bytearray([113])

    if ss == 0:  # DC scan (interleaved when ns>1)
        if se != 0:
            raise ValueError("JPEG DC scan with nonzero Se")
        dc_stats = {t: bytearray(DC_STAT_BINS) for _ci, t, _a in scan}
        dc_ctx = [0] * len(comps)
        last_dc = [0] * len(comps)

        def dc_block(ci, dtbl, blk):
            if ah == 0:
                L, U = dc_cond.get(dtbl, (0, 1))
                diff, ctx = _decode_dc_diff(dec, dc_stats[dtbl], dc_ctx[ci], L, U)
                dc_ctx[ci] = ctx
                last_dc[ci] += diff
                blk[0] = last_dc[ci] << al
            elif dec.decode(fixed, 0):  # refinement: one fixed-bin bit
                blk[0] = int(blk[0]) | (1 << al)

        n = mcux * mcuy if len(scan) > 1 else None
        if len(scan) > 1:  # interleaved MCU order
            for m_i in range(n):
                if restart_interval and m_i and m_i % restart_interval == 0:
                    dec = ArithDecoder(data, _find_restart(data, dec.pos))
                    fixed = bytearray([113])
                    for t in dc_stats:
                        dc_stats[t] = bytearray(DC_STAT_BINS)
                    dc_ctx = [0] * len(comps)
                    last_dc = [0] * len(comps)
                my, mx = divmod(m_i, mcux)
                for ci, dtbl, _a in scan:
                    _cid, ch, cv, _q = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            dc_block(ci, dtbl, coefs[ci][my * cv + by, mx * ch + bx])
        else:  # single component: its own block grid
            ci, dtbl, _a = scan[0]
            _cid, ch, cv, _q = comps[ci]
            wi, hi = -(-w * ch // hmax), -(-h * cv // vmax)
            bx_n, by_n = -(-wi // 8), -(-hi // 8)
            for i in range(bx_n * by_n):
                if restart_interval and i and i % restart_interval == 0:
                    dec = ArithDecoder(data, _find_restart(data, dec.pos))
                    fixed = bytearray([113])
                    for t in dc_stats:
                        dc_stats[t] = bytearray(DC_STAT_BINS)
                    dc_ctx = [0] * len(comps)
                    last_dc = [0] * len(comps)
                by, bx = divmod(i, bx_n)
                dc_block(ci, dtbl, coefs[ci][by, bx])
        return _next_marker(data, dec.pos)

    # AC scan: exactly one component, non-interleaved
    if len(scan) != 1:
        raise ValueError("JPEG AC progressive scan must be single-component")
    ci, _d, atbl = scan[0]
    _cid, ch, cv, _q = comps[ci]
    kx = ac_cond.get(atbl, 5)
    wi, hi = -(-w * ch // hmax), -(-h * cv // vmax)
    bx_n, by_n = -(-wi // 8), -(-hi // 8)
    ast = bytearray(AC_STAT_BINS)
    for i in range(bx_n * by_n):
        if restart_interval and i and i % restart_interval == 0:
            dec = ArithDecoder(data, _find_restart(data, dec.pos))
            fixed = bytearray([113])
            ast = bytearray(AC_STAT_BINS)
        by, bx = divmod(i, bx_n)
        block = coefs[ci][by, bx]
        if ah == 0:
            # AC first pass (F.2.4.2 over [Ss, Se], values shifted Al)
            k = ss
            while k <= se:
                base = 3 * (k - 1)
                if dec.decode(ast, base):
                    break  # EOB
                while dec.decode(ast, base + 1) == 0:
                    k += 1
                    if k > se:
                        raise ValueError(
                            "JPEG arithmetic AC index out of range"
                        )
                    base = 3 * (k - 1)
                sign = dec.decode(fixed, 0)
                sti = base + 2
                m = dec.decode(ast, sti)
                if m:
                    if dec.decode(ast, sti):
                        m <<= 1
                        sti = 189 if k <= kx else 217
                        while dec.decode(ast, sti):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "JPEG arithmetic AC magnitude overflow"
                                )
                            sti += 1
                v = m
                sti += 14
                mm = m
                while mm > 1:
                    mm >>= 1
                    if dec.decode(ast, sti):
                        v |= mm
                v += 1
                block[zigzag[k]] = (-v if sign else v) << al
                k += 1
        else:
            # AC refinement (G.1.3.3): correction bits for known
            # coefficients, newly-nonzero insertions, per-k EOB flag
            # beyond the previous scan's last nonzero index
            p1 = 1 << al
            m1 = -1 << al
            kex = se
            while kex > 0 and block[zigzag[kex]] == 0:
                kex -= 1
            k = ss
            while k <= se:
                base = 3 * (k - 1)
                if k > kex:
                    if dec.decode(ast, base):
                        break  # EOB
                while True:
                    zk = zigzag[k]
                    if block[zk]:
                        if dec.decode(ast, base + 2):
                            block[zk] = int(block[zk]) + (
                                m1 if block[zk] < 0 else p1
                            )
                        break
                    if dec.decode(ast, base + 1):
                        block[zk] = m1 if dec.decode(fixed, 0) else p1
                        break
                    k += 1
                    if k > se:
                        raise ValueError(
                            "JPEG arithmetic AC refinement overrun"
                        )
                    base = 3 * (k - 1)
                k += 1
    return _next_marker(data, dec.pos)
