"""WebP decoder — bytes → HWC uint8 ndarray (VP8L lossless here,
lossy VP8 routed to operators/vp8.py).

The most common real-corpus format that still raised after round 8
(VERDICT r08 Next #5).  VP8L is integer-exact (no DCT), so it fits the
repo's golden-test pattern: tests/test_webp_codec.py carries an
independently written in-test VP8L encoder and asserts bit-exact
round-trips across the entropy layer and transforms.  Lossy VP8
keyframes decode via the RFC 6386 implementation in operators/vp8.py
(bit-exact in YUV against the system libwebp, tests/test_vp8_codec.py)
and convert to RGB here; ALPH alpha planes (raw and headerless-VP8L
compressed, all three predictor filters) attach as a 4th channel, and
VP8X/ANIM/ANMF animations composite through ``decode_webp_frames``
(blend + dispose-to-background, the GIF-animation surface shape).

Implemented (the full lossless bitstream spec, RIFF container):
- RIFF/WEBP chunk walk (VP8X-wrapped VP8L included);
- LSB-first bit reader; canonical prefix codes via both the "simple"
  (1-2 symbol) and the full code-length-coded form (incl. repeat
  symbols 16/17/18 and the max_symbol cap);
- the five-code groups (green+length+cache / red / blue / alpha /
  distance), optional meta-prefix entropy image selecting per-block
  groups, LZ77 backward references with the 120-entry 2-D distance
  neighborhood map, and the hashed color cache;
- all four transforms, applied in reverse read order: PREDICTOR (all
  14 modes), COLOR (ColorTransformElement deltas), SUBTRACT_GREEN, and
  COLOR_INDEXING (delta-coded palette + sub-byte pixel bundling).

Documented contract limits (ValueError/NotImplementedError, same
policy as operators/multimodal.py): combining PREDICTOR/COLOR with COLOR_INDEXING in
one stream raises ValueError (libwebp's encoder never emits the
combination, and the packed-width interaction is a corner this
decoder refuses rather than guesses).

The reference has no codec layer (it ships bytes to ClickHouse);
this is SURVEY §2B north-star multimodal surface.
"""

from __future__ import annotations

import struct

# The 2-D distance map: LZ77 distance codes 1..120 address a pixel
# neighborhood rather than a linear offset.  The table is the 120
# nearest (dx, dy) offsets with dy >= 0 (and dx > 0 when dy == 0),
# ordered by (dx^2 + dy^2, dy descending, dx descending) — the first
# entries are (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),... as listed in
# the lossless bitstream spec; test_webp_codec pins that prefix.
_DIST_MAP: list[tuple[int, int]] = sorted(
    (
        (dx, dy)
        for dy in range(0, 9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)[:120]

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _Bits:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _Prefix:
    """Canonical prefix code (DEFLATE-style length→code assignment),
    decoded by walking the stream one bit at a time."""

    def __init__(self, lengths: dict[int, int]) -> None:
        used = {s: l for s, l in lengths.items() if l > 0}
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = next(iter(used))
            self.table = {}
            return
        self.single = None
        # canonical assignment: shorter lengths first, ties by symbol
        code = 0
        prev_len = 0
        table: dict[tuple[int, int], int] = {}
        for sym in sorted(used, key=lambda s: (used[s], s)):
            code <<= used[sym] - prev_len
            prev_len = used[sym]
            table[(used[sym], code)] = sym
            code += 1
        # over-subscribed / incomplete codes are malformed
        if code != 1 << prev_len:
            raise ValueError("VP8L prefix code is not full")
        self.table = table

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single  # zero-bit code
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code bits")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _Prefix({sym0: 1})  # one symbol → zero-bit code
        return _Prefix({sym0: 1, br.read(8): 1})
    # normal: code lengths themselves prefix-coded
    num_cl = br.read(4) + 4
    cl_lengths = {s: 0 for s in range(19)}
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # use a cap on the number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 7 + br.read(7) + 4  # 11..138
    if sym > alphabet_size:
        raise ValueError("VP8L code lengths overflow the alphabet")
    return _Prefix(lengths)


def _lz77_value(br: _Bits, sym: int) -> int:
    """Length/distance prefix symbol → value (spec's LZ77 coding)."""
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(br: _Bits, w: int, h: int, level0: bool):
    """Decode one spatially-coded ARGB image (the spec's
    DecodeImageStream): transforms only at level 0, meta-prefix only at
    level 0.  Returns (pixels, transforms) — pixels is a list of
    (a, r, g, b) tuples, row-major, length w*h (possibly of the
    REDUCED width when color-indexing bundles pixels)."""
    transforms = []
    seen_types = set()
    xsize = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen_types:
                raise ValueError("VP8L transform repeated")
            seen_types.add(ttype)
            if ttype == 0 or ttype == 1:  # PREDICTOR / COLOR
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_raw, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are componentwise delta-coded
                pal = []
                prev = (0, 0, 0, 0)
                for p in pal_raw:
                    cur = tuple((prev[i] + p[i]) & 0xFF for i in range(4))
                    pal.append(cur)
                    prev = cur
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, xsize), pal))
                xsize = -(-xsize // (1 << width_bits))
        if {0, 1} & seen_types and 3 in seen_types:
            raise ValueError(
                "VP8L: PREDICTOR/COLOR combined with COLOR_INDEXING is "
                "outside this decoder's contract (libwebp never emits it)"
            )

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix codes (level 0 only)
    entropy = None
    num_groups = 1
    if level0 and br.read(1):
        size_bits = br.read(3) + 2
        ew = -(-xsize // (1 << size_bits))
        eh = -(-h // (1 << size_bits))
        sub, _ = _decode_image_stream(br, ew, eh, False)
        groups = [(p[1] << 8) | p[2] for p in sub]  # (red<<8)|green
        entropy = (size_bits, ew, groups)
        num_groups = max(groups) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    codes = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, green_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        codes.append((g, r, b, a, d))

    n = xsize * h
    pixels: list[tuple[int, int, int, int]] = []

    def emit(px: tuple[int, int, int, int]) -> None:
        pixels.append(px)
        if cache is not None:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            cache[_cache_key(argb, cache_bits)] = argb

    while len(pixels) < n:
        pos = len(pixels)
        if entropy is not None:
            size_bits, ew, groups = entropy
            bx = (pos % xsize) >> size_bits
            by = (pos // xsize) >> size_bits
            group = groups[by * ew + bx]
        else:
            group = 0
        cg, cr, cb, ca, cd = codes[group]
        sym = cg.decode(br)
        if sym < 256:
            red = cr.decode(br)
            blue = cb.decode(br)
            alpha = ca.decode(br)
            emit((alpha, red, sym, blue))
        elif sym < 280:
            length = _lz77_value(br, sym - 256)
            dist_code = _lz77_value(br, cd.decode(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > len(pixels):
                raise ValueError("VP8L backward reference before image start")
            for _ in range(length):
                emit(pixels[len(pixels) - dist])
                if len(pixels) > n:
                    raise ValueError("VP8L backward reference overruns image")
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            idx = sym - 280
            argb = cache[idx]
            pixels.append(
                ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                 (argb >> 8) & 0xFF, argb & 0xFF)
            )
            # cache hits re-insert (no-op key-wise, but spec-faithful)
            cache[_cache_key(argb, cache_bits)] = argb
    return pixels, transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, L, T, TL, TR) -> tuple[int, int, int, int]:
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(L[i], TL[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(L[i], T[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(TL[i], T[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(T[i], TR[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)
        )
    if mode == 11:  # Select
        p_l = sum(abs(T[i] - TL[i]) for i in range(4))
        p_t = sum(abs(L[i] - TL[i]) for i in range(4))
        return T if p_t <= p_l else L
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            min(255, max(0, L[i] + T[i] - TL[i])) for i in range(4)
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = tuple(_avg2(L[i], T[i]) for i in range(4))
        # (a - b) / 2 with C truncation toward zero, not Python floor
        return tuple(
            min(255, max(0, ave[i] + int((ave[i] - TL[i]) / 2)))
            for i in range(4)
        )
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _apply_transforms(pixels, transforms, w: int, h: int):
    """Inverse transforms in reverse read order; returns (pixels, w)."""
    for ttype, arg, data in reversed(transforms):
        if ttype == 3:  # COLOR_INDEXING
            width_bits, full_w = arg
            pal = data
            packed_w = -(-full_w // (1 << width_bits))
            out = []
            per = 1 << width_bits
            bits = 8 >> width_bits
            mask = (1 << bits) - 1
            for y in range(h):
                row = []
                for xp in range(packed_w):
                    g = pixels[y * packed_w + xp][2]
                    for k in range(per):
                        idx = (g >> (k * bits)) & mask
                        if len(row) < full_w:
                            if idx >= len(pal):
                                raise ValueError(
                                    f"VP8L palette index {idx} out of range"
                                )
                            row.append(pal[idx])
                out.extend(row)
            pixels = out
            w = full_w
        elif ttype == 2:  # SUBTRACT_GREEN inverse
            pixels = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF)
                for (a, r, g, b) in pixels
            ]
        elif ttype == 1:  # COLOR transform inverse
            size_bits, sub = arg, data
            bw = -(-w // (1 << size_bits))
            out = list(pixels)
            for y in range(h):
                for x in range(w):
                    cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
                    g2r, g2b, r2b = cte[3], cte[2], cte[1]
                    a, r, g, b = out[y * w + x]

                    def delta(t: int, c: int) -> int:
                        ts = t - 256 if t >= 128 else t
                        cs = c - 256 if c >= 128 else c
                        return (ts * cs) >> 5

                    r = (r + delta(g2r, g)) & 0xFF
                    b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
                    out[y * w + x] = (a, r, g, b)
            pixels = out
        elif ttype == 0:  # PREDICTOR inverse
            size_bits, sub = arg, data
            bw = -(-w // (1 << size_bits))
            out = [None] * (w * h)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = (0xFF, 0, 0, 0)
                    elif y == 0:
                        pred = out[x - 1]  # forced L on the top row
                    elif x == 0:
                        pred = out[(y - 1) * w]  # forced T on column 0
                    else:
                        mode = sub[(y >> size_bits) * bw + (x >> size_bits)][2]
                        L = out[y * w + x - 1]
                        T = out[(y - 1) * w + x]
                        TL = out[(y - 1) * w + x - 1]
                        # TR at the last column reads the contiguous
                        # next element = leftmost pixel of THIS row
                        # (libwebp's row-buffer semantics)
                        TR = out[(y - 1) * w + x + 1] if x + 1 < w else out[y * w]
                        pred = _predict(mode, L, T, TL, TR)
                    res = pixels[y * w + x]
                    out[y * w + x] = tuple(
                        (res[i] + pred[i]) & 0xFF for i in range(4)
                    )
            pixels = out
    return pixels, w


def _decode_alpha(payload: bytes, w: int, h: int):
    """ALPH chunk → (h, w) uint8 alpha plane (the lossy-with-alpha
    path: a VP8 color frame plus a separately coded alpha plane).

    Header byte: bits 0-1 compression (0 = raw, 1 = a HEADERLESS VP8L
    image stream whose GREEN channel is the plane), bits 2-3 filtering
    (none / horizontal / vertical / gradient predictors, inverted here
    after decompression), bits 4-5 pre-processing (encoder-side level
    reduction — nothing to invert).  Golden-gated against libwebp's
    own RGBA decode in tests/test_vp8_codec.py."""
    import numpy as np

    if not payload:
        raise ValueError("empty WebP ALPH chunk")
    head = payload[0]
    method = head & 3
    filt = (head >> 2) & 3
    if method == 0:
        raw = payload[1 : 1 + w * h]
        if len(raw) < w * h:
            raise ValueError("truncated raw WebP alpha plane")
        plane = np.frombuffer(raw, np.uint8).reshape(h, w).astype(np.int32)
    elif method == 1:
        br = _Bits(payload, 1)
        pixels, transforms = _decode_image_stream(br, w, h, True)
        pixels, w2 = _apply_transforms(pixels, transforms, w, h)
        if w2 != w:
            raise ValueError("WebP alpha stream width mismatch")
        arr = np.array(pixels, dtype=np.uint8).reshape(h, w, 4)
        plane = arr[:, :, 2].astype(np.int32)  # green channel (A,R,G,B)
    else:
        raise ValueError(f"reserved WebP alpha compression method {method}")
    if filt:
        out = np.zeros((h, w), np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif filt == 1:  # horizontal
                    pred = out[y, x - 1] if x else out[y - 1, x]
                elif filt == 2:  # vertical
                    pred = out[y - 1, x] if y else out[y, x - 1]
                else:  # gradient
                    if y == 0:
                        pred = out[y, x - 1]
                    elif x == 0:
                        pred = out[y - 1, x]
                    else:
                        g = int(out[y, x - 1]) + int(out[y - 1, x]) - int(
                            out[y - 1, x - 1]
                        )
                        pred = min(255, max(0, g))
                out[y, x] = (plane[y, x] + pred) & 0xFF
        plane = out
    return plane.astype(np.uint8)


def _fancy_upsample(c, h: int, w: int):
    """libwebp's "fancy" 4:2:0 chroma upsampler (src/dsp/upsampling.c),
    exactly: output pixel (r, c) blends the 2x2 chroma neighborhood with
    weights (9, 3, 3, 1)/16 — 9 on the nearest sample, 3 on the
    horizontal and vertical neighbors toward the pixel's quarter-pel
    offset, 1 on the diagonal — with +8 rounding and edge replication.
    The staged packed arithmetic libwebp uses ((a + ((a+3b+3c+d+8)>>3))
    >> 1) is bit-identical to the direct (9a+3b+3c+d+8)>>4 form used
    here (proof: write a+3b+3c+d+8 = 8q+r, r<8; both reduce to
    floor((a+q)/2)), so this reproduces libwebp's planes exactly."""
    import numpy as np

    ch_, cw_ = c.shape
    r = np.arange(h)[:, None]
    col = np.arange(w)[None, :]
    j = r >> 1
    i = col >> 1
    j2 = np.clip(np.where(r & 1, j + 1, j - 1), 0, ch_ - 1)
    i2 = np.clip(np.where(col & 1, i + 1, i - 1), 0, cw_ - 1)
    c32 = c.astype(np.int32)
    out = (
        9 * c32[j, i] + 3 * c32[j, i2] + 3 * c32[j2, i] + c32[j2, i2] + 8
    ) >> 4
    return out


def vp8_yuv_to_rgb(y, u, v):
    """Limited-range (studio-swing) BT.601 YUV 4:2:0 → HWC uint8 RGB
    with libwebp's exact pipeline: the fancy chroma upsampler above,
    then the 14-bit fixed-point conversion from libwebp src/dsp/yuv.h —
      R = clip((((19077*y) >> 8) + ((26149*v) >> 8)                   - 14234) >> 6)
      G = clip((((19077*y) >> 8) -  ((6419*u) >> 8) - ((13320*v) >> 8) + 8708) >> 6)
      B = clip((((19077*y) >> 8) + ((33050*u) >> 8)                   - 17685) >> 6)
    VP8 YUV is LIMITED range (Y 16..235 maps to 0..255), unlike JPEG's
    full-range YCbCr (multimodal.ycc_to_rgb) — the two codecs genuinely
    use different conventions, so they deliberately do NOT share a
    formula (ADVICE r10).  Matching libwebp's fixed-point constants
    makes the pure path bit-exact against WebPDecodeRGBA, which the
    tests gate directly."""
    import numpy as np

    h, w = y.shape
    yy = (19077 * y.astype(np.int32)) >> 8
    uu = _fancy_upsample(u, h, w)
    vv = _fancy_upsample(v, h, w)
    r = (yy + ((26149 * vv) >> 8) - 14234) >> 6
    g = (yy - ((6419 * uu) >> 8) - ((13320 * vv) >> 8) + 8708) >> 6
    b = (yy + ((33050 * uu) >> 8) - 17685) >> 6
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_lossy_rgb(payload: bytes):
    """'VP8 ' chunk payload → HWC uint8 RGB, entirely pure-Python
    (operators/vp8.py spec decode + vp8_yuv_to_rgb) — kept as a named
    path so tests can differentially gate it bit-exact against the
    native libwebp route regardless of which one decode_webp picks."""
    from .vp8 import decode_vp8

    y, u, v = decode_vp8(payload)
    return vp8_yuv_to_rgb(y, u, v)


def decode_webp(data: bytes):
    """RIFF/WEBP → HWC uint8 (RGBA when the stream declares alpha,
    RGB otherwise).  Lossless (VP8L) decodes bit-exact; lossy VP8
    routes through the system libwebp (operators/webp_native) when the
    .so is present, else through operators/vp8.py (RFC 6386 keyframe
    decoder, golden-gated bit-exact in YUV against the same libwebp)
    plus vp8_yuv_to_rgb (limited-range BT.601, libwebp's fixed-point
    constants + fancy upsampler).  The two routes are bit-exact to each
    other (tests/test_vp8_codec.py gates it on the committed fixtures
    and fresh encodes), so the gated-query pins hold on machines with
    or without libwebp."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    vp8l = None
    alph = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            # a lying/truncated size field is a container defect: flag
            # it here rather than hand a short payload downstream (or
            # skip past real chunks) and mis-blame the bitstream
            raise ValueError("truncated RIFF chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"ANMF":
            # animation: the image chunks live inside ANMF payloads,
            # not at the top level — composite and return the first
            # canvas frame (the decode_image contract, as for GIF)
            return decode_webp_frames(data)[0]
        if fourcc == b"ALPH":
            alph = payload  # precedes the VP8 chunk in extended files
        if fourcc == b"VP8L":
            from . import webp_native

            if webp_native.available() and len(payload) >= 5:
                # r12: route lossless through libwebp too — the pure
                # VP8L path below builds the pixel stream as a Python
                # list (per-pixel interpreter cost); VP8L is lossless,
                # so libwebp's output is the same bytes by definition
                # (gated anyway: tests/test_webp_codec.py pins native ≡
                # pure on the synth fixtures).  The alpha-present flag
                # is bit 28 of the VP8L header (LSB-first after the
                # 0x2F signature): byte 4, bit 4.
                try:
                    rgba = webp_native.decode_rgba(data)
                except ValueError:
                    pass  # malformed-for-libwebp: pure route decides
                else:
                    if (payload[4] >> 4) & 1:
                        return rgba
                    return rgba[:, :, :3].copy()
            vp8l = payload
            break
        if fourcc == b"VP8 ":
            from . import webp_native

            if webp_native.available():
                try:
                    rgba = webp_native.decode_rgba(data)
                except ValueError:
                    # libwebp enforces container rules the spec path
                    # tolerates (e.g. ALPH without a VP8X header, which
                    # _decode_frame_payload's re-mux of ANMF still
                    # chunks produces) — fall through to the pure route,
                    # which is gated bit-exact against it anyway
                    pass
                else:
                    return rgba if alph is not None else rgba[:, :, :3].copy()
            rgb = _decode_lossy_rgb(payload)
            if alph is None:
                return rgb
            h, w = rgb.shape[:2]
            a = _decode_alpha(alph, w, h)
            return np.concatenate([rgb, a[:, :, None]], axis=2)
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("RIFF/WEBP without a VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Bits(vp8l, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    pixels, transforms = _decode_image_stream(br, w, h, True)
    pixels, w = _apply_transforms(pixels, transforms, w, h)
    arr = np.array(pixels, dtype=np.uint8).reshape(h, w, 4)  # A,R,G,B
    rgba = arr[:, :, [1, 2, 3, 0]]
    return rgba if has_alpha else rgba[:, :, :3].copy()


# ---------------------------------------------------------------------------
# Minimal VP8L synthesizer for the gated query path.
# ---------------------------------------------------------------------------


class _BitsW:
    """LSB-first bit writer (the synthesizer's mirror of ``_Bits``)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def put(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def put_msb(self, code: int, n: int) -> None:
        """Prefix-code bits go most-significant-first (the decoder walks
        ``code = (code << 1) | read(1)``)."""
        for i in range(n - 1, -1, -1):
            self.put((code >> i) & 1, 1)


WEBP_R_CONST = 7
WEBP_B_CONST = 201


def synth_webp_gray(seed: int, w: int, h: int) -> bytes:
    """Deterministic single-plane VP8L payload for the gated image-codec
    query (the image analog of ``multimodal.synth_avi_dib``): green
    pixel (y, x) = ``(seed*31 + y*7 + x*3) % 251``, red/blue the
    WEBP_R_CONST/WEBP_B_CONST constants, opaque alpha, ``has_alpha=0``
    so ``decode_webp`` returns HxWx3 RGB.

    The stream is the no-transform, no-cache, single-group literal form:
    green carries a FULL uniform 8-bit canonical code over symbols
    0..255 (so each pixel's green byte is its own codeword), and the
    red/blue/alpha/distance codes are the zero-bit simple form.  Kept
    deliberately independent of the in-test encoder
    (tests/test_webp_codec.py) so encode and decode goldens don't share
    a bug."""
    bw = _BitsW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint: none
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta-prefix image
    # green: normal form, every symbol 0..255 at length 8 (a full code:
    # 256 * 2^-8 == 1), lengths coded by the {0:1, 8:1} cl code
    bw.put(0, 1)  # not simple
    bw.put(15, 4)  # 19 code-length lengths follow
    for s in _CL_ORDER:
        bw.put(1 if s in (0, 8) else 0, 3)
    bw.put(1, 1)  # max_symbol cap present
    bw.put(3, 3)  # length_nbits selector -> 8 bits
    bw.put(254, 8)  # cap = 2 + 254 = 256 reads
    for _ in range(256):
        bw.put_msb(1, 1)  # cl code: sym 8 -> canonical code 1
    # red / blue / alpha: one-symbol simple codes (zero bits per pixel)
    for const in (WEBP_R_CONST, WEBP_B_CONST, 255):
        bw.put(1, 1)  # simple
        bw.put(0, 1)  # one symbol
        bw.put(1, 1)  # 8-bit first symbol
        bw.put(const, 8)
    # distance: one-symbol simple code (never read — literals only)
    bw.put(1, 1)
    bw.put(0, 1)
    bw.put(1, 1)
    bw.put(0, 8)
    for y in range(h):
        for x in range(w):
            g = (seed * 31 + y * 7 + x * 3) % 251
            bw.put_msb(g, 8)  # uniform canonical code: codeword == symbol
    vp8l = bytes([0x2F]) + bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM/ANMF) — same surface shape as the GIF
# animation API: full composited frame list + the first frame for the
# decode_image contract.
# ---------------------------------------------------------------------------


def _decode_frame_payload(payload: bytes):
    """ANMF frame data → (h, w, 4) uint8 RGBA via the still decoders
    (an ALPH subchunk may precede the VP8 one; VP8L carries its own
    alpha)."""
    import numpy as np

    wrapped = (
        b"RIFF"
        + struct.pack("<I", 4 + len(payload))
        + b"WEBP"
        + payload
    )
    out = decode_webp(wrapped)
    if out.shape[2] == 3:
        out = np.concatenate(
            [out, np.full(out.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    return out


def decode_webp_frames(data: bytes):
    """Animated WebP: list of composited HWC uint8 RGBA canvas frames
    (one per ANMF chunk), honoring the per-frame blend flag (straight
    alpha compositing, T.81-free integer-exact via the float formula
    rounded once) and dispose-to-background.  The canvas starts fully
    transparent (the ANIM background color is a hint most renderers
    ignore; transparent-start is the browser behavior, same choice the
    GIF decoder documents for its unobservable initial state).  A
    non-animated still decodes as a single full-canvas frame."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    frames = []
    animated = False
    canvas = None
    cw = ch = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            raise ValueError("truncated RIFF chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X":
            if len(payload) < 10:
                raise ValueError("short VP8X chunk")
            animated = bool(payload[0] & 0x02)
            cw = 1 + int.from_bytes(payload[4:7], "little")
            ch = 1 + int.from_bytes(payload[7:10], "little")
            canvas = np.zeros((ch, cw, 4), np.uint8)
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X")
            fx = 2 * int.from_bytes(payload[0:3], "little")
            fy = 2 * int.from_bytes(payload[3:6], "little")
            fw = 1 + int.from_bytes(payload[6:9], "little")
            fh = 1 + int.from_bytes(payload[9:12], "little")
            flags = payload[15]
            blend = not (flags & 0x02)  # bit set = do NOT blend
            dispose_bg = bool(flags & 0x01)
            frame = _decode_frame_payload(bytes(payload[16:]))
            if frame.shape[:2] != (fh, fw):
                raise ValueError(
                    f"ANMF geometry {fh}x{fw} != decoded {frame.shape[:2]}"
                )
            if fx + fw > cw or fy + fh > ch:
                raise ValueError("ANMF frame exceeds the canvas")
            dst = canvas[fy : fy + fh, fx : fx + fw].astype(np.float64)
            src = frame.astype(np.float64)
            if blend:
                sa = src[:, :, 3:4] / 255.0
                da = dst[:, :, 3:4] / 255.0
                oa = sa + da * (1.0 - sa)
                rgb = np.where(
                    oa > 0,
                    (src[:, :, :3] * sa + dst[:, :, :3] * da * (1.0 - sa))
                    / np.maximum(oa, 1e-12),
                    0.0,
                )
                comp = np.concatenate([rgb, oa * 255.0], axis=2)
            else:
                comp = src
            canvas[fy : fy + fh, fx : fx + fw] = np.clip(
                np.round(comp), 0, 255
            ).astype(np.uint8)
            frames.append(canvas.copy())
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = 0
        pos += 8 + size + (size & 1)
    if frames and not animated:
        # ANMF chunks under a VP8X header whose animation flag is clear:
        # malformed — and falling through to the still path would
        # re-enter decode_webp on the same ANMF-bearing bytes (mutual
        # recursion, ADVICE r10).
        raise ValueError("ANMF chunks present but VP8X animation flag unset")
    if not animated or not frames:
        # still image (possibly VP8X-wrapped): one full-canvas frame
        import numpy as np

        out = decode_webp(data)
        if out.shape[2] == 3:
            out = np.concatenate(
                [out, np.full(out.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        return [out]
    return frames
