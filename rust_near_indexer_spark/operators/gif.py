"""GIF decoder (87a/89a) — bytes → HWC uint8 RGB frames.

After WebP lossless (round 9's VERDICT #5 item), GIF is the next most
common real-corpus image format that still raised.  GIF is integer-
exact (palette indices through LZW), so it fits the repo's golden-test
pattern: tests/test_gif_codec.py carries an INDEPENDENTLY written
in-test GIF encoder (full greedy-LZW with dictionary growth to 12
bits) and asserts bit-exact round-trips; the product-side synthesizer
below uses the opposite strategy (literal-only codes with periodic
CLEAR) so the two implementations share no code path.

Implemented (the full 89a feature surface):
- header + logical screen descriptor, global/local color tables of
  every legal size (2..256 entries);
- LZW decompression: LSB-first codes across length-prefixed
  sub-blocks, variable width 3..12 bits, CLEAR/EOI, the KwKwK case,
  deferred-clear streams that sit at 12 bits with a full dictionary;
- the 4-pass interlace;
- 89a extensions: graphic control (transparency index, disposal
  method, delay), NETSCAPE loop count, comment / plain-text /
  unknown application blocks skipped by sub-block walking;
- multi-frame compositing with all four disposal methods
  (unspecified / keep / restore-background / restore-previous).

Corrupt or truncated streams raise ValueError (codec contract, same
policy as operators/multimodal.py).  The reference has no codec layer
(it ships bytes to ClickHouse); this is SURVEY §2B north-star
multimodal surface.
"""

from __future__ import annotations

import struct

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


class _LzwBits:
    """LSB-first bit reader over the concatenation of the image data
    sub-blocks (GIF packs LZW codes little-endian within bytes)."""

    def __init__(self, blocks: bytes) -> None:
        self.data = blocks
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at ``pos``;
    returns (payload, position after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block body")
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(blocks: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW: width starts at min_code_size+1 and grows when
    the dictionary reaches 2**width (capped at 12); CLEAR resets;
    deferred clear (full dictionary, no reset) is legal and handled."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"illegal GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = _LzwBits(blocks)
    out = bytearray()

    def fresh() -> list:
        d = [bytes([i]) for i in range(clear)]
        d += [b"", b""]  # CLEAR / EOI placeholders keep indices aligned
        return d

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = bits.read(width)
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad GIF LZW code {code} (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"short GIF raster: want {n_pixels} pixels, got {len(out)}"
        )
    return out[:n_pixels]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows_in_order, h: int):
    """Map sequentially decoded rows back to display order (4 passes)."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = [None] * h
    for src, dst in enumerate(order):
        out[dst] = rows_in_order[src]
    return out


def _color_table(data: bytes, pos: int, n: int):
    import numpy as np

    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    tbl = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3).copy()
    return tbl, end


def parse_gif(data: bytes) -> dict:
    """Container walk → logical-screen fields + per-frame raw rasters
    (palette indices, BEFORE compositing).  ``decode_gif_frames``
    layers disposal/transparency on top."""
    import numpy as np

    if bytes(data[:6]) not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_index = data[11]
    pos = 13
    global_pal = None
    if packed & 0x80:
        global_pal, pos = _color_table(data, pos, 2 << (packed & 0x07))
    frames: list[dict] = []
    loop_count = None
    # pending graphic-control state applies to the NEXT image only
    gc_transparent = None
    gc_disposal = 0
    gc_delay_cs = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            payload, pos = _subblocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(payload) < 4:
                    raise ValueError("short graphic control block")
                flags = payload[0]
                gc_disposal = (flags >> 2) & 0x07
                gc_delay_cs = struct.unpack_from("<H", payload, 1)[0]
                gc_transparent = payload[3] if flags & 0x01 else None
            elif label == 0xFF and payload[:11] == b"NETSCAPE2.0":
                if len(payload) >= 14 and payload[11] == 1:
                    loop_count = struct.unpack_from("<H", payload, 12)[0]
            # comments (0xFE), plain text (0x01), other apps: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", data, pos)
        fpacked = data[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rectangle outside logical screen")
        pal = global_pal
        if fpacked & 0x80:
            pal, pos = _color_table(data, pos, 2 << (fpacked & 0x07))
        if pal is None:
            raise ValueError("GIF frame without any color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code_size = data[pos]
        pos += 1
        blocks, pos = _subblocks(data, pos)
        indices = _lzw_decode(blocks, min_code_size, fw * fh)
        idx = np.frombuffer(bytes(indices), dtype=np.uint8).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced
            idx = np.array(_deinterlace(list(idx), fh), dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index outside color table")
        frames.append(
            {
                "x": fx,
                "y": fy,
                "w": fw,
                "h": fh,
                "indices": idx,
                "palette": pal,
                "transparent": gc_transparent,
                "disposal": gc_disposal,
                "delay_cs": gc_delay_cs,
            }
        )
        gc_transparent, gc_disposal, gc_delay_cs = None, 0, 0
    if not frames:
        raise ValueError("GIF with no image frames")
    return {
        "width": w,
        "height": h,
        "background_index": bg_index,
        "global_palette": global_pal,
        "loop_count": loop_count,
        "version": bytes(data[3:6]).decode("ascii"),
        "frames": frames,
    }


def decode_gif_frames(data: bytes):
    """Full animation decode: list of composited HWC uint8 RGB frames
    (one per image block), honoring transparency and all four disposal
    methods.  The canvas starts at the background color (or black when
    the background index is transparent / there is no global table —
    the common browser behavior for the unobservable initial state)."""
    import numpy as np

    g = parse_gif(data)
    h, w = g["height"], g["width"]
    gp = g["global_palette"]
    bg = (
        gp[g["background_index"]]
        if gp is not None and g["background_index"] < len(gp)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(bg, (h, w, 1)).astype(np.uint8)
    out: list = []
    for fr in g["frames"]:
        x, y, fw, fh = fr["x"], fr["y"], fr["w"], fr["h"]
        region_before = canvas[y : y + fh, x : x + fw].copy()
        rgb = fr["palette"][fr["indices"]]
        if fr["transparent"] is not None:
            keep = fr["indices"] != fr["transparent"]
            patch = canvas[y : y + fh, x : x + fw]
            patch[keep] = rgb[keep]
        else:
            canvas[y : y + fh, x : x + fw] = rgb
        out.append(canvas.copy())
        if fr["disposal"] == 2:  # restore to background
            canvas[y : y + fh, x : x + fw] = bg
        elif fr["disposal"] == 3:  # restore to previous
            canvas[y : y + fh, x : x + fw] = region_before
        # 0 / 1: leave the canvas as drawn
    return out


def decode_gif(data: bytes):
    """First composited frame as HWC uint8 RGB — the ``decode_image``
    contract (multimodal feature extraction wants one raster; the
    animation API above exposes the rest)."""
    return decode_gif_frames(data)[0]


# ---------------------------------------------------------------------------
# Product-side synthesizer for the gate query.  Deliberately the
# OPPOSITE encoding strategy from the in-test encoder (which implements
# greedy dictionary LZW): literal-only 9-bit codes with a CLEAR every
# 254 symbols so the width never grows — a legal, widely used
# "uncompressed GIF" form that still exercises the decoder's real CLEAR
# handling and sub-block framing.
# ---------------------------------------------------------------------------


class _LzwBitsW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _literal_lzw(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    bw = _LzwBitsW()
    bw.put(clear, width)
    budget = (1 << width) - len(
        range(clear + 2)
    )  # codes until the decoder would widen
    for b in indices:
        if budget <= 1:  # stay at the initial width: reset first
            bw.put(clear, width)
            budget = (1 << width) - (clear + 2)
        bw.put(b, width)
        budget -= 1
    bw.put(eoi, width)
    return bw.done()


def synth_gif_gray(seed: int, w: int, h: int) -> bytes:
    """A genuine GIF89a payload: 256-entry grayscale global table and
    pixel g(x, y) = (seed*29 + y*11 + x*5) % 241 — integer-exact, so a
    DuckDB oracle reproduces every decoded value from generate_series
    (queries/multimodal.image_codec_router_matrix)."""
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0xF7, 0x00, 0x00])
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, i, i])
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    idx = bytes(
        (seed * 29 + y * 11 + x * 5) % 241 for y in range(h) for x in range(w)
    )
    lzw = _literal_lzw(idx)
    body = bytearray([8])  # min code size
    i = 0
    while i < len(lzw):
        chunk = lzw[i : i + 255]
        body += bytes([len(chunk)]) + chunk
        i += 255
    body += b"\x00"
    return head + bytes(pal) + desc + bytes(body) + b"\x3b"
