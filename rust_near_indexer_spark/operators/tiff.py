"""Baseline TIFF decoder — bytes → HWC uint8 ndarray.

Part of the round-9 common-format sweep (GIF/BMP/TIFF).  TIFF 6.0
baseline is integer-exact for the raster classes real corpora carry
(scans, faxes, palette art), so it fits the golden-test pattern:
tests/test_tiff_codec.py carries an independently written in-test
TIFF writer with its own LZW and PackBits encoders and asserts
bit-exact round-trips in both byte orders.

Implemented:
- both byte orders (II little / MM big), classic 32-bit IFD walk,
  inline-vs-offset field values for BYTE/ASCII/SHORT/LONG types;
- strip organization (any RowsPerStrip, multi-strip), chunky
  PlanarConfiguration;
- Compression 1 (none), 32773 (PackBits), and 5 (LZW — MSB-first
  codes, 9→12-bit widths with TIFF's EARLY-CHANGE rule: the width
  grows one code sooner than GIF's LZW, a deliberate divergence the
  tests pin both of);
- Predictor 2 (horizontal differencing, per-sample row cumsum);
- pixel classes: 1-bit bilevel (WhiteIsZero and BlackIsZero), 8-bit
  gray, 16-bit gray (high byte exposed, same 16→8 reduction as the
  PNG/PNM paths), 8-bit RGB and RGBA-with-ExtraSamples (alpha
  dropped), 8-bit palette via the 16-bit ColorMap (high byte).

Tiled layout, planar configuration 2, CCITT/JPEG-in-TIFF and other
compressions raise NotImplementedError; corrupt structures raise
ValueError — the codec contract of operators/multimodal.py.  The
reference has no codec layer; SURVEY §2B north-star surface.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, e: str) -> dict[int, list[int]]:
    """First IFD → {tag: [values...]} for integer types."""
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    off = struct.unpack_from(e + "I", data, 4)[0]
    if off + 2 > len(data):
        raise ValueError("TIFF IFD offset past end")
    n = struct.unpack_from(e + "H", data, off)[0]
    fields: dict[int, list[int]] = {}
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ = struct.unpack_from(e + "HH", data, pos)
        count = struct.unpack_from(e + "I", data, pos + 4)[0]
        size = _TYPE_SIZES.get(typ)
        if size is None:
            pos += 12
            continue  # unknown field type: spec says skip
        total = size * count
        if total <= 4:
            voff = pos + 8
        else:
            voff = struct.unpack_from(e + "I", data, pos + 8)[0]
            if voff + total > len(data):
                raise ValueError(f"TIFF tag {tag} value past end")
        if typ in (3, 8):
            vals = [
                struct.unpack_from(e + "H", data, voff + 2 * i)[0]
                for i in range(count)
            ]
        elif typ in (4, 9):
            vals = [
                struct.unpack_from(e + "I", data, voff + 4 * i)[0]
                for i in range(count)
            ]
        elif typ in (1, 6, 7, 2):
            vals = list(data[voff : voff + count])
        else:  # RATIONAL etc. — unused by the raster path
            vals = []
        fields[tag] = vals
        pos += 12
    return fields


def _packbits(data: bytes, want: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < want and i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:  # no-op
            continue
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < want:
        raise ValueError(f"short PackBits strip: want {want}, got {len(out)}")
    return bytes(out[:want])


class _MsbBits:
    """MSB-first bit reader (TIFF LZW code order — the opposite of
    GIF's)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated TIFF LZW stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - width)) & ((1 << width) - 1)
        self.n -= width
        return v


def _tiff_lzw(data: bytes, want: int) -> bytes:
    """TIFF-flavor LZW: 8-bit roots, CLEAR=256, EOI=257, MSB-first
    codes, and the spec's EARLY CHANGE — width grows when the table
    reaches 2**width - 1 (one entry sooner than GIF)."""
    CLEAR, EOI = 256, 257
    bits = _MsbBits(data)
    out = bytearray()

    def fresh() -> list:
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    prev: bytes | None = None
    while len(out) < want:
        code = bits.read(width)
        if code == CLEAR:
            table = fresh()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and code not in (CLEAR, EOI):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad TIFF LZW code {code} (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change
        prev = entry
    if len(out) < want:
        raise ValueError(f"short TIFF LZW strip: want {want}, got {len(out)}")
    return bytes(out[:want])


def _assemble_segments(
    data: bytes, f: dict, e: str, w: int, h: int, b: int, spp: int,
    comp: int, predictor: int, planar: int, tiled: bool,
):
    """Assemble tiled and/or planar-separate TIFF segments into a
    native-dtype (h, w, spp) array.  Segment order follows libtiff's
    TIFFComputeStrip/TIFFComputeTile: row-major within a plane, planes
    outermost (sample-major).  Tiles are full-size padded per TIFF6
    §15 (edge tiles carry pad rows/cols, cropped here); the horizontal
    predictor is undone per segment row before placement."""
    import numpy as np

    dt = np.dtype(("<u2" if e == "<" else ">u2") if b == 16 else "u1")
    nb = b // 8
    planes = spp if planar == 2 else 1
    sppx = 1 if planar == 2 else spp
    offsets = f[324] if tiled else f[273]
    counts = f[325] if tiled else f[279]
    if tiled:
        tw = f.get(322, [w])[0]
        tl = f.get(323, [h])[0]
        if not tw or not tl:
            raise ValueError("zero TIFF tile dimensions")
        across = -(-w // tw)
        down = -(-h // tl)
        per_plane = across * down
    else:
        rps = f.get(278, [h])[0] or h
        per_plane = -(-h // rps)
    if len(offsets) != len(counts):
        raise ValueError("segment offsets/counts length mismatch")
    if len(offsets) < planes * per_plane:
        raise ValueError("too few TIFF segments for geometry")

    def seg_bytes(i: int, want: int) -> bytes:
        o, c = offsets[i], counts[i]
        if o + c > len(data):
            raise ValueError("TIFF segment past end of file")
        raw = data[o : o + c]
        if comp == 1:
            if len(raw) < want:
                raise ValueError("short uncompressed TIFF segment")
            return raw[:want]
        if comp == 32773:
            return _packbits(raw, want)
        return _tiff_lzw(raw, want)

    out = np.zeros((h, w, spp), np.uint16 if b == 16 else np.uint8)
    for p in range(planes):
        if tiled:
            for ty in range(down):
                for tx in range(across):
                    i = p * per_plane + ty * across + tx
                    want = tl * tw * sppx * nb
                    seg = np.frombuffer(seg_bytes(i, want), dt).reshape(
                        tl, tw, sppx
                    )
                    if predictor == 2:
                        seg = np.cumsum(seg.astype(np.int64), axis=1)
                        seg = seg.astype(np.uint16 if b == 16 else np.uint8)
                    y0, x0 = ty * tl, tx * tw
                    rows = min(tl, h - y0)
                    cols = min(tw, w - x0)
                    tgt = seg[:rows, :cols]
                    if planar == 2:
                        out[y0 : y0 + rows, x0 : x0 + cols, p] = tgt[:, :, 0]
                    else:
                        out[y0 : y0 + rows, x0 : x0 + cols, :] = tgt
        else:
            for s in range(per_plane):
                i = p * per_plane + s
                y0 = s * rps
                rows = min(rps, h - y0)
                want = rows * w * sppx * nb
                seg = np.frombuffer(seg_bytes(i, want), dt).reshape(
                    rows, w, sppx
                )
                if predictor == 2:
                    seg = np.cumsum(seg.astype(np.int64), axis=1)
                    seg = seg.astype(np.uint16 if b == 16 else np.uint8)
                if planar == 2:
                    out[y0 : y0 + rows, :, p] = seg[:, :, 0]
                else:
                    out[y0 : y0 + rows, :, :] = seg
    return out


def decode_tiff(data: bytes):
    """bytes → HWC uint8 ndarray (gray (h,w,1), RGB/palette (h,w,3))."""
    import numpy as np

    magic = bytes(data[:4])
    if magic[:2] == b"II" and magic[2:4] == b"*\x00":
        e = "<"
    elif magic[:2] == b"MM" and magic[2:4] == b"\x00*":
        e = ">"
    else:
        raise ValueError("not a classic TIFF payload")
    f = _read_ifd(data, e)
    tiled = 322 in f or 323 in f
    planar = f.get(284, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF PlanarConfiguration {planar}")
    try:
        w = f[256][0]
        h = f[257][0]
        if tiled:
            offsets = f[324]
            counts = f[325]
        else:
            offsets = f[273]
            counts = f[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    comp = f.get(259, [1])[0]
    photo = f.get(262, [1])[0]
    spp = f.get(277, [1])[0]
    bps = f.get(258, [1] * spp)
    rps = f.get(278, [h])[0] or h
    predictor = f.get(317, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    if len(set(bps)) != 1:
        raise NotImplementedError(f"mixed TIFF bits-per-sample {bps}")
    b = bps[0]
    if (b, photo) not in {
        (1, 0),
        (1, 1),
        (8, 0),
        (8, 1),
        (16, 0),
        (16, 1),
        (8, 2),
        (8, 3),
        (16, 2),
    }:
        raise NotImplementedError(
            f"TIFF class bits={b} photometric={photo} unsupported"
        )
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with SamplesPerPixel < 3")
    if photo != 2 and spp != 1:
        raise NotImplementedError("multi-sample non-RGB TIFF")
    if tiled or planar == 2 or (b == 16 and spp > 1):
        # tile grids, separate planes, and 16-bit multi-sample rasters
        # (TIFF6 §15 / PlanarConfig=2, r11 — golden-gated against
        # libtiff's own tile/plane writer in tests/test_tiff_golden.py):
        # assemble per segment, with the horizontal predictor applied
        # WITHIN each segment row (a tile row is its own differencing
        # run — cumsum across the full image row would bleed across
        # tile boundaries)
        if b not in (8, 16):
            raise NotImplementedError(
                f"tiled/planar TIFF at {b} bits per sample"
            )
        px = _assemble_segments(
            data, f, e, w, h, b, spp, comp, predictor, planar, tiled
        )
        if b == 16:
            if photo == 0:
                px = (np.uint16(0xFFFF) - px).astype(np.uint16)
            px = (px >> 8).astype(np.uint8)
        elif photo == 0:
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        if photo == 3:
            cmap = f.get(320)
            if not cmap or len(cmap) < 3 * 256:
                raise ValueError("palette TIFF without a full ColorMap")
            pal = (
                np.array(cmap[: 3 * 256], dtype=np.uint16).reshape(3, 256).T
                >> 8
            ).astype(np.uint8)
            return pal[px[:, :, 0]]
        if photo == 2:
            return px[:, :, :3].copy()
        return px
    row_bytes = (w * b * spp + 7) // 8
    n_strips = (h + rps - 1) // rps
    if len(offsets) < n_strips:
        raise ValueError("too few TIFF strips for image height")
    raster = bytearray()
    for s in range(n_strips):
        rows = min(rps, h - s * rps)
        want = rows * row_bytes
        o, c = offsets[s], counts[s]
        if o + c > len(data):
            raise ValueError("TIFF strip past end of file")
        strip = data[o : o + c]
        if comp == 1:
            if len(strip) < want:
                raise ValueError("short uncompressed TIFF strip")
            raster += strip[:want]
        elif comp == 32773:
            raster += _packbits(strip, want)
        else:
            raster += _tiff_lzw(strip, want)
    buf = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, row_bytes)

    if b == 1:
        cols = np.arange(w)
        bitvals = (buf[:, cols // 8] >> (7 - (cols % 8))) & 1
        if photo == 0:  # WhiteIsZero
            bitvals = 1 - bitvals
        return (bitvals * 255).astype(np.uint8)[:, :, None]
    if b == 16:
        dt = "<u2" if e == "<" else ">u2"
        v = np.frombuffer(bytes(raster), dtype=dt).reshape(h, w)
        if predictor == 2:
            v = np.cumsum(v.astype(np.int64), axis=1).astype(np.uint16)
        if photo == 0:
            v = np.uint16(0xFFFF) - v
        return (v >> 8).astype(np.uint8)[:, :, None]
    # 8-bit paths
    px = buf.reshape(h, w, spp) if spp > 1 else buf[:, :w][:, :, None]
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if photo == 3:
        cmap = f.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF without a full ColorMap")
        pal = (
            np.array(cmap[: 3 * 256], dtype=np.uint16)
            .reshape(3, 256)
            .T
            >> 8
        ).astype(np.uint8)
        return pal[px[:, :, 0]]
    if photo == 2:
        return px[:, :, :3].copy()  # drop ExtraSamples (alpha)
    if photo == 0:
        px = (255 - px.astype(np.int16)).astype(np.uint8)
    return px


def synth_tiff_gray(seed: int, w: int, h: int) -> bytes:
    """A genuine little-endian single-strip 8-bit gray TIFF with pixel
    g(x, y) = (seed*29 + y*11 + x*5) % 241 — same formula as the other
    synthesizers so the router gate asserts cross-format equality."""
    raster = bytes(
        (seed * 29 + y * 11 + x * 5) % 241 for y in range(h) for x in range(w)
    )
    # layout: header(8) IFD entries, raster after the IFD
    entries = [
        (256, 3, 1, w),  # ImageWidth
        (257, 3, 1, h),  # ImageLength
        (258, 3, 1, 8),  # BitsPerSample
        (259, 3, 1, 1),  # Compression: none
        (262, 3, 1, 1),  # BlackIsZero
        (273, 4, 1, None),  # StripOffsets (patched below)
        (277, 3, 1, 1),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip
        (279, 4, 1, len(raster)),  # StripByteCounts
    ]
    ifd_off = 8
    raster_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if val is None:
            val = raster_off
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # next-IFD terminator
    out += raster
    return bytes(out)
