"""BMP (Windows DIB) decoder — bytes → HWC uint8 RGB.

Part of the round-9 common-format sweep (GIF/BMP/TIFF): BMP is the
uncompressed-raster workhorse of scraped corpora and integer-exact
end-to-end, so it fits the golden-test pattern
(tests/test_bmp_codec.py carries an independently written in-test
encoder).

Implemented:
- BITMAPFILEHEADER + BITMAPINFOHEADER (40) and its V2-V5 extensions
  (52/56/64/108/124 — extra bytes skipped), plus the OS/2
  BITMAPCOREHEADER (12, 3-byte palette entries);
- 1/4/8-bit palette rows (MSB-first sub-byte packing, 4-byte row
  padding), 16-bit (X1R5G5B5 default and BI_BITFIELDS masks with any
  contiguous 16/32-bit channel masks), 24-bit BGR, 32-bit BGRX;
- RLE8 and RLE4 (encoded runs, absolute mode with word padding, EOL /
  EOB / delta escapes — delta-skipped pixels stay at the documented
  index-0 fill);
- bottom-up (positive height) and top-down (negative height) rows.

Corrupt/truncated payloads raise ValueError; genuinely absent
features (multi-plane, JPEG/PNG-embedded BI_JPEG/BI_PNG pass-through)
raise NotImplementedError — same codec contract as
operators/multimodal.py.  The reference has no codec layer; SURVEY
§2B north-star multimodal surface.
"""

from __future__ import annotations

import struct


def _mask_shift(mask: int) -> tuple[int, int]:
    """(right shift, width) for one contiguous channel mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise ValueError(f"non-contiguous BMP channel mask 0x{mask:x}")
    return shift, width


def _expand_channel(v, shift: int, width: int):
    """Scale a ``width``-bit channel to 8 bits (left-shift + replicate)."""
    import numpy as np

    if width == 0:
        return np.zeros_like(v, dtype=np.uint8)
    c = (v >> shift) & ((1 << width) - 1)
    if width >= 8:
        return (c >> (width - 8)).astype(np.uint8)
    # bit replication: the standard expansion (e.g. 5-bit 31 -> 255) —
    # repeat the channel's bit pattern down the 8-bit range
    out = np.zeros_like(c, dtype=np.int64)
    pos = 8
    while pos > 0:
        pos -= width
        if pos >= 0:
            out |= c << pos
        else:
            out |= c >> (-pos)
    return out.astype(np.uint8)


def _rle_decode(data: bytes, w: int, h: int, four_bit: bool):
    """RLE8/RLE4 → row-major index raster (bottom-up source order)."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h:  # end-of-line/delta may park y at h; writes must not
                raise ValueError("BMP RLE pixel data past last row")
            if four_bit:
                pair = ((val >> 4) & 0xF, val & 0xF)
                for k in range(cnt):
                    if x >= w:
                        raise ValueError("BMP RLE run past row end")
                    out[y, x] = pair[k & 1]
                    x += 1
            else:
                if x + cnt > w:
                    raise ValueError("BMP RLE run past row end")
                out[y, x : x + cnt] = val
                x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("BMP RLE past last row")
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE delta out of range")
        else:  # absolute mode: val literal pixels, word-aligned
            cnt = val
            if y >= h:
                raise ValueError("BMP RLE pixel data past last row")
            if four_bit:
                nbytes = (cnt + 1) // 2
                pad = (2 - nbytes % 2) % 2
                if i + nbytes > n:
                    raise ValueError("truncated BMP RLE absolute run")
                for k in range(cnt):
                    b = data[i + k // 2]
                    if x >= w:
                        raise ValueError("BMP RLE absolute past row end")
                    out[y, x] = (b >> 4) & 0xF if k % 2 == 0 else b & 0xF
                    x += 1
                i += nbytes + pad
            else:
                pad = cnt % 2
                if i + cnt > n:
                    raise ValueError("truncated BMP RLE absolute run")
                if x + cnt > w:
                    raise ValueError("BMP RLE absolute past row end")
                out[y, x : x + cnt] = np.frombuffer(
                    data[i : i + cnt], dtype=np.uint8
                )
                x += cnt
                i += cnt + pad
    raise ValueError("BMP RLE stream ended without end-of-bitmap")


def decode_bmp(data: bytes):
    """bytes → HWC uint8 RGB ndarray."""
    import numpy as np

    if bytes(data[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    if len(data) < 18:
        raise ValueError("truncated BMP file header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size == 12:  # BITMAPCOREHEADER
        if len(data) < 26:
            raise ValueError("truncated BMP core header")
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, 18)
        top_down = False
        compression = 0
        clr_used = 0
        pal_entry = 3
    elif hdr_size >= 40:
        if len(data) < 14 + hdr_size:
            raise ValueError("truncated BMP info header")
        w, h = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        clr_used = struct.unpack_from("<I", data, 46)[0]
        top_down = h < 0
        h = abs(h)
        pal_entry = 4
    else:
        raise ValueError(f"unknown BMP header size {hdr_size}")
    if planes != 1:
        raise NotImplementedError(f"{planes}-plane BMP")
    if w <= 0 or h == 0:
        raise ValueError("illegal BMP dimensions")
    if compression in (4, 5):
        raise NotImplementedError("BI_JPEG/BI_PNG embedded BMP")
    if compression not in (0, 1, 2, 3):
        raise ValueError(f"unknown BMP compression {compression}")

    masks = None
    if compression == 3:
        if bpp not in (16, 32):
            raise ValueError("BI_BITFIELDS requires 16/32 bpp")
        # Masks sit at byte 54 either way: appended after a 40-byte
        # BITMAPINFOHEADER, or as the in-header RGB-mask fields of
        # V2+/V4/V5 headers (which start at info offset 40 = file 54).
        masks = struct.unpack_from("<III", data, 54)
    elif bpp == 16:
        masks = (0x7C00, 0x03E0, 0x001F)
    elif bpp == 32:
        masks = (0x00FF0000, 0x0000FF00, 0x000000FF)

    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        poff = 14 + hdr_size
        if hdr_size == 40 and compression == 3:
            poff += 12
        end = poff + pal_entry * n
        if end > len(data):
            raise ValueError("truncated BMP palette")
        raw = np.frombuffer(data[poff:end], dtype=np.uint8).reshape(
            n, pal_entry
        )
        palette = raw[:, [2, 1, 0]].copy()  # BGR(A) → RGB

    if pix_off > len(data):
        raise ValueError("BMP pixel offset past end of file")
    pix = data[pix_off:]

    if compression in (1, 2):  # RLE8 / RLE4
        if bpp != (8 if compression == 1 else 4):
            raise ValueError("BMP RLE compression/bpp mismatch")
        idx = _rle_decode(bytes(pix), w, h, four_bit=(compression == 2))
        if not top_down:  # RLE rows are stored bottom-up
            idx = idx[::-1]
        if palette is None or int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP RLE index outside palette")
        return palette[idx]

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    if len(pix) < need:
        raise ValueError(
            f"truncated BMP raster: want {need} bytes, got {len(pix)}"
        )
    rows = np.frombuffer(bytes(pix[:need]), dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        else:
            per = 8 // bpp
            mask = (1 << bpp) - 1
            cols = np.arange(w)
            byte = rows[:, cols // per]
            shift = (per - 1 - (cols % per)) * bpp
            idx = (byte >> shift) & mask
        idx = idx.astype(np.uint8)
        if palette is None or int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index outside palette")
        return palette[idx]
    if bpp == 16:
        v = rows[:, : 2 * w].reshape(h, w, 2)
        v = v[:, :, 0].astype(np.int64) | (v[:, :, 1].astype(np.int64) << 8)
        chans = [
            _expand_channel(v, *_mask_shift(m)) for m in masks
        ]
        return np.stack(chans, axis=-1)
    if bpp == 24:
        v = rows[:, : 3 * w].reshape(h, w, 3)
        return v[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 32:
        v = rows[:, : 4 * w].reshape(h, w, 4)
        le = (
            v[:, :, 0].astype(np.int64)
            | (v[:, :, 1].astype(np.int64) << 8)
            | (v[:, :, 2].astype(np.int64) << 16)
            | (v[:, :, 3].astype(np.int64) << 24)
        )
        chans = [_expand_channel(le, *_mask_shift(m)) for m in masks]
        return np.stack(chans, axis=-1)
    raise NotImplementedError(f"{bpp}-bpp BMP")


def synth_bmp_gray(seed: int, w: int, h: int) -> bytes:
    """A genuine bottom-up 8-bit palette BMP with pixel
    g(x, y) = (seed*29 + y*11 + x*5) % 241 — the same formula as the
    other image synthesizers so the router gate can assert cross-format
    equality (queries/multimodal.image_codec_router_matrix)."""
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, i, i, 0])  # BGRA with B=G=R=i
    stride = (w + 3) // 4 * 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes((seed * 29 + y * 11 + x * 5) % 241 for x in range(w))
        raster += row + b"\x00" * (stride - w)
    pix_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(raster), 2835, 2835, 256, 0
    )
    return hdr + info + bytes(pal) + bytes(raster)
