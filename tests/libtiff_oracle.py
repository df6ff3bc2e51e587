"""ctypes binding to the system libtiff — the independent TIFF oracle.

The sandbox ships ``libtiff.so.6`` without dev headers, so unlike the
JPEG/PNG golden tools this one binds the public API (tiffio.h) via
ctypes instead of a compiled wrapper.  Only functions with stable
signatures are used; the two varargs entry points (TIFFSetField /
TIFFGetField) are called with explicitly wrapped ctypes values — the
TIFF* handle in particular MUST travel as c_void_p or the x86-64
varargs call truncates it to 32 bits.

Encode/decode go through temp files (TIFFOpen) rather than replicating
the client-proc memory API.  Decode uses TIFFReadRGBAImageOriented —
libtiff's own full pipeline (strip assembly, LZW/PackBits expansion,
predictor, colormap application) normalized to top-left RGBA.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

_lib = None
_err: str | None = None


def _load():
    global _lib, _err
    if _lib is not None or _err is not None:
        return _lib
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError as e:
        _err = str(e)
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFWriteEncodedStrip.restype = ctypes.c_long
    lib.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.TIFFWriteEncodedTile.restype = ctypes.c_long
    lib.TIFFWriteEncodedTile.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# (tag, varargs value type): uint16-typed tags are read by libtiff as
# promoted int from the va_list; uint32 tags as uint32
_TAGS = {
    256: ctypes.c_uint32,  # ImageWidth
    257: ctypes.c_uint32,  # ImageLength
    258: ctypes.c_int,     # BitsPerSample
    259: ctypes.c_int,     # Compression
    262: ctypes.c_int,     # Photometric
    277: ctypes.c_int,     # SamplesPerPixel
    278: ctypes.c_uint32,  # RowsPerStrip
    284: ctypes.c_int,     # PlanarConfig
    317: ctypes.c_int,     # Predictor
    322: ctypes.c_uint32,  # TileWidth
    323: ctypes.c_uint32,  # TileLength
}


def encode(img: np.ndarray, *, compression: int, rows_per_strip: int = 4,
           predictor: int | None = None, tile: tuple[int, int] | None = None,
           planar: bool = False, bits: int = 8) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → TIFF bytes via libtiff's
    real encoder (COMPRESSION_NONE=1 / LZW=5 / PACKBITS=32773).
    ``tile=(tw, tl)`` writes a tiled file (tw/tl multiples of 16 per
    TIFF6); ``planar=True`` writes PlanarConfiguration=2 (separate
    planes, sample-major segment order — libtiff's TIFFComputeStrip/
    TIFFComputeTile numbering)."""
    lib = _load()
    assert lib is not None
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    dt = np.uint16 if bits == 16 else np.uint8
    img3 = img.reshape(h, w, spp).astype(dt)  # native-endian for libtiff
    path = tempfile.mktemp(suffix=".tif")
    tif = lib.TIFFOpen(path.encode(), b"w")
    if not tif:
        raise RuntimeError("TIFFOpen(w) failed")
    fields = [(256, w), (257, h), (258, bits), (259, compression),
              (262, 1 if gray else 2), (277, spp),
              (284, 2 if planar else 1)]
    if tile is not None:
        fields += [(322, tile[0]), (323, tile[1])]
    else:
        fields.append((278, rows_per_strip))
    if predictor is not None:
        fields.append((317, predictor))
    for tag, val in fields:
        lib.TIFFSetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(tag), _TAGS[tag](val)
        )
    # whole encoded segments, NOT TIFFWriteScanline: this libtiff
    # build's scanline path records PREDICTOR=2 in the directory but
    # writes undifferenced data (observed empirically — its own reader
    # then mis-accumulates), while the encoded-strip/tile path applies
    # the predictor correctly.  libtiff differences the buffer IN
    # PLACE, hence the .copy() on every segment.
    planes = range(spp) if planar else (None,)
    seg = 0
    try:
        if tile is not None:
            tw, tl = tile
            for p in planes:
                for y0 in range(0, h, tl):
                    for x0 in range(0, w, tw):
                        pad = np.zeros(
                            (tl, tw, 1 if planar else spp), dt
                        )
                        src = (img3[y0:y0 + tl, x0:x0 + tw, p:p + 1]
                               if planar else img3[y0:y0 + tl, x0:x0 + tw])
                        pad[: src.shape[0], : src.shape[1]] = src
                        buf = np.ascontiguousarray(pad)
                        if lib.TIFFWriteEncodedTile(
                            tif, seg, buf.ctypes.data_as(ctypes.c_void_p),
                            buf.nbytes,
                        ) < 0:
                            raise RuntimeError(f"tile {seg} write failed")
                        seg += 1
        else:
            for p in planes:
                for y0 in range(0, h, rows_per_strip):
                    src = (img3[y0:y0 + rows_per_strip, :, p:p + 1]
                           if planar else img3[y0:y0 + rows_per_strip])
                    buf = np.ascontiguousarray(src).copy()
                    if lib.TIFFWriteEncodedStrip(
                        tif, seg, buf.ctypes.data_as(ctypes.c_void_p),
                        buf.nbytes,
                    ) < 0:
                        raise RuntimeError(f"strip {seg} write failed")
                    seg += 1
    except Exception:
        lib.TIFFClose(tif)
        os.unlink(path)
        raise
    lib.TIFFClose(tif)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def decode_rgba(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 4) uint8 RGBA via libtiff's own full read
    pipeline, top-left oriented."""
    lib = _load()
    assert lib is not None
    path = tempfile.mktemp(suffix=".tif")
    open(path, "wb").write(data)
    tif = lib.TIFFOpen(path.encode(), b"r")
    if not tif:
        os.unlink(path)
        raise ValueError("libtiff could not open payload")
    try:
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        lib.TIFFGetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(256), ctypes.byref(w)
        )
        lib.TIFFGetField(
            ctypes.c_void_p(tif), ctypes.c_uint32(257), ctypes.byref(h)
        )
        raster = (ctypes.c_uint32 * (w.value * h.value))()
        if lib.TIFFReadRGBAImageOriented(tif, w, h, raster, 1, 0) != 1:
            raise ValueError("libtiff could not decode payload")
        # packed ABGR words; little-endian memory order is R,G,B,A
        return np.frombuffer(bytearray(raster), np.uint8).reshape(
            h.value, w.value, 4
        )
    finally:
        lib.TIFFClose(tif)
        os.unlink(path)
