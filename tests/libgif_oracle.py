"""ctypes binding to the system giflib — the independent GIF oracle.

The sandbox ships ``libgif.so.7`` (giflib 5.2) without dev headers, so
this binds the public API (gif_lib.h) via ctypes with the 5.x struct
layouts replicated below.  The layouts are validated functionally: a
wrong field offset scrambles dimensions/rasters and every test fails
loudly rather than silently passing.

Roles, mirroring the libwebp/libjpeg/libpng/libtiff oracles:

- ``encode``: giflib's REAL LZW encoder (its own code-width growth,
  clear-code policy and sub-block framing) produces streams the
  pure-Python decoder must reproduce exactly;
- ``decode_frames``: DGifSlurp's view of files our encoders produce —
  per-image index rasters plus the palette, pre-composition, so the
  comparison is free of disposal-convention choices.
"""

from __future__ import annotations

import ctypes as C
import os
import tempfile

import numpy as np

_lib = None
_err: str | None = None


class GifColorType(C.Structure):
    _fields_ = [("Red", C.c_ubyte), ("Green", C.c_ubyte), ("Blue", C.c_ubyte)]


class ColorMapObject(C.Structure):
    _fields_ = [
        ("ColorCount", C.c_int), ("BitsPerPixel", C.c_int),
        ("SortFlag", C.c_bool), ("Colors", C.POINTER(GifColorType)),
    ]


class GifImageDesc(C.Structure):
    _fields_ = [
        ("Left", C.c_int), ("Top", C.c_int), ("Width", C.c_int),
        ("Height", C.c_int), ("Interlace", C.c_bool),
        ("ColorMap", C.POINTER(ColorMapObject)),
    ]


class ExtensionBlock(C.Structure):
    _fields_ = [
        ("ByteCount", C.c_int), ("Bytes", C.POINTER(C.c_ubyte)),
        ("Function", C.c_int),
    ]


class SavedImage(C.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc), ("RasterBits", C.POINTER(C.c_ubyte)),
        ("ExtensionBlockCount", C.c_int),
        ("ExtensionBlocks", C.POINTER(ExtensionBlock)),
    ]


class GifFileType(C.Structure):
    _fields_ = [
        ("SWidth", C.c_int), ("SHeight", C.c_int),
        ("SColorResolution", C.c_int), ("SBackGroundColor", C.c_int),
        ("AspectByte", C.c_ubyte), ("SColorMap", C.POINTER(ColorMapObject)),
        ("ImageCount", C.c_int), ("Image", GifImageDesc),
        ("SavedImages", C.POINTER(SavedImage)),
        ("ExtensionBlockCount", C.c_int),
        ("ExtensionBlocks", C.POINTER(ExtensionBlock)),
        ("Error", C.c_int), ("UserData", C.c_void_p), ("Private", C.c_void_p),
    ]


def _load():
    global _lib, _err
    if _lib is not None or _err is not None:
        return _lib
    try:
        lib = C.CDLL("libgif.so.7")
    except OSError as e:
        _err = str(e)
        return None
    lib.DGifOpenFileName.restype = C.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [C.c_char_p, C.POINTER(C.c_int)]
    lib.DGifSlurp.restype = C.c_int
    lib.DGifSlurp.argtypes = [C.POINTER(GifFileType)]
    lib.DGifCloseFile.argtypes = [C.POINTER(GifFileType), C.POINTER(C.c_int)]
    lib.EGifOpenFileName.restype = C.c_void_p
    lib.EGifOpenFileName.argtypes = [C.c_char_p, C.c_bool, C.POINTER(C.c_int)]
    lib.GifMakeMapObject.restype = C.POINTER(ColorMapObject)
    lib.GifMakeMapObject.argtypes = [C.c_int, C.POINTER(GifColorType)]
    lib.GifFreeMapObject.argtypes = [C.POINTER(ColorMapObject)]
    lib.EGifPutScreenDesc.restype = C.c_int
    lib.EGifPutScreenDesc.argtypes = [
        C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int,
        C.POINTER(ColorMapObject),
    ]
    lib.EGifPutImageDesc.restype = C.c_int
    lib.EGifPutImageDesc.argtypes = [
        C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int, C.c_bool,
        C.POINTER(ColorMapObject),
    ]
    lib.EGifPutLine.restype = C.c_int
    lib.EGifPutLine.argtypes = [C.c_void_p, C.POINTER(C.c_ubyte), C.c_int]
    lib.EGifCloseFile.restype = C.c_int
    lib.EGifCloseFile.argtypes = [C.c_void_p, C.POINTER(C.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode(idx: np.ndarray, palette: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) palette indices + (n, 3) palette → GIF89a bytes via
    giflib's real encoder.  For interlaced files EGifPutLine expects the
    caller to supply rows in pass order (giflib writes sequentially)."""
    lib = _load()
    assert lib is not None
    h, w = idx.shape
    n = len(palette)
    assert n & (n - 1) == 0 and 2 <= n <= 256
    colors = (GifColorType * n)()
    for i, (r, g, b) in enumerate(palette):
        colors[i] = GifColorType(int(r), int(g), int(b))
    cmap = lib.GifMakeMapObject(n, colors)
    err = C.c_int()
    path = tempfile.mktemp(suffix=".gif")
    gf = lib.EGifOpenFileName(path.encode(), False, C.byref(err))
    if not gf:
        raise RuntimeError(f"EGifOpenFileName: {err.value}")
    try:
        assert lib.EGifPutScreenDesc(gf, w, h, 8, 0, cmap) == 1
        assert lib.EGifPutImageDesc(gf, 0, 0, w, h, interlace, None) == 1
        order = (
            [y for y0, dy in _INTERLACE_PASSES for y in range(y0, h, dy)]
            if interlace else range(h)
        )
        for y in order:
            row = np.ascontiguousarray(idx[y], dtype=np.uint8)
            assert lib.EGifPutLine(
                gf, row.ctypes.data_as(C.POINTER(C.c_ubyte)), w
            ) == 1
    finally:
        assert lib.EGifCloseFile(gf, C.byref(err)) == 1
        lib.GifFreeMapObject(cmap)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def decode_frames(data: bytes):
    """GIF bytes → list of dicts per image block: index raster in
    DISPLAY order (DGifSlurp de-interlaces internally, reading the four
    passes into their display rows), geometry, and the effective RGB
    palette."""
    lib = _load()
    assert lib is not None
    path = tempfile.mktemp(suffix=".gif")
    open(path, "wb").write(data)
    err = C.c_int()
    g = lib.DGifOpenFileName(path.encode(), C.byref(err))
    if not g:
        os.unlink(path)
        raise ValueError(f"giflib could not open payload: {err.value}")
    try:
        if lib.DGifSlurp(g) != 1:
            raise ValueError(f"giflib slurp error {g.contents.Error}")
        gf = g.contents
        out = []
        for i in range(gf.ImageCount):
            si = gf.SavedImages[i]
            d = si.ImageDesc
            raster = np.ctypeslib.as_array(
                si.RasterBits, shape=(d.Height * d.Width,)
            ).copy().reshape(d.Height, d.Width)
            cm = (d.ColorMap if d.ColorMap else gf.SColorMap).contents
            colors = np.ctypeslib.as_array(
                C.cast(cm.Colors, C.POINTER(C.c_ubyte)),
                shape=(cm.ColorCount * 3,),
            ).copy().reshape(-1, 3)
            out.append({
                "raster": raster,
                "left": d.Left, "top": d.Top,
                "interlace": bool(d.Interlace),
                "palette": colors,
                "canvas": (gf.SHeight, gf.SWidth),
            })
        return out
    finally:
        lib.DGifCloseFile(g, C.byref(err))
        os.unlink(path)
