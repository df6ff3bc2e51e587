"""ctypes route to the system libjpeg — native JPEG decode + test oracle.

Mirrors operators/webp_native.py (VERDICT r10 #2's proven pattern) for
JPEG (VERDICT r11 #3): where the system ``libjpeg`` and ``gcc`` exist,
``decode_image``'s JPEG branch routes through an in-process compiled
shim; the pure-Python T.81 decoder (operators/multimodal._decode_jpeg
+ operators/jpeg_arith.py) remains the fallback and the differential
oracle, gated BIT-EXACT against this route in tests/test_jpeg_native.py.

Unlike libwebp there is no stable public ``WebPDecodeRGBA``-style
one-call ABI to bind directly: libjpeg's API is a large setjmp-managed
struct whose layout varies per build, so binding it from ctypes would
read garbage on a mismatched header.  Instead a ~100-line C shim
(``_SHIM_SRC``) is compiled ON DEMAND against whatever jpeglib.h/.so
the machine carries and cached content-addressed; if gcc, the header,
or the library are absent, ``available()`` is False and every caller
falls back to the pure decoder.

The shim pins ONE decode convention so output is stable across libjpeg
builds and reproducible by the pure decoder:

- ``do_fancy_upsampling = FALSE`` — plain (box) chroma upsampling.
  With the default TRUE, IJG libjpeg uses the triangular "fancy"
  filter while libjpeg-turbo's merged upsampler is box — the SAME
  bytes would decode differently across builds.  Box is the one
  convention every build implements identically.
- default ``JDCT_ISLOW`` — the 13-bit fixed-point AAN IDCT every
  libjpeg build (and turbo's SIMD paths) computes bit-identically.
- default separate/merged fixed-point YCbCr→RGB tables (identical
  constants in jdcolor.c and jdmerge.c).

The pure decoder reproduces exactly this pipeline
(multimodal._jpeg_idct_islow / _jpeg_to_image / ycc_to_rgb), proven
bit-exact across the full sampling × quality × entropy matrix by
tests/test_jpeg_native.py — so the
``image_jpeg_decode_stats`` pins hold with or without the .so
(test_fixture_pins_path_independent, same contract as lossy WebP).

Reference parity note: the reference repo has no image codecs; this
is beyond-reference LLM-pipeline surface (SURVEY §2 multimodal).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from ctypes import POINTER, byref, c_int, c_ubyte, c_ulong

_SHIM_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct jn_err { struct jpeg_error_mgr pub; jmp_buf jb; };
static void jn_err_exit(j_common_ptr cinfo) {
    struct jn_err *e = (struct jn_err *)cinfo->err;
    longjmp(e->jb, 1);
}

int jn_decode(const unsigned char *data, unsigned long len,
              int *w, int *h, int *ncomp,
              unsigned char **out, unsigned long *outlen) {
    struct jpeg_decompress_struct d;
    struct jn_err jerr;
    unsigned char *buf = NULL;
    d.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jn_err_exit;
    if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&d); free(buf); return 1; }
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, data, len);
    jpeg_read_header(&d, TRUE);
    /* Pin the cross-build-stable convention: plain (box) upsampling. */
    d.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&d);
    unsigned long stride = (unsigned long)d.output_width * d.output_components;
    buf = malloc(stride * d.output_height ? stride * d.output_height : 1);
    if (!buf) { jpeg_destroy_decompress(&d); return 2; }
    while (d.output_scanline < d.output_height) {
        unsigned char *row = buf + (unsigned long)d.output_scanline * stride;
        jpeg_read_scanlines(&d, &row, 1);
    }
    *w = d.output_width; *h = d.output_height; *ncomp = d.output_components;
    *outlen = stride * d.output_height;
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    *out = buf;
    return 0;
}

int jn_encode(const unsigned char *pix, int w, int h, int gray, int quality,
              int arith, int progressive, int restart, int h_samp, int v_samp,
              unsigned char **out, unsigned long *outlen) {
    struct jpeg_compress_struct c;
    struct jn_err jerr;
    unsigned char *jout = NULL; unsigned long jlen = 0;
    c.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jn_err_exit;
    if (setjmp(jerr.jb)) { jpeg_destroy_compress(&c); free(jout); return 1; }
    jpeg_create_compress(&c);
    jpeg_mem_dest(&c, &jout, &jlen);
    c.image_width = w; c.image_height = h;
    c.input_components = gray ? 1 : 3;
    c.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    c.arith_code = arith ? TRUE : FALSE;
    if (progressive) jpeg_simple_progression(&c);
    c.restart_interval = restart;
    c.optimize_coding = FALSE;
    if (h_samp > 0) c.comp_info[0].h_samp_factor = h_samp;
    if (v_samp > 0) c.comp_info[0].v_samp_factor = v_samp;
    jpeg_start_compress(&c, TRUE);
    int stride = w * c.input_components;
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = (JSAMPROW)(pix + (size_t)c.next_scanline * stride);
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    *out = jout; *outlen = jlen;
    return 0;
}

void jn_free(unsigned char *p) { free(p); }
"""

# MUST be a real filesystem dir, NOT derived from __file__: executors
# import this module from the addPyFile package ZIP (session.py), where
# a __file__-relative path cannot hold a compiled .so.  The system temp
# dir is the same channel the package zip itself stages through; the
# content-addressed filename keeps stale shims from ever loading.
_BUILD_DIR = os.path.join(
    tempfile.gettempdir(), "rust_near_indexer_spark_native"
)

_lib = None
_lib_err: str | None = None


def _load():
    """Compile-on-demand, content-addressed cache, atomic publish.

    Concurrent Python workers (local[32] spawns dozens) may race here
    on first use: each compiles into a private temp name and
    ``os.rename``s it over the cache path — last writer wins, every
    loader sees a complete .so.  At cluster scale the .so ships once
    per executor via the same archive channel as the worker package
    (session.py), not per task."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    digest = hashlib.sha256(_SHIM_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"jpeg_shim_{digest}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            with tempfile.NamedTemporaryFile(
                "w", suffix=".c", dir=_BUILD_DIR, delete=False
            ) as f:
                f.write(_SHIM_SRC)
                c_path = f.name
            tmp_so = c_path[:-2] + ".so"
            r = subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path,
                 "-ljpeg"],
                capture_output=True,
                timeout=120,
            )
            os.unlink(c_path)
            if r.returncode != 0:
                _lib_err = r.stderr.decode(errors="replace")[:500]
                return None
            os.rename(tmp_so, so_path)
        except Exception as exc:  # no gcc / no header / read-only fs
            _lib_err = str(exc)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as exc:  # pragma: no cover - corrupt cache
        _lib_err = str(exc)
        return None
    lib.jn_decode.restype = c_int
    lib.jn_decode.argtypes = [
        ctypes.c_char_p, c_ulong, POINTER(c_int), POINTER(c_int),
        POINTER(c_int), POINTER(POINTER(c_ubyte)), POINTER(c_ulong),
    ]
    lib.jn_encode.restype = c_int
    lib.jn_encode.argtypes = [
        ctypes.c_char_p, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
        c_int, c_int, POINTER(POINTER(c_ubyte)), POINTER(c_ulong),
    ]
    lib.jn_free.argtypes = [POINTER(c_ubyte)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def why_unavailable() -> str | None:
    _load()
    return _lib_err


def decode(data: bytes):
    """JPEG bytes → HWC uint8 ndarray (h, w, 1|3) via the system
    libjpeg, box-upsample convention.  Raises ValueError on data
    libjpeg rejects (the caller falls back to the pure decoder — e.g.
    lossless SOF3, which libjpeg never implemented) and
    NotImplementedError on component counts the pure decoder also
    refuses, so both routes expose one contract."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libjpeg shim unavailable: {_lib_err}")
    out = POINTER(c_ubyte)()
    n = c_ulong()
    w = c_int()
    h = c_int()
    nc = c_int()
    rc = lib.jn_decode(data, len(data), byref(w), byref(h), byref(nc),
                       byref(out), byref(n))
    if rc != 0:
        raise ValueError(f"libjpeg decode failed (rc={rc})")
    try:
        if nc.value not in (1, 3):
            raise NotImplementedError(f"{nc.value}-component JPEG")
        arr = np.frombuffer(
            bytearray(ctypes.cast(out, POINTER(c_ubyte * n.value)).contents),
            dtype=np.uint8,
        ).reshape(h.value, w.value, nc.value)
    finally:
        lib.jn_free(out)
    return arr


def encode(pix, quality: int = 75, arith: bool = False,
           progressive: bool = False, restart: int = 0,
           h_samp: int = 0, v_samp: int = 0) -> bytes:
    """Encode an ndarray — (h, w) / (h, w, 1) grayscale or (h, w, 3)
    RGB — through the system libjpeg encoder.  Test-oracle helper: the
    differential suite uses it to produce genuinely independent
    payloads across the sampling (h_samp/v_samp override comp 0) ×
    entropy × scan matrix."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"libjpeg shim unavailable: {_lib_err}")
    pix = np.ascontiguousarray(pix, dtype=np.uint8)
    gray = pix.ndim == 2 or pix.shape[2] == 1
    h, w = pix.shape[:2]
    out = POINTER(c_ubyte)()
    n = c_ulong()
    rc = lib.jn_encode(pix.tobytes(), w, h, int(gray), quality, int(arith),
                       int(progressive), restart, h_samp, v_samp,
                       byref(out), byref(n))
    if rc != 0:
        raise ValueError(f"libjpeg encode failed (rc={rc})")
    try:
        return bytes(bytearray(ctypes.cast(out, POINTER(c_ubyte * n.value)).contents))
    finally:
        lib.jn_free(out)
