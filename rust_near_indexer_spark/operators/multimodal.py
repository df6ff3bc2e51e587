"""Multimodal columns: opaque binary payloads + typed metadata (north-star §LLM).

Media (image/audio/video) travels as an opaque ``BinaryType`` column with
a typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas iterators over ``mapInPandas`` — the only
sanctioned Python boundary in this engine.

Codec reality: the container has no PIL/opencv/ffmpeg, but the decode
paths are REAL for the formats corpora actually carry — binary PNM
(P5/P6, 8- and 16-bit), PNG at every legal bit depth (1/2/4/8/16)
with and without Adam7 interlacing (stdlib zlib inflate + per-pass
unfilter + sub-byte unpack), baseline AND
progressive DCT JPEG (canonical-Huffman entropy decode, spectral
selection + successive approximation, matrix IDCT), PCM16 WAV audio,
and MJPEG / raw-DIB frames inside RIFF/AVI video containers
(``parse_avi``/``decode_video``).  Lossless (SOF3) and ARITHMETIC
(SOF9/SOF10, operators/jpeg_arith.py) JPEG decode for real too, and
WebP routes to operators/webp.py (VP8L) / vp8.py (lossy keyframes).
Formats beyond those (MP3/OGG full audio decode — metadata scanners
exist, non-MJPEG video codecs, hierarchical JPEG) raise
``NotImplementedError`` under the same contract, which a production
image swaps in without touching the Spark plumbing.
``extract_features`` remains the deterministic fake decode whose
Spark-side plumbing — schema, Arrow batching, partition mapping, UDF
signature — is oracle-tested (queries/multimodal_features);
``decoded_stats`` is the REAL-codec end-to-end path (pytest-pinned
against independently computed values).

Scale posture: payload bytes never pass through a shuffle — feature
extraction is mapInPandas on the scan partition; only the small feature
rows continue downstream.  Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of large
blobs never materializes at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media_id + kind + opaque payload + typed metadata (decoders fill what
# they know; NULL elsewhere)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video | text-bytes
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("sample_rate", LongType(), True),
                    StructField("n_frames", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("md5_hex", StringType(), True),
        StructField("feature0", LongType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table (text bytes as payload) —
    the container has no binary media fixtures, so text bytes stand in;
    the column types and partitioning are exactly what image/audio use."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text-bytes").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.named_struct(
            F.lit("width"), F.lit(None).cast("long"),
            F.lit("height"), F.lit(None).cast("long"),
            F.lit("sample_rate"), F.lit(None).cast("long"),
            F.lit("n_frames"), F.lit(None).cast("long"),
        ).alias("meta"),
    )


def documents_as_video(documents: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Wrap documents as fake fixed-frame-size video media: the payload is
    the text bytes, a 'frame' is each ``frame_bytes`` slice, ``n_frames``
    lands in the typed metadata — the real video path differs only in the
    decoder."""
    payload = F.encode("text", "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        payload.alias("payload"),
        F.named_struct(
            F.lit("width"), F.lit(None).cast("long"),
            F.lit("height"), F.lit(None).cast("long"),
            F.lit("sample_rate"), F.lit(None).cast("long"),
            F.lit("n_frames"), F.floor(F.length(payload) / frame_bytes).cast("long"),
        ).alias("meta"),
    )


FRAME_SCHEMA = "media_id long, frame_idx long, frame_hex string"


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Frame sampling over mapInPandas: every ``every_k``-th complete
    ``frame_bytes`` slice of each payload, emitted as (media_id,
    frame_idx, frame_hex).  Payload bytes stay on the scan partition;
    only the sampled frames continue downstream."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_hex": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = len(payload) // frame_bytes
                for i in range(0, n, every_k):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_hex"].append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                        .hex()
                        .upper()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "media_id long, out_w long, out_h long, resized binary"


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over mapInPandas: the deterministic fake
    decode interprets the payload as a ``meta.width``×``meta.height``
    grayscale uint8 raster (swap in ``decode_image`` when codecs exist);
    the resample itself is vectorized numpy, identical for a real
    decoded array.  Rows without usable dimensions are dropped."""

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "out_w": [], "out_h": [], "resized": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    continue
                w, h = meta.get("width"), meta.get("height")
                if not w or not h or w * h > len(payload):
                    continue
                img = np.frombuffer(bytes(payload[: w * h]), dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized"].append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Invert the per-scanline PNG filters (types 0-4, RFC 2083 §6).

    Sub/Average/Paeth carry a within-row sequential dependency, so this
    is a byte loop — fine inside the Arrow batch iterator where each
    call handles one image; a SIMD unfilter drops in here untouched.
    """
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if len(row) != stride:
            raise ValueError("truncated PNG scanline")
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (RFC 2083 §2.6) — each
# pass is an independently-filtered sub-image.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _decode_png(data: bytes):
    """PNG → HWC uint8 ndarray, pure stdlib (struct + zlib).  Gray /
    RGB / gray+alpha / RGBA / palette at every legal bit depth —
    1/2/4-bit (packed samples, gray scaled to 8-bit, palette indexed),
    8-bit, and 16-bit (high byte — the standard 16→8 reduction) —
    interlaced (Adam7, per-pass unfiltering) and non-interlaced.
    tRNS transparency (r11) expands to a real alpha channel, matching
    libpng's png_set_expand: per-entry alpha for palette images,
    colorkey→alpha for gray/RGB — with the colorkey compared at the
    stream's NATIVE depth (a 16-bit key whose low bytes are nonzero
    matches nothing after an early 16→8 reduction, so the mask is
    computed before the high-byte cut; gated bit-exact against libpng
    in tests/test_png_golden.py)."""
    import struct
    import zlib

    import numpy as np

    pos, ihdr, plte, idat, trns = 8, None, None, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"tRNS":
            trns = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"illegal PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    if depth < 8 and color not in (0, 3):
        raise ValueError(f"sub-byte depth is not legal for color type {color}")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not legal")
    nb = max(depth // 8, 1)
    # filter bpp is in BYTES, floored to 1 for packed sub-byte rows
    bpp = max(channels * depth // 8, 1)

    def pass_pixels(seg: bytes, hp: int, wp: int):
        """Unfilter + unpack one (sub-)image → (hp, wp, channels*nb) u8."""
        if depth >= 8:
            stride = wp * channels * nb
            flat = _png_unfilter(seg, hp, stride, bpp)
            return np.frombuffer(flat, np.uint8).reshape(
                hp, wp, channels * nb
            )
        stride = (wp * depth + 7) // 8
        flat = _png_unfilter(seg, hp, stride, 1)
        rows = np.frombuffer(flat, np.uint8).reshape(hp, stride)
        bits = np.unpackbits(rows, axis=1)[:, : wp * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        vals = (bits.reshape(hp, wp, depth) * weights).sum(
            axis=2, dtype=np.int64
        )
        return vals.astype(np.uint8)[:, :, None]

    def pass_len(hp: int, wp: int) -> int:
        stride = (
            wp * channels * nb if depth >= 8 else (wp * depth + 7) // 8
        )
        return hp * (stride + 1)

    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        if len(raw) != pass_len(h, w):
            raise ValueError("PNG IDAT length mismatch")
        img = pass_pixels(raw, h, w)
    elif interlace == 1:  # Adam7
        img = np.zeros((h, w, channels * nb), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # pass is empty for this image size
            n = pass_len(hp, wp)
            img[y0::dy, x0::dx, :] = pass_pixels(raw[off : off + n], hp, wp)
            off += n
        if off != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    else:
        raise NotImplementedError(f"PNG interlace method {interlace}")
    alpha = None  # (h, w) uint8 colorkey alpha, built at NATIVE depth
    if trns is not None and color in (0, 2):
        if len(trns) != 2 * channels:
            raise ValueError("tRNS length mismatch for color type")
        key = struct.unpack(f">{channels}H", trns)
        if depth == 16:
            samples = (
                img.reshape(h, w, channels, 2).astype(np.uint16) << (8, 0)
            ).sum(axis=3, dtype=np.uint16)
        else:
            samples = img.astype(np.uint16)  # (h, w, channels), raw values
        mask = (samples == np.array(key, np.uint16)).all(axis=2)
        alpha = np.where(mask, 0, 255).astype(np.uint8)
    if depth == 16:
        # samples are big-endian: byte 0 is the high byte
        img = img.reshape(h, w, channels, 2)[:, :, :, 0].copy()
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if trns is not None:
            # per-palette-entry alpha; entries past the chunk are opaque
            alut = np.full(len(pal), 255, np.uint8)
            alut[: min(len(trns), len(pal))] = np.frombuffer(
                trns[: len(pal)], np.uint8
            )
            return np.concatenate(
                [pal[idx], alut[idx][:, :, None]], axis=2
            )
        img = pal[idx]
    elif depth < 8:
        # scale packed gray to full 8-bit range (255 // (2^d - 1) is an
        # exact integer for d in 1/2/4: 255, 85, 17)
        img = (img.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if alpha is not None:
        img = np.concatenate([img, alpha[:, :, None]], axis=2)
    return img


def synth_png_gray(seed: int, w: int, h: int) -> bytes:
    """Deterministic gray-8 PNG for the gate query
    (queries/multimodal.image_png_decode_stats): pixel (x, y) carries
    ``(seed*23 + y*7 + x*3) % 251`` — a formula DuckDB reproduces from
    generate_series — and each row is FORWARD-filtered with the full
    filter cycle (None/Sub/Up/Average/Paeth by ``y % 5``) so the gate
    exercises every unfilter path, not just the trivial one.  The
    encode side is deliberately independent of ``_decode_png`` (filters
    applied here by direct spec arithmetic; the decoder inverts them),
    and the same raster bytes are additionally golden-gated against
    libpng in tests/test_png_golden.py."""
    import struct
    import zlib

    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    img = ((seed * 23 + y * 7 + x * 3) % 251).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w, np.int64)
    for yy in range(h):
        row = img[yy].astype(np.int64)
        ft = yy % 5
        a = np.concatenate([[0], row[:-1]])  # left (bpp=1)
        b = prev
        c = np.concatenate([[0], prev[:-1]])  # upper-left
        if ft == 0:
            pred = np.zeros(w, np.int64)
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
        raw += bytes([ft]) + ((row - pred) & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_matrix():
    """The orthonormal 8x8 DCT-II basis A (A[k,n] = c(k)/2 ·
    cos((2n+1)kπ/16)); spatial = Aᵀ·coef·A.  A @ Aᵀ = I, so the
    inverse is exact to float precision (orthonormality is pinned by
    test_jpeg_codec).  Used by the TEST encoder; the decoder renders
    through ``_jpeg_idct_islow`` below so its pixels are bit-exact vs
    the system libjpeg (r12 — the same decode-convention contract the
    VP8 path satisfies vs libwebp)."""
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(0.5) if k == 0 else 1.0
        for n in range(8):
            a[k, n] = 0.5 * c * math.cos((2 * n + 1) * k * math.pi / 16)
    return a


# libjpeg's islow IDCT fixed-point constants: FIX(x) = round(x · 2^13)
# for the AAN-factored DCT angles (public T.81 practice, identical in
# every IJG/libjpeg-turbo build; turbo's SIMD paths are bit-compatible).
_J_F0298, _J_F0390, _J_F0541, _J_F0765 = 2446, 3196, 4433, 6270
_J_F0899, _J_F1175, _J_F1501, _J_F1847 = 7373, 9633, 12299, 15137
_J_F1961, _J_F2053, _J_F2562, _J_F3072 = 16069, 16819, 20995, 25172
_J_CONST_BITS, _J_PASS1_BITS = 13, 2


def _jpeg_idct_pass(inp, shift):
    """One islow butterfly pass along axis -2, vectorized over every
    leading dim (all blocks of a component at once).  ``shift`` is the
    DESCALE amount: CONST_BITS-PASS1_BITS for pass 1 (columns),
    CONST_BITS+PASS1_BITS+3 for pass 2 (rows).  int64 throughout;
    ``>>`` on negative ints is arithmetic in numpy, matching C's
    RIGHT_SHIFT on the signed descale."""
    import numpy as np

    d = [inp[..., k, :] for k in range(8)]
    z2, z3 = d[2], d[6]
    z1 = (z2 + z3) * _J_F0541
    t2 = z1 - z3 * _J_F1847
    t3 = z1 + z2 * _J_F0765
    z2, z3 = d[0], d[4]
    t0 = (z2 + z3) << _J_CONST_BITS
    t1 = (z2 - z3) << _J_CONST_BITS
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    t0, t1, t2, t3 = d[7], d[5], d[3], d[1]
    z1, z2 = t0 + t3, t1 + t2
    z3, z4 = t0 + t2, t1 + t3
    z5 = (z3 + z4) * _J_F1175
    t0 = t0 * _J_F0298
    t1 = t1 * _J_F2053
    t2 = t2 * _J_F3072
    t3 = t3 * _J_F1501
    z1 = -z1 * _J_F0899
    z2 = -z2 * _J_F2562
    z3 = -z3 * _J_F1961 + z5
    z4 = -z4 * _J_F0390 + z5
    t0 += z1 + z3
    t1 += z2 + z4
    t2 += z2 + z3
    t3 += z1 + z4
    half = 1 << (shift - 1)
    out = np.empty_like(inp)
    out[..., 0, :] = (t10 + t3 + half) >> shift
    out[..., 7, :] = (t10 - t3 + half) >> shift
    out[..., 1, :] = (t11 + t2 + half) >> shift
    out[..., 6, :] = (t11 - t2 + half) >> shift
    out[..., 2, :] = (t12 + t1 + half) >> shift
    out[..., 5, :] = (t12 - t1 + half) >> shift
    out[..., 3, :] = (t13 + t0 + half) >> shift
    out[..., 4, :] = (t13 - t0 + half) >> shift
    return out


def _jpeg_idct_islow(blocks, quant):
    """Dequantize + libjpeg islow IDCT for a whole component:
    ``blocks`` (by, bx, 64) int coefficients in natural order,
    ``quant`` (8, 8) int table → (by·8, bx·8) uint8 sample plane.
    Bit-exact vs any libjpeg's JDCT_ISLOW output (the library default;
    proven across the entropy × sampling × quality matrix by
    tests/test_jpeg_native.py).  The C code's all-AC-zero DC shortcuts
    are algebraically equal to the general path (DESCALE identities),
    so one vectorized general path suffices."""
    import numpy as np

    by, bx, _ = blocks.shape
    b = blocks.astype(np.int64).reshape(by, bx, 8, 8) * quant.astype(np.int64)
    p1 = _jpeg_idct_pass(b, _J_CONST_BITS - _J_PASS1_BITS)
    p2 = _jpeg_idct_pass(
        p1.transpose(0, 1, 3, 2), _J_CONST_BITS + _J_PASS1_BITS + 3
    ).transpose(0, 1, 3, 2)
    samples = np.clip(p2 + 128, 0, 255).astype(np.uint8)
    return samples.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


class _JpegBitReader:
    """MSB-first entropy-segment reader: un-stuffs 0xFF 0x00, stops at
    markers, and re-syncs across RSTn boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc, self.n = 0, 0

    def _next_byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise EOFError("marker inside entropy segment")
        self.pos += 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc, self.n = self._next_byte(), 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTn marker (skipping a
        stuffed FF 00 that all-ones padding may have produced)."""
        self.n = 0
        while (
            self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (idx & 7)
        ):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _jpeg_huff_table(bits: list[int], vals: bytes) -> dict:
    """DHT BITS/HUFFVAL → canonical {(length, code): symbol} map."""
    table, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, n: int) -> int:
    """Receive/extend (ITU T.81 F.2.2.1): an n-bit magnitude to the
    signed coefficient value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_jpeg(data: bytes):
    """Huffman-coded DCT JPEG → HWC uint8 ndarray, pure stdlib+numpy:
    marker parse, canonical-Huffman entropy decode (with restart
    intervals), dequantize + de-zigzag, orthonormal-matrix IDCT,
    nearest-neighbor chroma upsample, BT.601 YCbCr→RGB.  Supports both
    baseline sequential (SOF0/1) and PROGRESSIVE (SOF2: spectral
    selection + successive approximation, T.81 G.2) frames — the two
    families that cover essentially all real-corpus JPEGs.  Lossless /
    hierarchical / arithmetic coding raise the documented codec
    contract."""
    import struct

    import numpy as np

    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    progressive = False
    lossless = False
    arith = False
    dc_cond: dict[int, tuple] = {}  # DAC: DC table id -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: AC table id -> Kx
    precision = 8
    coefs: list | None = None  # progressive: per-comp (by, bx, 64) int32
    restart_interval = 0
    pos = 2  # past SOI
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                tbl = np.zeros(64, np.int32)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(
                    seg[i + 1 : i + 65], np.uint8
                ).astype(np.int32)
                qt[tid] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless
            # sequential, SOF9/SOF10 arithmetic sequential/progressive
            # (T.81 F.2.4 / G.1.3 over the Annex D QM decoder)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if marker in (0xC9, 0xCA):
                arith = True
            if marker == 0xC3:
                lossless = True
                if not 2 <= prec <= 8:
                    raise NotImplementedError(
                        f"{prec}-bit lossless JPEG samples (uint8 output "
                        "supports precisions 2..8)"
                    )
            elif prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG samples")
            precision = prec
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (h, w, comps)
            if marker in (0xC2, 0xCA):
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * cv, mcux * ch, 64), np.int32)
                    for _cid, ch, cv, _q in comps
                ]
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline, progressive (Huffman or arithmetic), "
                "lossless-sequential, and arithmetic-sequential JPEG "
                f"are supported (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0xF
                if tc == 0:
                    dc_cond[tb] = (seg[i + 1] & 0xF, seg[i + 1] >> 4)
                else:
                    ac_cond[tb] = seg[i + 1]
                i += 2
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                huff[(tc, tid)] = _jpeg_huff_table(
                    bits, seg[i + 17 : i + 17 + nv]
                )
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if arith:
                # arithmetic SOS: table selectors index DAC
                # conditioning, not Huffman tables
                a_scan = []
                for s in range(ns):
                    cid, tsel = seg[1 + 2 * s], seg[2 + 2 * s]
                    ci = next(
                        i for i, c in enumerate(frame[2]) if c[0] == cid
                    )
                    a_scan.append((ci, tsel >> 4, tsel & 0xF))
                from .jpeg_arith import (
                    decode_progressive_scan,
                    decode_sequential_scan,
                )

                if progressive:
                    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
                    pos = decode_progressive_scan(
                        data, pos, frame, a_scan, ss, se, ah, al,
                        dc_cond, ac_cond, restart_interval, coefs,
                        _JPEG_ZIGZAG,
                    )
                    continue
                if ns != len(frame[2]):
                    # decode_sequential_scan walks the interleaved MCU
                    # grid; a component-subset scan (legal but which no
                    # mainstream encoder emits for sequential) would
                    # desync rather than decode — refuse loudly
                    raise NotImplementedError(
                        "non-interleaved (multi-scan) sequential "
                        "arithmetic JPEG"
                    )
                h, w, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * cv, mcux * ch, 64), np.int32)
                    for _cid, ch, cv, _q in comps
                ]
                decode_sequential_scan(
                    data, pos, frame, a_scan, dc_cond, ac_cond,
                    restart_interval, coefs, _JPEG_ZIGZAG,
                )
                return _jpeg_from_coefs(frame, qt, coefs)
            scan = []  # (comp_index, dc_table, ac_table) — either may be
            # absent for progressive scans that don't need it
            for s in range(ns):
                cid, tsel = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(
                    i for i, c in enumerate(frame[2]) if c[0] == cid
                )
                scan.append(
                    (ci, huff.get((0, tsel >> 4)), huff.get((1, tsel & 0xF)))
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            # validate table presence AT SOS TIME (ADVICE r08: a scan
            # referencing an undefined table otherwise dies later with
            # an opaque TypeError inside the entropy decoder).  A DC
            # scan (baseline, or progressive ss=0 first pass) needs its
            # DC table; an AC scan needs its AC table; DC/AC refinement
            # passes (ah>0) read raw bits, with AC refinement still
            # consuming run-length codes from the AC table.
            for (ci, dc_tbl, ac_tbl), s in zip(scan, range(ns)):
                tsel = seg[2 + 2 * s]
                needs_dc = lossless or (not progressive or (ss == 0 and ah == 0))
                needs_ac = not lossless and (not progressive or ss > 0)
                if needs_dc and dc_tbl is None:
                    raise ValueError(
                        f"JPEG SOS references undefined DC Huffman table "
                        f"{tsel >> 4} (no prior DHT)"
                    )
                if needs_ac and ac_tbl is None:
                    raise ValueError(
                        f"JPEG SOS references undefined AC Huffman table "
                        f"{tsel & 0xF} (no prior DHT)"
                    )
            if lossless:
                if not 1 <= ss <= 7:
                    raise ValueError(f"lossless JPEG predictor {ss} out of range")
                if se != 0 or ah != 0:
                    raise ValueError("malformed lossless JPEG SOS (Se/Ah != 0)")
                return _jpeg_lossless_scan(
                    data, pos, frame, precision, scan, ss, al, restart_interval
                )
            if not progressive:
                return _jpeg_scan(data, pos, frame, qt, scan, restart_interval)
            pos = _jpeg_progressive_scan(
                data, pos, frame, coefs, scan, ss, se, ah, al,
                restart_interval,
            )
    if progressive and frame is not None:
        return _jpeg_from_coefs(frame, qt, coefs)
    raise ValueError("malformed JPEG: no SOS marker")


def _jpeg_lossless_scan(data, pos, frame, prec, scan, predictor, pt,
                        restart_interval):
    """Lossless sequential JPEG (SOF3, ITU T.81 process 14 / annex H):
    Huffman-coded prediction differences, no DCT.  Per sample the DC
    table codes a magnitude category SSSS (16 = the special +32768
    difference, no extra bits), extend() turns the raw bits into the
    signed difference, and the reconstruction is (prediction + diff)
    modulo 2^16, finally shifted left by the point transform Pt.

    Prediction (H.1.2.1): the scan's first sample — and the first
    sample after every restart — uses the default 1 << (prec-1-Pt);
    the remainder of that LINE uses Ra (left); the first sample of
    every later line uses Rb (above); everything else uses the
    SOS-selected predictor 1..7 over Ra/Rb/Rc.  Components interleave
    one sample per MCU (sampling factors must be 1x1 — the only form
    lossless encoders emit; T.81's subsampled-lossless corner raises).

    No color transform: T.81 defines none for lossless, and real SOF3
    producers (DNG, PDF/medical rasters) store component planes
    verbatim — so 1 component → HxWx1, 3 components → HxWx3 as-is."""
    import numpy as np

    h, w, comps = frame
    if any(c[1] != 1 or c[2] != 1 for c in comps):
        raise NotImplementedError("subsampled lossless JPEG")
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan lossless JPEG")
    reader = _JpegBitReader(data, pos)
    planes = [np.zeros((h, w), np.int32) for _ in scan]
    default = 1 << (prec - 1 - pt)
    rst_y, rst_x = 0, 0  # raster position of the current interval start
    mcu = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                rst_y, rst_x = y, x
            for (ci, dc_tbl, _ac), plane in zip(scan, planes):
                ssss = _jpeg_huff_decode(reader, dc_tbl)
                if ssss == 16:  # T.81 H.2: 32768, no appended bits
                    diff = 32768
                elif ssss > 16:
                    raise ValueError("invalid lossless JPEG SSSS category")
                else:
                    diff = _jpeg_extend(reader.bits(ssss), ssss)
                if y == rst_y and x == rst_x:
                    p = default
                elif y == rst_y:  # rest of the interval's first line: Ra
                    p = int(plane[y, x - 1])
                elif x == 0:  # later lines start from Rb
                    p = int(plane[y - 1, x])
                else:
                    a = int(plane[y, x - 1])
                    b = int(plane[y - 1, x])
                    c = int(plane[y - 1, x - 1])
                    if predictor == 1:
                        p = a
                    elif predictor == 2:
                        p = b
                    elif predictor == 3:
                        p = c
                    elif predictor == 4:
                        p = a + b - c
                    elif predictor == 5:
                        p = a + ((b - c) >> 1)
                    elif predictor == 6:
                        p = b + ((a - c) >> 1)
                    else:  # 7
                        p = (a + b) >> 1
                plane[y, x] = (p + diff) & 0xFFFF
            mcu += 1
    out = np.stack(planes, axis=2)
    if pt:
        out = out << pt
    return np.clip(out, 0, 255).astype(np.uint8)


def _jpeg_scan(data, pos, frame, qt, scan, restart_interval):
    """Baseline Huffman scan: entropy-decode every MCU into per-
    component coefficient grids, then render through the same
    dequantize→islow-IDCT tail the progressive/arithmetic paths use
    (one vectorized IDCT per component instead of one matmul per
    block — and bit-exact vs libjpeg, see _jpeg_idct_islow)."""
    import numpy as np

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c[2], mcux * c[1], 64), np.int32) for c in comps
    ]
    reader = _JpegBitReader(data, pos)
    pred = [0] * len(comps)
    n_restarts = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart(n_restarts)
            n_restarts += 1
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, dc_tbl, ac_tbl in scan:
            _cid, ch, cv, _qid = comps[ci]
            for by in range(cv):
                for bx in range(ch):
                    coef = coefs[ci][my * cv + by, mx * ch + bx]
                    t = _jpeg_huff_decode(reader, dc_tbl)
                    pred[ci] += _jpeg_extend(reader.bits(t), t)
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, ac_tbl)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError(
                                "JPEG coefficient index out of range"
                            )
                        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(s), s)
                        k += 1
    return _jpeg_from_coefs(frame, qt, coefs)


_J_SCALEBITS = 16
_J_ONE_HALF = 1 << (_J_SCALEBITS - 1)


def _jpeg_color_tables():
    """jdcolor.c's build_ycc_rgb_table: per-Cb/Cr fixed-point lookup
    tables with FIX(x) = round(x · 2^16) of the full-range BT.601
    (T.871) constants — identical in jdmerge.c, so every libjpeg build
    converts YCbCr→RGB through exactly these integers."""
    import numpy as np

    def fix(x):
        return int(x * (1 << _J_SCALEBITS) + 0.5)

    i = np.arange(256, dtype=np.int64) - 128
    return (
        (fix(1.40200) * i + _J_ONE_HALF) >> _J_SCALEBITS,  # Cr → R
        (fix(1.77200) * i + _J_ONE_HALF) >> _J_SCALEBITS,  # Cb → B
        -fix(0.71414) * i,                                 # Cr → G (hi-res)
        -fix(0.34414) * i + _J_ONE_HALF,                   # Cb → G (hi-res)
    )


_J_COLOR_TABLES = None


def ycc_to_rgb(y, cb, cr):
    """Full-range BT.601 YCbCr → RGB, integer samples in / uint8 HWC
    out — libjpeg's exact fixed-point table conversion (jdcolor.c), so
    the pure decode is bit-identical to the native route (r12; before,
    a float formula differed from libjpeg by ±1 LSB).  Deliberately
    NOT shared with lossy-VP8 WebP: VP8 YUV is limited-range (studio
    swing, Y 16..235), so webp.vp8_yuv_to_rgb uses libwebp's 14-bit
    limited-range constants instead (ADVICE r10 high — sharing one
    formula made every lossy-WebP pixel systematically skewed)."""
    import numpy as np

    global _J_COLOR_TABLES
    if _J_COLOR_TABLES is None:
        _J_COLOR_TABLES = _jpeg_color_tables()
    cr_r, cb_b, cr_g, cb_g = _J_COLOR_TABLES
    y = y.astype(np.int64)
    cb = cb.astype(np.int64)
    cr = cr.astype(np.int64)
    img = np.stack(
        [
            y + cr_r[cr],
            y + ((cb_g[cb] + cr_g[cr]) >> _J_SCALEBITS),
            y + cb_b[cb],
        ],
        axis=2,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _jpeg_to_image(frame, planes):
    """Shared tail of every JPEG path: integer sample planes → chroma
    upsample → YCbCr→RGB → HWC uint8.

    Upsampling is libjpeg's PLAIN (box) replication — the one
    convention every build computes identically, and the one the
    native route pins with ``do_fancy_upsampling = FALSE``
    (operators/jpeg_native.py; with the default fancy flag, IJG's
    triangular filter and turbo's merged box upsampler would make the
    same bytes decode differently across builds).  Each plane is first
    cropped to its ceil-scaled downsampled dims, replicated, then
    cropped to the frame — replication commutes with cropping, so edge
    handling matches libjpeg's."""
    import numpy as np

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for ci, (_cid, ch, cv, _qid) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            if hmax % ch or vmax % cv:
                raise NotImplementedError("non-integer JPEG sampling ratio")
            p = p[: -(-h * cv // vmax), : -(-w * ch // hmax)]
            p = np.repeat(np.repeat(p, vmax // cv, 0), hmax // ch, 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.ascontiguousarray(out[0][:, :, None])
    if len(out) == 3:
        return ycc_to_rgb(out[0], out[1], out[2])
    raise NotImplementedError(f"{len(out)}-component JPEG")


# ---------------------------------------------------------------------------
# Progressive JPEG (T.81 G.2): spectral selection + successive
# approximation.  Each SOS deposits partial coefficients into the
# per-component arrays; reconstruction happens once at EOI.
# ---------------------------------------------------------------------------


def _jpeg_ac_first_block(reader, ac_tbl, coef, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0): band [ss..se], values
    arrive point-transformed (<< al); EOB runs span blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1 + (reader.bits(r) if r else 0)
            break
        k += r
        if k > se:
            raise ValueError("JPEG coefficient index out of range")
        coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(s), s) << al
        k += 1
    return eobrun


def _jpeg_ac_refine_block(reader, ac_tbl, coef, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah>0): the T.81 G.1.2.3
    correction-bit algorithm — newly-nonzero coefficients arrive as
    ±(1<<al) with interleaved correction bits for every already-nonzero
    coefficient the traversal passes."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(z):
        if reader.bit():
            v = int(coef[z])
            if not (v & p1):
                coef[z] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(reader, ac_tbl)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (reader.bits(r) if r else 0)
                    break
                # r == 15: skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                newval = p1 if reader.bit() else m1
            while k <= se:
                z = _JPEG_ZIGZAG[k]
                if coef[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        if newval:
                            coef[z] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            z = _JPEG_ZIGZAG[k]
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_scan(
    data, pos, frame, coefs, scan, ss, se, ah, al, restart_interval
):
    """Decode ONE progressive scan into the coefficient arrays; returns
    the stream position of the next marker.  DC scans (ss=0) may be
    interleaved (MCU order); AC scans are single-component over the
    component's own block grid (T.81 G.2.2)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _JpegBitReader(data, pos)
    n_restarts = 0
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("JPEG DC scan with nonzero Se")
        preds = [0] * len(comps)
        if len(scan) > 1:  # interleaved: MCU order
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    reader.sync_restart(n_restarts)
                    n_restarts += 1
                    preds = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, dc_tbl, _ac in scan:
                    _cid, ch, cv, _q = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coefs[ci][my * cv + by, mx * ch + bx]
                            if ah == 0:
                                t = _jpeg_huff_decode(reader, dc_tbl)
                                preds[ci] += _jpeg_extend(reader.bits(t), t)
                                blk[0] = preds[ci] << al
                            elif reader.bit():
                                blk[0] = int(blk[0]) | (1 << al)
        else:  # single component: its own grid
            ci, dc_tbl, _ac = scan[0]
            _cid, ch, cv, _q = comps[ci]
            wi, hi = -(-w * ch // hmax), -(-h * cv // vmax)
            bx_n, by_n = -(-wi // 8), -(-hi // 8)
            for i in range(bx_n * by_n):
                if restart_interval and i and i % restart_interval == 0:
                    reader.sync_restart(n_restarts)
                    n_restarts += 1
                    preds = [0] * len(comps)
                by, bx = divmod(i, bx_n)
                blk = coefs[ci][by, bx]
                if ah == 0:
                    t = _jpeg_huff_decode(reader, dc_tbl)
                    preds[ci] += _jpeg_extend(reader.bits(t), t)
                    blk[0] = preds[ci] << al
                elif reader.bit():
                    blk[0] = int(blk[0]) | (1 << al)
    else:  # AC scan: exactly one component, non-interleaved
        if len(scan) != 1:
            raise ValueError("JPEG AC progressive scan must be single-component")
        ci, _dc, ac_tbl = scan[0]
        _cid, ch, cv, _q = comps[ci]
        wi, hi = -(-w * ch // hmax), -(-h * cv // vmax)
        bx_n, by_n = -(-wi // 8), -(-hi // 8)
        eobrun = 0
        block_fn = _jpeg_ac_first_block if ah == 0 else _jpeg_ac_refine_block
        for i in range(bx_n * by_n):
            if restart_interval and i and i % restart_interval == 0:
                reader.sync_restart(n_restarts)
                n_restarts += 1
                eobrun = 0
            by, bx = divmod(i, bx_n)
            eobrun = block_fn(
                reader, ac_tbl, coefs[ci][by, bx], ss, se, al, eobrun
            )
    # advance to the next marker (skip stuffed FF00 and RSTn).  The
    # entropy decoder may legitimately sit a few bytes short of the
    # marker (bit-padding, an EOB run ending mid-byte, a trailing RST),
    # but a LARGE gap means the scan under-consumed — a truncated or
    # corrupt stream that would otherwise be masked (ADVICE r08).
    p = start = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            if p - start > 16:
                raise ValueError(
                    f"malformed JPEG: {p - start} unconsumed entropy "
                    f"bytes before next marker (truncated/corrupt scan)"
                )
            return p
        p += 1
    return p


def _jpeg_from_coefs(frame, qt, coefs):
    """Shared DCT-path reconstruction (baseline, progressive, and
    arithmetic scans all land here): dequantize + islow IDCT per
    component — bit-exact vs libjpeg — then the plane→image tail."""
    planes = [
        _jpeg_idct_islow(coefs[ci], qt[qid])
        for ci, (_cid, _ch, _cv, qid) in enumerate(frame[2])
    ]
    return _jpeg_to_image(frame, planes)


def decode_image(payload: bytes, meta: dict):
    """Image decode: bytes → HWC uint8 ndarray.

    REAL for the formats real corpora actually carry: binary PNM (P5/
    P6, 8- and 16-bit), PNG at every legal bit depth, interlaced or
    not (``_decode_png``), baseline + progressive + lossless JPEG
    (``_decode_jpeg``), WebP lossless (operators/webp.py), GIF 87a/89a
    incl. animation compositing (operators/gif.py), BMP incl. RLE and
    bitfields (operators/bmp.py), and baseline TIFF incl. LZW/PackBits
    (operators/tiff.py), lossy-VP8 WebP keyframes (operators/vp8.py,
    bit-exact in YUV vs the system libwebp), and arithmetic-coded JPEG
    (SOF9/SOF10, operators/jpeg_arith.py, coefficient-exact vs the
    system libjpeg).  Remaining formats (hierarchical/differential
    JPEG) raise ``NotImplementedError`` with the same contract; a deployment with PIL/opencv extends the
    magic-byte dispatch below, and the mapInPandas plumbing around it
    is unchanged.  Runs inside the Arrow batch iterator, one batch at
    a time, never on the driver.
    """
    import numpy as np

    if bytes(payload[:8]) == PNG_MAGIC:
        return _decode_png(bytes(payload))
    if bytes(payload[:3]) == b"\xff\xd8\xff":
        from . import jpeg_native

        if jpeg_native.available():
            try:
                return jpeg_native.decode(bytes(payload))
            except ValueError:
                # data libjpeg rejects but the pure decoder handles —
                # lossless SOF3 above all (libjpeg never implemented
                # it); genuinely corrupt payloads re-raise from the
                # pure path with the decoder's own diagnostics
                pass
        return _decode_jpeg(bytes(payload))
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WEBP":
        from .webp import decode_webp

        return decode_webp(bytes(payload))
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(bytes(payload))
    if bytes(payload[:2]) == b"BM":
        from .bmp import decode_bmp

        return decode_bmp(bytes(payload))
    if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(bytes(payload))
    magic = bytes(payload[:2])
    if magic in (b"P6", b"P5"):
        # binary PNM: magic, whitespace/comments, width, height, maxval,
        # ONE whitespace byte, raw samples
        fields: list[int] = []
        i = 2
        while len(fields) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to EOL
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        w, h, maxval = fields[0], fields[1], fields[2]
        if not 0 < maxval < 65536:
            raise ValueError(f"illegal PNM maxval {maxval}")
        c = 3 if magic == b"P6" else 1
        if maxval > 255:
            # 16-bit PNM: big-endian 2-byte samples; expose the high
            # byte (same 16→8 reduction as the PNG path)
            n = w * h * c
            buf = bytes(payload[i : i + 2 * n])
            raster = np.frombuffer(buf[: len(buf) // 2 * 2], dtype=">u2")
            if raster.size != n:
                raise ValueError(
                    f"truncated PNM: want {2 * n} bytes, got {len(buf)}"
                )
            return (raster >> 8).astype(np.uint8).reshape(h, w, c)
        raster = np.frombuffer(bytes(payload[i : i + w * h * c]), dtype=np.uint8)
        if raster.size != w * h * c:
            raise ValueError(f"truncated PNM: want {w * h * c} bytes, got {raster.size}")
        return raster.reshape(h, w, c)
    raise NotImplementedError(
        f"image codec for magic {magic!r} unavailable in this environment "
        "(PNM, PNG, JPEG, WebP-lossless, GIF, BMP, and baseline TIFF are "
        "the in-sandbox real paths)"
    )


def decode_audio(payload: bytes, meta: dict):
    """Audio decode: bytes → (samples float32 ndarray in [-1, 1],
    sample_rate).

    REAL for RIFF/WAVE — integer PCM 8/16/24/32, IEEE float32/64,
    G.711 μ-law/A-law, IMA ADPCM, and the WAVE_FORMAT_EXTENSIBLE
    wrapper (operators/wavext.py) — and for native FLAC streams
    (operators/flac.py: CONSTANT/VERBATIM/FIXED/LPC subframes,
    Rice/Rice2 residuals, all stereo decorrelation modes, CRC-verified).
    Remaining compressed formats (MP3/OGG full decode — codec libs
    absent; operators/mp3.py parses their metadata) raise
    ``NotImplementedError`` under the same contract.
    """
    import numpy as np

    if bytes(payload[:4]) == b"fLaC":
        from .flac import decode_flac

        samples, rate, bps = decode_flac(payload)
        return samples.astype(np.float32) / float(1 << (bps - 1)), rate
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE":
        from .wavext import parse_wav

        return parse_wav(bytes(payload))
    raise NotImplementedError(
        f"audio codec for magic {bytes(payload[:4])!r} unavailable in this "
        "environment (WAV incl. G.711/ADPCM, and FLAC, are the in-sandbox "
        "real paths)"
    )


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield ``(fourcc, payload_offset, payload_size)`` for the RIFF
    chunk sequence in ``data[pos:end]``.  Chunks are word-aligned: an
    odd-sized payload is followed by one pad byte."""
    while pos + 8 <= end:
        fourcc = bytes(data[pos : pos + 4])
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if pos + 8 + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(data: bytes) -> dict:
    """RIFF/AVI container parse → header fields + the stream-0 video
    frame index, WITHOUT decoding any frame.

    Walks ``LIST hdrl`` for the ``avih`` main header
    (dwMicroSecPerFrame / dwTotalFrames / dwWidth / dwHeight) and
    ``LIST movi`` (including nested ``LIST rec␣`` record groups) for
    the ``00dc``/``00db`` chunks of the first stream.  Returns
    ``{"width", "height", "usec_per_frame", "n_frames",
    "frames": [(fourcc, offset, size), ...]}`` — frame payloads stay
    as (offset, size) views so samplers can decode only the frames
    they keep.
    """
    import struct

    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    info = {"width": None, "height": None, "usec_per_frame": None,
            "n_frames": None, "frames": []}

    def walk(pos: int, end: int) -> None:
        for fourcc, s, sz in _riff_chunks(data, pos, end):
            if fourcc == b"LIST":
                if bytes(data[s : s + 4]) in (b"hdrl", b"movi", b"rec "):
                    walk(s + 4, s + sz)
            elif fourcc == b"avih":
                usec, _mbps, _pad, _flags, total = struct.unpack(
                    "<5I", bytes(data[s : s + 20])
                )
                w, h = struct.unpack("<II", bytes(data[s + 32 : s + 40]))
                info.update(
                    usec_per_frame=usec, n_frames=total, width=w, height=h
                )
            elif fourcc[:2] == b"00" and fourcc[2:4] in (b"dc", b"db"):
                info["frames"].append((fourcc, s, sz))

    walk(12, len(data))
    if info["width"] is None:
        raise ValueError("malformed AVI: no avih header")
    return info


def decode_video(payload: bytes, meta: dict, frame_indices=None):
    """Video decode: AVI container bytes → ``(frames, fps)`` where
    ``frames`` is a list of ``(frame_idx, HWC uint8 ndarray)``.

    REAL for two in-sandbox paths: **MJPEG** (``00dc`` chunks that are
    baseline JPEGs with embedded DHT — what ffmpeg/opencv MJPEG writers
    emit — decoded by ``_decode_jpeg``) and **uncompressed 24-bit DIB**
    (``00db`` chunks: bottom-up BGR rows padded to 4-byte stride).
    Other codecs raise ``NotImplementedError`` under the usual codec
    contract.

    ``frame_indices`` decodes only the named frames — the container
    index is a header walk over (offset, size) pairs, so a sampler
    that keeps every k-th frame pays entropy-decode cost only for the
    kept frames.
    """
    import numpy as np

    data = bytes(payload)
    info = parse_avi(data)
    frames = info["frames"]
    sel = range(len(frames)) if frame_indices is None else frame_indices
    out = []
    for i in sel:
        fourcc, off, sz = frames[i]
        chunk = data[off : off + sz]
        if fourcc.endswith(b"dc"):
            if chunk[:3] != b"\xff\xd8\xff":
                raise NotImplementedError(
                    "only MJPEG 00dc chunks are supported"
                )
            out.append((i, _decode_jpeg(chunk)))
        else:  # 00db: uncompressed DIB, bottom-up BGR, 4-byte row stride
            w, h = info["width"], info["height"]
            stride = (w * 3 + 3) & ~3
            if sz < stride * h:
                raise ValueError("truncated DIB frame")
            rows = np.frombuffer(chunk[: stride * h], np.uint8).reshape(
                h, stride
            )
            bgr = rows[::-1, : w * 3].reshape(h, w, 3)
            out.append((i, bgr[:, :, ::-1].copy()))
    fps = 1e6 / info["usec_per_frame"] if info["usec_per_frame"] else None
    return out, fps


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx long, height long, width long, "
    "mean_milli long, frame_md5 string"
)


def sample_video_frames(media: DataFrame, every_k: int = 2, pre=None) -> DataFrame:
    """Container-aware REAL frame sampling over ``mapInPandas``: for
    each RIFF/AVI payload, walk the chunk index, decode ONLY every
    ``every_k``-th frame (MJPEG/DIB via ``decode_video``), and emit
    integer per-frame features — (height, width), 1000·mean-pixel
    (floor), and the md5 of the decoded RGB raster.

    Scale shape mirrors ``sample_frames``: the container bytes never
    leave the scan partition; only (media_id, frame_idx, features)
    rows continue downstream, and skipped frames are never
    entropy-decoded (the chunk walk is a header scan).  Undecodable
    or non-AVI payloads are dropped.
    """

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        if pre is not None:  # fuse payload synthesis into this stage
            batches = pre(batches)  # (decoded_stats docstring, r12)
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "height",
                                   "width", "mean_milli", "frame_md5")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    info = parse_avi(bytes(payload))
                    keep = range(0, len(info["frames"]), every_k)
                    decoded, _fps = decode_video(payload, {}, keep)
                except Exception:  # not an AVI / unsupported codec: drop
                    continue
                for idx, img in decoded:
                    vals = img.reshape(-1)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["height"].append(img.shape[0])
                    out["width"].append(img.shape[1])
                    out["mean_milli"].append(
                        int(int(vals.sum()) * 1000 // vals.size)
                    )
                    out["frame_md5"].append(
                        hashlib.md5(img.tobytes()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=VIDEO_FRAME_SCHEMA)


DECODED_STATS_SCHEMA = (
    "media_id long, kind string, dim0 long, dim1 long, n_values long, mean_milli long"
)


def decoded_stats(media: DataFrame, pre=None) -> DataFrame:
    """End-to-end REAL-codec feature extraction over mapInPandas: decode
    each payload with the genuine stdlib codec (PNM image / WAV audio)
    and emit integer summary features — for images (dim0, dim1) =
    (height, width), n_values = pixel-samples, mean_milli = 1000·mean
    pixel (floor); for audio (dim0, dim1) = (sample_rate, channels),
    n_values = samples, mean_milli = 1000·mean |pcm16| (floor).
    Undecodable payloads are dropped (counted upstream via observe if
    needed).  Integer outputs keep the result engine-comparable.

    Exact-duplicate elision (r11): byte-identical payloads within an
    Arrow batch decode ONCE — real web/media corpora are full of exact
    duplicate assets (and the committed-fixture gate queries repeat 6
    payloads across every document), so a per-batch content-keyed memo
    is the correct engine behavior, not a benchmark trick.  The memo is
    per batch (bounded by batch size), keyed by the raw bytes (hash +
    equality — no collision risk), and caches the DROP decision for
    undecodable payloads too.

    ``pre`` (r12, guide §4.1): an optional generator transform applied
    to the incoming batches INSIDE the same ``mapInPandas`` stage —
    gate queries that synthesize payloads per row pass their maker here
    so synth → decode → reduce is ONE Python stage; the chained
    ``df.mapInPandas(mk) → decoded_stats`` form paid a second full
    JVM↔Arrow round-trip of the payload bytes (two ArrowEvalPython
    nodes) purely to move bytes between two Python functions."""

    def _stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if pre is not None:
            batches = pre(batches)

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "dim0", "dim1", "n_values", "mean_milli")}
            memo: dict = {}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    continue
                key = (kind, bytes(payload))
                if key in memo:
                    row = memo[key]
                    if row is None:
                        continue
                else:
                    try:
                        if kind == "image":
                            img = decode_image(payload, {})
                            h, w, _c = img.shape
                            vals = img.reshape(-1).astype(np.int64)
                            row = (h, w, int(vals.size), int(vals.sum() * 1000 // vals.size))
                        elif kind == "audio":
                            samples, rate = decode_audio(payload, {})
                            pcm = np.abs((samples * 32768.0).astype(np.int64))
                            nch = samples.shape[1] if samples.ndim > 1 else 1
                            row = (
                                rate,
                                nch,
                                int(pcm.size),
                                int(pcm.sum() * 1000 // pcm.size) if pcm.size else 0,
                            )
                        else:
                            continue
                    except Exception:  # undecodable payload (bad magic,
                        memo[key] = None  # truncated raster): drop, and
                        continue  # remember the drop for its duplicates
                    memo[key] = row
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["dim0"].append(row[0])
                out["dim1"].append(row[1])
                out["n_values"].append(row[2])
                out["mean_milli"].append(row[3])
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=DECODED_STATS_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic fake decode + feature extraction over mapInPandas:
    per payload, n_bytes + md5 + a 60→63-bit integer feature (first 8 md5
    hex digits).  Replace the body of ``_featurize`` with a real decoder
    (decode_image/decode_audio) when codecs exist; the Spark-side shape
    stays identical."""

    def _featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            digests = [
                hashlib.md5(p).hexdigest() if p is not None else None for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "md5_hex": digests,
                    "feature0": [
                        int(d[:8], 16) if d is not None else None for d in digests
                    ],
                }
            )

    return media.mapInPandas(_featurize, schema=FEATURES_SCHEMA)


def mux_avi_dib(frames, usec_per_frame: int = 40_000) -> bytes:
    """Minimal RIFF/AVI muxer for uncompressed 24-bit DIB frames (HWC
    RGB uint8 ndarrays in, bottom-up BGR ``00db`` chunks out) — the
    payload synthesizer for the gated video path.  Kept deliberately
    independent of the in-test muxer so encode and decode goldens don't
    share construction code."""
    import struct

    import numpy as np

    h, w, _ = frames[0].shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 25, 0, len(frames), 0, 0, 0, 0
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    )
    stride = (w * 3 + 3) & ~3
    bodies = []
    for img in frames:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        bodies.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(bodies))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_avi_dib(media_id: int, n_frames: int, h: int = 8, w: int = 8) -> bytes:
    """Deterministic DIB AVI: pixel(f, r, c, ch) = (media_id*31 + f*17 +
    r*5 + c*3 + ch) % 251 — pure integer arithmetic an external SQL
    engine reproduces with generate_series."""
    import numpy as np

    f = np.arange(n_frames)[:, None, None, None]
    r = np.arange(h)[None, :, None, None]
    c = np.arange(w)[None, None, :, None]
    ch = np.arange(3)[None, None, None, :]
    px = (media_id * 31 + f * 17 + r * 5 + c * 3 + ch) % 251
    return mux_avi_dib([p.astype(np.uint8) for p in px])
