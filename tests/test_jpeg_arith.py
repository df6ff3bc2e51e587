"""Arithmetic-JPEG golden tests (VERDICT r09 "codec corners").

Oracle: the SYSTEM libjpeg (Debian libjpeg62-turbo — an independent
implementation of ITU T.81 with arithmetic coding enabled), driven
through a ~150-line C helper (tests/golden/jpeg_arith_tool.c) compiled
on demand.  The decisive comparison is at the ENTROPY layer:
``jpeg_read_coefficients`` dumps libjpeg's exact quantized coefficient
grid, and operators/jpeg_arith.py must reproduce it EXACTLY — two
independent implementations of the published spec agreeing on every
integer, with no IDCT rounding convention in the way.  Covers the QM
decoder (conditional MPS/LPS exchange, renormalization, FF00
stuffing), the F.2.4 DC conditioning contexts and AC Kx split,
restart-interval statistics resets, and subsampled multi-component
MCU interleave.

Skips when gcc or libjpeg development support is absent.
"""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from rust_near_indexer_spark.operators.jpeg_arith import (
    ARITH_STATE_TABLE,
    decode_sequential_scan,
)
from rust_near_indexer_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    _decode_jpeg,
)


@pytest.fixture(scope="session")
def tool(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available")
    exe = tmp_path_factory.mktemp("jarith") / "jpeg_arith_tool"
    src = __file__.rsplit("/", 1)[0] + "/golden/jpeg_arith_tool.c"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, "-ljpeg"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg tool does not build: {r.stderr[:200]!r}")
    # arithmetic support is a libjpeg build option; probe it
    probe = subprocess.run(
        [str(exe), "enc", "8", "8", "75", "1", "0"],
        input=b"\x80" * 192,
        capture_output=True,
    )
    if probe.returncode != 0 or b"\xff\xc9" not in probe.stdout:
        pytest.skip("system libjpeg built without arithmetic encoding")
    return str(exe)


def _enc(tool, img, q=75, arith=1, prog=0, restart=0):
    h, w, _ = img.shape
    r = subprocess.run(
        [tool, "enc", str(w), str(h), str(q), str(arith), str(prog), str(restart)],
        input=np.ascontiguousarray(img).tobytes(),
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def _coef_ref(tool, jpg):
    r = subprocess.run([tool, "coef"], input=jpg, capture_output=True)
    assert r.returncode == 0, r.stderr
    comps, lines, i = {}, r.stdout.decode().splitlines(), 0
    while i < len(lines):
        _, ci, bh, bw = lines[i].split()
        ci, bh, bw = int(ci), int(bh), int(bw)
        arr = np.zeros((bh, bw, 64), np.int32)
        i += 1
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = list(map(int, lines[i].split()))
                i += 1
        comps[ci] = arr
    return comps


def _rgb_ref(tool, jpg):
    r = subprocess.run([tool, "dec"], input=jpg, capture_output=True)
    hdr, _, rest = r.stdout.partition(b"\n")
    w, h, nc = map(int, hdr.split())
    return np.frombuffer(rest, np.uint8).reshape(h, w, nc)


def _my_coefs(jpg):
    """Drive decode_sequential_scan from a minimal marker walk (the
    entropy-layer view, bypassing the IDCT tail)."""
    pos, frame, dc_cond, ac_cond, ri = 2, None, {}, {}, 0
    while pos + 4 <= len(jpg):
        assert jpg[pos] == 0xFF
        marker = jpg[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue
        (seglen,) = struct.unpack(">H", jpg[pos : pos + 2])
        seg = jpg[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xC9:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (h, w, comps)
        elif marker == 0xCC:
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0xF
                if tc == 0:
                    dc_cond[tb] = (seg[i + 1] & 0xF, seg[i + 1] >> 4)
                else:
                    ac_cond[tb] = seg[i + 1]
                i += 2
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for s in range(ns):
                cid, tsel = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(i for i, c in enumerate(frame[2]) if c[0] == cid)
                scan.append((ci, tsel >> 4, tsel & 0xF))
            h, w, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * cv, mcux * ch, 64), np.int32)
                for _c, ch, cv, _q in comps
            ]
            decode_sequential_scan(
                jpg, pos, frame, scan, dc_cond, ac_cond, ri, coefs,
                _JPEG_ZIGZAG,
            )
            return coefs
    raise AssertionError("no arithmetic SOS found")


def _assert_coefs_exact(tool, jpg):
    ref = _coef_ref(tool, jpg)
    mine = _my_coefs(jpg)
    for ci, r in ref.items():
        bh, bw = r.shape[:2]  # libjpeg trims pad blocks; we keep them
        np.testing.assert_array_equal(r, mine[ci][:bh, :bw], err_msg=f"comp {ci}")


@pytest.mark.parametrize(
    "shape,q",
    [
        ((8, 8), 75),
        ((24, 32), 75),
        ((40, 56), 30),
        ((17, 13), 90),
        ((64, 48), 50),
        ((128, 96), 10),
        ((9, 25), 95),
    ],
)
def test_coefficients_exact(tool, shape, q):
    h, w = shape
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    _assert_coefs_exact(tool, _enc(tool, img, q=q))


def test_coefficients_exact_gradient(tool):
    g = (np.mgrid[0:64, 0:48][0] * 4).astype(np.uint8)
    img = g.reshape(64, 48, 1).repeat(3, 2)
    _assert_coefs_exact(tool, _enc(tool, img, q=60))


@pytest.mark.parametrize("restart", [1, 2, 5])
def test_restart_interval_statistics_reset(tool, restart):
    rng = np.random.default_rng(restart)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    jpg = _enc(tool, img, restart=restart)
    assert any(bytes([0xFF, 0xD0 + i]) in jpg for i in range(8))
    _assert_coefs_exact(tool, jpg)


def test_full_pipeline_rgb_close_to_libjpeg(tool):
    """Pixel-level sanity: the coefficient layer is compared EXACTLY
    above; the RGB render is compared against libjpeg with its fancy
    upsampler disabled (the tool sets do_fancy_upsampling=FALSE, so
    both sides replicate chroma), leaving only integer-islow-IDCT vs
    float-matrix-IDCT and color-conversion rounding — within ±2 on
    smooth content."""
    y, x = np.mgrid[0:32, 0:40]
    g = ((x * 255 // 39 + y * 128 // 31) // 2).astype(np.uint8)
    img = np.stack([g, 255 - g, (g * 2).astype(np.uint8)], axis=2)
    jpg = _enc(tool, img)
    out = _decode_jpeg(jpg)
    ref = _rgb_ref(tool, jpg)
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_huffman_path_unchanged(tool):
    """The same image Huffman-coded decodes to the same coefficients as
    arithmetic-coded (entropy layer is lossless either way)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    a = _decode_jpeg(_enc(tool, img, arith=1))
    h = _decode_jpeg(_enc(tool, img, arith=0))
    np.testing.assert_array_equal(a, h)


@pytest.mark.parametrize("q,restart", [(75, 0), (30, 0), (75, 3), (90, 0)])
def test_progressive_arithmetic_equals_huffman_baseline(tool, q, restart):
    """SOF10: all four scan models (DC first/refine, AC first/refine
    with EOBx tracking) must accumulate the same coefficients the
    encoder started from — pinned by decoding the same image Huffman-
    baseline through our own pipeline (entropy layers are lossless, so
    the RGB renders must be IDENTICAL, same IDCT both sides)."""
    rng = np.random.default_rng(q + restart)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    jpg = _enc(tool, img, q=q, arith=1, prog=1, restart=restart)
    assert b"\xff\xca" in jpg  # SOF10
    np.testing.assert_array_equal(
        _decode_jpeg(jpg), _decode_jpeg(_enc(tool, img, q=q, arith=0, prog=0))
    )


def test_hierarchical_still_raises(tool):
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    jpg = bytearray(_enc(tool, img, arith=1, prog=0))
    i = jpg.index(b"\xff\xc9")
    jpg[i + 1] = 0xCE  # differential arithmetic SOF
    with pytest.raises(NotImplementedError, match="SOF marker 0xCE"):
        _decode_jpeg(bytes(jpg))


def test_state_table_is_spec_table_d3():
    # first row, last adaptive row, and the fixed bin — the published
    # Table D.3 anchor values
    assert ARITH_STATE_TABLE[0] == (0x5A1D, 0x81, 1)
    assert ARITH_STATE_TABLE[112] == (0x59EB, 0xF0, 111)
    assert ARITH_STATE_TABLE[113] == (0x5A1D, 0x71, 113)
    assert len(ARITH_STATE_TABLE) == 114


def test_multi_scan_sequential_arith_refused(tool):
    """A component-subset sequential arithmetic scan would desync the
    interleaved MCU walk — pin that it raises instead of decoding
    silently wrong (review r10 finding)."""
    rng = np.random.default_rng(8)
    jpg = bytearray(_enc(tool, rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)))
    # rewrite the SOS to claim a single component (ns=1, comp 1 only)
    i = jpg.index(b"\xff\xda")
    ln = (jpg[i + 2] << 8) | jpg[i + 3]
    # original: ns=3 with 3 (cid, tsel) pairs; new: ns=1 keeping comp 1
    new_sos = bytes([0xFF, 0xDA, 0, 8, 1, jpg[i + 5], jpg[i + 6]]) + bytes(
        jpg[i + 2 + ln - 3 : i + 2 + ln]
    )
    patched = bytes(jpg[:i]) + new_sos + bytes(jpg[i + 2 + ln :])
    with pytest.raises((NotImplementedError, ValueError)):
        _decode_jpeg(patched)
