"""Pins for the committed JPEG fixtures behind
queries/multimodal.image_jpeg_decode_stats (round 11 — the JPEG decode
path's first driver-facing gate; mirrors test_vp8_fixtures.py).

Two layers: (1) the pure decoder reproduces the stats the query's
oracle VALUES list pins (catches any drift in the Huffman/arithmetic
entropy decoders, IDCT, color conversion, or router); (2) when gcc and
libjpeg are present, each committed payload's RGB render is re-checked
against libjpeg's own decompress at test time — pixel-level
independent evidence per fixture, inside the documented
IDCT-convention envelope (integer islow IDCT there, exact float IDCT
here).  The entropy layers themselves are compared coefficient-EXACT
against jpeg_read_coefficients on fresh encodes of every mode in
tests/test_jpeg_arith.py — the class gate these fixtures were
generated under.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from rust_near_indexer_spark.operators.jpeg_fixtures import JPEG_FIXTURES
from rust_near_indexer_spark.operators.multimodal import decode_image

# mirror of the oracle VALUES list in image_jpeg_decode_stats
PINS = {
    "baseline_q75": (24, 24, 1728, 127631),
    "baseline_q30_restart": (19, 21, 1197, 128788),
    "progressive_q75": (32, 48, 4608, 127539),
    "arith_seq_q60": (29, 35, 3045, 127127),
    "arith_prog_q75": (16, 24, 1152, 126796),
    "baseline_q90_noise": (16, 16, 768, 127128),
}

# SOF marker proving each fixture really exercises its entropy mode
SOF = {
    "baseline_q75": b"\xff\xc0",
    "baseline_q30_restart": b"\xff\xc0",
    "progressive_q75": b"\xff\xc2",
    "arith_seq_q60": b"\xff\xc9",
    "arith_prog_q75": b"\xff\xca",
    "baseline_q90_noise": b"\xff\xc0",
}


def test_fixture_set_shape():
    assert [n for n, _ in JPEG_FIXTURES] == list(PINS)
    for name, data in JPEG_FIXTURES:
        assert data[:2] == b"\xff\xd8", name
        assert SOF[name] in data, name
    assert b"\xff\xd0" in dict(JPEG_FIXTURES)["baseline_q30_restart"]


@pytest.mark.parametrize(
    "name,payload", JPEG_FIXTURES, ids=[n for n, _ in JPEG_FIXTURES]
)
def test_fixture_decode_matches_oracle_pins(name, payload):
    img = decode_image(payload, {})
    h, w, c = img.shape
    vals = img.reshape(-1).astype(np.int64)
    assert (h, w, int(vals.size), int(vals.sum() * 1000 // vals.size)) == PINS[name]
    assert c == 3 and img.dtype == np.uint8


@pytest.fixture(scope="module")
def tool(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available")
    exe = tmp_path_factory.mktemp("jfix") / "jpeg_tool"
    src = __file__.rsplit("/", 1)[0] + "/golden/jpeg_arith_tool.c"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, "-ljpeg"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg tool does not build: {r.stderr[:200]!r}")
    return str(exe)


@pytest.mark.parametrize(
    "name,payload", JPEG_FIXTURES, ids=[n for n, _ in JPEG_FIXTURES]
)
def test_fixture_rgb_within_idct_envelope(tool, name, payload):
    """RGB vs libjpeg's decompress (fancy upsampling off, so both
    sides replicate chroma): coefficients are exact above, leaving
    libjpeg's integer islow IDCT vs this repo's exact float IDCT plus
    per-component color rounding.  Mean |diff| stays well under 1;
    outliers are confined to heavily-quantized high-frequency blocks
    (q30 noise content measured max 20 at generation time)."""
    r = subprocess.run([tool, "dec"], input=bytes(payload), capture_output=True)
    assert r.returncode == 0, r.stderr
    hd, rest = r.stdout.split(b"\n", 1)
    w, h, nc = map(int, hd.split())
    ref = np.frombuffer(rest[: w * h * nc], np.uint8).reshape(h, w, nc)
    out = decode_image(payload, {})
    assert out.shape == ref.shape
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.mean() < 1.0, (name, d.mean())
    assert d.max() <= 24, (name, d.max())
