"""Pins for the committed JPEG fixtures behind
queries/multimodal.image_jpeg_decode_stats (round 11 — the JPEG decode
path's first driver-facing gate; mirrors test_vp8_fixtures.py).

Three layers: (1) BOTH decode routes — pure T.81 and the native
libjpeg shim — reproduce the stats the query's oracle VALUES list
pins, so the pins hold with or without gcc/libjpeg on the machine
(the path-independence contract test_vp8_fixtures proved for WebP);
(2) when gcc and libjpeg are present, each committed payload's RGB
render is re-checked BIT-EXACT against libjpeg's own decompress at
test time (r12 — the pure decoder now implements libjpeg's islow
IDCT, box upsample, and fixed-point color tables exactly; the old
float-IDCT "envelope" comparison is gone with the float IDCT); (3)
the entropy layers are compared coefficient-EXACT against
jpeg_read_coefficients on fresh encodes of every mode in
tests/test_jpeg_arith.py — the class gate these fixtures were
generated under.  The full randomized sampling × entropy matrix is in
tests/test_jpeg_native.py.
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
    "baseline_q75": (24, 24, 1728, 127620),
    "baseline_q30_restart": (19, 21, 1197, 128803),
    "progressive_q75": (32, 48, 4608, 127548),
    "arith_seq_q60": (29, 35, 3045, 127033),
    "arith_prog_q75": (16, 24, 1152, 126798),
    "baseline_q90_noise": (16, 16, 768, 127093),
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


@pytest.mark.parametrize(
    "name,payload", JPEG_FIXTURES, ids=[n for n, _ in JPEG_FIXTURES]
)
def test_fixture_pins_path_independent(name, payload, monkeypatch):
    """The oracle pins hold on machines WITHOUT gcc/libjpeg: force the
    pure route and re-assert the exact stats (the same contract
    test_vp8_fixtures pins for the WebP native route — a native-only
    truth would make the driver gate environment-dependent)."""
    from rust_near_indexer_spark.operators import jpeg_native

    monkeypatch.setattr(jpeg_native, "available", lambda: False)
    img = decode_image(payload, {})
    h, w, _c = img.shape
    vals = img.reshape(-1).astype(np.int64)
    assert (h, w, int(vals.size), int(vals.sum() * 1000 // vals.size)) == PINS[name]


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
def test_fixture_rgb_bit_exact_vs_libjpeg(tool, name, payload, monkeypatch):
    """The PURE decoder's RGB vs libjpeg's own decompress: BIT-EXACT
    (r12 — islow IDCT + box upsample + fixed-point color reproduce
    libjpeg's pipeline integer-for-integer; the pre-r12 float IDCT
    needed a ±24 envelope here).  The golden tool decodes with library
    defaults, which on this image resolve to the same plain-box
    chroma convention the native shim pins.  The pure route is forced
    so the native wiring cannot hollow this gate out."""
    from rust_near_indexer_spark.operators import jpeg_native

    r = subprocess.run([tool, "dec"], input=bytes(payload), capture_output=True)
    assert r.returncode == 0, r.stderr
    hd, rest = r.stdout.split(b"\n", 1)
    w, h, nc = map(int, hd.split())
    ref = np.frombuffer(rest[: w * h * nc], np.uint8).reshape(h, w, nc)
    monkeypatch.setattr(jpeg_native, "available", lambda: False)
    out = decode_image(payload, {})
    assert out.shape == ref.shape
    assert np.array_equal(out, ref), (
        name,
        int(np.abs(out.astype(int) - ref.astype(int)).max()),
    )
