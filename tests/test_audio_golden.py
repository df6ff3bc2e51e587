"""G.711 / IMA-ADPCM golden suite vs CPython's audioop (round 11).

The audio expansion paths were gated against spec-derived in-test
encoders — the same-author failure class ADVICE r10 caught in the VP8
RGB conversion.  CPython's ``audioop`` (a C implementation dating to
the SGI days, independent of this repo's tables) ships in the
sandbox's Python 3.11 and provides the independent side:

- ``ulaw2lin`` / ``alaw2lin``: all 256 codes of both G.711 laws must
  expand to the IDENTICAL int16 values as our vectorized LUTs;
- ``adpcm2lin`` (Intel/DVI = IMA ADPCM): the sequential nibble fold —
  step-table walk, 3-bit magnitude reconstruction, index clamp to
  [0, 88], predictor clamp to int16 — must produce identical samples
  from identical (predictor, index) states across random streams and
  adversarial corner streams.

``audioop`` is deprecated (removed in 3.13): the suite import-gates it
and skips cleanly where absent, leaving the in-test-encoder gates in
test_wavext_codec.py as the fallback evidence.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

try:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
except ImportError:  # Python >= 3.13
    audioop = None

from rust_near_indexer_spark.operators.wavext import (
    _ima_decode_nibbles,
    alaw_to_linear,
    ulaw_to_linear,
)

pytestmark = pytest.mark.skipif(
    audioop is None, reason="stdlib audioop removed (Python >= 3.13)"
)


def test_ulaw_all_codes_exact():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
    np.testing.assert_array_equal(ulaw_to_linear(codes), ref)


def test_alaw_all_codes_exact():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2")
    np.testing.assert_array_equal(alaw_to_linear(codes), ref)


def _audioop_adpcm(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    """audioop's stream format packs the FIRST nibble in the HIGH half
    of each byte (the WAV IMA container packs low-first; that is
    container framing, undone by _decode_ima before the fold)."""
    packed = bytes(
        (int(nibbles[i]) << 4) | int(nibbles[i + 1])
        for i in range(0, len(nibbles) - 1, 2)
    )
    out, _state = audioop.adpcm2lin(packed, 2, (pred, index))
    return np.frombuffer(out, "<i2")


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("pred,index", [(0, 0), (-1234, 17), (30000, 88)])
def test_ima_adpcm_fold_exact(seed, pred, index):
    rng = np.random.default_rng(seed)
    nibbles = rng.integers(0, 16, 512).astype(np.uint8)
    ours, _p, _i = _ima_decode_nibbles(nibbles, pred, index)
    np.testing.assert_array_equal(ours, _audioop_adpcm(nibbles, pred, index))


def test_ima_adpcm_clamp_corners_exact():
    """Adversarial streams that pin the clamps: all-magnitude nibbles
    (7) slam the index to 88 and the predictor into int16 saturation;
    all-sign-magnitude (15) slams the negative rail; alternating 7/15
    whipsaws the predictor across both clamps."""
    for stream in (
        np.full(256, 7, np.uint8),
        np.full(256, 15, np.uint8),
        np.tile(np.array([7, 15], np.uint8), 128),
        np.tile(np.array([0, 8], np.uint8), 128),  # index decay path
    ):
        ours, _p, _i = _ima_decode_nibbles(stream, 0, 0)
        np.testing.assert_array_equal(ours, _audioop_adpcm(stream, 0, 0))
