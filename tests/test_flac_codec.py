"""FLAC decoder goldens.

Streams are built by an in-test FLAC *encoder* (bit writer + frame/
subframe/rice encoders written independently from the decoder), so the
decoder is pinned against separately-constructed bitstreams rather than
fixtures it produced itself.  CRC-8/CRC-16 implementations are pinned
against published check values first, so both sides can share them
without circularity.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_near_indexer_spark.operators.flac import crc8, crc16, decode_flac

# ---------------------------------------------------------------------------
# CRC known-answer vectors (CRC-8/SMBUS and CRC-16/BUYPASS, the FLAC pair)
# ---------------------------------------------------------------------------


def test_crc_known_answers():
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


# ---------------------------------------------------------------------------
# In-test encoder
# ---------------------------------------------------------------------------


class W:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        return self

    def s(self, val: int, n: int):
        return self.u(val & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def streaminfo(rate: int, channels: int, bps: int, total: int,
               md5: bytes = b"\x00" * 16) -> bytes:
    w = W()
    w.u(1, 1).u(0, 7)  # last-metadata-block, type 0
    w.u(34, 24)
    w.u(16, 16).u(65535, 16)  # min/max blocksize
    w.u(0, 24).u(0, 24)
    w.u(rate, 20).u(channels - 1, 3).u(bps - 1, 5).u(total, 36)
    for b in md5:
        w.u(b, 8)  # all-zero = unset (skip verification) per spec
    return b"fLaC" + w.bytes()


def rice(w: W, residual: list[int], param: int, porder: int, order: int, bs: int):
    """Residual coding method 0 (4-bit Rice), all partitions same param."""
    w.u(0, 2).u(porder, 4)
    idx = 0
    for p in range(1 << porder):
        n = (bs >> porder) - (order if p == 0 else 0)
        w.u(param, 4)
        for _ in range(n):
            x = residual[idx]
            idx += 1
            z = (x << 1) ^ (x >> 63) if x >= 0 else (-x << 1) - 1
            q, r = z >> param, z & ((1 << param) - 1)
            for _ in range(q):
                w.u(0, 1)
            w.u(1, 1)
            if param:
                w.u(r, param)
    assert idx == len(residual)


def rice_escape(w: W, residual: list[int], rawbits: int, order: int, bs: int):
    """One partition, escape-coded raw residuals."""
    w.u(0, 2).u(0, 4).u(0xF, 4).u(rawbits, 5)
    for x in residual:
        w.s(x, rawbits)


def sub_verbatim(w: W, samples: list[int], bps: int, wasted: int = 0):
    w.u(0, 1).u(1, 6)
    if wasted:
        w.u(1, 1)
        for _ in range(wasted - 1):
            w.u(0, 1)
        w.u(1, 1)
    else:
        w.u(0, 1)
    for s in samples:
        w.s(s >> wasted, bps - wasted)


def sub_constant(w: W, value: int, bps: int):
    w.u(0, 1).u(0, 6).u(0, 1)
    w.s(value, bps)


def sub_fixed(w: W, samples: list[int], order: int, bps: int, param: int,
              porder: int = 0, escape_raw: int = 0):
    from rust_near_indexer_spark.operators.flac import FIXED_COEFFS

    w.u(0, 1).u(8 + order, 6).u(0, 1)
    for s in samples[:order]:
        w.s(s, bps)
    coeffs = FIXED_COEFFS[order]
    residual = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        for i in range(order, len(samples))
    ]
    if escape_raw:
        rice_escape(w, residual, escape_raw, order, len(samples))
    else:
        rice(w, residual, param, porder, order, len(samples))


def sub_lpc(w: W, samples: list[int], coeffs: list[int], shift: int,
            precision: int, bps: int, param: int):
    order = len(coeffs)
    w.u(0, 1).u(31 + order, 6).u(0, 1)
    for s in samples[:order]:
        w.s(s, bps)
    w.u(precision - 1, 4).s(shift, 5)
    for c in coeffs:
        w.s(c, precision)
    residual = [
        samples[i]
        - (sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs)) >> shift)
        for i in range(order, len(samples))
    ]
    rice(w, residual, param, 0, order, len(samples))


def frame(subframes, bs: int, channels: int, frameno: int = 0,
          ch_code: int | None = None) -> bytes:
    """subframes: callable(w) list — one per encoded subframe."""
    w = W()
    w.u(0b11111111111110, 14).u(0, 1).u(0, 1)
    w.u(7, 4)  # blocksize: 16-bit at end of header
    w.u(0, 4)  # sample rate: from STREAMINFO
    w.u(ch_code if ch_code is not None else channels - 1, 4)
    w.u(0, 3).u(0, 1)  # sample size: from STREAMINFO
    assert frameno < 0x80
    w.u(frameno, 8)
    w.u(bs - 1, 16)
    hdr = w.align().bytes()
    w2 = W()
    w2.u(crc8(hdr), 8)
    body = W()
    for sf in subframes:
        sf(body)
    body.align()
    payload = hdr + w2.bytes() + body.bytes()
    w3 = W()
    w3.u(crc16(payload), 16)
    return payload + w3.bytes()


# ---------------------------------------------------------------------------
# Decoder goldens
# ---------------------------------------------------------------------------

RNG = np.random.default_rng(7)


def test_verbatim_mono_roundtrip():
    samples = RNG.integers(-32768, 32768, 64).tolist()
    data = streaminfo(44100, 1, 16, 64) + frame(
        [lambda w: sub_verbatim(w, samples, 16)], 64, 1
    )
    out, rate, bps = decode_flac(data)
    assert rate == 44100 and bps == 16
    assert out.tolist() == samples


def test_constant_and_multiframe():
    data = streaminfo(8000, 1, 16, 96) + frame(
        [lambda w: sub_constant(w, -1234, 16)], 48, 1, frameno=0
    ) + frame([lambda w: sub_constant(w, 77, 16)], 48, 1, frameno=1)
    out, rate, _ = decode_flac(data)
    assert out.tolist() == [-1234] * 48 + [77] * 48


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    # a smooth-ish signal so fixed-predictor residuals stay small
    t = np.arange(64)
    samples = (1000 * np.sin(t / 9) + t * 3).astype(np.int64).tolist()
    data = streaminfo(16000, 1, 16, 64) + frame(
        [lambda w: sub_fixed(w, samples, order, 16, param=6)], 64, 1
    )
    out, _, _ = decode_flac(data)
    assert out.tolist() == samples


def test_fixed_partitioned_and_escape():
    samples = RNG.integers(-5000, 5000, 64).tolist()
    data = streaminfo(16000, 1, 16, 128) + frame(
        [lambda w: sub_fixed(w, samples, 2, 16, param=9, porder=2)],
        64, 1, frameno=0,
    ) + frame(
        [lambda w: sub_fixed(w, samples, 1, 16, param=0, escape_raw=17)],
        64, 1, frameno=1,
    )
    out, _, _ = decode_flac(data)
    assert out.tolist() == samples + samples


def test_lpc_roundtrip():
    t = np.arange(64)
    samples = (3000 * np.sin(t / 5)).astype(np.int64).tolist()
    data = streaminfo(22050, 1, 16, 64) + frame(
        [lambda w: sub_lpc(w, samples, [3, -2], shift=1, precision=6,
                           bps=16, param=8)],
        64, 1,
    )
    out, _, _ = decode_flac(data)
    assert out.tolist() == samples


def test_wasted_bits():
    samples = [s * 4 for s in RNG.integers(-4000, 4000, 32).tolist()]
    data = streaminfo(8000, 1, 16, 32) + frame(
        [lambda w: sub_verbatim(w, samples, 16, wasted=2)], 32, 1
    )
    out, _, _ = decode_flac(data)
    assert out.tolist() == samples


def test_stereo_independent_and_decorrelated():
    left = RNG.integers(-30000, 30000, 32).tolist()
    right = RNG.integers(-30000, 30000, 32).tolist()
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    cases = [
        (1, [lambda w: sub_verbatim(w, left, 16),
             lambda w: sub_verbatim(w, right, 16)]),
        (8, [lambda w: sub_verbatim(w, left, 16),
             lambda w: sub_verbatim(w, side, 17)]),
        (9, [lambda w: sub_verbatim(w, side, 17),
             lambda w: sub_verbatim(w, right, 16)]),
        (10, [lambda w: sub_verbatim(w, mid, 16),
              lambda w: sub_verbatim(w, side, 17)]),
    ]
    for ch_code, subs in cases:
        data = streaminfo(48000, 2, 16, 32) + frame(
            subs, 32, 2, ch_code=ch_code
        )
        out, _, _ = decode_flac(data)
        assert out.shape == (32, 2), ch_code
        assert out[:, 0].tolist() == left, ch_code
        assert out[:, 1].tolist() == right, ch_code


def test_24bit():
    samples = RNG.integers(-(1 << 23), 1 << 23, 16).tolist()
    data = streaminfo(96000, 1, 24, 16) + frame(
        [lambda w: sub_verbatim(w, samples, 24)], 16, 1
    )
    out, rate, bps = decode_flac(data)
    assert bps == 24 and rate == 96000
    assert out.tolist() == samples


def test_corrupt_crc_and_truncation_raise():
    samples = [1] * 16
    good = streaminfo(8000, 1, 16, 16) + frame(
        [lambda w: sub_verbatim(w, samples, 16)], 16, 1
    )
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 6])
    with pytest.raises(ValueError):
        decode_flac(b"NOPE" + good[4:])


def test_decode_audio_dispatches_flac():
    from rust_near_indexer_spark.operators.multimodal import decode_audio

    samples = RNG.integers(-32768, 32768, 48).tolist()
    data = streaminfo(44100, 1, 16, 48) + frame(
        [lambda w: sub_verbatim(w, samples, 16)], 48, 1
    )
    out, rate = decode_audio(data, {})
    assert rate == 44100 and out.dtype == np.float32
    assert np.allclose(out, np.array(samples) / 32768.0)


def test_fuzzed_streams_fail_loudly_never_silently():
    """Structured fuzz: random corruptions of a valid stream must raise
    (ValueError/NotImplementedError) or decode to the ORIGINAL samples
    (corruption in ignored metadata) — never return different audio
    silently.  CRCs are the enforcement mechanism being tested."""
    import random

    import hashlib

    rng = random.Random(11)
    samples = [rng.randrange(-32768, 32768) for _ in range(32)]
    md5 = hashlib.md5(np.array(samples, "<i2").tobytes()).digest()
    good = streaminfo(8000, 1, 16, 32, md5=md5) + frame(
        [lambda w: sub_verbatim(w, samples, 16)], 32, 1
    )
    out, _, _ = decode_flac(good)  # correct md5 verifies clean
    assert out.tolist() == samples
    silent_wrong = 0
    for _ in range(300):
        bad = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            out, _, _ = decode_flac(bytes(bad))
        except (ValueError, NotImplementedError, IndexError):
            continue
        if out.tolist() != samples:
            silent_wrong += 1
    assert silent_wrong == 0
