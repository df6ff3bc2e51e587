"""Extended RIFF/WAVE decode — the non-PCM16 formats real audio
corpora carry.

The stdlib ``wave`` module only reads integer PCM; telephony and
speech corpora ship G.711 companded (μ-law format 7 / A-law format 6)
and IMA ADPCM (format 0x11) WAVs, and instrument corpora ship 8/24/32-
bit PCM and float32.  This module parses the RIFF chunks directly and
decodes every one of those, including the WAVE_FORMAT_EXTENSIBLE
(0xFFFE) wrapper that routes by SubFormat GUID.

All integer paths are integer-exact: the G.711 expansion follows the
CCITT reference tables (μ-law magnitudes ≤ 32124 and A-law ≤ 32256
both fit float32's 24-bit mantissa exactly after /32768), so gate
queries can replay every decoded value relationally
(queries/multimodal.audio_g711_expand_stats).  IMA ADPCM is a
sequential per-block fold — pytest-gated against an independent
in-test encoder (tests/test_wavext_codec.py), not SQL-expressible.

Corrupt/truncated payloads raise ValueError; genuinely absent codecs
(MS ADPCM 0x02, GSM 0x31) raise NotImplementedError — the codec
contract of operators/multimodal.py.  The reference has no codec
layer; SURVEY §2B north-star surface.
"""

from __future__ import annotations

import struct


def _ulaw_table():
    """CCITT G.711 ulaw2linear, vectorized as a 256-entry LUT."""
    import numpy as np

    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _alaw_table():
    """CCITT G.711 alaw2linear LUT (sign bit set means positive)."""
    import numpy as np

    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW = None
_ALAW = None


def ulaw_to_linear(data):
    """uint8 array of μ-law bytes → int16 PCM."""
    global _ULAW
    if _ULAW is None:
        _ULAW = _ulaw_table()
    return _ULAW[data]


def alaw_to_linear(data):
    global _ALAW
    if _ALAW is None:
        _ALAW = _alaw_table()
    return _ALAW[data]


# IMA ADPCM reference tables (IMA ADPCM spec / MS WAVE appendix)
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ima_decode_nibbles(nibbles, pred: int, index: int):
    """Sequential IMA ADPCM fold over one channel's nibble stream."""
    import numpy as np

    out = np.empty(len(nibbles), dtype=np.int16)
    for i, nib in enumerate(nibbles):
        step = _IMA_STEPS[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        index = max(0, min(88, index + _IMA_INDEX[nib]))
        out[i] = pred
    return out, pred, index


def _decode_ima(data: bytes, channels: int, block_align: int):
    """Block-structured IMA ADPCM → int16 (n, channels)."""
    import numpy as np

    if channels not in (1, 2):
        raise NotImplementedError(f"{channels}-channel IMA ADPCM")
    if block_align < 4 * channels or block_align % (4 * channels):
        raise ValueError(f"illegal IMA ADPCM block align {block_align}")
    chunks = []
    for off in range(0, len(data) - len(data) % block_align, block_align):
        block = data[off : off + block_align]
        per_ch = []
        preds, idxs = [], []
        for c in range(channels):
            pred, index = struct.unpack_from("<hB", block, 4 * c)
            if index > 88:
                raise ValueError(f"IMA ADPCM step index {index} out of range")
            preds.append(pred)
            idxs.append(index)
            per_ch.append([pred])
        body = block[4 * channels :]
        # data interleaves 4-byte words per channel
        for g in range(0, len(body), 4 * channels):
            for c in range(channels):
                word = body[g + 4 * c : g + 4 * c + 4]
                nibs = []
                for byte in word:
                    nibs.append(byte & 0x0F)
                    nibs.append((byte >> 4) & 0x0F)
                dec, preds[c], idxs[c] = _ima_decode_nibbles(
                    nibs, preds[c], idxs[c]
                )
                per_ch[c].extend(int(v) for v in dec)
        n = min(len(v) for v in per_ch)
        chunks.append(
            np.stack([np.array(v[:n], dtype=np.int16) for v in per_ch], axis=1)
        )
    if not chunks:
        raise ValueError("IMA ADPCM stream shorter than one block")
    return np.concatenate(chunks, axis=0)


def parse_wav(data: bytes):
    """bytes → (samples float32 in [-1, 1], sample_rate).

    Multi-channel output has shape (n, channels) — matching the stdlib
    path in ``decode_audio``."""
    import numpy as np

    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    body = None
    n = len(data)
    while pos + 8 <= n:
        cid = bytes(data[pos : pos + 4])
        size = struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            body = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("WAV without fmt / data chunk")
    if len(fmt) < 16:
        raise ValueError("short WAV fmt chunk")
    code, channels, rate, _brate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: SubFormat GUID
        if len(fmt) < 40:
            raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
        code = struct.unpack_from("<H", fmt, 24)[0]
    if channels < 1:
        raise ValueError("WAV with zero channels")

    if code == 1:  # integer PCM
        if bits == 8:
            v = np.frombuffer(body, dtype=np.uint8).astype(np.int32) - 128
            samples = (v << 8).astype(np.float32) / 32768.0
        elif bits == 16:
            samples = (
                np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2").astype(
                    np.float32
                )
                / 32768.0
            )
        elif bits == 24:
            b3 = np.frombuffer(
                body[: len(body) // 3 * 3], dtype=np.uint8
            ).reshape(-1, 3)
            v = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = (v.astype(np.float32)) / float(1 << 23)
        elif bits == 32:
            v = np.frombuffer(body[: len(body) // 4 * 4], dtype="<i4")
            samples = (v.astype(np.float64) / float(1 << 31)).astype(
                np.float32
            )
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM WAV")
    elif code == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(
                body[: len(body) // 4 * 4], dtype="<f4"
            ).astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(
                body[: len(body) // 8 * 8], dtype="<f8"
            ).astype(np.float32)
        else:
            raise NotImplementedError(f"{bits}-bit float WAV")
    elif code == 7:  # μ-law
        samples = (
            ulaw_to_linear(np.frombuffer(body, dtype=np.uint8)).astype(
                np.float32
            )
            / 32768.0
        )
    elif code == 6:  # A-law
        samples = (
            alaw_to_linear(np.frombuffer(body, dtype=np.uint8)).astype(
                np.float32
            )
            / 32768.0
        )
    elif code == 0x11:  # IMA ADPCM
        pcm = _decode_ima(bytes(body), channels, block_align)
        return pcm.astype(np.float32) / 32768.0, rate
    else:
        raise NotImplementedError(f"WAV format code 0x{code:x}")
    if channels > 1:
        samples = samples[: len(samples) // channels * channels].reshape(
            -1, channels
        )
    return samples, rate


# ---------------------------------------------------------------------------
# Product-side synthesizers for the gate query (genuine WAV containers
# around formula-driven companded bytes)
# ---------------------------------------------------------------------------


def _wav_container(code: int, channels: int, rate: int, bits: int,
                   block_align: int, body: bytes) -> bytes:
    fmt = struct.pack(
        "<HHIIHH",
        code,
        channels,
        rate,
        rate * block_align,
        block_align,
        bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_wav_g711(seed: int, n: int, law: str, rate: int = 8000) -> bytes:
    """A genuine G.711 WAV whose companded byte stream is the pure
    integer formula b_i = (seed*7 + i*13) % 256 — so a DuckDB oracle
    can replay the CCITT expansion relationally."""
    body = bytes((seed * 7 + i * 13) % 256 for i in range(n))
    code = 7 if law == "ulaw" else 6
    return _wav_container(code, 1, rate, 8, 1, body)
