"""VERDICT r05 #7: one REAL codec path executes end-to-end in-sandbox.

PNM (P5/P6) and PCM16 WAV are stdlib-decodable, so decode_image /
decode_audio genuinely parse bytes here — payloads are synthesized
in-test, decoded inside mapInPandas on executors, and the integer
features are pinned against independently computed values.  Formats
needing absent codec libs still raise NotImplementedError (pinned too).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from rust_near_indexer_spark.operators import multimodal


def _ppm_p6(w: int, h: int) -> tuple[bytes, np.ndarray]:
    """Deterministic RGB raster + its P6 encoding (with a header comment
    to exercise the comment-skipping parse path)."""
    img = (np.arange(w * h * 3, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(
        h, w, 3
    )
    header = f"P6\n# synthetic fixture\n{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def _pgm_p5(w: int, h: int) -> tuple[bytes, np.ndarray]:
    img = (np.arange(w * h, dtype=np.int64) * 13 % 256).astype(np.uint8).reshape(
        h, w, 1
    )
    return f"P5\n{w} {h}\n255\n".encode() + img.tobytes(), img


def _wav_pcm16(rate: int, n: int, channels: int = 1) -> tuple[bytes, np.ndarray]:
    pcm = ((np.arange(n * channels, dtype=np.int64) * 997) % 20001 - 10000).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue(), pcm


def test_decode_image_ppm_roundtrip():
    payload, img = _ppm_p6(17, 9)
    got = multimodal.decode_image(payload, {})
    assert got.shape == (9, 17, 3)
    assert np.array_equal(got, img)


def test_decode_image_pgm_roundtrip():
    payload, img = _pgm_p5(8, 5)
    got = multimodal.decode_image(payload, {})
    assert got.shape == (5, 8, 1)
    assert np.array_equal(got, img)


def test_decode_audio_wav_roundtrip():
    payload, pcm = _wav_pcm16(16_000, 1000)
    samples, rate = multimodal.decode_audio(payload, {})
    assert rate == 16_000
    assert samples.dtype == np.float32
    assert np.array_equal((samples * 32768.0).astype("<i2"), pcm)


def test_unsupported_formats_still_raise():
    # Both WebP paths (VP8L lossless, lossy VP8 keyframes) are real
    # now; a lossy chunk with a garbage payload is MALFORMED (the VP8
    # decoder's truncation contract), and so is a chunk-less RIFF
    lossy = b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00" + b"\x00" * 4
    with pytest.raises(ValueError):
        multimodal.decode_image(lossy, {})  # native or spec route
    import unittest.mock as mock

    from rust_near_indexer_spark.operators import webp_native as wn

    with mock.patch.object(wn, "available", lambda: False):
        with pytest.raises(ValueError, match="truncated VP8"):
            multimodal.decode_image(lossy, {})
    with pytest.raises(ValueError, match="VP8L chunk"):
        multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8, {})
    mp3ish = b"ID3\x04" + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="WAV"):
        multimodal.decode_audio(mp3ish, {})
    # JPEG is a real path now: a truncated stream is MALFORMED, not
    # unsupported
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16, {})


def test_decoded_stats_end_to_end(spark):
    """The full Spark path: binary payloads → mapInPandas → real decode
    → integer features, checked against pure-python expectations."""
    ppm, img = _ppm_p6(12, 7)
    wav, pcm = _wav_pcm16(8_000, 640)
    truncated = b"P6\n4 4\n255\n" + b"\x01" * 5  # undecodable: dropped
    rows = [
        (1, "image", bytearray(ppm), None),
        (2, "audio", bytearray(wav), None),
        (3, "image", bytearray(truncated), None),
        (4, "video", bytearray(b"\x00\x01"), None),  # no codec: dropped
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decoded_stats(media).collect()
    }
    vals = img.reshape(-1).astype(np.int64)
    assert got[1] == {
        "media_id": 1,
        "kind": "image",
        "dim0": 7,
        "dim1": 12,
        "n_values": int(vals.size),
        "mean_milli": int(vals.sum() * 1000 // vals.size),
    }
    apcm = np.abs(pcm.astype(np.int64))
    assert got[2] == {
        "media_id": 2,
        "kind": "audio",
        "dim0": 8_000,
        "dim1": 1,
        "n_values": 640,
        "mean_milli": int(apcm.sum() * 1000 // apcm.size),
    }
    assert set(got) == {1, 2}


def test_synth_wav_roundtrips_through_real_decode():
    """The audio gate's payload generator: real RIFF/WAVE bytes whose
    decode recovers the integer tone exactly (float32 normalization is
    exact at |s| <= 2000)."""
    import numpy as np

    from rust_near_indexer_spark.operators.audio import synth_pcm16, synth_wav_bytes
    from rust_near_indexer_spark.operators.multimodal import decode_audio

    for did, n in [(0, 64), (17, 100), (49999, 127)]:
        samples, rate = decode_audio(synth_wav_bytes(did, n), {})
        assert rate == 8000 and len(samples) == n
        back = np.rint(samples.astype(np.float64) * 32768.0).astype(np.int64)
        assert back.tolist() == synth_pcm16(did, n).tolist()


def test_synth_avi_roundtrips_through_real_decode():
    """The video gate's payload generator: a real RIFF/AVI DIB container
    whose selective decode recovers the generator pixels bit-exactly."""
    import numpy as np

    from rust_near_indexer_spark.operators.multimodal import (
        decode_video,
        parse_avi,
        synth_avi_dib,
    )

    payload = synth_avi_dib(media_id=7, n_frames=4)
    info = parse_avi(payload)
    assert info["n_frames"] == 4 and len(info["frames"]) == 4
    decoded, fps = decode_video(payload, {}, frame_indices=[0, 2])
    assert [i for i, _ in decoded] == [0, 2]
    for fi, img in decoded:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        want = (7 * 31 + fi * 17 + r * 5 + c * 3 + ch) % 251
        assert (img.astype(np.int64) == want).all()


def test_pnm_16bit_high_byte():
    """maxval > 255 → big-endian 2-byte samples; decode exposes the
    high byte (the same 16→8 reduction as the PNG path).  Low bytes are
    noisy to catch accidental low-byte or little-endian reads."""
    import numpy as np

    from rust_near_indexer_spark.operators import multimodal

    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 65536, (6, 7, 3), dtype=np.uint16)
    payload = f"P6\n7 6\n65535\n".encode() + img16.astype(">u2").tobytes()
    out = multimodal.decode_image(payload, {})
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))

    gray16 = rng.integers(0, 65536, (4, 5, 1), dtype=np.uint16)
    payload = f"P5\n5 4\n65535\n".encode() + gray16.astype(">u2").tobytes()
    out = multimodal.decode_image(payload, {})
    assert np.array_equal(out, (gray16 >> 8).astype(np.uint8))

    # truncated 16-bit raster fails loudly
    import pytest

    with pytest.raises(ValueError, match="truncated PNM"):
        multimodal.decode_image(b"P5\n4 4\n65535\n" + b"\x00" * 7, {})
    with pytest.raises(ValueError, match="illegal PNM maxval"):
        multimodal.decode_image(b"P5\n2 2\n65536\n" + b"\x00" * 16, {})
