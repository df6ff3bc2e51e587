"""Round-7+ audio DSP front-end: framing, Hann+rFFT spectrum, centroid/
rolloff/RMS/ZCR, mel filterbank, MFCC — pinned three independent ways:

1. the rFFT magnitude spectrum matches a naive O(n²) textbook DFT
   written HERE (no shared code with the operator);
2. analytic signals with known answers: a pure sine's spectral centroid
   lands on its frequency, silence has zero RMS, a full-scale square
   wave has RMS 1 and ZCR at its toggle rate;
3. the mel filterbank rows sum triangles that tile (each FFT bin inside
   the band has total weight bounded by 1-ish) and the DCT basis is
   orthonormal.

The Spark path is exercised end-to-end: WAV payloads muxed in-test with
the stdlib ``wave`` writer, decoded inside mapInPandas, feature rows
compared against directly computed values.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from rust_near_indexer_spark.operators.audio import (
    _dct2_orthonormal,
    audio_spectral_frames,
    frame_signal,
    hann_window,
    mel_filterbank,
    spectral_features_frame,
)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float [-1,1] mono → PCM16 RIFF/WAVE bytes via the stdlib writer."""
    pcm = np.clip(np.round(samples * 32767), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _naive_dft_mag(x: np.ndarray) -> np.ndarray:
    """O(n²) textbook DFT magnitude for bins 0..n//2 — no numpy.fft."""
    n = len(x)
    out = []
    for k in range(n // 2 + 1):
        re = sum(x[t] * np.cos(-2 * np.pi * k * t / n) for t in range(n))
        im = sum(x[t] * np.sin(-2 * np.pi * k * t / n) for t in range(n))
        out.append(np.hypot(re, im))
    return np.array(out)


def test_rfft_matches_naive_dft():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64)
    win = hann_window(64)
    got = spectral_features_frame(x[None, :], 8000)
    spec = np.abs(np.fft.rfft(x * win))
    np.testing.assert_allclose(spec, _naive_dft_mag(x * win), atol=1e-9)
    # and the centroid derived from that spectrum agrees
    freqs = np.fft.rfftfreq(64, d=1 / 8000)
    want = (spec * freqs).sum() / spec.sum()
    assert got["centroid_hz"][0] == pytest.approx(want)


def test_analytic_signals():
    rate, n = 8000, 256
    t = np.arange(n * 4) / rate
    # pure 1 kHz sine: centroid ~1000 Hz on every frame
    sine = np.sin(2 * np.pi * 1000 * t)
    f = spectral_features_frame(frame_signal(sine, n, n), rate)
    assert np.allclose(f["centroid_hz"], 1000.0, atol=25.0)
    assert np.all(f["rolloff_hz"] >= 900.0)
    # silence: zero RMS, zero ZCR
    z = spectral_features_frame(frame_signal(np.zeros(n * 2), n, n), rate)
    assert np.all(z["rms"] == 0) and np.all(z["zcr"] == 0)
    # full-scale square toggling every 4 samples: RMS 1, ZCR 1/4
    sq = np.tile(np.repeat([1.0, -1.0], 4), n)
    s = spectral_features_frame(frame_signal(sq, n, n), rate)
    assert np.allclose(s["rms"], 1.0)
    assert np.allclose(s["zcr"], 0.25, atol=1 / n)


def test_mel_filterbank_and_dct():
    fb = mel_filterbank(16, 256, 8000)
    assert fb.shape == (16, 129)
    assert np.all(fb >= 0) and np.all(fb.sum(axis=1) > 0)
    # interior bins covered by at most two overlapping triangles
    assert fb.sum(axis=0).max() <= 2.0 + 1e-9
    c = _dct2_orthonormal(16)
    np.testing.assert_allclose(c @ c.T, np.eye(16), atol=1e-12)


def test_dominant_mel_tracks_frequency():
    """A higher-frequency sine must excite a higher mel band."""
    rate, n = 8000, 256
    t = np.arange(n * 2) / rate
    lo = spectral_features_frame(
        frame_signal(np.sin(2 * np.pi * 300 * t), n, n), rate
    )["dominant_mel"]
    hi = spectral_features_frame(
        frame_signal(np.sin(2 * np.pi * 3000 * t), n, n), rate
    )["dominant_mel"]
    assert lo.max() < hi.min()


def test_audio_spectral_frames_spark(spark):
    """End-to-end: WAV payloads through decode + DSP inside mapInPandas;
    rows recomputed directly in the test."""
    rate = 8000
    t = np.arange(rate) / rate  # 1 s
    clip_a = np.sin(2 * np.pi * 440 * t) * 0.5
    clip_b = np.sin(2 * np.pi * 2000 * t) * 0.25
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(_wav_bytes(clip_a, rate)), None),
            (2, "audio", bytearray(_wav_bytes(clip_b, rate)), None),
            (3, "audio", bytearray(b"not audio"), None),
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<width:long,height:long,sample_rate:long,n_frames:long>",
    )
    df = audio_spectral_frames(media, frame_len=256, hop=128)
    rows = df.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2}
    # frame count = 1 + (8000-256)//128
    assert len(by_media[1]) == 1 + (rate - 256) // 128
    # centroids bracket the two tones
    c_a = np.median([r["centroid_milli_hz"] for r in by_media[1]]) / 1000
    c_b = np.median([r["centroid_milli_hz"] for r in by_media[2]]) / 1000
    assert abs(c_a - 440) < 60 and abs(c_b - 2000) < 60
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    rms_a = np.median([r["rms_milli"] for r in by_media[1]]) / 1000
    assert abs(rms_a - 0.5 / np.sqrt(2)) < 0.01
    # direct recomputation of one frame's row (PCM16 quantization included)
    pcm = np.clip(np.round(clip_a * 32767), -32768, 32767) / 32768.0
    f = spectral_features_frame(
        frame_signal(pcm.astype(np.float64), 256, 128), rate
    )
    r0 = next(r for r in by_media[1] if r["frame_idx"] == 0)
    assert r0["centroid_milli_hz"] == int(np.floor(f["centroid_hz"][0] * 1000))
    assert r0["mfcc0_milli"] == int(np.floor(f["mfcc"][0, 0] * 1000))
    assert r0["dominant_mel"] == int(f["dominant_mel"][0])


def test_audio_spectral_frames_plan_no_shuffle(spark):
    """Scale shape: PCM bytes go scan -> MapInPandas with no Exchange
    in between (payloads never cross a shuffle)."""
    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"x"), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<width:long,height:long,sample_rate:long,n_frames:long>",
    )
    plan = audio_spectral_frames(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan
