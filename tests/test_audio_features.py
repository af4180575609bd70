"""Audio DSP front-end (operators/audio_features.py): the core is
property-tested directly — Parseval, exact-bin pure tones, filterbank
structure — independent of the Spark-facing contract query."""

from __future__ import annotations

import numpy as np

from iceberg_geo_poc_spark.operators.audio_features import (
    dominant_mel_band,
    frame_signal,
    hann,
    hz_to_mel,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_hz,
    nearest_mel_filter,
)


def test_framing_counts_and_content():
    x = np.arange(100)
    f = frame_signal(x, 16, 8)
    assert f.shape == (11, 16)  # 1 + (100-16)//8
    assert (f[0] == x[:16]).all()
    assert (f[1] == x[8:24]).all()
    assert frame_signal(np.arange(10), 16, 8).shape == (0, 16)


def test_mel_scale_roundtrip_and_monotonic():
    f = np.array([0.0, 100.0, 1000.0, 7999.0])
    assert np.allclose(mel_to_hz(hz_to_mel(f)), f)
    mels = hz_to_mel(np.linspace(0, 8000, 100))
    assert (np.diff(mels) > 0).all()


def test_filterbank_partition_and_support():
    fb = mel_filterbank(40, 512, 16000)
    assert fb.shape == (40, 257)
    # interior frequency bins are covered by at least one filter with
    # combined weight near 1 (triangles overlap 50%: sum == 1 between
    # the first and last centers)
    freqs = np.fft.rfftfreq(512, 1 / 16000)
    centers = mel_to_hz(np.linspace(0, hz_to_mel(8000.0), 42))[1:-1]
    interior = (freqs > centers[0]) & (freqs < centers[-1])
    assert np.allclose(fb.sum(axis=0)[interior], 1.0, atol=1e-9)
    # every filter is nonnegative with one contiguous support run
    assert (fb >= 0).all()


def test_pure_tone_lands_on_expected_fft_bin_and_mel_band():
    rate, frame = 16000, 512
    for k in (5, 20, 60, 100):  # exact FFT bins
        f = k * rate / frame
        t = np.arange(4096)
        x = (8000 * np.sin(2 * np.pi * f * t / rate)).astype(np.int16)
        frames = frame_signal(x.astype(float), frame, 256)
        spec = np.abs(np.fft.rfft(frames * hann(frame), axis=1)) ** 2
        assert int(np.argmax(spec.sum(axis=0))) == k  # exact-bin peak
        mels = log_mel_spectrogram(x, rate, frame, 256, 40)
        assert abs(dominant_mel_band(mels) - nearest_mel_filter(f, 40, rate)) <= 1


def test_parseval_energy_conservation():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1000, 512)
    X = np.fft.rfft(x)
    # rfft parseval: sum|x|^2 == (|X0|^2 + 2*sum|Xk|^2 + |Xn/2|^2)/N
    lhs = float((x**2).sum())
    mags = np.abs(X) ** 2
    rhs = (mags[0] + 2 * mags[1:-1].sum() + mags[-1]) / len(x)
    assert np.isclose(lhs, rhs, rtol=1e-9)


def test_silence_and_empty():
    mels = log_mel_spectrogram(np.zeros(2048, dtype=np.int16), 16000)
    assert mels.shape[1] == 40
    assert (mels <= np.log(1e-9)).all()  # floor everywhere
    assert log_mel_spectrogram(np.zeros(10, dtype=np.int16), 16000).shape == (0, 40)
