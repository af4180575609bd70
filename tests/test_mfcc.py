"""MFCC front-end tests (operators/audio_features.py DCT additions)."""

from __future__ import annotations

import numpy as np

from iceberg_geo_poc_spark.operators import audio_features as AF


def test_dct_is_orthonormal():
    for n in (8, 13, 40):
        c = AF.dct_ortho(n)
        assert np.allclose(c @ c.T, np.eye(n), atol=1e-12)


def test_parseval_norm_preserved():
    rng = np.random.default_rng(7)
    mels = rng.normal(size=(12, 40))
    coeffs = AF.mfcc_from_log_mel(mels, n_coeff=40)
    assert np.isclose(np.sum(coeffs**2), np.sum(mels**2), rtol=1e-12)


def test_full_rank_inversion_roundtrip():
    rng = np.random.default_rng(11)
    mels = rng.normal(size=(5, 40))
    coeffs = AF.mfcc_from_log_mel(mels, n_coeff=40)
    recon = coeffs @ AF.dct_ortho(40)
    assert np.allclose(recon, mels, atol=1e-10)


def test_c0_is_scaled_mean():
    # coefficient 0 of the orthonormal DCT-II is sum/sqrt(n) — the
    # log-energy term every MFCC consumer treats specially
    mels = np.arange(80, dtype=float).reshape(2, 40)
    coeffs = AF.mfcc_from_log_mel(mels, n_coeff=1)
    assert np.allclose(coeffs[:, 0], mels.sum(axis=1) / np.sqrt(40))


def test_truncated_coeffs_prefix_of_full():
    rng = np.random.default_rng(3)
    mels = rng.normal(size=(4, 40))
    full = AF.mfcc_from_log_mel(mels, n_coeff=40)
    trunc = AF.mfcc_from_log_mel(mels, n_coeff=13)
    assert np.allclose(trunc, full[:, :13])


def test_empty_input():
    assert AF.mfcc_from_log_mel(np.zeros((0, 40)), 13).shape == (0, 13)


def test_extract_mfcc_contract_on_tone(spark):
    import pandas as pd

    from iceberg_geo_poc_spark.operators.flac import encode_flac

    rows = []
    for did in range(6):
        f = 300 + (did % 32) * 180
        n = 2048 + 256 * (did % 4)
        t = np.arange(n)
        wave = (8000 * np.sin(2 * np.pi * f * t / 16000)).astype("int16")
        rows.append((did, encode_flac(wave, sample_rate=16000), "flac", f))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload", "format", "tone_hz"])
    )
    out = {r["doc_id"]: r for r in AF.extract_mfcc(media).collect()}
    for did in range(6):
        r = out[did]
        assert r["n_frames"] == 7 + did % 4
        assert r["band_ok"], did
        assert r["norm_ok"], did
