"""FLAC codec (operators/flac.py): lossless, so every round-trip is
bit-exact; CRC-16 guards frame integrity."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_geo_poc_spark.operators.flac import decode_flac, encode_flac


def _sine_noise(rng, n, amp=3000, noise=60):
    t = np.arange(n)
    return (amp * np.sin(t / 50) + rng.normal(0, noise, n)).astype(np.int16)


def test_mono_roundtrip_and_compression():
    rng = np.random.default_rng(3)
    mono = _sine_noise(rng, 20000)
    enc = encode_flac(mono, 16000)
    dec, sr = decode_flac(enc)
    assert sr == 16000
    assert dec.shape == (20000, 1)
    assert (dec[:, 0] == mono).all()
    # smooth signals must actually compress (FIXED predictors working)
    assert len(enc) < mono.nbytes * 0.75


def test_multichannel_and_blocking():
    rng = np.random.default_rng(5)
    st = np.stack(
        [_sine_noise(rng, 7000), rng.integers(-500, 500, 7000)], axis=1
    ).astype(np.int16)
    dec, sr = decode_flac(encode_flac(st, 8000, block_size=1000))
    assert sr == 8000 and (dec == st).all()
    tri = rng.integers(-2000, 2000, (700, 3)).astype(np.int16)
    dec3, _ = decode_flac(encode_flac(tri, block_size=256))
    assert (dec3 == tri).all()


def test_extremes_and_noise_exact():
    rng = np.random.default_rng(7)
    edge = np.array([32767, -32768, 0, 1, -1] * 100, dtype=np.int16)
    assert (decode_flac(encode_flac(edge))[0][:, 0] == edge).all()
    noise = rng.integers(-32768, 32768, 5000).astype(np.int16)
    assert (decode_flac(encode_flac(noise))[0][:, 0] == noise).all()
    const = np.full(3000, -12345, dtype=np.int16)
    assert (decode_flac(encode_flac(const))[0][:, 0] == const).all()


def test_crc_detects_corruption():
    rng = np.random.default_rng(9)
    enc = bytearray(encode_flac(_sine_noise(rng, 4000)))
    enc[len(enc) // 2] ^= 0xFF  # flip a payload byte mid-frame
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_rejects_non_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFFxxxxWAVE")


def test_decode_audio_dispatch():
    from iceberg_geo_poc_spark.operators.multimodal import decode_audio

    rng = np.random.default_rng(11)
    mono = _sine_noise(rng, 2048)
    samples, rate = decode_audio(encode_flac(mono, 22050), "flac")
    assert rate == 22050 and (samples == mono).all()
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3", "mp3")
