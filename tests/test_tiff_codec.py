"""TIFF codec (operators/tiff.py): all three compressions + predictor
are lossless — bit-exact round-trips; multi-page IFD chains."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_geo_poc_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def test_tiff_lzw_earlychange_boundaries():
    rng = np.random.default_rng(0)
    # random data crosses the 511/1023/2047 width boundaries and the
    # 4094-entry dictionary reset
    for n in (300, 1000, 5000, 60000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8).tolist())
        assert _lzw_decode(_lzw_encode(data)) == data
    rep = bytes([1, 2, 3, 4] * 2000)
    assert _lzw_decode(_lzw_encode(rep)) == rep


def test_packbits_runs_and_literals():
    cases = [
        b"",
        b"\x00" * 300,
        b"abcdef",
        b"aaabccccdd" * 40,
        bytes(range(256)) * 3,
    ]
    for c in cases:
        assert _packbits_decode(_packbits_encode(c), len(c)) == c


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("pred", [False, True])
def test_rgb_and_gray_roundtrip_exact(comp, pred):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff([img], comp, pred))[0] == img).all()
    gray = rng.integers(0, 256, (20, 31), dtype=np.uint8)
    g = decode_tiff(encode_tiff([gray], comp, pred))[0]
    assert g.shape == (20, 31, 3)
    assert (g[:, :, 0] == gray).all() and (g[:, :, 2] == gray).all()


def test_multipage_and_strip_boundaries():
    rng = np.random.default_rng(5)
    # heights that do and don't divide rows_per_strip
    a = rng.integers(0, 256, (16, 10, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (17, 10, 3), dtype=np.uint8)
    frames = decode_tiff(encode_tiff([a, b], compression=5, predictor=True))
    assert len(frames) == 2
    assert (frames[0] == a).all() and (frames[1] == b).all()


def test_compression_actually_compresses_smooth_scans():
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack([xx * 4, yy * 4, (xx + yy) * 2], 2).astype(np.uint8)
    raw = encode_tiff([smooth], 1)
    lzw = encode_tiff([smooth], 5, predictor=True)
    assert len(lzw) < len(raw) * 0.2


def test_rejects_and_dispatch():
    with pytest.raises(ValueError):
        decode_tiff(b"GIF89a")
    from iceberg_geo_poc_spark.operators.multimodal import decode_image

    img = np.full((9, 9, 3), (10, 200, 30), np.uint8)
    for comp in (1, 5, 32773):
        out = decode_image(encode_tiff([img], comp), "tiff")
        assert (out == img).all()
    assert (decode_image(encode_tiff([img]), "tif") == img).all()
