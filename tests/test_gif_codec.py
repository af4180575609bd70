"""GIF codec (operators/gif.py): LZW, interlace, transparency,
composition — all bit-exact (GIF is lossless over its palette)."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_geo_poc_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _paletted(rng, h, w, ncolors=64):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def test_lzw_roundtrip_various_code_sizes():
    rng = np.random.default_rng(3)
    for mcs in (2, 4, 8):
        syms = rng.integers(0, 1 << mcs, 5000).astype(np.uint8)
        assert _lzw_decode(_lzw_encode(syms, mcs), mcs) == syms.tobytes()


def test_lzw_dictionary_reset_path():
    # long low-entropy stream forces the 12-bit table to fill and reset
    syms = np.tile(np.arange(4, dtype=np.uint8), 30000)
    assert _lzw_decode(_lzw_encode(syms, 2), 2) == syms.tobytes()


@pytest.mark.parametrize("interlace", [False, True])
def test_single_frame_exact(interlace):
    rng = np.random.default_rng(7)
    img = _paletted(rng, 21, 33)
    frames = decode_gif(encode_gif([img], interlace=interlace))
    assert len(frames) == 1
    assert (frames[0] == img).all()


def test_animated_frames_exact():
    rng = np.random.default_rng(9)
    frames = [_paletted(rng, 12, 18, 32) for _ in range(5)]
    dec = decode_gif(encode_gif(frames, delay_cs=4))
    assert len(dec) == 5
    for d, f in zip(dec, frames):
        assert (d == f).all()


def test_transparency_composites_over_previous_frame():
    f1 = np.full((10, 10, 3), (10, 20, 30), np.uint8)
    f2 = f1.copy()
    f2[2:5, 2:5] = (200, 100, 50)
    f2[0:2, 0:2] = (1, 2, 3)  # the transparent key color
    dec = decode_gif(encode_gif([f1, f2], transparent_rgb=(1, 2, 3)))
    assert (dec[1][0, 0] == (10, 20, 30)).all()  # shows through
    assert (dec[1][3, 3] == (200, 100, 50)).all()
    assert (dec[1][8, 8] == (10, 20, 30)).all()


def test_two_color_and_large_images():
    bw = np.zeros((5, 7, 3), np.uint8)
    bw[::2] = 255
    assert (decode_gif(encode_gif([bw]))[0] == bw).all()
    rng = np.random.default_rng(11)
    big = _paletted(rng, 100, 120)
    assert (decode_gif(encode_gif([big]))[0] == big).all()


def test_rejects_non_gif_and_too_many_colors():
    with pytest.raises(ValueError):
        decode_gif(b"\x89PNG\r\n")
    rng = np.random.default_rng(13)
    # 24-bit noise has ~all-distinct colors
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_gif([noisy])


def test_decode_image_dispatch_first_frame():
    from iceberg_geo_poc_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(17)
    img = _paletted(rng, 9, 11)
    out = decode_image(encode_gif([img, img]), "gif")
    assert (out == img).all()
