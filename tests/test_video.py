"""Y4M raw-video codec + temporal frame sampling (operators/video.py)."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_geo_poc_spark.operators.video import (
    decode_y4m,
    encode_y4m,
    sample_video_frames,
    synthesize_y4m_media,
)


def test_gray_roundtrip_both_colorspaces():
    frames = [np.full((6, 8, 3), v, np.uint8) for v in (0, 32, 126, 255)]
    for cs in ("C444", "C420jpeg", "C420"):
        out, fps = decode_y4m(encode_y4m(frames, fps=(30, 1), colorspace=cs))
        assert fps == (30, 1)
        assert len(out) == 4
        for a, b in zip(frames, out):
            assert (a == b).all(), cs


def test_color_444_roundtrip_within_rounding():
    rng = np.random.default_rng(7)
    fr = rng.integers(0, 256, (10, 12, 3), np.uint8)
    (out,), _ = decode_y4m(encode_y4m([fr], colorspace="C444"))
    assert np.abs(out.astype(int) - fr.astype(int)).max() <= 2


def test_header_parse_is_token_order_independent():
    # hand-built stream: reordered tokens, extra unknown token, C444
    y = bytes([50]) * 4
    cbcr = bytes([128]) * 8
    data = b"YUV4MPEG2 C444 F24:1 H2 W2 Xunknown A1:1\nFRAME\n" + y + cbcr
    frames, fps = decode_y4m(data)
    assert fps == (24, 1)
    assert frames[0].shape == (2, 2, 3)
    assert (frames[0] == 50).all()


def test_corrupt_streams_raise_value_error():
    good = encode_y4m([np.zeros((4, 4, 3), np.uint8)])
    for bad in (
        b"RIFFnotvideo",
        good[: len(good) - 5],          # truncated frame payload
        good.replace(b"FRAME", b"FRAMX", 1),
        b"YUV4MPEG2 W2 H2\nFRAME\n",    # missing planes
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError):
        encode_y4m([np.zeros((3, 3, 3), np.uint8)], colorspace="C420jpeg")


def test_sample_video_frames_spark(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(6)}))
    media = synthesize_y4m_media(docs)
    out = sample_video_frames(media, every_n=2).toPandas()
    for did in range(6):
        rows = out[out.doc_id == did].sort_values("frame_idx")
        n_frames = 3 + did % 4
        assert list(rows.frame_idx) == list(range(0, n_frames, 2))
        assert (rows.n_frames == n_frames).all()
