"""Corrupt-input contract for every media decoder: bit-flipped or
truncated files raise ValueError (or NotImplementedError for known
unsupported features) — NEVER a raw IndexError/struct.error — so
ingestion pipelines can catch-and-skip bad records deterministically.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from iceberg_geo_poc_spark.operators import (
    flac,
    gif,
    jpeg,
    tiff,
    video,
    warc,
    webdataset,
)


def _codecs():
    img = np.full((8, 8, 3), 77, np.uint8)
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    return {
        "jpeg": (jpeg.encode_jpeg(img), jpeg.decode_jpeg),
        # DRI-bearing stream: a desynced restart marker must raise, not
        # hang (regression fixture for the nbits-25..31 _fill no-op spin)
        "jpeg_dri": (
            jpeg.encode_jpeg(big, restart_interval=2),
            jpeg.decode_jpeg,
        ),
        "gif": (gif.encode_gif([img]), gif.decode_gif),
        "tiff": (tiff.encode_tiff([img], compression=5), tiff.decode_tiff),
        "flac": (
            flac.encode_flac(np.arange(200, dtype=np.int16)),
            flac.decode_flac,
        ),
        "y4m": (video.encode_y4m([img, img]), video.decode_y4m),
    }


@pytest.mark.parametrize(
    "name", ["jpeg", "jpeg_dri", "gif", "tiff", "flac", "y4m"]
)
def test_decoders_fail_cleanly_on_corruption(name):
    import signal

    import zlib

    valid, dec = _codecs()[name]
    dec(valid)  # sanity: pristine input still decodes
    # crc32, NOT hash(): str hash is randomized per process, which made
    # the fuzz corpus differ run-to-run (and intermittently surfaced the
    # GIF canvas-bomb before the max_pixels guard existed)
    rng = random.Random(zlib.crc32(name.encode()) & 0xFFFF)

    def _alarm(signum, frame):  # pragma: no cover - only fires on a hang
        raise AssertionError(f"{name} decoder hung on corrupt input")

    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for _ in range(400):
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            data = bytes(b[: rng.randrange(len(b) + 1)])
            signal.alarm(10)
            try:
                dec(data)
            except (ValueError, NotImplementedError):
                pass  # the contract: clean, catchable failure
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_archive_parsers_fail_cleanly():
    import tarfile
    import zipfile

    pages = [("https://x.example/1", "<html><body>hi</body></html>")]
    wdata = warc.build_warc(pages, gzip_members=True)
    shard = webdataset.build_shard([("0001.txt", b"hello")], gzipped=True)
    rng = random.Random(9)
    for valid, parser, errs in (
        (wdata, warc.parse_warc, (ValueError,)),
        (
            shard,
            webdataset.parse_shard,
            (ValueError, tarfile.TarError, zipfile.BadZipFile, EOFError),
        ),
    ):
        for _ in range(200):
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            data = bytes(b[: rng.randrange(len(b) + 1)])
            try:
                parser(data)
            except errs:
                pass
            except Exception as exc:  # pragma: no cover
                # zlib errors surface as zlib.error (a subclass of
                # Exception only) — treat them as acceptable clean
                # failures since gzip corruption is detected, not crashed
                import zlib

                if not isinstance(exc, zlib.error):
                    raise
