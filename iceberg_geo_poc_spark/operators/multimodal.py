"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.12).

Design mirrors the geometry layer's key idea (SURVEY.md §1.2): the
stored column is an opaque typed payload — ``binary`` bytes plus a
typed metadata struct — and rich decoding happens only at explicit
engine boundaries.  At 100 TB the payload column usually holds an
object-store *pointer* + byte range rather than inline bytes; the
schema below carries both forms (``payload`` nullable, ``uri`` for the
pointer case).

Decode is REAL for the dependency-free formats: P6 PPM and 24-bit BMP
images (numpy parse → (h, w, 3) uint8), 8-bit RGB/RGBA PNG (stdlib
zlib inflate + full filter-type 0-4 unfiltering), baseline JPEG (the
spec-level T.81 codec in operators/jpeg.py), GIF incl. animated frames
(LZW + interlace + composition, operators/gif.py), and 16-bit PCM WAV
audio (RIFF chunk walk → int16 samples).  Remaining codec-bound
formats (webp/mp3/...) still raise NotImplementedError with the
library to plug in — the container ships none.  Resize is genuine pixel work
(nearest-neighbor index mapping over the decoded array) and frame
sampling slices real decoded samples; both stay byte-reproducible by
the DuckDB oracle because the synthesized test media is constant-color
/ constant-amplitude (decode handles arbitrary content — unit tests
cover gradients and round-trips).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),  # inline bytes (small media)
        StructField("uri", StringType()),  # object-store pointer (big media)
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("feat0", DoubleType()),  # deterministic fake feature
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_FORMATS = ["png", "jpeg", "webp"]


# -- real dependency-free codecs --------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8, or binary P5 PGM -> (h, w)
    uint8 (comments + whitespace per the netpbm spec)."""
    if not (b.startswith(b"P6") or b.startswith(b"P5")):
        raise ValueError("not a P6 PPM / P5 PGM")
    ch = 3 if b.startswith(b"P6") else 1
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxv = vals
    if maxv != 255:
        raise ValueError("only maxval 255 supported")
    flat = np.frombuffer(b, np.uint8, count=w * h * ch, offset=pos)
    return flat.reshape(h, w, 3) if ch == 3 else flat.reshape(h, w)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR)."""
    h, w, _ = arr.shape
    row = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def _decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP supported")
    flip = h > 0
    h = abs(h)
    row = (w * 3 + 3) // 4 * 4
    body = np.frombuffer(b, np.uint8, count=row * h, offset=data_off).reshape(h, row)
    px = body[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px[::-1] if flip else px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> non-interlaced 8-bit PNG (filter 0 rows,
    stdlib zlib — no codec library needed)."""
    h, w, _ = arr.shape
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(arr[y], np.uint8).tobytes() for y in range(h)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG row filters (types 0-4) -> (h, w, ch) uint8.

    Row layout: 1 filter byte + w*ch sample bytes.  None/Up vectorize
    whole-row; Sub is a per-channel cumsum; Average/Paeth depend on the
    left-neighbor output so they run per-pixel (correctness path — our
    own encoder emits filter 0 only)."""
    stride = w * ch
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype, row = rows[y, 0], rows[y, 1:]
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 2:  # Up
            out[y] = row + prev
        elif ftype == 1:  # Sub: prefix sum per channel position
            out[y] = np.cumsum(
                row.reshape(w, ch).astype(np.uint32), axis=0
            ).astype(np.uint8).reshape(stride)
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 3:
                    cur[x] = (int(row[x]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
    return out.reshape(h, w, ch)


def _decode_png(b: bytes) -> np.ndarray:
    """Non-interlaced 8-bit RGB/RGBA PNG -> (h, w, 3) uint8 (alpha
    dropped), pure stdlib zlib + numpy."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(b):
        size, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8 : pos + 8 + size]
        pos += 12 + size
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit non-interlaced RGB/RGBA PNG supported"
                )
            ch = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    px = _png_unfilter(raw, h, w, ch)
    return px[:, :, :3]


def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """(h, w, 3) uint8 for the dependency-free formats; clear error for
    compressed formats that need a codec library."""
    if fmt in ("ppm", "pgm"):
        return _decode_ppm(bytes(payload))
    if fmt == "bmp":
        return _decode_bmp(bytes(payload))
    if fmt == "png":
        return _decode_png(bytes(payload))
    if fmt in ("jpeg", "jpg"):
        from iceberg_geo_poc_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if fmt == "gif":
        from iceberg_geo_poc_spark.operators.gif import decode_gif

        return decode_gif(bytes(payload))[0]
    if fmt in ("tiff", "tif"):
        from iceberg_geo_poc_spark.operators.tiff import decode_tiff

        return decode_tiff(bytes(payload))[0]
    raise NotImplementedError(
        f"{fmt} decode requires a codec library (PIL/libvips); container "
        "ships none. ppm/bmp/png/jpeg/gif/tiff decode natively."
    )


def resize_nn(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via floor index mapping (pure numpy)."""
    h, w = arr.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return arr[yi][:, xi]


def resize_box(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Area-average (box filter) DOWNSAMPLE: each output pixel is the
    round-half-up mean of its source block — the antialiased thumbnail
    path (nearest-neighbor aliases high-frequency content, which
    perceptual hashing and vision preprocessing both care about).
    Exact integer arithmetic end to end (block sums via
    np.add.reduceat, +count//2 before the divide), so results are
    bit-deterministic across platforms.  Upsampling falls back to
    nearest (a box filter cannot invent pixels)."""
    h, w = arr.shape[:2]
    if height > h or width > w:
        return resize_nn(arr, width, height)
    ys = (np.arange(height + 1) * h) // height
    xs = (np.arange(width + 1) * w) // width
    a = arr.astype(np.int64)
    rows = np.add.reduceat(a, ys[:-1], axis=0)
    cells = np.add.reduceat(rows, xs[:-1], axis=1)
    counts = np.outer(ys[1:] - ys[:-1], xs[1:] - xs[:-1]).astype(np.int64)
    if a.ndim == 3:
        counts = counts[..., None]
    return ((cells + counts // 2) // counts).astype(np.uint8)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono int16 PCM -> RIFF WAV."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Full-fidelity RIFF WAV PCM decode: (int32 array shaped
    (n_frames, channels) at NATIVE scale, sample_rate, bits_per_sample).

    Supports 8-bit unsigned (returned centered: -128..127), 16/24/32-bit
    signed little-endian, IEEE float32/float64 (format 3, rescaled to
    the int32 range so the caller contract stays uniform), any channel
    count, and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping a PCM or float
    subformat — the layouts real tools emit (validated against
    CPython's test/audiodata pluck-pcm{8,16,24,32} files in
    tests/test_codec_goldens.py).  24-bit unpack is vectorized (three
    byte-plane gathers + shift-or, then sign extension)."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE file")
    pos, rate, bits, channels, raw = 12, None, None, None, None
    is_float = False
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", b, pos
            )
            if audio_fmt == 0xFFFE:
                # extensible: SubFormat GUID starts 01 00 (PCM) or
                # 03 00 (IEEE float)
                sub = b[pos + 24 : pos + 26] if size >= 40 else b""
                if sub == b"\x03\x00":
                    is_float = True
                elif sub != b"\x01\x00":
                    raise NotImplementedError(
                        "only PCM/float WAVE_FORMAT_EXTENSIBLE supported"
                    )
            elif audio_fmt == 3:
                is_float = True
            elif audio_fmt != 1:
                raise NotImplementedError("only PCM / IEEE-float WAV supported")
            if is_float and bits not in (32, 64):
                raise NotImplementedError(f"unsupported float depth {bits}")
            if not is_float and bits not in (8, 16, 24, 32):
                raise NotImplementedError(f"unsupported PCM depth {bits}")
        elif cid == b"data":
            raw = b[pos : pos + size]
        pos += size + (size & 1)
    if rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if is_float:
        # IEEE float in [-1, 1): rescale to 32-bit integer range so the
        # (array, rate, bits=32) contract is uniform for callers
        f = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        s = np.clip(f, -1.0, 1.0 - 2.0 ** -31)
        s = np.round(s * 2147483648.0).astype(np.int64)
        s = np.clip(s, -2147483648, 2147483647).astype(np.int32)
        bits = 32
    elif bits == 8:
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 32:
        s = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:  # 24-bit: little-endian byte triplets, sign-extended
        u = np.frombuffer(raw[: len(raw) - len(raw) % 3], dtype=np.uint8)
        u = u.reshape(-1, 3).astype(np.int32)
        s = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        s -= (s & 0x800000) << 1
    n = (len(s) // channels) * channels
    return s[:n].reshape(-1, channels), rate, bits


def decode_audio(payload: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """(mono int16 sample array, sample_rate) for PCM WAV and FLAC;
    NotImplementedError for codec-bound audio (mp3 needs ffmpeg).

    WAV accepts 8/16/24/32-bit PCM at any channel count: samples are
    rescaled to int16 (8-bit << 8, 24-bit >> 8, 32-bit >> 16) and
    multichannel audio is downmixed by the floor-division channel mean —
    integer arithmetic throughout, so the pipeline features stay
    bit-deterministic."""
    if fmt == "flac":
        from iceberg_geo_poc_spark.operators.flac import decode_flac

        arr, rate = decode_flac(bytes(payload))
        if arr.shape[1] != 1:
            raise NotImplementedError("only mono FLAC in the audio pipeline")
        return arr[:, 0], rate
    if fmt != "wav":
        raise NotImplementedError(f"{fmt} decode requires ffmpeg/soundfile")
    s, rate, bits = decode_wav_pcm(payload)
    if bits == 8:
        s = s << 8
    elif bits == 24:
        s = s >> 8
    elif bits == 32:
        s = s >> 16
    if s.shape[1] > 1:
        s = np.floor_divide(s.sum(axis=1), s.shape[1])
    else:
        s = s[:, 0]
    return s.astype(np.int16), rate


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents (payload = utf-8 text).

    Stands in for `spark.read.format("binaryFile")` / an object-store
    manifest; keeps the oracle able to recompute every byte.
    """
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]),
        (F.col("doc_id") % len(_FORMATS) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("s3://media-bucket/doc-"), F.col("doc_id")).alias("uri"),
        fmt.alias("format"),
        (64 + F.col("doc_id") % 512).cast("int").alias("width"),
        (64 + F.col("doc_id") % 384).cast("int").alias("height"),
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction; the real decode path is stubbed.

    Per batch (not per row): vectorized over the pandas frame.  feat0 is
    a deterministic stand-in for a model embedding — first 8 md5 hex
    digits scaled to [0,1) — so the oracle reproduces it exactly.
    """
    for pdf in batches:
        md5s = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "content_md5": md5s,
                # exact integer floor at 6 decimals — no float-rounding
                # ambiguity between engines (oracle uses BIGINT // too)
                "feat0": md5s.map(lambda h: (int(h[:8], 16) * 10**6 // 2**32) / 1e6),
                "width": pdf["width"],
                "height": pdf["height"],
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the media table.

    Narrow per-partition map, Arrow both ways, no shuffle; at scale the
    only knob is partition sizing (maxPartitionBytes) so each Arrow
    batch fits comfortably in a python worker.
    """
    return media.mapInPandas(_extract_batches, FEATURE_SCHEMA)


def synthesize_image_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL image table: constant-color PPM/BMP/PNG
    payloads whose dims and RGB derive from doc_id (so the DuckDB oracle
    can reproduce any md5 of a re-encoded image with repeat(chr(..))),
    while decode/resize run the same code they would on arbitrary
    pixels (PNG goes through a real zlib inflate + unfilter)."""

    _ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png}

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts, ws, hs = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 8, 6 + did % 6
                rgb = (32 + did % 95, 32 + (did * 7) % 95, 32 + (did * 13) % 95)
                arr = np.full((h, w, 3), rgb, dtype=np.uint8)
                fmt = ("ppm", "bmp", "png")[did % 3]
                payloads.append(_ENCODERS[fmt](arr))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/img-{d}" for d in pdf["doc_id"]],
                    "format": fmts,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def synthesize_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL JPEG table: constant-color images run through
    the spec-level baseline encoder (operators/jpeg.py), alternating
    4:4:4 and 4:2:0 per doc.  At quality 95 a constant-color image
    decodes BIT-EXACTLY (the DC quantization error stays under half an
    intensity step through the YCbCr round-trip), so every downstream
    decoded-pixel oracle (resize md5, phash) remains SQL-reproducible
    while the entropy decode, dequantization, IDCT, and chroma
    upsampling all genuinely execute."""
    from iceberg_geo_poc_spark.operators.jpeg import encode_jpeg

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 8, 6 + did % 6
                rgb = (32 + did % 95, 32 + (did * 7) % 95, 32 + (did * 13) % 95)
                arr = np.full((h, w, 3), rgb, dtype=np.uint8)
                payloads.append(
                    encode_jpeg(arr, quality=95, subsample=bool(did % 2))
                )
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/img-{d}.jpg" for d in pdf["doc_id"]],
                    "format": "jpeg",
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL animated-GIF table: 2-4 constant-color frames
    per doc (colors/dims derived from doc_id), LZW-encoded by the
    spec-level GIF writer (operators/gif.py).  GIF is lossless over its
    palette, so downstream per-frame hashes are SQL-reproducible while
    LZW decode + frame composition genuinely execute."""
    from iceberg_geo_poc_spark.operators.gif import encode_gif

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 8, 6 + did % 6
                frames = []
                for f in range(2 + did % 3):
                    rgb = (
                        32 + (did + f) % 95,
                        32 + ((did + f) * 7) % 95,
                        32 + ((did + f) * 13) % 95,
                    )
                    frames.append(np.full((h, w, 3), rgb, dtype=np.uint8))
                payloads.append(encode_gif(frames, interlace=bool(did % 2)))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/anim-{d}.gif" for d in pdf["doc_id"]],
                    "format": "gif",
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def synthesize_tiff_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL TIFF table: constant-color scans rotating
    through the three TIFF compressions (none / LZW+predictor /
    PackBits) per doc_id.  TIFF is lossless, so decoded pixels equal
    the synthesized constants exactly and the resize-md5 oracle applies
    unchanged — while strip walking, LZW EarlyChange decode, PackBits,
    and the horizontal predictor all genuinely execute."""
    from iceberg_geo_poc_spark.operators.tiff import encode_tiff

    comps = [(1, False), (5, True), (32773, False)]

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 8, 6 + did % 6
                rgb = (32 + did % 95, 32 + (did * 7) % 95, 32 + (did * 13) % 95)
                arr = np.full((h, w, 3), rgb, dtype=np.uint8)
                comp, pred = comps[did % 3]
                payloads.append(
                    encode_tiff([arr], compression=comp, predictor=pred)
                )
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/scan-{d}.tif" for d in pdf["doc_id"]],
                    "format": "tiff",
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def gif_frame_hashes(media: DataFrame) -> DataFrame:
    """Decode every animated-GIF frame (LZW + interlace + composition)
    and md5 its canonical PPM — the video-frame-extraction shape over a
    REAL container format.  Per-partition map, no shuffle."""
    from iceberg_geo_poc_spark.operators.gif import decode_gif

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, md5s = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(decode_gif(payload)):
                    ids.append(did)
                    fidx.append(i)
                    md5s.append(hashlib.md5(encode_ppm(fr)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(fidx, dtype="int64"),
                    "frame_md5": md5s,
                }
            )

    return media.mapInPandas(
        _batches, "doc_id LONG, frame_idx LONG, frame_md5 STRING"
    )


def synthesize_audio_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL audio table: mono 16-bit PCM WAV payloads with
    constant sample value per doc (both bytes ASCII-range, so frame md5s
    are oracle-reproducible); 512*(1 + doc_id % 4) samples."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                lo, hi = 32 + did % 95, 32 + (did * 11) % 95
                val = lo | (hi << 8)
                n = 512 * (1 + did % 4)
                payloads.append(
                    encode_wav(np.full(n, val, dtype=np.int16), rate=16000)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/wav-{d}" for d in pdf["doc_id"]],
                    "format": "wav",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def synthesize_flac_media(docs: DataFrame) -> DataFrame:
    """The WAV synthesis mirrored through the FLAC encoder
    (operators/flac.py): identical constant sample values and counts,
    so the SAME frame-md5 oracle verifies Rice/CONSTANT decode + frame
    slicing over a genuinely compressed container."""
    from iceberg_geo_poc_spark.operators.flac import encode_flac

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                lo, hi = 32 + did % 95, 32 + (did * 11) % 95
                val = lo | (hi << 8)
                n = 512 * (1 + did % 4)
                payloads.append(
                    encode_flac(np.full(n, val, dtype=np.int16), sample_rate=16000)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/a-{d}.flac" for d in pdf["doc_id"]],
                    "format": "flac",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, method: str = "nearest"
) -> DataFrame:
    """REAL image resize over mapInPandas: decode each payload (PPM or
    BMP) to a pixel array, resize in numpy (``method``: "nearest" index
    mapping or "box" area-average antialiasing), re-encode canonically
    as PPM, report its md5.  The emitted width/height come
    from the DECODED array shape — not the metadata columns — so a green
    oracle row proves the decode actually ran.  Narrow per-partition
    map, Arrow both ways, no shuffle."""
    if method not in ("nearest", "box"):
        raise ValueError(f"unknown resize method {method!r}")
    kernel = resize_nn if method == "nearest" else resize_box

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, md5s = [], [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                arr = decode_image(payload, fmt)
                out = kernel(arr, width, height)
                h, w = arr.shape[:2]
                ws.append(w)
                hs.append(h)
                md5s.append(hashlib.md5(encode_ppm(out)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "new_width": pd.array([width] * len(pdf), dtype="int32"),
                    "new_height": pd.array([height] * len(pdf), dtype="int32"),
                    "resized_md5": md5s,
                }
            )

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


def sample_media_frames(
    media: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """REAL frame sampling: decode the WAV payload, slice the int16
    sample stream into frames of ``frame_size`` samples, emit every
    ``every_n``-th frame's raw-byte md5.  Row explosion happens INSIDE
    the Arrow batch (the output/input row ratio is the operator's
    fan-out, not a join)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"]
            ):
                samples, _rate = decode_audio(payload, fmt)
                n_frames = len(samples) // frame_size
                for i in range(0, n_frames, every_n):
                    frame = samples[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(np.asarray(frame, "<i2").tobytes()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s}
            )

    return media.mapInPandas(_batches, FRAME_SCHEMA)


# -- perceptual hashing ------------------------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", StringType()),  # 64-bit aHash, hex
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_patterned_media(
    docs: DataFrame, n_groups: int = 50, brightness_step: int = 3
) -> DataFrame:
    """Deterministic TEXTURED image table for perceptual-hash work:
    every doc in visual group ``doc_id % n_groups`` carries the same
    16x16 pseudo-random pattern, shifted by a per-doc uniform
    brightness delta (bounded so no channel clips).  Near-duplicate
    ground truth is exactly the group id."""

    _ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png}

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                g = did % n_groups
                # deterministic per-group texture (seeded PRNG — every
                # executor reproduces the same pattern for the same g);
                # values bounded to 198 so the brightness shift never clips
                base = (
                    np.random.RandomState(12345 + g)
                    .randint(0, 199, (16, 16, 3))
                    .astype(np.uint8)
                )
                b = (did // n_groups * brightness_step) % 57
                arr = (base + np.uint8(b)).astype(np.uint8)
                fmt = ("ppm", "bmp", "png")[did % 3]
                payloads.append(_ENCODERS[fmt](arr))
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/tex-{d}" for d in pdf["doc_id"]],
                    "format": fmts,
                    "width": pd.array([16] * len(pdf), dtype="int32"),
                    "height": pd.array([16] * len(pdf), dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)


def perceptual_hash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """64-bit average hash (aHash) over REAL decoded pixels: decode,
    grayscale, nearest-downsample to hash_size x hash_size, threshold at
    the mean.  Exactly invariant to uniform (non-clipping) brightness
    shifts — the visual-dedup property the pipeline relies on.  Narrow
    Arrow-batched map, no shuffle; the dedup groupBy on the hash is one
    partial-agg shuffle of 8-byte keys."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, ws, hs = [], [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                arr = decode_image(payload, fmt)
                h, w = arr.shape[:2]
                gray = arr[:, :, :3].astype(np.float64).mean(axis=2)
                ys = (np.arange(hash_size) * h) // hash_size
                xs = (np.arange(hash_size) * w) // hash_size
                small = gray[np.ix_(ys, xs)]
                bits = (small > small.mean()).flatten()
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                hashes.append(f"{val:016x}")
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": hashes,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return media.mapInPandas(_batches, PHASH_SCHEMA)


AUGMENT_SCHEMA = "doc_id LONG, op STRING, width INT, height INT, aug_md5 STRING"

_AUGMENT_OPS = ("hflip", "vflip", "rot90")


def augment_images(media: DataFrame, ops: tuple = _AUGMENT_OPS) -> DataFrame:
    """Deterministic GEOMETRIC augmentation over binary image columns —
    the label-preserving transforms a vision training pipeline fans
    each sample into.  Exact index permutations (no resampling, so
    bit-deterministic everywhere):

    - ``hflip``: out[y, x] = in[y, W-1-x]
    - ``vflip``: out[y, x] = in[H-1-y, x]
    - ``rot90``: clockwise, out[y, x] = in[H-1-x, y]

    One mapInPandas over the media table emitting |ops| rows per image
    (decode once, permute |ops| times), canonical PPM re-encode + md5
    so an oracle can recompute the exact output bytes.  Arrow both
    ways, no shuffle."""
    bad = set(ops) - set(_AUGMENT_OPS)
    if bad:
        raise ValueError(f"unknown augment ops {sorted(bad)}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "op", "width", "height", "aug_md5")}
            for did, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"]
            ):
                arr = decode_image(payload, fmt)
                h, w = arr.shape[:2]
                for op in ops:
                    if op == "hflip":
                        out = arr[:, ::-1]
                    elif op == "vflip":
                        out = arr[::-1, :]
                    else:  # rot90 clockwise
                        out = np.rot90(arr, k=-1)
                    rows["doc_id"].append(did)
                    rows["op"].append(op)
                    rows["width"].append(out.shape[1])
                    rows["height"].append(out.shape[0])
                    rows["aug_md5"].append(
                        hashlib.md5(
                            encode_ppm(np.ascontiguousarray(out))
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "op": rows["op"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "aug_md5": rows["aug_md5"],
                }
            )

    return media.mapInPandas(_batches, AUGMENT_SCHEMA)
