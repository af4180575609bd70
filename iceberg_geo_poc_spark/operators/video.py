"""Y4M (YUV4MPEG2) raw-video ingestion — parse, encode, frame-sample.

The multimodal family already extracts frames from animated GIF (a
compressed image container); this module adds a true VIDEO container:
YUV4MPEG2, the uncompressed interchange format every transcode
pipeline (ffmpeg/x264/VMAF tooling) reads and writes.  Y4M is fully
documented and codec-free — a text stream header (``YUV4MPEG2 W.. H..
F.. Ip A.. C..``) followed by ``FRAME`` records of raw planar YUV — so
the parser here is spec-level and dependency-free like the other
codecs (operators/gif.py, flac.py...).

Supported colorspaces: C444 (full-res planes) and C420jpeg/C420
(2x2-subsampled chroma; both treated with JPEG chroma siting — the
half-pixel siting difference of plain C420 is below the integer
rounding floor for the constant-plane content this engine synthesizes,
and is documented rather than modeled).  Color math is BT.601
full-range, matching the JPEG codec so gray content round-trips
bit-exactly through either path.

Scale shape: videos are opaque binary payloads in a ``binary`` column;
decode + temporal sampling run inside ``mapInPandas`` batches — one
task streams its own payloads, zero shuffle, the same posture as every
other multimodal operator here (SURVEY §2.12).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _rgb_to_ycbcr(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = frame.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_y4m(
    frames: list[np.ndarray],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C420jpeg",
) -> bytes:
    """(h, w, 3) uint8 RGB frames -> YUV4MPEG2 bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if colorspace not in ("C444", "C420jpeg", "C420"):
        raise ValueError(f"unsupported colorspace {colorspace}")
    sub = colorspace != "C444"
    if sub and (h % 2 or w % 2):
        raise ValueError("4:2:0 needs even dimensions")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        y, cb, cr = _rgb_to_ycbcr(np.asarray(fr, np.uint8))
        out += b"FRAME\n"
        out += np.clip(np.round(y), 0, 255).astype(np.uint8).tobytes()
        for p in (cb, cr):
            if sub:
                p = 0.25 * (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                )
            out += np.clip(np.round(p), 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


def _decode_y4m_inner(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    data = bytes(data)
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "C420jpeg"
    for tok in data[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            a, _, b = tok[1:].partition(":")
            fps = (int(a), int(b or "1"))
        elif tok[0] == "C":
            cs = tok
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    if cs not in ("C444", "C420jpeg", "C420"):
        raise NotImplementedError(f"colorspace {cs} not supported (444/420 only)")
    sub = cs != "C444"
    if sub and (h % 2 or w % 2):
        raise ValueError("4:2:0 stream with odd dimensions")
    ysz = w * h
    csz = (w // 2) * (h // 2) if sub else ysz
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        need = ysz + 2 * csz
        if pos + need > len(data):
            raise ValueError("truncated frame payload")
        y = np.frombuffer(data, np.uint8, ysz, pos).reshape(h, w).astype(np.float64)
        cb = np.frombuffer(data, np.uint8, csz, pos + ysz).astype(np.float64)
        cr = np.frombuffer(data, np.uint8, csz, pos + ysz + csz).astype(np.float64)
        if sub:
            cb = np.repeat(np.repeat(cb.reshape(h // 2, w // 2), 2, 0), 2, 1)
            cr = np.repeat(np.repeat(cr.reshape(h // 2, w // 2), 2, 0), 2, 1)
        else:
            cb = cb.reshape(h, w)
            cr = cr.reshape(h, w)
        frames.append(_ycbcr_to_rgb(y, cb, cr))
        pos += need
    return frames, fps


def decode_y4m(*args, **kwargs):
    """Guarded entry: corrupt or truncated input raises ValueError (so
    ingestion pipelines can catch-and-skip bad records), never a raw
    IndexError from a short buffer."""
    try:
        return _decode_y4m_inner(*args, **kwargs)
    except (IndexError, UnicodeDecodeError, OverflowError) as exc:
        raise ValueError(f"corrupt or truncated Y4M stream: {exc}") from exc


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Temporal frame sampling over Y4M payloads: decode, keep every
    ``every_n``-th frame, md5 its canonical PPM (the keyframe-extraction
    shape of a training-data video pipeline).  Per-partition map, zero
    shuffle."""
    from iceberg_geo_poc_spark.operators.multimodal import encode_ppm

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, md5s, nf = [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _fps = decode_y4m(payload)
                for i in range(0, len(frames), every_n):
                    ids.append(did)
                    fidx.append(i)
                    md5s.append(
                        hashlib.md5(encode_ppm(frames[i])).hexdigest()
                    )
                    nf.append(len(frames))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(fidx, dtype="int64"),
                    "frame_md5": md5s,
                    "n_frames": pd.array(nf, dtype="int64"),
                }
            )

    return media.mapInPandas(
        _batches, "doc_id LONG, frame_idx LONG, frame_md5 STRING, n_frames LONG"
    )


def synthesize_y4m_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL Y4M table: 3-6 constant-GRAY frames per doc
    (level derived from doc_id + frame index), alternating C444 and
    C420jpeg.  Gray is invariant under the BT.601 round-trip AND under
    chroma subsampling (constant planes), so decoded frames equal the
    synthesized constants bit-exactly and the frame-md5 oracle is plain
    SQL — while header parsing, plane slicing, chroma upsampling, and
    color conversion all genuinely execute."""
    from iceberg_geo_poc_spark.operators.multimodal import MEDIA_SCHEMA

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + 2 * (did % 5), 6 + 2 * (did % 4)
                frames = [
                    np.full((h, w, 3), 32 + (did * 5 + f * 17) % 95, np.uint8)
                    for f in range(3 + did % 4)
                ]
                payloads.append(
                    encode_y4m(
                        frames,
                        fps=(30, 1),
                        colorspace="C444" if did % 2 == 0 else "C420jpeg",
                    )
                )
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "uri": [f"s3://media-bucket/clip-{d}.y4m" for d in pdf["doc_id"]],
                    "format": "y4m",
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(_batches, MEDIA_SCHEMA)
