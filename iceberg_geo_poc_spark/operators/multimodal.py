"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.12).

Design mirrors the geometry layer's key idea (SURVEY.md §1.2): the
stored column is an opaque typed payload — ``binary`` bytes plus a
typed metadata struct — and rich decoding happens only at explicit
engine boundaries.  At 100 TB the payload column usually holds an
object-store *pointer* + byte range rather than inline bytes; the
schema below carries both forms (``payload`` nullable, ``uri`` for the
pointer case).

The decode step (image resize / audio resample / video frame-sample)
needs codec libraries this container does not ship, so ``decode_*`` are
clearly-marked stubs raising NotImplementedError.  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition behavior — is real and oracle-tested via a deterministic
md5-based feature path that any engine can reproduce.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_image(payload: bytes, fmt: str) -> "object":
    """STUB — real image decode needs PIL/libvips (not in container)."""
    raise NotImplementedError(
        "image decode requires a codec library; container ships none. "
        "Swap this stub for PIL.Image.open(io.BytesIO(payload)) in prod."
    )


def decode_audio(payload: bytes, fmt: str) -> "object":
    """STUB — real audio decode needs soundfile/ffmpeg (not in container)."""
    raise NotImplementedError("audio decode requires ffmpeg/soundfile")


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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing over mapInPandas: batch shape, schema, and the
    per-batch vectorization are real; the pixel work is a deterministic
    fake (md5 of payload + target dims) because no codec library ships
    in this container — swap the inner lambda for a PIL resize in prod.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": width,
                    "new_height": height,
                    "resized_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b) + tag).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling plumbing: each payload is treated as a container
    with ``len(payload) // 1000 + 1`` frames; every ``every_n``-th frame
    row is emitted (row explosion happens INSIDE the Arrow batch — the
    output/input row ratio is the operator's fan-out, not a join).
    Frame decode is the deterministic fake md5(payload + "-" + idx).
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // 1000 + 1
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(b + f"-{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s}
            )

    return media.mapInPandas(_batches, FRAME_SCHEMA)
