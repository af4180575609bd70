"""Deletion vectors: bitmap position deletes in Puffin sidecars.

Modern Iceberg (format v3) replaces per-commit position-delete PARQUET
files with one compressed bitmap per data file — a "deletion vector"
(DV) — stored as a ``deletion-vector-v1`` blob inside a Puffin file and
referenced from the delete manifest entry.  The reference engine ships
the v2 positional-delete machinery this repo already mirrors
(data/src/main/java/org/apache/iceberg/data/DeleteFilter.java:160-233);
this module adds the v3-style DV encoding on top of it as the scale
path: at 100 TB a long-lived table accumulates millions of (path, pos)
tuples across hundreds of delete files, while the DV form is one
O(#deleted-rows/compression) blob per data file with O(1) lookup by
file — the read side unions far fewer, far smaller inputs.

Bitmap encoding: the public "portable" Roaring format
(RoaringFormatSpec — github.com/RoaringBitmap/RoaringFormatSpec), the
same serialization Iceberg's DV blobs use:

- 32-bit stream: cookie 12346 (``SERIAL_COOKIE_NO_RUNCONTAINER``, u32
  LE) | container count (u32) | descriptive header (u16 high-key, u16
  cardinality-1 per container) | offset header (u32 byte offset per
  container) | container payloads.  A container holds the low 16 bits
  of values sharing a 16-bit high key: sorted u16 array when
  cardinality <= 4096, else a fixed 8 KiB bitset.
- 64-bit wrapper (Roaring64NavigableMap portable): u64 LE count of
  32-bit maps, then per map a u32 LE high key + one 32-bit stream.

Run containers (cookie 12347) are a writer option in the spec; this
writer never emits them and the reader rejects the cookie explicitly
rather than mis-parsing.

All container packing/unpacking is vectorized numpy — no per-position
Python loops — so encoding a million-row DV is a handful of array ops.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE_RUNCONTAINER = 12347
ARRAY_CONTAINER_MAX = 4096
BITSET_BYTES = 8192

DV_BLOB_TYPE = "deletion-vector-v1"


# -- 32-bit portable roaring -------------------------------------------------


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Sorted-unique uint32 values -> portable 32-bit roaring bytes."""
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(uniq_keys)
    header = bytearray()
    header += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    cards = (bounds[1:] - bounds[:-1]).astype(np.int64)
    for k, c in zip(uniq_keys, cards):
        header += struct.pack("<HH", int(k), int(c) - 1)
    # offset header: byte offset of each container from stream start
    payloads: list[bytes] = []
    sizes = np.where(cards <= ARRAY_CONTAINER_MAX, cards * 2, BITSET_BYTES)
    base = len(header) + 4 * n
    offsets = base + np.concatenate(([0], np.cumsum(sizes)[:-1]))
    for off in offsets:
        header += struct.pack("<I", int(off))
    for i in range(n):
        chunk = lows[bounds[i] : bounds[i + 1]]
        if len(chunk) <= ARRAY_CONTAINER_MAX:
            payloads.append(chunk.astype("<u2").tobytes())
        else:
            bits = np.zeros(BITSET_BYTES, dtype=np.uint8)
            np.bitwise_or.at(
                bits, chunk >> 3, (1 << (chunk & 7)).astype(np.uint8)
            )
            payloads.append(bits.tobytes())
    return bytes(header) + b"".join(payloads)


def _deserialize_roaring32(data: bytes, base: int = 0) -> tuple[np.ndarray, int]:
    """-> (sorted uint32 values, bytes consumed from ``base``)."""
    cookie, n = struct.unpack_from("<II", data, base)
    if cookie == SERIAL_COOKIE_RUNCONTAINER or (cookie & 0xFFFF) == SERIAL_COOKIE_RUNCONTAINER:
        raise NotImplementedError(
            "roaring run containers (cookie 12347) not supported; this "
            "engine's writer always emits cookie 12346"
        )
    if cookie != SERIAL_COOKIE_NO_RUNCONTAINER:
        raise ValueError(f"bad roaring cookie {cookie}")
    desc = np.frombuffer(data, dtype="<u2", count=2 * n, offset=base + 8)
    keys = desc[0::2].astype(np.uint32)
    cards = desc[1::2].astype(np.int64) + 1
    pos = base + 8 + 4 * n + 4 * n  # skip descriptive + offset headers
    out: list[np.ndarray] = []
    for i in range(n):
        if cards[i] <= ARRAY_CONTAINER_MAX:
            lows = np.frombuffer(
                data, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += int(cards[i]) * 2
        else:
            bits = np.frombuffer(data, dtype=np.uint8, count=BITSET_BYTES, offset=pos)
            lows = np.flatnonzero(
                np.unpackbits(bits, bitorder="little")
            ).astype(np.uint32)
            pos += BITSET_BYTES
        out.append((keys[i] << 16) | lows)
    vals = np.concatenate(out) if out else np.empty(0, dtype=np.uint32)
    return vals, pos - base


# -- 64-bit portable wrapper -------------------------------------------------


def serialize_positions(positions) -> bytes:
    """Row positions (any int iterable / array) -> 64-bit portable
    roaring bytes.  Deduplicates and sorts; positions must be >= 0."""
    arr = np.unique(np.asarray(list(positions) if not isinstance(positions, np.ndarray) else positions, dtype=np.int64))
    if len(arr) and arr[0] < 0:
        raise ValueError("positions must be non-negative")
    arr = arr.astype(np.uint64)
    highs = (arr >> np.uint64(32)).astype(np.uint32)
    lows = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(arr))
    out = bytearray(struct.pack("<Q", len(uniq)))
    for i, h in enumerate(uniq):
        out += struct.pack("<I", int(h))
        out += _serialize_roaring32(lows[bounds[i] : bounds[i + 1]])
    return bytes(out)


def deserialize_positions(data: bytes) -> np.ndarray:
    """64-bit portable roaring bytes -> sorted int64 positions."""
    (n_maps,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    out: list[np.ndarray] = []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, used = _deserialize_roaring32(data, pos)
        pos += used
        out.append((np.uint64(high) << np.uint64(32)) | vals.astype(np.uint64))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out).astype(np.int64)


# -- Puffin DV files ---------------------------------------------------------


def write_dv_file(
    dvs: dict, snapshot_id: int, sequence_number: int
) -> tuple[bytes, list[dict]]:
    """{data_file_path: positions-array | (payload_bytes, cardinality)}
    -> (puffin bytes, per-file blob descriptors
    [{referenced, offset, length, cardinality}]).

    One blob per referenced data file, deterministic path order — the
    manifest's dv entries carry (puffin path, offset, length) so a
    reader slices exactly its blob.  The tuple form lets distributed
    jobs serialize bitmaps executor-side and ship only compressed
    payloads to the writer.
    """
    from iceberg_geo_poc_spark.table import puffin as P

    blobs, payloads = [], []
    for path in sorted(dvs):
        v = dvs[path]
        if isinstance(v, tuple):
            payload, card = bytes(v[0]), int(v[1])
        else:
            payload, card = serialize_positions(v), int(len(np.unique(v)))
        payloads.append(payload)
        blobs.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "properties": {
                    "referenced-data-file": path,
                    "cardinality": str(card),
                },
            }
        )
    data = P.write_puffin(blobs, payloads, {"created-by": "iceberg_geo_poc_spark"})
    footer, _ = P.read_puffin(data)
    descs = [
        {
            "referenced": b["properties"]["referenced-data-file"],
            "offset": b["offset"],
            "length": b["length"],
            "cardinality": int(b["properties"]["cardinality"]),
        }
        for b in footer["blobs"]
    ]
    return data, descs


def read_dv_blob(data: bytes, offset: int, length: int) -> np.ndarray:
    """Decode one DV blob sliced out of a Puffin file's bytes."""
    return deserialize_positions(bytes(data[offset : offset + length]))


def dv_deletes_df(spark, descriptors: list[tuple[str, str, int, int]]):
    """[(puffin_path, referenced_data_file, offset, length)] -> a
    distributed (__file_path, __pos) DataFrame of deleted positions.

    Decode runs executor-side in ``mapInPandas`` — one task per slice of
    the descriptor list, each reading only the Puffin files its blobs
    live in (per-task byte cache, so a shared sidecar is read once per
    task, not once per blob).  At 100 TB the descriptor list is
    #data-files-with-deletes rows (small), while the decoded positions
    can be billions — exactly the asymmetry that wants the decode on
    executors instead of the driver.
    """
    import pandas as pd

    desc = spark.createDataFrame(
        descriptors, "puffin string, referenced string, offset long, length long"
    ).repartition(max(1, min(len(descriptors), 32)))

    def _decode(batches):
        cache: dict[str, bytes] = {}
        for pdf in batches:
            for puffin, ref, off, ln in zip(
                pdf["puffin"], pdf["referenced"], pdf["offset"], pdf["length"]
            ):
                pos = _blob_positions(puffin, int(off), int(ln), cache)
                yield pd.DataFrame(
                    {"__file_path": ref, "__pos": pos.astype("int64")}
                )

    return desc.mapInPandas(_decode, "__file_path string, __pos long")


def _blob_positions(
    puffin: str, off: int, ln: int, cache: dict[str, bytes]
) -> np.ndarray:
    """Read + decode one DV blob.  FileIOs exposing ``read_range``
    (chunked-GCM-stream encrypted stores, encryption.py) serve the blob
    slice WITHOUT a whole-sidecar read/decrypt — the reference
    AesGcmInputFile seek path; plain stores read once per sidecar and
    slice from a per-task byte cache."""
    from iceberg_geo_poc_spark.table import fileio as FIO

    io = FIO.io_for(puffin)
    if hasattr(io, "read_range"):
        return read_dv_blob(io.read_range(puffin, off, ln), 0, ln)
    if puffin not in cache:
        cache[puffin] = io.read_bytes(puffin)
    return read_dv_blob(cache[puffin], off, ln)


def dv_deletes_local(spark, descriptors: list[tuple[str, str, int, int]]):
    """Driver-side variant of :func:`dv_deletes_df` for scans that will
    BROADCAST the deleted positions anyway: when the summed DV
    cardinality is bounded (the caller gates on the manifest's
    ``record_count``), the decoded set ends up on the driver regardless,
    so decoding there — one FileIO read per sidecar + vectorized numpy —
    skips an entire Python-worker stage.  Same crossover posture as
    ``spark_planning.plan_files_spark`` (pandas below the threshold,
    distributed above)."""
    import pandas as pd

    cache: dict[str, bytes] = {}
    files: list[np.ndarray] = []
    positions: list[np.ndarray] = []
    for puffin, ref, off, ln in descriptors:
        pos = _blob_positions(puffin, int(off), int(ln), cache)
        files.append(np.repeat(ref, len(pos)))
        positions.append(pos.astype(np.int64))
    pdf = pd.DataFrame(
        {
            "__file_path": np.concatenate(files) if files else np.empty(0, dtype=object),
            "__pos": np.concatenate(positions) if positions else np.empty(0, dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf, "__file_path string, __pos long")


def pack_tuples(tuples) -> list[tuple[str, bytes, int]]:
    """(file_path, pos) DataFrame -> [(file_path, payload, cardinality)].

    Bitmaps are serialized executor-side (one applyInPandas group per
    data file); only the compressed payloads — the bytes a Puffin
    sidecar will hold — are collected, so driver memory is bounded by
    the sidecar size itself, not the raw position count.
    """
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pos = pdf["pos"].to_numpy()
        return pd.DataFrame(
            {
                "file_path": [pdf["file_path"].iloc[0]],
                "blob": [serialize_positions(pos)],
                "card": pd.array([int(pd.unique(pos).size)], dtype="int64"),
            }
        )

    rows = tuples.groupBy("file_path").applyInPandas(
        _pack, "file_path string, blob binary, card long"
    ).collect()
    return [(r["file_path"], bytes(r["blob"]), int(r["card"])) for r in rows]
