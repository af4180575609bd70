"""Iceberg-spec bucket hashing (Murmur3-32, seed 0, single-value bytes).

The engine's native ``bucket[N]`` transform rides Spark's built-in
``F.hash`` (Murmur3-32 with seed 42 over Spark's own value layout,
``transforms.py``) — self-consistent for tables this engine writes, but
NOT the numbering a genuine Iceberg writer produced.  Tables imported
via ``add_files``/``migrate`` from a real Iceberg-bucketed layout need
the spec's numbering so that (a) derived partition values match the
directory layout, (b) engine appends land rows in the same buckets as
the imported files, and (c) storage-partitioned joins co-locate.

Spec (reference ``api/.../transforms/Bucket.java`` + ``BucketUtil.java``,
Iceberg spec Appendix B "32-bit Hash Requirements"):

    bucket(v, N) = (murmur3_x86_32(serialize(v), seed=0) & Int.MAX) % N

with the single-value serialization:

- int, long, date (days), time / timestamp / timestamptz (micros):
  8-byte little-endian of the value widened to long;
- timestamp_ns: floorDiv(nanos, 1000) then as timestamp (micros);
- string: UTF-8 bytes;
- uuid: the 16 big-endian bytes;
- fixed / binary: the bytes as-is;
- decimal: minimal two's-complement BIG-endian of the unscaled value.

float/double are NOT valid bucket sources (spec; refuse, don't guess).

MurmurHash3 x86_32 is implemented from the public domain algorithm
(Austin Appleby's MurmurHash3.cpp) — scalar for literals/partition
values, and a numpy-vectorized long-input variant for column jobs (an
Iceberg layout's per-file bucket derivation hashes every row of the
bucket column; at 100 TB that must be a vectorized batch op, not a
Python loop).
"""

from __future__ import annotations

import struct
import uuid as _uuid
from decimal import Decimal

import numpy as np
import pandas as pd

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32 over ``data`` -> signed int32."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_long_vec(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 over int64 values serialized as 8-byte
    little-endian (the int/long/date/time/timestamp hash) -> int32 array.
    Two 4-byte blocks + finalization, all uint32 numpy arithmetic."""
    v = vals.astype(np.int64).view(np.uint64)
    blocks = [
        (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (v >> np.uint64(32)).astype(np.uint32),
    ]
    h = np.full(len(v), seed, dtype=np.uint32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    with np.errstate(over="ignore"):
        for k in blocks:
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # total length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def serialize_single(value, icetype: str) -> bytes:
    """Iceberg single-value serialization for hashing (spec Appendix B).

    ``icetype``: int | long | date | time | timestamp | timestamptz |
    timestamp_ns | string | uuid | fixed | binary | decimal.
    date/time/timestamp values are the already-converted integer forms
    (days / micros / nanos from epoch)."""
    t = icetype.lower()
    if t in ("int", "long", "integer", "bigint", "date", "time",
             "timestamp", "timestamptz"):
        return struct.pack("<q", int(value))
    if t == "timestamp_ns":
        # floorDiv to micros, then hash as timestamp
        ns = int(value)
        return struct.pack("<q", ns // 1000)
    if t in ("string", "varchar"):
        return str(value).encode("utf-8")
    if t == "uuid":
        u = value if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value))
        return u.bytes  # big-endian per RFC 4122
    if t in ("fixed", "binary"):
        return bytes(value)
    if t == "decimal":
        unscaled = value
        if isinstance(value, Decimal):
            sign, digits, exp = value.as_tuple()
            unscaled = int("".join(map(str, digits)))
            if sign:
                unscaled = -unscaled
        unscaled = int(unscaled)
        # minimal two's-complement big-endian.  Signed minimal width is
        # (magnitude bits + sign bit) rounded up; for negatives the
        # magnitude is that of the complement (-n-1), so exact negative
        # powers of two (-128, -32768, ...) fit one byte narrower than
        # their positive counterparts — (bit_length+8)//8 over-allocated
        # a redundant 0xff byte there (hypothesis-found, unscaled=-128).
        mag = unscaled if unscaled >= 0 else -unscaled - 1
        length = mag.bit_length() // 8 + 1
        return unscaled.to_bytes(length, "big", signed=True)
    if t in ("float", "double"):
        raise ValueError("bucket transform is not defined for float/double")
    raise ValueError(f"no Iceberg single-value serialization for {icetype!r}")


def hash_value(value, icetype: str) -> int:
    return murmur3_x86_32(serialize_single(value, icetype), 0)


def bucket_value(value, icetype: str, n: int) -> int | None:
    """Spec bucket number of one value (None stays None — null partition)."""
    if value is None:
        return None
    return (hash_value(value, icetype) & 0x7FFFFFFF) % n


def bucket_udf(n: int):
    """Vectorized pandas UDF computing spec bucket numbers — the write
    kernel behind the ``bucket[N,iceberg]`` transform."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _ibucket(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_series(s, n), dtype="Int32")

    return _ibucket


def bucket_series(s, n: int):
    """pandas Series -> spec bucket numbers (nullable Int32).

    Dtype-dispatched: integer dtypes hash via the vectorized long path;
    datetime64 converts to micros first; strings/bytes hash per value
    (scalar murmur over the variable-length bytes).  This is the batch
    kernel behind the ``bucket[N,iceberg]`` transform's pandas UDF.
    """
    mask = s.isna()
    out = pd.array([None] * len(s), dtype="Int32")
    if mask.all():
        return out
    kind = s.dtype.kind
    if kind in ("i", "u") or str(s.dtype).startswith("Int"):
        vals = s[~mask].astype("int64").to_numpy()
        hashes = murmur3_long_vec(vals)
    elif kind == "M":  # datetime64[ns] -> micros
        vals = s[~mask].astype("datetime64[us]").astype("int64").to_numpy()
        hashes = murmur3_long_vec(vals)
    elif kind == "f":
        raise ValueError("bucket transform is not defined for float/double")
    else:
        import datetime as _dt

        def _one(v):
            if isinstance(v, (bytes, bytearray)):
                return murmur3_x86_32(bytes(v), 0)
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                days = (v - _dt.date(1970, 1, 1)).days
                return murmur3_x86_32(struct.pack("<q", days), 0)
            if isinstance(v, Decimal):
                return hash_value(v, "decimal")
            return murmur3_x86_32(str(v).encode("utf-8"), 0)

        hashes = np.fromiter(
            (_one(v) for v in s[~mask]), dtype=np.int64, count=int((~mask).sum())
        )
    buckets = (hashes.astype(np.int64) & 0x7FFFFFFF) % n
    out[~mask.to_numpy()] = buckets.astype("int32")
    return out
