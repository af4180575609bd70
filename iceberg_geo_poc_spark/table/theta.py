"""Theta (KMV) NDV sketches — mergeable distinct-count statistics.

The reference's ComputeTableStatsSparkAction writes per-column
``apache-datasketches-theta-v1`` blobs into Puffin statistics files
(core/src/main/java/org/apache/iceberg/puffin/StandardBlobTypes.java);
the engine's existing ``statistics.py`` covers the NDV *number* via
HLL++.  This module adds the SKETCH itself — the property the theta
family exists for is that sketches MERGE: per-partition / per-snapshot
/ per-table sketches union without re-reading data, and set-expression
estimates (union cardinality across tables) come for free.

KMV ("k minimum values", Bar-Yossef et al.; the estimator inside the
DataSketches theta family): hash every value to a uniform 64-bit
integer, keep the k smallest DISTINCT hashes.

- n <= k         : the sketch holds every distinct hash — EXACT.
- n > k          : with m = (k-th smallest)/M the unbiased estimate is
                   ``(k-1)/m`` (relative error ~ 1/sqrt(k-2)).
- union(a, b)    : merge hash arrays below min(theta), keep k smallest
                   — associative/commutative, so partition sketches
                   tree-merge exactly like the reference's theta union.

Serialization is an engine-local little-endian layout (type
``theta-kmv-v1``: u32 k | u64 theta | u32 count | count*u64 sorted
hashes).  Byte parity with DataSketches' compact form is permanently
out of scope (decision, round 9): this environment has no datasketches
library, no published serialization vectors, and no network, so a
hand-written ``apache-datasketches-theta-v1`` layout could never be
validated against ground truth — and an UNVERIFIED interchange format
that merely looks compatible is worse than an honest engine-local one
(a consumer would trust bytes nothing ever pinned).  The estimator
contract (exact below k, (k-1)/m above, exact-under-union merge) is
property-tested and driver-oracle-checked against COUNT(DISTINCT).

Scale shape: hashes are computed in codegen (xxhash64); each partition
emits its own k smallest distinct hashes from one numpy pass
(mapInPandas), so the driver merges at most k x n_partitions longs —
the treeAggregate posture, never a full-column collect or a global
sort.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

THETA_BLOB_TYPE = "theta-kmv-v1"
DEFAULT_K = 4096
# hash domain: xxhash64 reinterpreted as uint64; M = 2^64
_M = float(2**64)


class ThetaSketch:
    """Immutable KMV sketch: sorted uint64 hashes (<= k) + theta."""

    __slots__ = ("k", "theta", "hashes")

    def __init__(self, k: int, theta: int, hashes: np.ndarray):
        self.k = int(k)
        self.theta = int(theta)  # exclusive upper bound on kept hashes
        self.hashes = np.asarray(hashes, dtype=np.uint64)

    # -- construction --------------------------------------------------
    @staticmethod
    def from_hashes(hashes, k: int = DEFAULT_K) -> "ThetaSketch":
        h = np.unique(np.asarray(hashes, dtype=np.uint64))
        if len(h) <= k:
            return ThetaSketch(k, 2**64, h)
        kept = h[:k]
        return ThetaSketch(k, int(h[k]), kept)

    # -- estimator ------------------------------------------------------
    @property
    def is_exact(self) -> bool:
        return self.theta == 2**64

    def estimate(self) -> float:
        if self.is_exact:
            return float(len(self.hashes))
        # KMV: theta is the (k+1)-th smallest; k kept below it.
        # E = k / (theta/M) is the "historic inverse" form; the
        # unbiased estimator uses (k-1) over the k-th minimum — with
        # our kept array, the k-th minimum IS hashes[-1].
        m = (float(self.hashes[-1]) + 1.0) / _M
        return (self.k - 1) / m

    # -- union ----------------------------------------------------------
    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("cannot union sketches with different k")
        theta = min(self.theta, other.theta)
        merged = np.unique(
            np.concatenate([self.hashes, other.hashes])
        )
        merged = merged[merged < np.uint64(theta)] if theta < 2**64 else merged
        if len(merged) <= self.k:
            return ThetaSketch(self.k, theta, merged)
        return ThetaSketch(self.k, int(merged[self.k]), merged[: self.k])

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        """Intersection sketch (DataSketches a-n-b/intersection shape):
        common hashes below min(theta); the estimate divides by the
        shared theta fraction.  EXACT when both inputs are exact."""
        if self.k != other.k:
            raise ValueError("cannot intersect sketches with different k")
        theta = min(self.theta, other.theta)
        common = np.intersect1d(self.hashes, other.hashes)
        if theta < 2**64:
            common = common[common < np.uint64(theta)]
        return ThetaSketch(self.k, theta, common)

    def estimate_intersection(self, other: "ThetaSketch") -> float:
        inter = self.intersect(other)
        if inter.theta == 2**64:
            return float(len(inter.hashes))
        return len(inter.hashes) / (inter.theta / _M)

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        return (
            struct.pack("<IQI", self.k, self.theta % (2**64), len(self.hashes))
            + self.hashes.astype("<u8").tobytes()
        )

    @staticmethod
    def from_bytes(data: bytes) -> "ThetaSketch":
        k, theta, n = struct.unpack_from("<IQI", data, 0)
        hashes = np.frombuffer(data, dtype="<u8", count=n, offset=16)
        # theta == 0 encodes the exact sentinel 2^64 (mod wraps to 0)
        return ThetaSketch(k, 2**64 if theta == 0 else theta, hashes.copy())


def column_sketch(df, column: str, k: int = DEFAULT_K) -> ThetaSketch:
    """Build a sketch of ``column`` over a DataFrame.

    Codegen xxhash64 per row; each partition reduces to its own k
    smallest distinct hashes in one numpy pass; the driver merges
    <= k x n_partitions longs.  NULLs are excluded (NDV semantics).
    """
    import pyspark.sql.functions as F

    hashed = df.filter(F.col(column).isNotNull()).select(
        F.xxhash64(F.col(column)).alias("__h")
    )

    def _partial(batches):
        best: np.ndarray | None = None
        for pdf in batches:
            h = pdf["__h"].to_numpy(dtype="int64").view(np.uint64)
            h = np.unique(h)
            best = h if best is None else np.unique(np.concatenate([best, h]))
            if len(best) > k:
                best = best[: k + 1]  # keep k+1 so theta survives the cut
        if best is None:
            best = np.empty(0, dtype=np.uint64)
        yield pd.DataFrame({"__h": best.view(np.int64)})

    partials = hashed.mapInPandas(_partial, "__h long").toPandas()
    return ThetaSketch.from_hashes(
        partials["__h"].to_numpy(dtype="int64").view(np.uint64), k
    )
