"""Skew-mitigation utilities for large joins and aggregations.

AQE's skew-join handling splits oversized *partitions*, but it only
kicks in for sort-merge joins and after materialization; when a single
JOIN KEY is hot (the classic power-law user_id), pre-salting is the
reliable fix at any scale:

- ``salted_join``: replicate the small(er) side ``salt`` times, salt the
  big side's key with a uniform shard, join on (key, shard). The hot
  key's rows spread over ``salt`` reducers instead of one straggler.
  Use when the small side is too big to broadcast but small enough to
  replicate ``salt``×.
- ``two_phase_count``: partial-then-final aggregation with an explicit
  salt column for extreme groupBy skew (a single group holding >1
  partition of rows). Spark's hash aggregate already does map-side
  partial aggregation; the explicit salt matters when per-key state is
  large (collect_list-like) rather than a counter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``big ⋈ small`` on ``on``.

    big gets a random-uniform shard per row (rand is fine — the shard
    only balances work, it never affects results); small is exploded
    ``salt``× so every (key, shard) pair finds its match.  Output
    equals a plain join (shard columns dropped).

    Only ``inner`` and ``left`` (outer on the big side) are supported:
    for right/full joins the exploded small side would emit every
    unmatched small-side row ``salt`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full would duplicate unmatched small-side rows salt times"
        )
    b = big.withColumn("__shard", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__shard", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, on + ["__shard"], how).drop("__shard")


def two_phase_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT) -> DataFrame:
    """COUNT per key with an explicit two-phase (salted) plan: first
    aggregate (key, shard), then aggregate key — the hot key's rows
    never converge on a single reducer with unbounded input."""
    return (
        df.withColumn("__shard", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__shard")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("n"))
    )
