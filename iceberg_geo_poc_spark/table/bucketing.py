"""Storage-partitioned (co-bucketed) joins — SURVEY.md §2.10 / 4.12.

The reference exposes its partitioning to Spark so equi-joins between
tables partitioned the same way skip the shuffle entirely
(reference spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/
source/SparkPartitioningAwareScan.java; exercised by
spark-extensions/.../TestStoragePartitionedJoinsInRowLevelOperations.java).

The idiomatic Spark analogue is bucketed tables: both sides written
with ``bucketBy(n, keys)`` + ``sortBy(keys)`` and equal bucket counts
join as a sort-merge join with NO Exchange on either side — at 100 TB
this converts the dominant fact-⋈-fact shuffle into a purely local
merge per bucket.  ``assert_no_shuffle`` lets callers (and tests)
verify the plan shape rather than trusting configuration.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

_BUCKETED: dict[tuple, tuple[str, str]] = {}


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int = 16,
    base_dir: str | None = None,
) -> str:
    """Persist df as a bucketed+sorted parquet table; returns the
    catalog table name.  Hash distribution is Spark's Murmur3 bucket
    hash — the engine-side analogue of writing with a bucket[N]
    partition transform (reference Bucket.java)."""
    table_name = f"{name}_{uuid.uuid4().hex[:8]}"
    path = os.path.join(base_dir or tempfile.mkdtemp(prefix="igps_spj_"), table_name)
    (
        df.write.bucketBy(num_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return table_name


def storage_partitioned_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_buckets: int = 16,
    how: str = "inner",
    cache_key: str | None = None,
) -> DataFrame:
    """Equi-join with both sides co-bucketed on the join keys.

    Writes each side once as a bucketed table (cached per cache_key),
    then joins the bucketed relations — Spark plans a sort-merge join
    with zero Exchange nodes.  The write is the amortized cost a real
    warehouse pays once at ingest, not per query.
    """
    key = (cache_key, tuple(on), num_buckets) if cache_key else None
    if key is None or key not in _BUCKETED:
        ln = write_bucketed(spark, left, "spj_l", on, num_buckets)
        rn = write_bucketed(spark, right, "spj_r", on, num_buckets)
        if key is not None:
            _BUCKETED[key] = (ln, rn)
    else:
        ln, rn = _BUCKETED[key]
    # MERGE hint: the storage-partitioned plan is a sort-merge join over
    # aligned buckets (broadcast would bypass the bucketed scan, which at
    # fact-⋈-fact scale is not an option anyway).
    return spark.table(ln).hint("merge").join(spark.table(rn), on, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan moves data between partitions (a
    shuffle Exchange).  BroadcastExchange is allowed: it replicates a
    small relation, it does not repartition the big side."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle:\n{plan}")
