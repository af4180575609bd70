"""Structured Streaming surface (SURVEY.md §2.9 host-engine operators).

The reference's own streaming is storage-level (snapshot micro-batches,
SparkMicroBatchStream.java:68-117 — covered by incremental.py).  The
watermark / event-time-window / session-window / streaming-sink surface
is host-engine territory the engine must still declare; here it is
declared with REAL ``readStream`` pipelines, run to completion with an
``availableNow`` trigger so each is deterministic and oracle-checkable.

Scale notes: file-source streams admit files per micro-batch
(maxFilesPerTrigger), watermarks bound state size for append-mode
windows, and the foreachBatch sink commits one table snapshot per
epoch — the same epoch = snapshot equivalence the reference's streaming
write uses (SparkWrite.java:181-186 asStreamingAppend).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_geo_poc_spark.session import _nanos_timestamp_cols

_STREAM_DIRS: dict[str, str] = {}


def _stream_dir(path: str) -> str:
    """Spark's file stream source requires a DIRECTORY; testdata ships
    single files, so stage a symlink dir per table (cheap, read-only)."""
    if path not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="igps_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        _STREAM_DIRS[path] = d
    return _STREAM_DIRS[path]


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``readStream`` over one testdata table (file-source micro-batches).

    Mirrors session.load_table: schema from the batch reader, nanos
    timestamps rescaled JVM-side.
    """
    path = f"{sf_dir}/{name}.parquet"
    schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(_stream_dir(path))
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` div 1000 AS LONG))"))
    return df


def run_to_completion(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DF with availableNow into a memory sink; return result."""
    name = f"s_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over the event stream.

    The 10-minute watermark bounds window state at scale; complete
    output mode makes the availableNow run emit every window.
    """
    ev = load_stream(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
        )
    )
    return run_to_completion(agg)


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows (30-minute gap) per user over the stream.

    session_window merges events whose timestamp is strictly less than
    the previous event time + gap; state per (user, open session) only.
    """
    ev = load_stream(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
    return run_to_completion(agg)


def stream_append_to_table(spark: SparkSession, sf_dir: str, table) -> None:
    """Streaming sink: one engine-table snapshot per micro-batch epoch
    (foreachBatch; the reference's asStreamingAppend equivalence)."""
    ev = load_stream(spark, sf_dir, "events")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append(batch_df)

    q = (
        ev.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{table.location}/_stream_checkpoint")
        .start()
    )
    q.awaitTermination()
