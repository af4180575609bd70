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

from iceberg_geo_poc_spark.session import _nanos_timestamp_cols, normalize_timestamps

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
    return normalize_timestamps(df)


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


_MULTIFILE_DIRS: dict[str, str] = {}


def _multifile_stream_dir(spark: SparkSession, sf_dir: str, name: str, n: int = 4) -> str:
    """Stage one testdata table as n parquet files so maxFilesPerTrigger=1
    yields a genuine multi-micro-batch stream (state must survive batches)."""
    path = f"{sf_dir}/{name}.parquet"
    if path not in _MULTIFILE_DIRS:
        d = tempfile.mkdtemp(prefix="igps_mstream_")
        spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(d)
        _MULTIFILE_DIRS[path] = d
    return _MULTIFILE_DIRS[path]


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: running per-user event counts via
    applyInPandasWithState (SURVEY §2.9 "custom stateful operators").

    The stream is staged as 4 files consumed one per micro-batch, so the
    per-user GroupState genuinely carries across batches; update mode
    emits the running total each time, and the caller takes the max
    (monotone) per user as the final answer.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    d = _multifile_stream_dir(spark, sf_dir, "events")
    schema = spark.read.parquet(d).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )

    def count_events(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    updates = (
        ev.select("user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_events,
            "user_id bigint, n_events bigint",
            "n_events bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    emitted = run_to_completion(updates, output_mode="update")
    return emitted.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


def stream_append_to_table(spark: SparkSession, sf_dir: str, table) -> None:
    """Streaming sink: one engine-table snapshot per micro-batch epoch
    (foreachBatch; the reference's asStreamingAppend equivalence).
    Exactly-once: epochs commit through ``append_streaming`` keyed on
    the checkpoint identity, so a replayed foreachBatch after a failure
    is skipped instead of double-appended."""
    ev = load_stream(spark, sf_dir, "events")
    query_id = f"ckpt:{table.location}/_stream_checkpoint"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append_streaming(batch_df, query_id, epoch_id)

    q = (
        ev.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{table.location}/_stream_checkpoint")
        .start()
    )
    q.awaitTermination()


def click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each click joined
    to the same user's purchases within the following hour.

    Both sides carry watermarks, so at steady state the join buffers
    only ~watermark-window of rows per side (state is bounded by the
    time-interval condition — the canonical Structured Streaming
    stream-stream join posture; without the bounds Spark would refuse
    to clean state)."""
    clicks = (
        load_stream(spark, sf_dir, "events")
        .filter("event_type = 'click'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        load_stream(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    j = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
    )
    return run_to_completion(
        j.select(
            F.col("c_user").alias("user_id"), "click_id", "purchase_id"
        ),
        output_mode="append",
    )


# NOTE: Spark 4's transformWithStateInPandas (the arbitrary-state
# successor to applyInPandasWithState) is NOT exposed here: its driver
# worker requires google.protobuf, which this container does not ship
# (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError
# google.protobuf.descriptor).  stateful_user_counts above covers the
# custom-stateful surface on the stable applyInPandasWithState API.


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: the event stream is staged
    TWICE (two copies of every file, consumed across separate
    micro-batches) and ``dropDuplicatesWithinWatermark`` on event_id
    must emit each event exactly once — the state store retains keys
    only within the watermark delay, so state size tracks the
    out-of-orderness bound, not the stream length (the streaming-ingest
    dedup shape of a training-data pipeline)."""
    path = f"{sf_dir}/events.parquet"
    key = f"{path}::dup2"
    if key not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="igps_stream_dup_")
        os.symlink(path, os.path.join(d, "a.parquet"))
        os.symlink(path, os.path.join(d, "b.parquet"))
        _STREAM_DIRS[key] = d
    schema = spark.read.parquet(path).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_STREAM_DIRS[key])
    )
    for c in _nanos_timestamp_cols(path):
        ev = ev.withColumn(
            c, F.expr(f"timestamp_micros(CAST(`{c}` div 1000 AS LONG))")
        )
    ev = normalize_timestamps(ev)
    deduped = (
        ev.withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_completion(deduped, output_mode="append")


def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join: the event stream enriched against a batch
    dimension (nation) via an equi-join Spark plans as a broadcast per
    micro-batch — the canonical streaming-enrichment shape (no state
    store, unlike stream-stream joins; the static side is re-broadcast
    per batch, so dimension updates between batches are picked up).
    The stream side derives its key in codegen; output aggregates per
    (nation, event_type) so availableNow yields a deterministic total.
    """
    from iceberg_geo_poc_spark.session import load_table

    ev = load_stream(spark, sf_dir, "events").withColumn(
        "nkey", F.pmod(F.col("user_id"), F.lit(25))
    )
    dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nkey"), "n_name"
    )
    joined = ev.join(F.broadcast(dim), "nkey")
    agg = joined.groupBy("n_name", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_to_completion(agg)


def stream_upsert_to_table(spark: SparkSession, sf_dir: str, table) -> None:
    """Streaming UPSERT sink — the standard CDC-consumption pattern the
    reference's changelog-view docs describe downstream (foreachBatch +
    MERGE INTO): each micro-batch first reduces to one row per key,
    then merges into the engine table with LAST-WRITE-WINS by
    (ts, event_id).

    The matched-update is CONDITIONAL (``s`` newer than ``t``: keep
    ``s``, else keep ``t``), which makes the final table state a pure
    per-key argmax — independent of how the stream was sliced into
    micro-batches, so the result is deterministic and SQL-expressible
    for the oracle even though batch boundaries are an engine detail."""
    from pyspark.sql import Window

    d = _multifile_stream_dir(spark, sf_dir, "events")
    schema = spark.read.parquet(d).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
    # normalize ts to epoch-MICROS longs whatever the staged physical
    # type (TIMESTAMP_NTZ under Spark-4 inference, or raw nanos longs
    # under nanosAsLong): the table column and the oracle's ordering
    # both use microsecond precision
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type.startswith("timestamp"):
        ev = ev.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")))
    else:
        ev = ev.withColumn("ts", F.expr("CAST(ts DIV 1000 AS LONG)"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    newer = (F.col("s.ts") > F.col("t.ts")) | (
        (F.col("s.ts") == F.col("t.ts"))
        & (F.col("s.event_id") > F.col("t.event_id"))
    )

    def keep(col: str):
        return F.when(newer, F.col(f"s.{col}")).otherwise(F.col(f"t.{col}"))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        src = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        table.merge(
            src,
            on=["user_id"],
            when_matched_update={
                c: keep(c) for c in ("event_id", "ts", "event_type", "value")
            },
        )

    q = (
        ev.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"{table.location}/_upsert_checkpoint"
        )
        .start()
    )
    q.awaitTermination()


def stream_overwrite_to_table(spark: SparkSession, sf_dir: str, table) -> None:
    """Complete-mode streaming sink: each epoch OVERWRITES the table
    with the stream's full aggregation state (the reference's
    ``asStreamingOverwrite`` — SparkWrite.java:181-186 routes Spark's
    complete output mode to a replace-all snapshot per epoch).

    Exactly-once: like append_streaming, the committing snapshot
    records (query-id, epoch-id) and a replayed epoch is skipped —
    overwrite replay would not corrupt data (it is idempotent by
    value) but would burn a phantom snapshot + data files per replay.
    """
    ev = load_stream(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    query_id = f"ckpt:{table.location}/_stream_ow_checkpoint"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        table.overwrite_streaming(batch_df, query_id, epoch_id)

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{table.location}/_stream_ow_checkpoint")
        .start()
    )
    q.awaitTermination()


_SENTINEL_ID = 10**9


def _time_ordered_stream_dir(spark: SparkSession, sf_dir: str, n_slices: int = 3) -> str:
    """Stage the event table as a time-ordered file sequence + a far-
    future SENTINEL file (one click + one purchase, 100 h past max ts).

    Two distinct correctness needs:
    - files must arrive in EVENT-TIME order (``maxFilesPerTrigger=1``
      replays them as micro-batches): a random split puts near-max
      timestamps in the FIRST batch, the watermark jumps to the end,
      and every later batch is dropped as late data;
    - outer joins emit their null-extended rows only when state
      EXPIRES — at availableNow termination, un-expired state is
      simply discarded, so without the sentinel advancing the final
      watermark past every real row the unmatched clicks near the end
      of the stream would silently never appear.  (Spark's no-data
      micro-batch after the sentinel performs the flush.)
    """
    import os
    import shutil
    import tempfile
    import time as _time

    ev = load_table_events(spark, sf_dir)
    lo, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    d = tempfile.mkdtemp(prefix="igps_ts_stream_")
    os.makedirs(d + "/stream")
    span = (mx - lo) / n_slices
    for i in range(n_slices):
        s = ev.filter(F.col("ts") >= lo + i * span)
        if i < n_slices - 1:
            s = s.filter(F.col("ts") < lo + (i + 1) * span)
        tmp = f"{d}/tmp{i}"
        s.coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.copy(f"{tmp}/{f}", f"{d}/stream/a{i}.parquet")
        _time.sleep(0.05)  # strictly increasing mtimes = replay order
    sent = spark.createDataFrame(
        [
            (_SENTINEL_ID, mx, -1, "click", 0.0),
            (_SENTINEL_ID + 1, mx, -1, "purchase", 0.0),
        ],
        ev.schema,
    ).withColumn("ts", F.col("ts") + F.expr("interval 100 hours"))
    sent.coalesce(1).write.parquet(d + "/sent")
    for f in os.listdir(d + "/sent"):
        if f.endswith(".parquet"):
            shutil.copy(f"{d}/sent/{f}", f"{d}/stream/z_sentinel.parquet")
    return d + "/stream"


def load_table_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_geo_poc_spark.session import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def click_purchase_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with event-time bounds: every
    click appears exactly once — matched to same-user purchases in the
    following hour, or with NULL purchase columns once the watermark
    proves no match can arrive.

    Outer stream-stream joins REQUIRE the watermark + interval bounds:
    the null-extended row is emitted exactly when the click's state
    expires, so 'no match' is provable.  The time-ordered sentinel
    replay (_time_ordered_stream_dir) makes the drained result equal
    the batch left join EXACTLY — which is what lets the driver oracle
    hash-verify a genuinely multi-batch outer join."""
    d = _time_ordered_stream_dir(spark, sf_dir)
    ev = load_table_events(spark, sf_dir)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    clicks = (
        src.filter("event_type = 'click'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        src.filter("event_type = 'purchase'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    j = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
        "left_outer",
    )
    out = run_to_completion(
        j.select(
            F.col("c_user").alias("user_id"), "click_id", "purchase_id"
        ),
        output_mode="append",
    )
    return out.filter(F.col("click_id") < _SENTINEL_ID)


def click_purchase_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join (Spark 3.1+ watermarked outer
    family, completing left-outer from round 11): every click AND every
    purchase appears exactly once — matched within the event-time bound,
    or null-extended on ITS side once the watermark proves no partner
    can arrive.  Both sentinel rows (one per stream) expire both sides'
    state before availableNow termination, so the drained result equals
    the batch FULL JOIN exactly."""
    d = _time_ordered_stream_dir(spark, sf_dir)
    ev = load_table_events(spark, sf_dir)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    clicks = (
        src.filter("event_type = 'click'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        src.filter("event_type = 'purchase'")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    j = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"
        ),
        "full_outer",
    )
    out = run_to_completion(
        j.select(
            F.coalesce("c_user", "p_user").alias("user_id"),
            "click_id",
            "purchase_id",
        ),
        output_mode="append",
    )
    return out.filter(
        (F.col("click_id").isNull() | (F.col("click_id") < _SENTINEL_ID))
        & (
            F.col("purchase_id").isNull()
            | (F.col("purchase_id") < _SENTINEL_ID)
        )
    )
