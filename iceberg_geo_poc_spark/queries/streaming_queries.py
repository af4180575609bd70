"""Structured Streaming queries, run to completion and oracle-checked.

Each query is a REAL ``readStream`` pipeline (file-source micro-batches,
watermark, event-time windows, foreachBatch table sink) executed with an
``availableNow`` trigger, so the final answer is deterministic and the
DuckDB oracle can verify it like any batch query — the strongest
correctness posture available for streaming operators (the reference
itself only tests its storage stream; SURVEY §2.9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_geo_poc_spark.registry import query
from iceberg_geo_poc_spark.streaming import structured as S


@query(
    "stream_hourly_event_counts",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window + watermark over a file-source stream."""
    return S.hourly_event_counts(spark, sf_dir)


@query(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows (30-min gap): a new session starts when
    the gap to the previous event is >= the gap duration — the oracle
    states the same contract as a gaps-and-islands SQL."""
    return S.session_window_counts(spark, sf_dir)


@query(
    "stream_stateful_user_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running counts over 4 micro-batches; the
    final per-user state must equal the batch GROUP BY count."""
    return S.stateful_user_counts(spark, sf_dir)


@query(
    "stream_table_sink",
    oracle="""
    SELECT event_id, event_type, user_id FROM events
    """,
)
def stream_table_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch streaming append into a managed engine table: one
    snapshot per epoch (reference SparkWrite.java:181-186
    asStreamingAppend), then a normal snapshot scan reads it back."""
    from iceberg_geo_poc_spark.queries.table_queries import _managed

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        )
        S.stream_append_to_table(spark, sf_dir, t)
        return t.refresh()

    t = _managed(spark, sf_dir, "stream_sink", build)
    return t.to_df().select("event_id", "event_type", "user_id")


@query(
    "stream_datasource_read",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value FROM events
    """,
)
def stream_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A managed table consumed through the registered Python DataSource
    as a REAL Structured Streaming source (snapshot offsets, availableNow)
    into a memory sink — SparkMicroBatchStream parity end-to-end."""
    import tempfile

    from iceberg_geo_poc_spark.queries.table_queries import _managed
    from iceberg_geo_poc_spark.session import load_table
    from iceberg_geo_poc_spark.streaming.datasource import TableDataSource

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
        )
        df = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        # two appends -> two snapshots -> two offsets in one availableNow run
        t.append(df.filter("event_id % 2 = 0").repartition(2))
        t.append(df.filter("event_id % 2 = 1").repartition(2))
        return t

    t = _managed(spark, sf_dir, "ds_read", build)
    spark.dataSource.register(TableDataSource)
    view = f"ds_read_{abs(hash(sf_dir)) % 10**8}"
    q = (
        spark.readStream.format("iceberg_geo_poc")
        .option("location", t.location)
        .load()
        .writeStream.format("memory")
        .queryName(view)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="igps_ds_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(view).select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (click -> purchase within 1h)."""
    return S.click_purchase_join(spark, sf_dir)


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, user_id, event_type FROM events ORDER BY event_id
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup: the event stream staged TWICE (every file
    duplicated, consumed across separate micro-batches) through
    ``dropDuplicatesWithinWatermark`` must emit each event exactly once.
    Watermark-scoped state keeps the key store bounded by the
    out-of-orderness window, not the stream length."""
    from iceberg_geo_poc_spark.streaming.structured import dedup_within_watermark

    return dedup_within_watermark(spark, sf_dir).orderBy("event_id")


@query(
    "stream_partitioned_table_sink",
    oracle="""
    SELECT event_id, user_id FROM events WHERE event_type = 'click'
    ORDER BY event_id
    """,
)
def stream_partitioned_table_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming append into a PARTITIONED managed table: each epoch's
    snapshot lands rows in their identity partitions, so a post-stream
    scan on the partition column is file-pruned (asserted in-query) —
    streaming ingest feeding the same hidden-partitioning layout batch
    writes get."""
    from iceberg_geo_poc_spark.queries.table_queries import _managed
    from iceberg_geo_poc_spark.table import E as EE

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING",
            partition_by=[("event_type", "identity")],
        )
        S.stream_append_to_table(spark, sf_dir, t)
        return t.refresh()

    t = _managed(spark, sf_dir, "stream_psink", build)
    scan = t.scan(where=EE.eq("event_type", "click"))
    assert 0 < len(scan.files()) < scan.total_data_files(), "partition pruning inactive"
    return scan.to_df().select("event_id", "user_id").orderBy("event_id")


@query(
    "stream_incremental_admission",
    oracle="""
    SELECT CAST(3 AS INT) AS n_batches,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           TRUE AS bounded
    FROM events WHERE event_id % 6 < 6
    """,
)
def stream_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch incremental consumption WITH admission control
    (streaming/incremental.py IncrementalStream — the reference
    SparkMicroBatchStream + SupportsAdmissionControl shape): six
    single-file appends are drained with max_files_per_batch=2, which
    must yield exactly 3 micro-batches whose union is loss- and
    duplicate-free (total row count pinned by the oracle), each batch
    within the admission bound."""
    from iceberg_geo_poc_spark.queries.table_queries import _managed
    from iceberg_geo_poc_spark.streaming.incremental import IncrementalStream

    def build(cat, tname):
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "value"
        )
        for i in range(6):
            t.append(ev.filter(f"event_id % 6 = {i}").coalesce(1))
            t = cat.load_table(tname)
        return t

    t = _managed(spark, sf_dir, "admission", build)
    stream = IncrementalStream(t, max_files_per_batch=2)
    total = 0
    n_batches = 0
    bounded = True
    while (batch := stream.next_batch()) is not None:
        total += batch.count()
        n_batches += 1
        if n_batches > 10:  # safety: a runaway loop must fail loudly
            raise AssertionError("admission loop did not converge")
    bounded = n_batches == 3
    return spark.createDataFrame(
        [(n_batches, total, bounded)],
        "n_batches INT, total_rows BIGINT, bounded BOOLEAN",
    )


@query(
    "stream_changelog_cdc",
    oracle="""
    SELECT event_id,
           ROUND(CASE WHEN event_type = 'click' THEN value * 2
                 ELSE value END, 2) AS value
    FROM events
    WHERE event_id % 4 = 0 AND value >= 5
    ORDER BY event_id
    """,
)
def stream_changelog_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC consumed as a STREAM of per-commit micro-batches
    (streaming/incremental.py changelog — the reference's
    CreateChangelogViewProcedure shape driven commit-by-commit): an
    append, a merge-on-read DELETE, and a copy-on-write UPDATE each
    produce one changelog batch; a downstream materialization applies
    every batch in commit order (anti-join the deletes, union the
    inserts — cost tracks change volume, not table size).  The
    reconstruction must equal the final table state the oracle
    computes directly — proving the change stream is complete, ordered,
    and loss-free across all three commit kinds."""
    from iceberg_geo_poc_spark.queries.table_queries import _managed
    from iceberg_geo_poc_spark.streaming import incremental as I
    from iceberg_geo_poc_spark.table import E as EE

    def build(cat, tname):
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "value"
        ).filter(F.col("event_id") % 4 == 0)
        t.append(ev)
        t = cat.load_table(tname)
        t.delete(EE.lt("value", 5.0), mode="merge-on-read")
        t = cat.load_table(tname)
        t.update(
            {"value": F.col("value") * 2},
            EE.eq("event_type", "click"),
            mode="copy-on-write",
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "cdc_stream", build)
    chain = I._ancestry(t, t.meta.current_snapshot_id)
    acc = None
    prev = None
    for sid in chain:
        batch = I.changelog(t, from_snapshot_id=prev, to_snapshot_id=sid)
        dels = batch.filter(F.col("_change_type") == "delete").select("event_id")
        ins = batch.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_snapshot_id"
        )
        if acc is None:
            acc = ins
        else:
            acc = acc.join(dels, "event_id", "left_anti").unionByName(ins)
        prev = sid
    return (
        acc.select("event_id", F.round("value", 2).alias("value"))
        .orderBy("event_id")
    )


@query(
    "stream_static_enrichment",
    oracle="""
    SELECT n.n_name, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: micro-batched events joined
    to a batch dimension with no state store (the static side is
    re-broadcast per batch) — the canonical streaming-enrichment shape
    the reference leaves to the host engine (SURVEY §2.9)."""
    return S.stream_static_enrichment(spark, sf_dir).orderBy(
        "n_name", "event_type"
    )


@query(
    "stream_upsert_sink",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, event_type, ROUND(value, 6) AS value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events)
    SELECT user_id, event_id, event_type, value
    FROM r WHERE rn = 1 ORDER BY user_id
    """,
)
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT sink (foreachBatch + conditional MERGE INTO —
    the CDC-consumption pattern downstream of the reference's
    changelog views): 4 micro-batches merge into an engine table with
    last-write-wins by (ts, event_id).  Because the matched-update is
    conditional, the final state is the per-user argmax regardless of
    batch slicing — so plain SQL over raw parquet is an exact oracle
    for a genuinely multi-batch streaming pipeline."""
    import tempfile

    from iceberg_geo_poc_spark.table import Catalog

    key = (sf_dir, "upsert_sink")
    if key not in _UPSERT_TABLES:
        cat = Catalog(tempfile.mkdtemp(prefix="igps_ups_"), spark)
        t = cat.create_table(
            "upserted",
            "user_id BIGINT, event_id BIGINT, ts LONG, "
            "event_type STRING, value DOUBLE",
        )
        S.stream_upsert_to_table(spark, sf_dir, t)
        _UPSERT_TABLES[key] = t
    t = _UPSERT_TABLES[key]
    return (
        t.to_df()
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
        )
        .orderBy("user_id")
    )


_UPSERT_TABLES: dict = {}


_OVERWRITE_TABLES: dict = {}


@query(
    "stream_overwrite_sink",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_overwrite_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-mode streaming sink (the reference's
    asStreamingOverwrite, SparkWrite.java:181-186): a running grouped
    aggregation over the event stream overwrites the engine table each
    epoch with its FULL state; after the stream drains, the table must
    equal the plain batch aggregation — exactly-once epoch replay keyed
    like the append sink (streaming/structured.py::
    stream_overwrite_to_table, Table.overwrite_streaming)."""
    import tempfile

    from iceberg_geo_poc_spark.table import Catalog

    key = (sf_dir, "overwrite_sink")
    if key not in _OVERWRITE_TABLES:
        cat = Catalog(tempfile.mkdtemp(prefix="igps_ow_"), spark)
        t = cat.create_table(
            "ow_counts",
            "event_type STRING, n_events BIGINT, total_value DOUBLE",
        )
        S.stream_overwrite_to_table(spark, sf_dir, t)
        # replaying the LAST epoch must be a no-op (exactly-once)
        last = t.meta.snapshots[-1]
        qid = last.summary["streaming.query-id"]
        eid = int(last.summary["streaming.epoch-id"])
        assert t.overwrite_streaming(t.to_df(), qid, eid) is None
        _OVERWRITE_TABLES[key] = t
    t = _OVERWRITE_TABLES[key]
    return (
        t.to_df()
        .select(
            "event_type",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "stream_outer_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    ORDER BY click_id, purchase_id
    """,
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark-driven NULL
    emission: a 4-micro-batch time-ordered replay (plus a far-future
    sentinel that expires every real click's state before termination)
    makes the drained streaming result equal the batch left join
    EXACTLY — matched pairs AND the null-extended unmatched clicks are
    hash-verified against plain SQL (streaming/structured.py::
    click_purchase_outer_join)."""
    return S.click_purchase_outer_join(spark, sf_dir).orderBy(
        "click_id", "purchase_id"
    )


@query(
    "stream_full_outer_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM c FULL JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY user_id, click_id, purchase_id
    """,
)
def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join, completing the watermarked outer
    family (inner r8, left-outer r11): the multi-batch time-ordered
    replay with per-stream sentinels drains to EXACTLY the batch FULL
    JOIN — matched pairs, null-extended unmatched clicks AND
    null-extended unmatched purchases all hash-verified
    (streaming/structured.py::click_purchase_full_outer_join)."""
    return S.click_purchase_full_outer_join(spark, sf_dir).orderBy(
        "user_id", "click_id", "purchase_id"
    )


_DSS_TABLES: dict = {}


@query(
    "stream_datasource_write_sink",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_datasource_write_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming WRITE through the Python DataSource format (the
    reference's asStreamingAppend over DSv2, without foreachBatch): a
    multi-file event replay streams into a managed table — one engine
    snapshot per micro-batch epoch, each stamped with (query-id,
    epoch-id) for exactly-once replay — and the drained table equals
    plain SQL over the source (streaming/datasource.py::
    _StreamAppendWriter)."""
    import tempfile

    from iceberg_geo_poc_spark.streaming.datasource import TableDataSource
    from iceberg_geo_poc_spark.streaming.structured import (
        _multifile_stream_dir,
    )
    from iceberg_geo_poc_spark.table import Catalog

    key = (sf_dir, "dss_sink")
    if key not in _DSS_TABLES:
        spark.dataSource.register(TableDataSource)
        cat = Catalog(tempfile.mkdtemp(prefix="igps_dss_"), spark)
        t = cat.create_table(
            "dss_sink",
            "event_id BIGINT, user_id BIGINT, value DOUBLE",
        )
        d = _multifile_stream_dir(spark, sf_dir, "events", n=4)
        q = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type STRING, value DOUBLE, props STRING"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .select("event_id", "user_id", "value")
            .writeStream.format("iceberg_geo_poc")
            .option("location", t.location)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="igps_dss_ck_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t = cat.load_table("dss_sink")
        # multi-epoch evidence: more than one streaming-stamped snapshot
        n_epochs = len(
            {
                s.summary.get("streaming.epoch-id")
                for s in t.meta.snapshots
                if s.summary.get("streaming.query-id")
            }
        )
        assert n_epochs >= 2, n_epochs
        _DSS_TABLES[key] = t
    t = _DSS_TABLES[key]
    return (
        t.to_df()
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id")
    )
