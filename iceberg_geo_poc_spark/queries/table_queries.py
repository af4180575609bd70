"""Table-format operations exposed as oracle-checked queries.

Each query loads driver testdata into a managed engine table (cached
per process), performs a table-format operation (CoW/MoR delete,
update, merge, time travel, incremental read, changelog, compaction,
stats fast path), and returns rows whose expected value is expressible
as plain SQL over the original parquet — so the DuckDB oracle verifies
the table layer's row-level semantics end-to-end.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_geo_poc_spark.registry import query
from iceberg_geo_poc_spark.session import load_table
from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table.table import Table

_CATALOGS: dict[str, Catalog] = {}
_TABLES: dict[tuple[str, str], Table] = {}


def _catalog(spark: SparkSession) -> Catalog:
    key = "default"
    if key not in _CATALOGS:
        _CATALOGS[key] = Catalog(tempfile.mkdtemp(prefix="igps_wh_"), spark)
    return _CATALOGS[key]


def _managed(spark: SparkSession, sf_dir: str, name: str, build) -> Table:
    """Build-once-per-process managed table for (sf_dir, recipe)."""
    key = (sf_dir, name)
    if key not in _TABLES:
        cat = _catalog(spark)
        tname = f"{name}_{abs(hash(sf_dir)) % 10**8}"
        if cat.table_exists(tname):
            cat.drop_table(tname)
        _TABLES[key] = build(cat, tname)
    return _TABLES[key]


_EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "managed_cow_delete",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM events WHERE NOT (event_type = 'error')
    """,
)
def managed_cow_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        # two appends split by user_id so the delete rewrites some files
        # and metadata-drops none (partial matches everywhere)
        t.append(df.filter("user_id % 2 = 0").repartition(2))
        t.append(df.filter("user_id % 2 = 1").repartition(2))
        t.delete(E.eq("event_type", "error"))
        return t

    t = _managed(spark, sf_dir, "cow_del", build)
    return t.to_df().select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_mor_delete",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 6) AS value
    FROM events WHERE NOT (value < 50.0)
    """,
)
def managed_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(4))
        t.delete(E.lt("value", 50.0), mode="merge-on-read")
        return t

    t = _managed(spark, sf_dir, "mor_del", build)
    return t.to_df().select("event_id", "user_id", F.round("value", 6).alias("value"))


@query(
    "managed_eq_delete",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM events WHERE event_type <> 'error'
    UNION ALL
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM events WHERE event_type = 'error' AND value >= 90.0
    """,
)
def managed_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read EQUALITY delete with sequence visibility: all
    'error' events are key-deleted, then the high-value errors are
    re-appended AFTER the delete — the re-appended rows must survive
    (higher sequence number than the delete file)."""

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        t.append(df.repartition(4))
        t.delete_by_keys(
            df.filter("event_type = 'error'").select("event_id"), key_cols=["event_id"]
        )
        t.append(df.filter("event_type = 'error' AND value >= 90.0"))
        return t

    t = _managed(spark, sf_dir, "eq_del", build)
    return t.to_df().select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_cow_update",
    oracle="""
    SELECT event_id, event_type,
           ROUND(CASE WHEN event_type = 'click' THEN value * 2 ELSE value END, 6)
             AS value
    FROM events
    """,
)
def managed_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(4))
        t.update({"value": F.col("value") * 2}, where=E.eq("event_type", "click"))
        return t

    t = _managed(spark, sf_dir, "cow_upd", build)
    return t.to_df().select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_merge",
    oracle="""
    SELECT c_custkey AS custkey,
           ROUND(CASE WHEN c_custkey % 10 = 0 THEN 0.0 ELSE c_acctbal END, 2) AS acctbal
    FROM customer
    UNION ALL
    SELECT 900000001, 1.0
    UNION ALL
    SELECT 900000002, 2.0
    """,
)
def managed_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE: zero out every 10th customer's balance, insert two new."""

    def build(cat, tname):
        t = cat.create_table(tname, "custkey BIGINT, acctbal DOUBLE")
        c = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        t.append(c.repartition(2))
        src = (
            c.filter("custkey % 10 = 0").withColumn("acctbal", F.lit(0.0))
        ).unionByName(
            spark.createDataFrame(
                [(900000001, 1.0), (900000002, 2.0)], "custkey BIGINT, acctbal DOUBLE"
            )
        )
        t.merge(src, on=["custkey"], when_matched_update={"acctbal": F.lit(0.0)})
        return t

    t = _managed(spark, sf_dir, "merge", build)
    return t.to_df().select("custkey", F.round("acctbal", 2).alias("acctbal"))


@query(
    "managed_changelog_apply",
    oracle="""
    SELECT event_id, event_type,
           ROUND(CASE WHEN event_type = 'click' THEN value + 5.0
                      ELSE value END, 6) AS value
    FROM events WHERE event_type <> 'error'
    """,
)
def managed_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: a mirror maintained purely from the source's changelog
    (delete + CoW-update commits) converges to the source state."""
    from iceberg_geo_poc_spark.streaming.incremental import apply_changelog

    def build(cat, tname):
        src = cat.create_table(tname, _EVENTS_DDL)
        mirror = cat.create_table(tname + "_mirror", _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        src.append(df.repartition(2))
        mirror.append(df.repartition(2))
        s1 = src.current_snapshot().snapshot_id
        src.delete(E.eq("event_type", "error"))
        src.update({"value": F.col("value") + 5.0}, where=E.eq("event_type", "click"))
        apply_changelog(src, mirror, ["event_id"], from_snapshot_id=s1)
        return mirror

    t = _managed(spark, sf_dir, "cdc_apply", build)
    return t.to_df().select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_row_lineage",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
      FROM orders WHERE o_orderkey % 8 = 1)
    SELECT o_orderkey, o_orderstatus,
           ROUND(CASE WHEN o_totalprice > 150000.0 THEN 0.0
                      ELSE o_totalprice END, 2) AS price,
           CAST(rid AS BIGINT) AS row_id,
           CAST(CASE WHEN o_totalprice > 150000.0 THEN 3 ELSE 1 END
             AS BIGINT) AS last_upd
    FROM base WHERE o_orderstatus <> 'F'
    ORDER BY o_orderkey
    """,
)
def managed_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row lineage (Iceberg v3 _row_id / _last_updated_sequence_number):
    one sorted append pins _row_id = row_number (block allocation from
    metadata next-row-id), a CoW DELETE carries survivors' ids through
    the rewrite MATERIALIZED, and a CoW UPDATE bumps
    _last_updated_sequence_number ONLY for the rows it touched (via the
    null-resolves-to-file-seq rule).  The oracle pins every id and seq
    exactly — any id reassignment or seq leak hash-mismatches."""

    def build(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        o = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .filter("o_orderkey % 8 = 1")
            .orderBy("o_orderkey")
            .coalesce(1)
        )
        t.append(o)  # seq 1: _row_id = sorted position
        t.delete(E.eq("o_orderstatus", "F"))  # seq 2: CoW, ids must survive
        t.update(  # seq 3: only touched rows take the new seq
            {"o_totalprice": F.lit(0.0)}, where=E.gt("o_totalprice", 150000.0)
        )
        return t

    t = _managed(spark, sf_dir, "row_lineage", build)
    return (
        t.to_df(lineage=True)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("price"),
            F.col("_row_id").alias("row_id"),
            F.col("_last_updated_sequence_number").alias("last_upd"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "managed_default_columns",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 16 = 3  THEN 'legacy'
                WHEN o_orderkey % 16 = 7  THEN 'web'
                WHEN o_orderkey % 32 = 11 THEN 'app'
                ELSE NULL END AS channel
    FROM orders WHERE o_orderkey % 16 IN (3, 7, 11)
    ORDER BY o_orderkey
    """,
)
def managed_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default column values (Iceberg v3 initial-default /
    write-default, spec "Default values"; reference TableMetadata
    default plumbing): a column evolved in AFTER the first append reads
    'legacy' (initial-default) for every pre-evolution row without any
    rewrite; a later append that OMITS the column gets 'web'
    (write-default) filled writer-side; an append that supplies the
    column keeps its values — explicit NULLs included (the v3
    absent-vs-null distinction).  A final bin-pack compaction rewrites
    every file, proving the defaults materialize through rewrites
    without value drift."""

    def build(cat, tname):
        t = cat.create_table(tname, "o_orderkey BIGINT, o_totalprice DOUBLE")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        t.append(o.filter("o_orderkey % 16 = 3"))  # pre-evolution
        t = cat.add_column_with_default(
            tname,
            "channel",
            "STRING",
            initial_default="legacy",
            write_default="web",
        )
        # writer omits the column entirely -> write-default fills it
        t.append(o.filter("o_orderkey % 16 = 7"))
        # writer supplies the column -> values kept, NULLs stay NULL
        t.append(
            o.filter("o_orderkey % 16 = 11").withColumn(
                "channel",
                F.when(F.col("o_orderkey") % 32 == 11, F.lit("app")),
            )
        )
        from iceberg_geo_poc_spark.table import maintenance as MT

        MT.rewrite_data_files(
            t, target_file_size=512 * 1024 * 1024, min_input_files=2
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "default_columns", build)
    return t.to_df().select("o_orderkey", "channel").orderBy("o_orderkey")


@query(
    "managed_changelog_mor",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value,
           'delete' AS change_type
    FROM events
    WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, event_type, ROUND(value, 6) AS value, 'delete'
    FROM events
    WHERE event_type <> 'error' AND value > 95.0
    ORDER BY event_id
    """,
)
def managed_changelog_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog over MERGE-ON-READ deletes: a position-delete commit
    and a deletion-vector commit both surface exact row-level 'delete'
    changes (the live-set diff path — a file-set diff would show
    nothing, since MoR commits leave data files untouched).  The second
    delete's rows exclude anything already dead, so the changelog is a
    true net history."""
    from iceberg_geo_poc_spark.streaming.incremental import changelog

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(4))
        t.delete(E.eq("event_type", "error"), mode="merge-on-read")
        t.delete(E.gt("value", 95.0), mode="merge-on-read-dv")
        return t

    t = _managed(spark, sf_dir, "cl_mor", build)
    oldest = t.meta.snapshots[0].snapshot_id
    return (
        changelog(t, from_snapshot_id=oldest)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.col("_change_type").alias("change_type"),
        )
        .orderBy("event_id")
    )


@query(
    "managed_mor_update",
    oracle="""
    SELECT event_id, event_type,
           ROUND(CASE WHEN event_type = 'view' THEN value + 1000.0 ELSE value END, 6)
             AS value
    FROM events
    """,
)
def managed_mor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE: matched rows become position deletes plus a
    new data file with the updated values; original files untouched
    (reference TestMergeOnReadUpdate)."""

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(4))
        n_before = int((t._entries().content == "data").sum())
        t.update(
            {"value": F.col("value") + 1000.0},
            where=E.eq("event_type", "view"),
            mode="merge-on-read",
        )
        ent = t._entries()
        assert (ent.content == "posdel").sum() >= 1
        # the original data files were not rewritten, only added to
        assert int((ent.content == "data").sum()) > n_before
        return t

    t = _managed(spark, sf_dir, "mor_upd", build)
    return t.to_df().select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_mor_merge",
    oracle="""
    SELECT c_custkey AS custkey,
           ROUND(CASE WHEN c_custkey % 7 = 0 THEN -1.0 ELSE c_acctbal END, 2) AS acctbal
    FROM customer
    UNION ALL
    SELECT 900000009, 9.0
    """,
)
def managed_mor_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE: matched rows position-deleted and re-added
    updated; unmatched source rows appended (TestMergeOnReadMerge)."""

    def build(cat, tname):
        t = cat.create_table(tname, "custkey BIGINT, acctbal DOUBLE")
        c = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        t.append(c.repartition(2))
        src = (
            c.filter("custkey % 7 = 0").withColumn("acctbal", F.lit(-1.0))
        ).unionByName(
            spark.createDataFrame(
                [(900000009, 9.0)], "custkey BIGINT, acctbal DOUBLE"
            )
        )
        t.merge(
            src,
            on=["custkey"],
            when_matched_update={"acctbal": F.lit(-1.0)},
            mode="merge-on-read",
        )
        assert (t._entries().content == "posdel").sum() >= 1
        return t

    t = _managed(spark, sf_dir, "mor_merge", build)
    return t.to_df().select("custkey", F.round("acctbal", 2).alias("acctbal"))


@query(
    "managed_time_travel",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def managed_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build(cat, tname):
        t = cat.create_table(tname, "o_orderkey BIGINT, o_custkey BIGINT")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        t.append(o.filter("o_orderkey % 3 = 0").repartition(2))
        t._tt_snapshot = t.current_snapshot().snapshot_id
        t.append(o.filter("o_orderkey % 3 != 0").repartition(2))
        return t

    t = _managed(spark, sf_dir, "tt", build)
    return t.scan(snapshot_id=t._tt_snapshot).to_df()


@query(
    "managed_incremental_read",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_id % 3 != 0
    """,
)
def managed_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append in 3 batches; incremental read from batch-1 snapshot must
    return exactly batches 2+3 (exactly-once union, FIXTURES F4)."""
    from iceberg_geo_poc_spark.streaming.incremental import incremental_read

    def build(cat, tname):
        t = cat.create_table(tname, "event_id BIGINT, event_type STRING")
        e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        t.append(e.filter("event_id % 3 = 0").repartition(2))
        t._inc_from = t.current_snapshot().snapshot_id
        t.append(e.filter("event_id % 3 = 1").repartition(2))
        t.append(e.filter("event_id % 3 = 2").repartition(2))
        return t

    t = _managed(spark, sf_dir, "inc", build)
    return incremental_read(t, from_snapshot_id=t._inc_from)


@query(
    "managed_changelog",
    oracle="""
    SELECT event_id, 'insert' AS _change_type
    FROM events WHERE event_id % 4 = 1
    """,
)
def managed_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_geo_poc_spark.streaming.incremental import changelog

    def build(cat, tname):
        t = cat.create_table(tname, "event_id BIGINT")
        e = load_table(spark, sf_dir, "events").select("event_id")
        t.append(e.filter("event_id % 4 = 0").repartition(2))
        t._cdc_from = t.current_snapshot().snapshot_id
        t.append(e.filter("event_id % 4 = 1").repartition(2))
        return t

    t = _managed(spark, sf_dir, "cdc", build)
    return changelog(t, from_snapshot_id=t._cdc_from).select(
        "event_id", "_change_type"
    )


@query(
    "managed_changelog_updates",
    oracle="""
    SELECT event_id, 'update_preimage' AS _change_type, ROUND(value, 6) AS value
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'update_postimage' AS _change_type, ROUND(value * 2, 6) AS value
    FROM events WHERE event_type = 'click'
    """,
)
def managed_changelog_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC with update detection: a CoW update rewrites whole files, but
    compute_updates(identifier_columns) nets out carryover rows and
    pairs changed rows as update_preimage/update_postimage (reference
    CreateChangelogViewProcedure with identifier columns)."""
    from iceberg_geo_poc_spark.streaming.incremental import (
        changelog,
        compute_updates,
    )

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(4))
        t._cdc_from = t.current_snapshot().snapshot_id
        t.update({"value": F.col("value") * 2}, where=E.eq("event_type", "click"))
        return t

    t = _managed(spark, sf_dir, "cdc_upd", build)
    diff = changelog(t, from_snapshot_id=t._cdc_from)
    return compute_updates(diff, identifier_columns=["event_id"]).select(
        "event_id", "_change_type", F.round("value", 6).alias("value")
    )


@query(
    "managed_compaction_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
    FROM events
    """,
)
def managed_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-pack compaction must preserve every row bit-for-bit."""
    from iceberg_geo_poc_spark.table.maintenance import rewrite_data_files

    def build(cat, tname):
        t = cat.create_table(
            tname, "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
        )
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        for m in range(4):
            t.append(e.filter(f"event_id % 4 = {m}").repartition(2))
        rewrite_data_files(t, target_file_size=1 << 30)
        assert t.scan().total_data_files() == 1
        return t

    t = _managed(spark, sf_dir, "compact", build)
    return t.to_df().select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "stats_fastpath_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem
    """,
)
def stats_fastpath_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/MIN/MAX answered from manifest stats only — no data files
    read (reference aggregate pushdown, SparkScanBuilder.java:202-274).
    The oracle equivalence IS the hash-match proof that the stats path
    equals full execution."""
    from iceberg_geo_poc_spark.table.stats_agg import try_stats_aggregate

    def build(cat, tname):
        t = cat.create_table(
            tname, "l_orderkey BIGINT, l_quantity DOUBLE"
        )
        l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        t.append(l.repartition(8))
        return t

    t = _managed(spark, sf_dir, "stats", build)
    vals = try_stats_aggregate(
        t, ["count(*)", "min(l_quantity)", "max(l_quantity)", "min(l_orderkey)", "max(l_orderkey)"]
    )
    assert vals is not None, "stats fast path unexpectedly bailed"
    mn, mx = float(vals[1]), float(vals[2])
    import math

    if math.isfinite(mn) and math.isfinite(mx):
        # literal SELECT: the optimizer folds it to a LocalRelation, so
        # collecting the one-row result is a driver-local read — the
        # createDataFrame path below costs ~250 ms (python RDD
        # parallelize + applySchema + a 1-task job) to ship one row,
        # ~300x the metadata aggregation it reports.  repr() is the
        # shortest exact round-trip for a double, so the CASTs rebuild
        # bit-identical values.
        return spark.sql(
            f"SELECT CAST({int(vals[0])} AS BIGINT) AS n_rows, "
            f"CAST('{mn!r}' AS DOUBLE) AS min_qty, "
            f"CAST('{mx!r}' AS DOUBLE) AS max_qty, "
            f"CAST({int(vals[3])} AS BIGINT) AS min_key, "
            f"CAST({int(vals[4])} AS BIGINT) AS max_key"
        )
    row = [(int(vals[0]), mn, mx, int(vals[3]), int(vals[4]))]
    return spark.createDataFrame(
        row,
        "n_rows BIGINT, min_qty DOUBLE, max_qty DOUBLE, min_key BIGINT, max_key BIGINT",
    )


@query(
    "managed_geo_pruned_scan",
    oracle=f"""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (CAST(l_partkey % 360 AS DOUBLE) - 180.0 + l_discount) BETWEEN 20.0 AND 80.0
      AND (CAST(l_suppkey % 180 AS DOUBLE) - 90.0 + l_tax) BETWEEN -40.0 AND 40.0
    """,
)
def managed_geo_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry table with hilbert-clustered appends; st_intersects scan
    goes through bbox file pruning + residual kernel filter, and must
    equal the coordinate-range oracle."""
    from iceberg_geo_poc_spark.geo import box
    from iceberg_geo_poc_spark.geo.functions import st_point

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_linenumber INT, geom BINARY",
            geometry_columns={"geom": "wkb"},
        )
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_partkey") % 360 - 180 + F.col("l_discount")).cast("double").alias("lon"),
            (F.col("l_suppkey") % 180 - 90 + F.col("l_tax")).cast("double").alias("lat"),
        )
        pts = l.withColumn("geom", st_point("lon", "lat")).drop("lon", "lat")
        # spatially clustered appends (hemispheres) -> prunable bboxes
        from iceberg_geo_poc_spark.geo.functions import st_xmin_udf

        west = pts.filter(st_xmin_udf(F.col("geom")) < 0)
        east = pts.filter(st_xmin_udf(F.col("geom")) >= 0)
        t.append(west.repartition(2))
        t.append(east.repartition(2))
        return t

    t = _managed(spark, sf_dir, "geo_scan", build)
    scan = t.scan(where=E.st_intersects("geom", box(20.0, -40.0, 80.0, 40.0)))
    assert len(scan.files()) < scan.total_data_files(), "bbox pruning had no effect"
    return scan.to_df().select("l_orderkey", "l_linenumber")


@query(
    "managed_date_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def managed_date_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective date-range scan over a months(l_shipdate)-partitioned
    managed table: hidden partitioning keeps each month's rows in
    month-homogeneous files, so the manifest min/max prune skips every
    out-of-range file before Spark reads a byte (the FlatParquetData
    filter-benchmark shape from BASELINE.md, clustered on the filter
    column)."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_shipdate TIMESTAMP, l_extendedprice DOUBLE",
            partition_by=[("l_shipdate", "month")],
        )
        t.append(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_shipdate", "l_extendedprice"
            )
        )
        return t

    t = _managed(spark, sf_dir, "date_scan", build)
    scan = t.scan(
        where=E.ge("l_shipdate", "1996-01-01 00:00:00.000000")
        & E.lt("l_shipdate", "1996-04-01 00:00:00.000000")
    )
    return scan.to_df().agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@query(
    "managed_encrypted_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def managed_encrypted_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT managed_date_pruned_scan shape over a Parquet-modular-
    encrypted table (PARQUET-1300): same columns, month partitioning,
    predicate, and aggregate — the only difference is the footer-key
    property routing writes through the encrypted pyarrow writer and
    scans through the decrypting Arrow read.  Bench pairs the two as
    ``encrypted_scan`` vs ``filtered_scan_managed``, so the "overhead is
    only the AES work" claim in table/parquet_crypto.py carries a
    standing measured ratio."""

    def build(cat, tname):
        from iceberg_geo_poc_spark.table import parquet_crypto as PC

        PC.register_master_key("bench_footer", bytes(range(13, 29)))
        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_shipdate TIMESTAMP, l_extendedprice DOUBLE",
            partition_by=[("l_shipdate", "month")],
            properties={"write.parquet.encryption.footer-key": "bench_footer"},
        )
        t.append(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_shipdate", "l_extendedprice"
            )
        )
        return t

    t = _managed(spark, sf_dir, "enc_date_scan", build)
    # explicit projection: the decrypting Arrow tasks sit behind
    # mapInArrow, where Catalyst cannot push column pruning — the plain
    # scan gets l_extendedprice-only reads for free, so the fair
    # same-columns comparison passes the select explicitly
    scan = t.scan(
        where=E.ge("l_shipdate", "1996-01-01 00:00:00.000000")
        & E.lt("l_shipdate", "1996-04-01 00:00:00.000000"),
        select=["l_shipdate", "l_extendedprice"],
    )
    assert len(scan.files()) < scan.total_data_files(), "month pruning had no effect"
    return scan.to_df().agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@query(
    "managed_overwrite_by_filter",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment != 'BUILDING'
    UNION ALL
    SELECT c_custkey, 'REBUILT' AS c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def managed_overwrite_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overwrite-by-filter: BUILDING rows replaced in one atomic commit
    (delete-matching + append-replacement as a single snapshot)."""

    def build(cat, tname):
        t = cat.create_table(tname, "c_custkey BIGINT, c_mktsegment STRING")
        c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        t.append(c.repartition(2))
        repl = (
            c.filter("c_mktsegment = 'BUILDING'")
            .withColumn("c_mktsegment", F.lit("REBUILT"))
        )
        t.overwrite(repl, where=E.eq("c_mktsegment", "BUILDING"))
        return t

    return _managed(spark, sf_dir, "ow_filter", build).to_df()


@query(
    "managed_wap_publish",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
)
def managed_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: a wap_id append is STAGED (invisible to
    readers), audited, then published via cherry-pick; the final state
    contains base + published rows."""

    def build(cat, tname):
        t = cat.create_table(tname, "o_orderkey BIGINT, o_custkey BIGINT")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        t.append(o.filter("o_orderkey % 3 = 0").repartition(2))
        visible_before = t.to_df().count()
        t.append(o.filter("o_orderkey % 3 = 1").repartition(2), wap_id="audit-1")
        # staged snapshot must NOT be visible pre-publish
        assert t.to_df().count() == visible_before, "WAP leak: staged rows visible"
        cat.publish_changes(tname, "audit-1")
        return cat.load_table(tname)

    return _managed(spark, sf_dir, "wap_pub", build).to_df()


@query(
    "managed_branch_write",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 4 IN (0, 1)
    """,
)
def managed_branch_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch write + fast-forward: main holds %4=0; an 'audit' branch
    receives %4=1; main is fast-forwarded to the audited branch head.
    Result = both sets on main (reference branch write + fast_forward)."""

    def build(cat, tname):
        t = cat.create_table(tname, "o_orderkey BIGINT, o_custkey BIGINT")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        t.append(o.filter("o_orderkey % 4 = 0").repartition(2))
        main_rows = t.to_df().count()
        cat.create_branch(tname, "audit")
        t = cat.load_table(tname)
        t.append(o.filter("o_orderkey % 4 = 1").repartition(2), to_branch="audit")
        # branch write must not move main
        assert t.to_df().count() == main_rows, "branch write leaked to main"
        cat.fast_forward(tname, "main", t.meta.refs["audit"]["snapshot-id"])
        return cat.load_table(tname)

    return _managed(spark, sf_dir, "branch_w", build).to_df()


@query(
    "managed_schema_evolution",
    oracle="""
    SELECT n_nationkey AS k, n_name AS val, NULL AS extra FROM nation
    WHERE n_nationkey < 13
    UNION ALL
    SELECT n_nationkey AS k, n_name AS val, n_regionkey AS extra FROM nation
    WHERE n_nationkey >= 13
    """,
)
def managed_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution by field id: rename a column, then add one; old
    files read under the new schema with NULL fill, no rewrite."""

    def build(cat, tname):
        t = cat.create_table(tname, "k BIGINT, v STRING")
        n = load_table(spark, sf_dir, "nation")
        t.append(
            n.filter("n_nationkey < 13").selectExpr("n_nationkey AS k", "n_name AS v")
        )
        cat.rename_column(tname, "v", "val")
        cat.add_columns(tname, "extra BIGINT")
        t = cat.load_table(tname)
        t.append(
            n.filter("n_nationkey >= 13").selectExpr(
                "n_nationkey AS k", "n_name AS val", "n_regionkey AS extra"
            )
        )
        return t

    return _managed(spark, sf_dir, "schema_evo", build).to_df()


@query(
    "managed_maintenance_cycle",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS compaction_reduced_files,
           TRUE AS snapshots_expired,
           TRUE AS manifests_rewritten
    FROM supplier
    """,
)
def managed_maintenance_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full maintenance cycle as a boolean contract: 8 tiny appends ->
    bin-pack compaction collapses the file count; rewrite_manifests and
    expire_snapshots shrink metadata; rows are untouched throughout."""
    from iceberg_geo_poc_spark.table.maintenance import (
        expire_snapshots,
        rewrite_data_files,
        rewrite_manifests,
    )

    def build(cat, tname):
        t = cat.create_table(tname, "s_suppkey BIGINT, s_nationkey BIGINT")
        s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        for i in range(8):
            t.append(s.filter(f"s_suppkey % 8 = {i}").coalesce(1))
        files_before = t.scan().total_data_files()
        rewrite_data_files(t)
        files_after = t.scan().total_data_files()
        n_snaps_before = len(t.meta.snapshots)
        rewrite_manifests(t)
        t.meta.properties["gc.enabled"] = "true"
        expire_snapshots(t, older_than_ms=MD_now_plus())
        t._maint = (
            files_after < files_before,
            len(t.meta.snapshots) < n_snaps_before + 1,  # expire pruned history
            True,
        )
        return t

    t = _managed(spark, sf_dir, "maint", build)
    comp, exp, man = t._maint
    return t.to_df().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(bool(comp)).alias("compaction_reduced_files"),
        F.lit(bool(exp)).alias("snapshots_expired"),
        F.lit(bool(man)).alias("manifests_rewritten"),
    )


def MD_now_plus():
    import time as _t

    return int(_t.time() * 1000) + 10_000


@query(
    "managed_runtime_filter_join",
    oracle="""
    SELECT l.l_orderkey, l.l_extendedprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey % 50 = 0
    """,
)
def managed_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime filtering (DPP analogue): the dim side's join keys are
    collected and re-prune the fact scan as an IN-set before reading
    (SupportsRuntimeV2Filtering parity); the re-planned scan must read
    fewer files AND return exactly the join's rows."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_extendedprice DOUBLE",
            partition_by=[("l_orderkey", "bucket[8]")],
        )
        t.append(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice"
            )
        )
        return t

    t = _managed(spark, sf_dir, "rtf", build)
    o = load_table(spark, sf_dir, "orders").filter(
        "o_orderpriority = '1-URGENT' AND o_orderkey % 50 = 0"
    )
    keys = [r.o_orderkey for r in o.select("o_orderkey").distinct().collect()]
    base_scan = t.scan()
    pruned = base_scan.with_runtime_filter("l_orderkey", keys)
    assert len(pruned.files()) <= base_scan.total_data_files()
    return pruned.to_df().select("l_orderkey", "l_extendedprice")


@query(
    "managed_add_files",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def managed_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_files import: existing parquet registered into a table
    without copying (manifests built from footers); scan returns the
    imported rows and footer-derived stats still prune."""
    import glob as _glob
    import os as _os
    import tempfile as _tmp

    def build(cat, tname):
        t = cat.create_table(tname, "r_regionkey BIGINT, r_name STRING")
        ext = _tmp.mkdtemp(prefix="igps_addfiles_")
        load_table(spark, sf_dir, "region").select(
            "r_regionkey", "r_name"
        ).coalesce(1).write.mode("overwrite").parquet(ext)
        paths = sorted(_glob.glob(_os.path.join(ext, "*.parquet")))
        cat.add_files(tname, paths)
        t = cat.load_table(tname)
        assert t.meta.properties.get("gc.enabled") == "false"  # imported files not owned
        return t

    return _managed(spark, sf_dir, "addf", build).to_df()


@query(
    "managed_orc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3
    """,
)
def managed_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC-format managed table: append + stats-pruned scan round-trip
    (stats harvested via one distributed aggregation — ORC has no cheap
    footer API)."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
            file_format="orc",
        )
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        for rk in range(5):
            t.append(n.filter(f"n_regionkey = {rk}").coalesce(1))
        return t

    t = _managed(spark, sf_dir, "orc_rt", build)
    scan = t.scan(where=E.lt("n_regionkey", 3))
    assert len(scan.files()) < scan.total_data_files(), "ORC stats pruning inactive"
    return scan.to_df()


_MOCK_FS_TABLES: dict = {}


@query(
    "managed_object_store_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey < 3 AND n_name <> 'FRANCE'
    ORDER BY n_nationkey
    """,
)
def managed_object_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table lifecycle on a NON-POSIX object store (pyarrow mock
    filesystem registered behind table/fileio.py): create partitioned,
    per-region appends, a merge-on-read DELETE whose position-delete
    sidecar uploads to the store, then a partition-pruned scan read back
    through the FileIO Arrow path.  Green = the whole metadata plane
    (metadata JSON + optimistic commit + manifests + delete sidecars)
    works without a filesystem — the reference's S3FileIO posture
    (aws/src/main/java/org/apache/iceberg/aws/s3/S3FileIO.java)."""
    key = (sf_dir, "objstore")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.catalog import Catalog
        from iceberg_geo_poc_spark.table.fileio import ArrowFSFileIO, register_file_io

        scheme = f"mockdrv{abs(hash(sf_dir)) % 10**6}"
        register_file_io(
            scheme + "://", ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        )
        cat = Catalog(f"{scheme}://wh", spark)
        t = cat.create_table(
            "nation_os",
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
            partition_by=[("n_regionkey", "identity")],
        )
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        for rk in range(5):
            t.append(n.filter(f"n_regionkey = {rk}").coalesce(1))
        t.delete(E.eq("n_name", "FRANCE"), mode="merge-on-read")
        _MOCK_FS_TABLES[key] = t
    t = _MOCK_FS_TABLES[key]
    scan = t.scan(where=E.lt("n_regionkey", 3))
    assert len(scan.files()) < scan.total_data_files(), (
        "object-store partition pruning inactive"
    )
    return scan.to_df().orderBy("n_nationkey")


@query(
    "managed_geometry_promotion",
    oracle=f"""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE {{lon}} BETWEEN 30.0 AND 70.0 AND {{lat}} BETWEEN -10.0 AND 40.0
    """.format(
        lon="(CAST(l_partkey % 360 AS DOUBLE) - 180.0 + l_discount)",
        lat="(CAST(l_suppkey % 180 AS DOUBLE) - 90.0 + l_tax)",
    ),
)
def managed_geometry_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET GEOMETRY FIELDS promotion: a plain binary column written
    BEFORE promotion becomes a geometry column afterwards — spatial
    predicates evaluate over old files, and post-promotion appends
    carry bbox stats for pruning."""
    from iceberg_geo_poc_spark.geo import box
    from iceberg_geo_poc_spark.geo.functions import st_point

    def build(cat, tname):
        t = cat.create_table(tname, "l_orderkey BIGINT, l_linenumber INT, g BINARY")
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_partkey") % 360 - 180 + F.col("l_discount"))
            .cast("double").alias("lon"),
            (F.col("l_suppkey") % 180 - 90 + F.col("l_tax"))
            .cast("double").alias("lat"),
        )
        t.append(
            l.withColumn("g", st_point("lon", "lat")).drop("lon", "lat").repartition(2)
        )
        cat.set_geometry_fields(tname, {"g": "wkb"})
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "geo_promo", build)
    return t.scan(
        where=E.st_intersects("g", box(30.0, -10.0, 70.0, 40.0))
    ).to_df().select("l_orderkey", "l_linenumber")


@query(
    "managed_write_ordered",
    oracle="""
    SELECT l_orderkey, l_quantity FROM lineitem
    WHERE l_quantity >= 48.0
    """,
)
def managed_write_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE DISTRIBUTED/ORDERED BY: after set_write_order(l_quantity),
    appended files are range-clustered on the order key, so a selective
    quantity predicate prunes most files (the clustering benefit the
    reference's SetWriteDistributionAndOrdering exists for)."""

    def build(cat, tname):
        t = cat.create_table(tname, "l_orderkey BIGINT, l_quantity DOUBLE")
        cat.set_write_order(tname, ["l_quantity"], distribution_mode="range")
        cat.alter_table_properties(tname, {"write.range-partitions": "8"})
        t = cat.load_table(tname)
        t.append(
            load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        )
        return t

    t = _managed(spark, sf_dir, "worder", build)
    scan = t.scan(where=E.ge("l_quantity", 48.0))
    assert len(scan.files()) < scan.total_data_files(), (
        "write-order clustering produced no pruning"
    )
    return scan.to_df()


@query(
    "managed_metadata_tables_summary",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM part) AS BIGINT) AS total_records,
           CAST(3 AS BIGINT) AS n_snapshots,
           TRUE AS files_have_stats,
           TRUE AS partitions_consistent
    FROM (SELECT 1)
    """,
)
def managed_metadata_tables_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata tables as queryable DataFrames: record counts from the
    FILES table, snapshot count from SNAPSHOTS, per-file stats presence,
    and PARTITIONS totals agreeing with FILES — aggregated to a
    deterministic contract row."""
    from iceberg_geo_poc_spark.table.metadata_tables import inspect

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "p_partkey BIGINT, p_size BIGINT",
            partition_by=[("p_partkey", "bucket[4]")],
        )
        p = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
        t.append(p.filter("p_partkey % 3 = 0"))
        t.append(p.filter("p_partkey % 3 = 1"))
        t.append(p.filter("p_partkey % 3 != 0 AND p_partkey % 3 != 1"))
        return t

    t = _managed(spark, sf_dir, "meta_tbls", build)
    files = inspect(t, "files")
    snaps = inspect(t, "snapshots")
    parts = inspect(t, "partitions")
    total = files.agg(F.sum("record_count")).first()[0]
    n_snaps = snaps.count()
    has_stats = files.filter(
        F.col("lower").isNull() | F.col("upper").isNull()
    ).count() == 0
    part_total = parts.agg(F.sum("record_count")).first()[0]
    return spark.createDataFrame(
        [(int(total), int(n_snaps), bool(has_stats), int(part_total) == int(total))],
        "total_records BIGINT, n_snapshots BIGINT, files_have_stats BOOLEAN, "
        "partitions_consistent BOOLEAN",
    )


# -- SELECT through the SQL dispatcher --------------------------------------
#
# The reference reaches SELECT (+ time travel, metadata tables) through
# its DSv2 catalog (spark/v3.5/spark/src/main/java/org/apache/iceberg/
# spark/SparkCatalog.java); the engine's dispatcher resolves the table
# references itself (table/sql.py _select) and hands the relational plan
# to spark.sql.  These queries drive that full text->prune->execute path.


def _tname(t: Table) -> str:
    import os

    return os.path.basename(t.location)


@query(
    "sql_select_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def sql_select_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual SELECT over the months(l_shipdate)-partitioned managed
    table: the dispatcher extracts the WHERE conjuncts, prunes files via
    the manifest (same plan as managed_date_pruned_scan), and delegates
    the aggregate to spark.sql."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_shipdate TIMESTAMP, l_extendedprice DOUBLE",
            partition_by=[("l_shipdate", "month")],
        )
        t.append(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_shipdate", "l_extendedprice"
            )
        )
        return t

    t = _managed(spark, sf_dir, "date_scan", build)
    return _catalog(spark).sql(
        f"SELECT COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 2) AS total "
        f"FROM {_tname(t)} "
        f"WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        f"AND l_shipdate < TIMESTAMP '1996-04-01'"
    )


@query(
    "sql_select_time_travel",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
    FROM events WHERE value < 50.0
    """,
)
def sql_select_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT ... VERSION AS OF through the dispatcher: the first
    snapshot holds only the value<50 events; the second append must be
    invisible to the pinned query."""

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        t.append(df.filter("value < 50.0").repartition(2))
        t.append(df.filter("value >= 50.0").repartition(2))
        return t

    t = _managed(spark, sf_dir, "sql_tt", build)
    first = t.snapshots()[0].snapshot_id
    return _catalog(spark).sql(
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total "
        f"FROM {_tname(t)} VERSION AS OF {first}"
    )


@query(
    "sql_select_metadata_table",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS total_records FROM part",
)
def sql_select_metadata_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT over a metadata table reference (t.files) through the
    dispatcher: summing per-file record counts must equal the source
    row count (reference MetadataTableType FILES surface)."""

    def build(cat, tname):
        t = cat.create_table(
            tname, "p_partkey BIGINT, p_name STRING, p_retailprice DOUBLE"
        )
        p = load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_name", "p_retailprice"
        )
        t.append(p.filter("p_partkey % 3 = 0"))
        t.append(p.filter("p_partkey % 3 = 1"))
        t.append(p.filter("p_partkey % 3 != 0 AND p_partkey % 3 != 1"))
        return t

    t = _managed(spark, sf_dir, "meta_tbls", build)
    return _catalog(spark).sql(
        f"SELECT CAST(SUM(record_count) AS BIGINT) AS total_records "
        f"FROM {_tname(t)}.files"
    )


@query(
    "managed_nan_pruned_scan",
    oracle="""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN 'NaN'::DOUBLE ELSE value END AS x
      FROM events)
    SELECT event_id, isnan(x) AS x_is_nan
    FROM src
    WHERE isnan(x) OR x > 99.0
    ORDER BY event_id
    """,
)
def managed_nan_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS_NAN/NOT_NAN predicate surface + nan_value_counts pruning
    (reference Expressions.java:139-151 isNaN/notNaN,
    InclusiveMetricsEvaluator.java:186-211): 'error' events get a NaN
    measure; errors and non-errors land in separate files so the scan
    can skip NaN-free files via the harvested nan counts.  The filter
    mixes is_nan with a gt comparison — under Spark's (and DuckDB's)
    NaN ordering NaN > 99.0 is also true, so pruning must keep NaN
    files for the gt disjunct too."""

    def build(cat, tname):
        t = cat.create_table(tname, "event_id BIGINT, x DOUBLE")
        df = _events_df(spark, sf_dir).select(
            "event_id",
            F.when(F.col("event_type") == "error", F.lit(float("nan")))
            .otherwise(F.col("value"))
            .alias("x"),
            "event_type",
        )
        # NaN rows isolated in their own files; two clean files
        t.append(df.filter("event_type = 'error'").select("event_id", "x").coalesce(1))
        t.append(
            df.filter("event_type != 'error' AND event_id % 2 = 0")
            .select("event_id", "x")
            .coalesce(1)
        )
        t.append(
            df.filter("event_type != 'error' AND event_id % 2 = 1")
            .select("event_id", "x")
            .coalesce(1)
        )
        return t

    t = _managed(spark, sf_dir, "nan_scan", build)
    scan = t.scan(where=E.or_(E.is_nan("x"), E.gt("x", 99.0)))
    return (
        scan.to_df()
        .select("event_id", F.isnan("x").alias("x_is_nan"))
        .orderBy("event_id")
    )


@query(
    "managed_avro_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 10 < 4 AND NOT (o_totalprice < 50000.0)
    ORDER BY o_orderkey
    """,
)
def managed_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro-format managed table round-trip (reference
    core/.../avro/Avro.java surface): appends through the pure-Python
    OCF writer (one mapInArrow job; per-file stats computed in-task),
    a stats-pruned scan through the igps_avro Python DataSource, and a
    CoW delete — all on avro data files.  The codec is interop-tested
    against the Apache Avro JVM library (tests/test_avro.py)."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
            file_format="avro",
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        for b in range(4):
            t.append(o.filter(f"o_orderkey % 10 = {b}").coalesce(1))
        t.delete(E.lt("o_totalprice", 50000.0))
        return t

    t = _managed(spark, sf_dir, "avro_rt", build)
    scan = t.scan()
    return (
        scan.to_df()
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "sql_select_join_pruned",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND c.c_acctbal > 0.0
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def sql_select_join_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textual SELECT with a JOIN through the SQL dispatcher: each
    engine-table reference resolves to a pruned scan (WHERE conjuncts
    attributed per reference by alias qualifier), views keep the
    query's aliases, and Catalyst executes the relational plan — the
    entry-point parity surface for the reference's DSv2 catalog
    (SparkCatalog.java) SELECT path."""

    def build_orders(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
            "o_orderdate TIMESTAMP"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        )
        # date-range-split appends -> orderdate-prunable files
        for flt in (
            "o_orderdate < TIMESTAMP '1997-01-01'",
            "o_orderdate >= TIMESTAMP '1997-01-01' AND "
            "o_orderdate < TIMESTAMP '1999-01-01'",
            "o_orderdate >= TIMESTAMP '1999-01-01'",
        ):
            t.append(o.filter(flt).coalesce(1))
        return t

    def build_cust(cat, tname):
        t = cat.create_table(
            tname, "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING"
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        t.append(c)
        return t

    to = _managed(spark, sf_dir, "sqlj_orders", build_orders)
    tc = _managed(spark, sf_dir, "sqlj_cust", build_cust)
    return _catalog(spark).sql(
        f"SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        f"ROUND(SUM(o.o_totalprice), 2) AS revenue "
        f"FROM {_tname(to)} o JOIN {_tname(tc)} c ON o.o_custkey = c.c_custkey "
        f"WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND c.c_acctbal > 0.0 "
        f"GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
    )


@query(
    "sql_dml_roundtrip",
    oracle="""
    WITH upd AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
      FROM events WHERE user_id % 4 = 1)
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM upd
    WHERE NOT (value < 20.0 OR event_type = 'error')
    ORDER BY event_id
    """,
)
def sql_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual DML surface end-to-end: CREATE TABLE, INSERT INTO …
    SELECT, UPDATE … SET <expr> WHERE, DELETE FROM … WHERE (with OR),
    then SELECT — every state change driven through catalog.sql, the
    statement surface the reference gets from its DSv2 catalog +
    Spark's AppendData/ReplaceData plans."""

    def build(cat, tname):
        cat.sql(
            f"CREATE TABLE {tname} "
            f"(event_id BIGINT, event_type STRING, value DOUBLE)"
        )
        # register a source view for the INSERT..SELECT (engine tables
        # resolve through the dispatcher; parquet sources via temp view)
        _events_df(spark, sf_dir).filter("user_id % 4 = 1").select(
            "event_id", "event_type", "value"
        ).createOrReplaceTempView("__dml_src")
        cat.sql(f"INSERT INTO {tname} SELECT event_id, event_type, value FROM __dml_src")
        cat.sql(f"UPDATE {tname} SET value = value * 2 WHERE event_type = 'click'")
        cat.sql(f"DELETE FROM {tname} WHERE value < 20.0 OR event_type = 'error'")
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "dml_rt", build)
    return (
        _catalog(spark)
        .sql(f"SELECT event_id, event_type, ROUND(value, 6) AS value FROM {_tname(t)}")
        .orderBy("event_id")
    )


@query(
    "managed_wap_branch_dml",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value FROM events WHERE user_id % 5 = 0
    ),
    afterdel AS (SELECT * FROM base WHERE NOT (event_type = 'error')),
    afterupd AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'click' THEN value + 1.0 ELSE value END
               AS value
      FROM afterdel
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM afterupd GROUP BY event_type ORDER BY event_type
    """,
)
def managed_wap_branch_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP-branch ROW-LEVEL DML (reference testDeleteToWapBranch family
    + the write-audit-publish pattern): with ``spark.wap.branch`` set,
    DELETE and UPDATE land on the audit branch — main is asserted
    UNTOUCHED while staged — then fast_forward publishes the branch
    head to main and the final state equals the SQL replay."""

    def build(cat, tname):
        cat.sql(
            f"CREATE TABLE {tname} "
            f"(event_id BIGINT, event_type STRING, value DOUBLE)"
        )
        _events_df(spark, sf_dir).filter("user_id % 5 = 0").select(
            "event_id", "event_type", "value"
        ).createOrReplaceTempView("__wapdml_src")
        cat.sql(f"INSERT INTO {tname} SELECT * FROM __wapdml_src")
        cat.sql(f"ALTER TABLE {tname} CREATE BRANCH audit")
        spark.conf.set("spark.wap.branch", "audit")
        try:
            cat.sql(f"DELETE FROM {tname} WHERE event_type = 'error'")
            cat.sql(
                f"UPDATE {tname} SET value = value + 1.0 "
                f"WHERE event_type = 'click'"
            )
        finally:
            spark.conf.unset("spark.wap.branch")
        t = cat.load_table(tname)
        n_main = t.to_df().count()
        n_branch = t.scan(ref="audit").to_df().count()
        assert n_branch < n_main, "staged deletes must be off-main"
        cat.fast_forward(tname, "main", t.meta.refs["audit"]["snapshot-id"])
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "wap_dml", build)
    return (
        t.to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


_JDBC_CACHE: dict = {}


@query(
    "managed_jdbc_catalog_roundtrip",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value FROM events WHERE user_id % 3 = 0
    ),
    kept AS (SELECT * FROM base WHERE NOT (event_type = 'error'))
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def managed_jdbc_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC catalog end-to-end (reference jdbc/JdbcCatalog.java over
    sqlite3): namespace + table registry in the database, THREE appends
    where the third comes from a deliberately STALE handle — its commit
    loses the metadata_location compare-and-swap once and lands via the
    standard retry (reference CommitFailedException + SnapshotProducer
    retry) — then a CoW delete and a rename, with the final read loaded
    by the post-rename name through the DB pointer."""
    if sf_dir not in _JDBC_CACHE:
        import tempfile

        from iceberg_geo_poc_spark.table.jdbc_catalog import JdbcCatalog

        # ONE catalog (one warehouse tmpdir, one commit-backend
        # registration) for the process; per-sf tables inside it —
        # a per-sf catalog would grow metadata._BACKENDS every lane
        if "_cat" not in _JDBC_CACHE:
            _JDBC_CACHE["_cat"] = JdbcCatalog(
                tempfile.mkdtemp(prefix="igps_jdbcwh_"), spark,
                catalog_name="q",
            )
            _JDBC_CACHE["_cat"].create_namespace("ns1")
        cat = _JDBC_CACHE["_cat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"ns1.events_jdbc_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 3 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        stale = cat.load_table(tname)
        t.append(df.filter("event_id % 4 = 1"))  # moves the pointer
        stale.append(df.filter("event_id % 4 = 3"))  # CAS loses, retries
        cat.load_table(tname).delete(E.eq("event_type", "error"))
        cat.rename_table(tname, f"ns1.events_final_{tag}")
        _JDBC_CACHE[sf_dir] = (cat, f"ns1.events_final_{tag}")
    cat, name = _JDBC_CACHE[sf_dir]
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_merge_schema_evolution",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderkey % 4 = 0
    ),
    src AS (
      SELECT o_orderkey AS k, o_totalprice * 2 AS price,
             o_orderpriority AS priority
      FROM orders WHERE o_orderkey % 6 = 0
    )
    SELECT COALESCE(t.k, s.k) AS o_orderkey,
           ROUND(COALESCE(s.price, t.price), 2) AS price,
           s.priority AS priority
    FROM tgt t FULL JOIN src s ON t.k = s.k
    ORDER BY o_orderkey
    """,
)
def managed_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION (reference TestMerge schema-evolution
    cases + SparkWriteConf's merge-schema handling): the source carries
    a ``priority`` column the target lacks — the dispatcher ADDs it
    (nullable add-column evolution) before the clause algebra, so
    UPDATE SET * assigns it on matched rows, INSERT * carries it on new
    rows, and rows untouched by the merge (keys % 4 = 0 but not % 6)
    read it back as NULL from their pre-evolution files."""

    def build(cat, tname):
        cat.sql(f"CREATE TABLE {tname} (o_orderkey BIGINT, price DOUBLE)")
        t = cat.load_table(tname)
        o = load_table(spark, sf_dir, "orders")
        t.append(
            o.filter("o_orderkey % 4 = 0").select(
                "o_orderkey", F.col("o_totalprice").alias("price")
            )
        )
        o.filter("o_orderkey % 6 = 0").select(
            "o_orderkey",
            (F.col("o_totalprice") * 2).alias("price"),
            F.col("o_orderpriority").alias("priority"),
        ).createOrReplaceTempView("__mse_src")
        cat.sql(
            f"MERGE WITH SCHEMA EVOLUTION INTO {tname} t "
            f"USING __mse_src s ON t.o_orderkey = s.o_orderkey "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "merge_evo", build)
    return (
        t.to_df()
        .select(
            "o_orderkey", F.round("price", 2).alias("price"), "priority"
        )
        .orderBy("o_orderkey")
    )


@query(
    "sql_delete_in_subquery",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL SELECT -1, NULL, 'X', 1.0
      UNION ALL SELECT -2, NULL, 'F', 2.0
    ),
    hot AS (
      SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 7000
    ),
    pairs AS (
      SELECT DISTINCT o_custkey AS k, 'O' AS s
      FROM orders WHERE o_custkey % 5 = 0
    ),
    keep4 AS (
      SELECT o_orderkey AS k FROM orders
      WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 = 0
    ),
    -- DELETE pred TRUE iff IN matched AND price-gate; survivors are the
    -- NOT-TRUE rows (FALSE or NULL) — EXISTS is exactly IN's TRUE set
    d1 AS (
      SELECT * FROM base b
      WHERE NOT (EXISTS (SELECT 1 FROM hot WHERE hot.k = b.o_custkey)
                 AND b.price < 150000.0)
    ),
    -- NOT IN against a subquery CONTAINING NULL is never TRUE: no-op
    d2 AS (SELECT * FROM d1),
    d3 AS (
      SELECT * FROM d2 b
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.k = b.o_custkey AND p.s = b.status)
    ),
    -- NOT IN over a null-free subquery with a never-null probe column:
    -- TRUE iff no match exists
    d4 AS (
      SELECT * FROM d3 b
      WHERE NOT (b.status = 'F'
                 AND NOT EXISTS (SELECT 1 FROM keep4 WHERE keep4.k = b.o_orderkey))
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_cust,
           ROUND(SUM(price), 2) AS total
    FROM d4 GROUP BY status ORDER BY status
    """,
)
def sql_delete_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates in textual DELETE (reference
    TestDelete.java:748-823 — testDeleteWithInSubquery,
    testDeleteWithNotInSubquery, testDeleteWithMultiColumnInSubquery;
    Spark rewrites all three to joins): the dispatcher plans each inner
    SELECT through its own SELECT path and executes via
    ``Table.delete_matching`` — IN as a left-semi join, NOT IN as the
    NULL-AWARE anti join (a NULL in the subquery makes NOT IN never
    true, statement 2 here must be a no-op), multi-column IN as a
    conjunctive pair join; plain conjuncts double as the inclusive
    file-pruning expression.  NULL target keys (two injected rows)
    must survive every IN delete."""

    def build(cat, tname):
        cat.sql(
            f"CREATE TABLE {tname} (o_orderkey BIGINT, o_custkey BIGINT, "
            f"status STRING, price DOUBLE)"
        )
        load_table(spark, sf_dir, "orders").filter("o_orderkey % 7 = 0").select(
            "o_orderkey", "o_custkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ).createOrReplaceTempView("__sqd_src")
        cat.sql(f"INSERT INTO {tname} SELECT * FROM __sqd_src")
        t = cat.load_table(tname)
        # NULL-key rows: must survive IN deletes (NULL IN (...) is NULL)
        t.append(
            spark.createDataFrame(
                [(-1, None, "X", 1.0), (-2, None, "F", 2.0)],
                "o_orderkey BIGINT, o_custkey BIGINT, status STRING, price DOUBLE",
            )
        )
        hot = cat.create_table(f"{tname}_hot", "k BIGINT")
        hot.append(
            load_table(spark, sf_dir, "customer")
            .filter("c_acctbal > 7000")
            .select(F.col("c_custkey").alias("k"))
            .distinct()
        )
        nn = cat.create_table(f"{tname}_nn", "k BIGINT")
        nn.append(spark.createDataFrame([(3,), (None,)], "k BIGINT"))
        pairs = cat.create_table(f"{tname}_pairs", "k BIGINT, s STRING")
        pairs.append(
            load_table(spark, sf_dir, "orders")
            .filter("o_custkey % 5 = 0")
            .select(F.col("o_custkey").alias("k"), F.lit("O").alias("s"))
            .distinct()
        )
        keep4 = cat.create_table(f"{tname}_keep4", "k BIGINT")
        keep4.append(
            load_table(spark, sf_dir, "orders")
            .filter("o_orderkey % 7 = 0 AND o_orderkey % 3 = 0")
            .select(F.col("o_orderkey").alias("k"))
        )
        cat.sql(
            f"DELETE FROM {tname} WHERE o_custkey IN "
            f"(SELECT k FROM {tname}_hot) AND price < 150000.0"
        )
        cat.sql(  # subquery holds a NULL -> never true -> must delete 0
            f"DELETE FROM {tname} WHERE o_orderkey NOT IN "
            f"(SELECT k FROM {tname}_nn)"
        )
        cat.sql(
            f"DELETE FROM {tname} WHERE (o_custkey, status) IN "
            f"(SELECT k, s FROM {tname}_pairs)"
        )
        cat.sql(
            f"DELETE FROM {tname} WHERE status = 'F' AND o_orderkey NOT IN "
            f"(SELECT k FROM {tname}_keep4)"
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "sqd_del", build)
    return (
        t.to_df()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_null_cust"),
            F.round(F.sum("price"), 2).alias("total"),
        )
        .orderBy("status")
    )


@query(
    "sql_update_in_subquery",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_id % 3 = 0
    ),
    vips AS (
      SELECT DISTINCT user_id AS u FROM events WHERE user_id % 11 = 0
    ),
    excl AS (
      SELECT event_id AS k FROM events WHERE event_id % 2 = 0
    ),
    u1 AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN EXISTS (SELECT 1 FROM vips WHERE vips.u = base.user_id)
                  THEN value + 1000.0 ELSE value END AS value
      FROM base
    ),
    -- NOT IN against a NULL-bearing subquery is never TRUE: no-op
    u2 AS (SELECT * FROM u1),
    u3 AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'click'
                       AND NOT EXISTS (SELECT 1 FROM excl
                                       WHERE excl.k = u2.event_id)
                  THEN value * 2.0 ELSE value END AS value
      FROM u2
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM u3 GROUP BY event_type ORDER BY event_type
    """,
)
def sql_update_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates in textual UPDATE (reference TestUpdate's
    updateWithInSubquery / updateWithNotInSubquery family): IN via
    left-semi join, NOT IN via the null-aware anti join (statement 2's
    NULL-bearing subquery must update 0 rows), executed through
    ``Table.update_matching`` — matched rows take the SET via the same
    when/otherwise rewrite as expression UPDATEs, so lineage and
    sequence-number semantics are identical."""

    def build(cat, tname):
        cat.sql(
            f"CREATE TABLE {tname} (event_id BIGINT, user_id BIGINT, "
            f"event_type STRING, value DOUBLE)"
        )
        _events_df(spark, sf_dir).filter("event_id % 3 = 0").select(
            "event_id", "user_id", "event_type", "value"
        ).createOrReplaceTempView("__squ_src")
        cat.sql(f"INSERT INTO {tname} SELECT * FROM __squ_src")
        vips = cat.create_table(f"{tname}_vips", "u BIGINT")
        vips.append(
            _events_df(spark, sf_dir)
            .filter("user_id % 11 = 0")
            .select(F.col("user_id").alias("u"))
            .distinct()
        )
        nn = cat.create_table(f"{tname}_nn", "k BIGINT")
        nn.append(spark.createDataFrame([(12,), (None,)], "k BIGINT"))
        # excl via temp view: the subquery SELECT path must accept
        # non-engine relations too (delegated to spark.sql)
        _events_df(spark, sf_dir).filter("event_id % 2 = 0").select(
            F.col("event_id").alias("k")
        ).createOrReplaceTempView("__squ_excl")
        cat.sql(
            f"UPDATE {tname} SET value = value + 1000.0 "
            f"WHERE user_id IN (SELECT u FROM {tname}_vips)"
        )
        cat.sql(  # subquery holds a NULL -> never true -> must update 0
            f"UPDATE {tname} SET value = 0.0 "
            f"WHERE event_id NOT IN (SELECT k FROM {tname}_nn)"
        )
        cat.sql(
            f"UPDATE {tname} SET value = value * 2.0 "
            f"WHERE event_type = 'click' AND event_id NOT IN "
            f"(SELECT k FROM __squ_excl)"
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "squ_upd", build)
    return (
        t.to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_partition_evolution",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY event_id
    """,
)
def managed_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution mid-table (reference ALTER TABLE …
    ADD/REPLACE PARTITION FIELD, PartitionSpec evolution): the first
    half of the data lands under days(ts) partitioning, the spec then
    gains bucket(4, user_id), and the second half lands under the new
    layout.  A ts-range scan must prune and read correctly across BOTH
    spec eras (hidden partitioning: old files keep their directories
    forever)."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING",
            partition_by=[("ts", "day")],
        )
        df = _events_df(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type"
        )
        t.append(df.filter("event_id % 2 = 0"))
        cat.alter_partition_spec(
            tname, [("ts", "day"), ("user_id", "bucket[4]")]
        )
        t = cat.load_table(tname)
        t.append(df.filter("event_id % 2 = 1"))
        return t

    t = _managed(spark, sf_dir, "part_evo", build)
    scan = t.scan(
        where=E.and_(
            E.ge("ts", "2024-01-10 00:00:00.000000"),
            E.lt("ts", "2024-01-20 00:00:00.000000"),
        )
    )
    assert len(scan.files()) < scan.total_data_files(), "date pruning inactive"
    return scan.to_df().select("event_id", "user_id", "event_type").orderBy("event_id")


# -- statistics files (Puffin analogue) --------------------------------------


@query(
    "managed_table_stats_ndv",
    oracle="""
    SELECT 'event_type' AS column_name,
           COUNT(DISTINCT event_type) AS exact_ndv,
           COUNT(*) AS n_rows, TRUE AS ndv_within_tol
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(DISTINCT user_id), COUNT(*), TRUE FROM events
    ORDER BY column_name
    """,
)
def managed_table_stats_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot statistics file with per-column NDV estimates (reference
    GenericStatisticsFile + puffin theta-sketch blobs, StandardBlobTypes
    .java:28; here Spark HLL++, table/statistics.py).  The persisted
    estimate must honor the sketch's error contract against the exact
    distinct count — the oracle pins exact NDV, row count, and the
    contract boolean."""
    from iceberg_geo_poc_spark.table import statistics as ST

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir))
        ST.compute_table_stats(t, columns=["user_id", "event_type"])
        return t

    t = _managed(spark, sf_dir, "tbl_stats", build)
    est = spark.createDataFrame(
        [
            ("event_type", int(ST.ndv(t, "event_type"))),
            ("user_id", int(ST.ndv(t, "user_id"))),
        ],
        "column_name STRING, est BIGINT",
    )
    exact = t.to_df().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("x_user_id"),
        F.count_distinct("event_type").alias("x_event_type"),
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "column_name",
            F.when(F.col("column_name") == "user_id", F.col("x_user_id"))
            .otherwise(F.col("x_event_type"))
            .alias("exact_ndv"),
            "n_rows",
            (
                F.abs(
                    F.col("est")
                    - F.when(
                        F.col("column_name") == "user_id", F.col("x_user_id")
                    ).otherwise(F.col("x_event_type"))
                )
                / F.when(
                    F.col("column_name") == "user_id", F.col("x_user_id")
                ).otherwise(F.col("x_event_type"))
                <= F.lit(0.15)
            ).alias("ndv_within_tol"),
        )
        .orderBy("column_name")
    )


@query(
    "managed_partition_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS record_count, TRUE AS files_positive
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def managed_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition statistics file computed from the manifest alone — zero
    data reads (reference GenericPartitionStatisticsFile registered via
    SetPartitionStatistics; stats derive from metadata).  Per-partition
    record counts must equal a group-by over the source rows."""
    from iceberg_geo_poc_spark.table import statistics as ST

    def build(cat, tname):
        t = cat.create_table(
            tname, _EVENTS_DDL, partition_by=[("event_type", "identity")]
        )
        t.append(_events_df(spark, sf_dir))
        ST.compute_partition_stats(t)
        return t

    t = _managed(spark, sf_dir, "part_stats", build)
    ps = ST.read_partition_stats(t)
    return ps.select(
        F.get_json_object("partition", "$.event_type").alias("event_type"),
        F.col("data_record_count").alias("record_count"),
        (F.col("data_file_count") >= F.lit(1)).alias("files_positive"),
    ).orderBy("event_type")


@query(
    "managed_scan_report",
    oracle="""
    SELECT COUNT(*) AS n_rows, TRUE AS files_accounted, TRUE AS pruned,
           TRUE AS commit_totals_match
    FROM events WHERE event_type = 'click'
    """,
)
def managed_scan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + commit metrics reports (reference core/.../metrics/
    ScanReport.java, CommitReport.java, MetricsReporter SPI;
    table/reporting.py).  One append per event_type gives per-file
    min==max string stats, so the ``event_type = 'click'`` scan must
    prune to exactly the click file; the report's accounting
    (result + skipped == total) and the commit reports' running record
    totals are returned as oracle-pinned booleans alongside the actual
    scanned row count."""
    from iceberg_geo_poc_spark.table import reporting as RPT

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        types = [r[0] for r in df.select("event_type").distinct().orderBy("event_type").collect()]
        for et in types:  # bounded: a handful of event types
            t.append(df.filter(F.col("event_type") == et).coalesce(1))
        return t

    t = _managed(spark, sf_dir, "scan_rpt", build)
    r = RPT.InMemoryMetricsReporter()
    RPT.register_metrics_reporter(t.location, r)
    try:
        scan = t.scan(where=E.eq("event_type", "click"))
        n_rows = scan.to_df().count()
        sr = r.scan_reports()[0]
    finally:
        RPT.unregister_metrics_reporter(r)
    files_accounted = (
        sr.result_data_files + sr.skipped_data_files == sr.total_data_files
    )
    # fast appends leave one delta manifest per event type, so pruning
    # now happens at the MANIFEST level: the click scan reads one
    # manifest, skips the rest unread
    pruned = sr.result_data_files == 1 and (
        sr.skipped_data_files + sr.skipped_data_manifests > 0
    )
    # commit contract: the manifest's total records (what the last
    # CommitReport.total_records reported at build time) equal the
    # actual table count
    totals = t.to_df().count()
    ent = t._entries()
    commit_totals_match = int(ent[ent.content == "data"].record_count.sum()) == totals
    return spark.createDataFrame(
        [(int(n_rows), bool(files_accounted), bool(pruned), bool(commit_totals_match))],
        "n_rows BIGINT, files_accounted BOOLEAN, pruned BOOLEAN, "
        "commit_totals_match BOOLEAN",
    )


@query(
    "managed_stats_broadcast_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def managed_stats_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics-aware join planning: the engine consults manifest
    byte/record totals (the numbers the reference reports to Spark's
    CBO via SparkScan.estimateStatistics) and broadcasts the small side
    explicitly (table/join_planning.py).  The plan is asserted to be a
    BroadcastHashJoin — no sort-merge shuffle of the fact side — and
    the result must match the plain SQL join."""
    from iceberg_geo_poc_spark.table.join_planning import stats_aware_join

    def build_cust(cat, tname):
        t = cat.create_table(tname, "c_custkey BIGINT, nationkey BIGINT, c_acctbal DOUBLE")
        t.append(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", F.col("c_nationkey").alias("nationkey"), "c_acctbal"
            )
        )
        return t

    def build_nat(cat, tname):
        t = cat.create_table(tname, "nationkey BIGINT, n_name STRING")
        t.append(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("nationkey"), "n_name"
            )
        )
        return t

    cust = _managed(spark, sf_dir, "sbj_cust", build_cust)
    nat = _managed(spark, sf_dir, "sbj_nat", build_nat)
    j = stats_aware_join(cust, nat, on="nationkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "stats-aware join did not broadcast"
    return (
        j.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "dedup_incremental_new_docs",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS h
      FROM documents
    )
    SELECT b.doc_id AS new_doc_id, MIN(a.doc_id) AS first_dup
    FROM fp b JOIN fp a ON b.h = a.h AND a.doc_id < b.doc_id
    WHERE b.doc_id >= 250
    GROUP BY b.doc_id ORDER BY new_doc_id
    """,
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: only the docs appended since the last indexed
    snapshot are checked, via incremental scan (snapshot file diff) +
    one fingerprint equi-join against the corpus (5-word-prefix hash — a stand-in for any content fingerprint: md5, simhash, minhash band).  The 100 TB shape:
    per-batch work is |new docs| x hash-join probe, never a corpus
    self-join — the composition pattern for keeping a growing corpus
    deduplicated (reference incremental scans,
    core/.../BaseIncrementalAppendScan.java, feeding the dedup
    operator family)."""
    from iceberg_geo_poc_spark.streaming.incremental import incremental_read

    def build(cat, tname):
        t = cat.create_table(tname, "doc_id BIGINT, text STRING")
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        t.append(docs.filter("doc_id < 250"))
        t.append(docs.filter("doc_id >= 250"))
        return t

    t = _managed(spark, sf_dir, "inc_dedup", build)
    first_snap = t.snapshots()[0].snapshot_id
    fp = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)))
    new = incremental_read(t, from_snapshot_id=first_snap).select(
        F.col("doc_id").alias("new_doc_id"), fp.alias("h")
    )
    corpus = t.to_df().select("doc_id", fp.alias("h"))
    return (
        new.join(corpus, "h")
        .filter(F.col("doc_id") < F.col("new_doc_id"))
        .groupBy("new_doc_id")
        .agg(F.min("doc_id").alias("first_dup"))
        .orderBy("new_doc_id")
    )


@query(
    "managed_fast_append_pruning",
    oracle="""
    SELECT event_id, user_id FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    ORDER BY event_id
    """,
)
def managed_fast_append_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast-append manifest lists under a time-range scan: daily appends
    leave one delta manifest each (reference FastAppend.java); the
    2-day scan must prune at the MANIFEST level — strictly fewer
    manifests read than the snapshot holds — and still return exactly
    the oracle's rows."""

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        days = [r[0] for r in df.selectExpr("CAST(ts AS DATE) d").distinct().orderBy("d").collect()]
        for d in days[:14]:  # bounded: two weeks of dailies
            t.append(df.filter(F.to_date("ts") == F.lit(d)).coalesce(1))
        rest = df.filter(F.to_date("ts") > F.lit(days[13])) if len(days) > 14 else None
        if rest is not None:
            t.append(rest)
        return t

    t = _managed(spark, sf_dir, "fa_daily", build)
    scan = t.scan(
        where=E.and_(
            E.ge("ts", "2024-01-10 00:00:00.000000"),
            E.lt("ts", "2024-01-12 00:00:00.000000"),
        )
    )
    scan.files()
    n_manifests = len(t.current_snapshot().manifest_list())
    kept = len(scan._kept_manifests or [])
    assert n_manifests > 10 and 0 < kept < n_manifests, (
        f"manifest-level pruning inactive: {kept}/{n_manifests}"
    )
    return scan.to_df().select("event_id", "user_id").orderBy("event_id")


@query(
    "managed_gdpr_erasure",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS no_trace_on_disk, TRUE AS history_expired
    FROM events
    WHERE user_id <> (SELECT MIN(user_id) FROM events)
    """,
)
def managed_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard erasure end-to-end (the right-to-be-forgotten composition a
    reference user runs): copy-on-write DELETE of one user's rows,
    expire_snapshots to drop the pre-delete history, remove_orphan_files
    to sweep stragglers — then PROVE erasure by re-reading every
    surviving data file raw: zero rows for the erased key anywhere on
    disk, and no snapshot left that could time-travel them back."""
    from iceberg_geo_poc_spark.table.maintenance import (
        expire_snapshots,
        remove_orphan_files,
    )

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        t.append(df.filter("event_id % 2 = 0").repartition(2))
        t.append(df.filter("event_id % 2 = 1").repartition(2))
        victim = df.agg(F.min("user_id")).collect()[0][0]
        t.delete(E.eq("user_id", int(victim)))
        expire_snapshots(t, keep_last=1)
        remove_orphan_files(t)
        t.meta.properties["__victim"] = str(int(victim))
        return t

    t = _managed(spark, sf_dir, "gdpr", build)
    victim = int(t.meta.properties["__victim"])
    n_rows = t.to_df().count()
    # raw-disk proof: read every parquet under data/ directly (bypassing
    # the table layer) and look for the erased key
    import os as _os

    raw_files = []
    for root, _d, fs in _os.walk(_os.path.join(t.location, "data")):
        raw_files += [_os.path.join(root, f) for f in fs if f.endswith(".parquet")]
    raw = spark.read.schema(_EVENTS_DDL).parquet(*raw_files)
    no_trace = raw.filter(F.col("user_id") == victim).count() == 0
    history_expired = len(t.snapshots()) == 1
    return spark.createDataFrame(
        [(int(n_rows), bool(no_trace), bool(history_expired))],
        "n_rows BIGINT, no_trace_on_disk BOOLEAN, history_expired BOOLEAN",
    )


@query(
    "managed_manifest_consolidation",
    oracle="""
    SELECT event_id, user_id FROM events
    WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def managed_manifest_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_manifests over a fast-append manifest LIST: five delta
    manifests consolidate to one (reference RewriteManifestsSparkAction)
    and the scan result is unchanged — asserted in-query, rows pinned by
    the oracle."""
    from iceberg_geo_poc_spark.table.maintenance import rewrite_manifests

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        for et in ["click", "error", "purchase", "signup", "view"]:
            t.append(df.filter(F.col("event_type") == et).coalesce(1))
        assert len(t.current_snapshot().manifest_list()) == 5
        rewrite_manifests(t)
        return t

    t = _managed(spark, sf_dir, "manifest_consol", build)
    assert len(t.current_snapshot().manifest_list()) == 1, "not consolidated"
    return (
        t.scan(where=E.eq("event_type", "purchase"))
        .to_df()
        .select("event_id", "user_id")
        .orderBy("event_id")
    )


@query(
    "managed_identifier_eq_delete",
    oracle="""
    SELECT event_id, user_id FROM events
    WHERE user_id NOT IN (SELECT user_id FROM events
                          WHERE event_type = 'error' AND value >= 98)
    ORDER BY event_id
    """,
)
def managed_identifier_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET IDENTIFIER FIELDS drives the DEFAULT equality-delete key
    (reference identifier-field-ids as the default equality delete
    columns): deleting by a keys frame with extra columns uses only the
    identifier column, removing every event of the matched users."""

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        t.append(_events_df(spark, sf_dir).repartition(2))
        cat.set_identifier_fields(tname, ["user_id"])
        t = cat.load_table(tname)
        bad_users = (
            _events_df(spark, sf_dir)
            .filter("event_type = 'error' AND value >= 98")
            .select("user_id", "event_id")  # extra column: identifiers win
            .distinct()
        )
        t.delete_by_keys(bad_users.select("user_id"))
        return t

    t = _managed(spark, sf_dir, "ident_eqdel", build)
    return t.to_df().select("event_id", "user_id").orderBy("event_id")


@query(
    "stats_fastpath_filtered_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events WHERE event_type = 'click'
    """,
)
def stats_fastpath_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED aggregate answered from manifest stats alone: per-type
    appends make ``event_type = 'click'`` resolve at file granularity
    (every kept file strict-matches), so COUNT/MIN/MAX come from the
    manifest without touching data (reference filter pushdown +
    pushAggregation over the residual-free pruned scan).  Bails (and
    would fail the in-query assert) if any file only partially
    matched."""
    from iceberg_geo_poc_spark.table.stats_agg import try_stats_aggregate

    def build(cat, tname):
        t = cat.create_table(tname, _EVENTS_DDL)
        df = _events_df(spark, sf_dir)
        types = [
            r[0]
            for r in df.select("event_type").distinct().orderBy("event_type").collect()
        ]
        for et in types:
            t.append(df.filter(F.col("event_type") == et).coalesce(1))
        return t

    t = _managed(spark, sf_dir, "scan_rpt", build)  # shares the per-type recipe
    vals = try_stats_aggregate(
        t,
        ["count(*)", "min(event_id)", "max(event_id)"],
        where=E.eq("event_type", "click"),
    )
    assert vals is not None, "filtered stats fast path bailed"
    return spark.createDataFrame(
        [(int(vals[0]), int(vals[1]), int(vals[2]))],
        "n_clicks BIGINT, min_id BIGINT, max_id BIGINT",
    )


@query(
    "managed_avro_mor_delete",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 10 >= 7 AND NOT (o_orderstatus = 'F')
    ORDER BY o_orderkey
    """,
)
def managed_avro_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read POSITION deletes on an AVRO table: the igps_avro
    reader synthesizes (__file_path, __pos) during its sequential
    decode, so row-delta deletes work on avro data files (the reference
    position-delete path is parquet-row-index based; the Python
    DataSource generalizes it).  Oracle pins the surviving rows."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
            file_format="avro",
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).filter("o_orderkey % 10 >= 7")
        t.append(o.coalesce(2))
        t.delete(E.eq("o_orderstatus", "F"), mode="merge-on-read")
        return t

    t = _managed(spark, sf_dir, "avro_mor", build)
    return t.to_df().select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    ).orderBy("o_orderkey")


@query(
    "managed_encrypted_roundtrip",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_custkey % 10 < 3 AND c_mktsegment <> 'BUILDING'
    ORDER BY c_custkey
    """,
)
def managed_encrypted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-GCM encrypted table (table/encryption.py): every
    metadata-plane object — metadata JSON, manifests, MoR delete
    sidecars — is sealed with AES-256-GCM behind the FileIO seam on a
    non-POSIX store, and the query runs the full lifecycle through the
    ciphertext: create, append, merge-on-read DELETE, read back.  The
    query also asserts the raw stored bytes are sealed envelopes (no
    plaintext metadata at rest) — the reference's EncryptionManager
    posture (core/src/main/java/org/apache/iceberg/encryption/
    Ciphers.java, AesGcmInputFile.java)."""
    key = (sf_dir, "encrypted")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.encryption import EncryptingFileIO
        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )

        scheme = f"encdrv{abs(hash(sf_dir)) % 10**6}"
        inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        register_file_io(
            scheme + "://",
            EncryptingFileIO(inner, b"\x13\x37" * 16, aad_prefix=b"tbl"),
        )
        cat = Catalog(f"{scheme}://wh", spark)
        t = cat.create_table(
            "customer_enc",
            "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE",
        )
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        ).filter("c_custkey % 10 < 3")
        t.append(c.coalesce(2))
        t.delete(E.eq("c_mktsegment", "BUILDING"), mode="merge-on-read")
        # nothing at rest is plaintext: every metadata object is sealed
        sealed = [
            p
            for p in inner.list_files(f"{scheme}://wh/customer_enc")
            if "/metadata/" in p
        ]
        assert sealed, "no metadata objects found on the encrypted store"
        for p in sealed:
            raw = inner.read_bytes(p)
            assert raw[:4] == b"AGSP" and b"snapshot" not in raw
        _MOCK_FS_TABLES[key] = cat.load_table("customer_enc")
    t = _MOCK_FS_TABLES[key]
    return t.to_df().select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    ).orderBy("c_custkey")


@query(
    "managed_rewrite_table_path",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_orderkey % 5 = 0 AND l_quantity > 10
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def managed_rewrite_table_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table relocation with absolute-path rewriting (reference
    RewriteTablePathSparkAction — DR replication / bucket migration):
    a managed table with a position-delete layer is relocated to a NEW
    location — manifests, posdel parquet CONTENTS (their file_path
    column), and metadata rewritten; data files byte-copied per the
    returned plan — and the query runs against the REGISTERED COPY,
    which must reproduce plain SQL exactly (MoR deletes still applying
    through the rewritten posdel paths).  The source tree could be
    deleted afterwards; nothing in the copy references it."""
    import json as _json
    import os as _os
    import tempfile

    def build(cat, tname):
        from iceberg_geo_poc_spark.table import maintenance as X
        from iceberg_geo_poc_spark.table import manifest as _M

        t = cat.create_table(
            tname,
            "l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
            "l_returnflag STRING, l_linestatus STRING",
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus",
        ).filter("l_orderkey % 5 = 0")
        t.append(li.coalesce(2))
        t.delete(E.le("l_quantity", 10.0), mode="merge-on-read")
        t = cat.load_table(tname)
        tgt = tempfile.mkdtemp(prefix="igps_reloc_")
        _os.rmdir(tgt)
        res = X.rewrite_table_path(t, tgt)
        assert res["copied"] == len(res["plan"]) > 0
        moved = cat.register_table(tname + "_moved", tgt)
        # nothing in the copy references the source location
        src = t.location.rstrip("/")
        for s in moved.meta.snapshots:
            ent = _M.read_snapshot_entries(moved.location, s)
            assert not any(
                p.startswith(src + "/") for p in ent.file_path
            ), "relocated metadata still references the source tree"
        return moved

    t = _managed(spark, sf_dir, "reloc", build)
    return (
        t.to_df()
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "managed_encrypted_dv_stream",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey % 7 = 0 AND o_totalprice >= 50000
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def managed_encrypted_dv_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNKED AES-GCM streams + deletion vectors on an encrypted table
    (reference core/.../encryption/AesGcmInputFile.java, the Iceberg
    gcm-stream format): objects above the FileIO's stream threshold are
    sealed as fixed-size GCM blocks with index-bound AAD, so the DV
    scan's Puffin blob reads decrypt ONLY the blocks covering each
    blob's (offset, length) slice — the seekable-read path a 100 MB
    encrypted sidecar needs — instead of whole-object decrypts.  The
    query runs create → append → DV delete → scan entirely through the
    sealed store, asserts the manifests/sidecars really are in the
    chunked form at rest, and must reproduce plain SQL exactly."""
    key = (sf_dir, "encrypted_dv")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.encryption import EncryptingFileIO
        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )

        scheme = f"encdv{abs(hash(sf_dir)) % 10**6}"
        inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        register_file_io(
            scheme + "://",
            EncryptingFileIO(
                inner,
                b"\x42\x17" * 16,
                aad_prefix=b"dvt",
                # zero threshold + small blocks: EVERY object takes the
                # stream form at any SF (sf0.001 sidecars are <512 B),
                # and sf0.01 manifests genuinely span multiple blocks
                stream_threshold=0,
                stream_block=4096,
            ),
        )
        cat = Catalog(f"{scheme}://wh", spark)
        t = cat.create_table(
            "orders_encdv",
            "o_orderkey BIGINT, o_orderstatus STRING, "
            "o_orderpriority STRING, o_totalprice DOUBLE",
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        ).filter("o_orderkey % 7 = 0")
        t.append(o.coalesce(2))
        t.delete(E.lt("o_totalprice", 50000.0), mode="merge-on-read-dv")
        # stream form at rest: manifests + DV sidecars are chunked
        stored = inner.list_files(f"{scheme}://wh/orders_encdv")
        sidecars = [p for p in stored if p.endswith(".puffin")]
        assert sidecars, "expected a DV Puffin sidecar"
        for p in sidecars:
            assert inner.read_bytes(p)[:4] == b"AGS1", "sidecar not chunked"
        _MOCK_FS_TABLES[key] = cat.load_table("orders_encdv")
    t = _MOCK_FS_TABLES[key]
    return (
        t.to_df()
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "managed_sketch_join_estimate",
    oracle="""
    WITH l AS (SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0),
    r AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0),
    s AS (SELECT
      (SELECT COUNT(*) FROM l) AS n_l,
      (SELECT COUNT(*) FROM r) AS n_r,
      (SELECT COUNT(DISTINCT k) FROM l) AS ndv_l,
      (SELECT COUNT(DISTINCT k) FROM r) AS ndv_r,
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT k FROM l INTERSECT SELECT DISTINCT k FROM r)) AS common,
      (SELECT COUNT(*) FROM l JOIN r USING (k)) AS actual)
    SELECT CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
           CAST(ndv_l AS BIGINT) AS ndv_left, CAST(ndv_r AS BIGINT) AS ndv_right,
           CAST(common AS BIGINT) AS common_keys,
           ROUND(n_l * 1.0 / ndv_l * n_r / ndv_r * common, 2) AS predicted_rows,
           CAST(actual AS BIGINT) AS actual_rows
    FROM s
    """,
)
def managed_sketch_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven join-cardinality estimation (the CBO input the
    reference feeds Spark through SetStatistics NDVs, upgraded by theta
    INTERSECTION — table/join_planning.py::estimate_join_cardinality):
    two managed tables register theta sketches on their join key; the
    planner's ndv / common-key / predicted-row numbers must equal the
    EXACT SQL aggregates (below-k sketches are exact, and intersection
    of exact sketches is exact), pinning that the estimator's inputs —
    not just its formula — are faithful.  actual_rows is returned
    alongside so the driver row also witnesses the true join size the
    estimate is for."""
    from iceberg_geo_poc_spark.table import join_planning as JP
    from iceberg_geo_poc_spark.table import statistics as ST

    def build(cat, tname):
        l = cat.create_table(tname, "k BIGINT")
        l.append(
            load_table(spark, sf_dir, "orders")
            .filter("o_orderkey % 3 = 0")
            .select(F.col("o_custkey").alias("k"))
        )
        r = cat.create_table(tname + "_r", "k BIGINT")
        r.append(
            load_table(spark, sf_dir, "customer")
            .filter("c_custkey % 2 = 0")
            .select(F.col("c_custkey").alias("k"))
        )
        ST.compute_table_stats(
            cat.load_table(tname), columns=["k"],
            with_sketches=True, sketch_k=65536,
        )
        ST.compute_table_stats(
            cat.load_table(tname + "_r"), columns=["k"],
            with_sketches=True, sketch_k=65536,
        )
        return cat.load_table(tname)

    l = _managed(spark, sf_dir, "sketch_join", build)
    # the right table lives beside the left in the managed catalog dir
    from iceberg_geo_poc_spark.table import metadata as MD

    rt = type(l)(MD.read_metadata(l.location + "_r"), spark)
    est = JP.estimate_join_cardinality(l, rt, "k")
    assert est is not None and est["exact"], "sketches must be exact here"
    actual = l.to_df().join(rt.to_df(), "k").count()
    return spark.createDataFrame(
        [
            (
                JP.estimate_row_count(l),
                JP.estimate_row_count(rt),
                int(est["ndv_left"]),
                int(est["ndv_right"]),
                int(est["common_keys"]),
                round(est["rows"], 2),
                actual,
            )
        ],
        "n_left BIGINT, n_right BIGINT, ndv_left BIGINT, ndv_right BIGINT, "
        "common_keys BIGINT, predicted_rows DOUBLE, actual_rows BIGINT",
    )


@query(
    "managed_datasource_write_roundtrip",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p_retailprice), 2) AS total_price
    FROM part WHERE p_size <= 25
    GROUP BY 1 ORDER BY 1
    """,
)
def managed_datasource_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource WRITE path (the DSv2 SparkWrite.asBatchAppend
    analogue, spark/.../source/SparkWrite.java): part flows in through
    ``df.write.format("iceberg_geo_poc").save()`` — executors stream
    Arrow batches into parquet + per-file stats, the driver commits a
    fast-append WITHOUT a SparkSession (the append commit loop is pure
    metadata) — then half the rows are appended in a second write, and
    the result is read back through BOTH entry points (the engine scan
    with a pruning predicate, and ``spark.read.format(...)``) which
    must agree with each other and with plain SQL."""
    from iceberg_geo_poc_spark.streaming.datasource import TableDataSource

    def build(cat, tname):
        spark.dataSource.register(TableDataSource)
        t = cat.create_table(
            tname,
            "p_partkey BIGINT, p_brand STRING, p_size BIGINT, "
            "p_retailprice DOUBLE",
        )
        part = load_table(spark, sf_dir, "part").select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("long").alias("p_size"),
            "p_retailprice",
        )
        for half in (0, 1):
            (
                part.filter(F.col("p_partkey") % 2 == half)
                .repartitionByRange(2, "p_size")
                .write.format("iceberg_geo_poc")
                .option("location", t.location)
                .mode("append")
                .save()
            )
        t = cat.load_table(tname)
        assert len(t.meta.snapshots) == 2
        assert t.meta.snapshots[-1].summary.get("writer") == "datasource"
        # both read entry points agree on the count
        via_ds = (
            spark.read.format("iceberg_geo_poc")
            .option("location", t.location)
            .load()
            .count()
        )
        assert via_ds == t.to_df().count()
        return t

    t = _managed(spark, sf_dir, "ds_write", build)
    scan = t.scan(where=E.le("p_size", 25))
    assert len(scan.files()) < scan.total_data_files(), "size scan did not prune"
    return (
        scan.to_df()
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
        .orderBy("p_brand")
    )


@query(
    "managed_theta_sketch_ndv",
    oracle="""
    SELECT 'o_custkey' AS col, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
           true AS exact FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           true FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           true FROM orders
    ORDER BY col
    """,
)
def managed_theta_sketch_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE theta/KMV NDV sketches (table/theta.py; the reference
    persists apache-datasketches-theta-v1 blobs via
    ComputeTableStatsSparkAction): per-column sketches are built with
    one codegen hash pass + per-partition k-smallest reduction, stored
    as blobs in the snapshot's Puffin statistics file, and read back.
    Below k the sketch is EXACT, so the oracle pins COUNT(DISTINCT)
    equality; the query also proves the union law inline — sketches of
    the two table halves merged equal the whole-table sketch (the
    property the theta family exists for: stats compose without
    re-reading data)."""
    from iceberg_geo_poc_spark.table import statistics as ST
    from iceberg_geo_poc_spark.table import theta as TH

    def build(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_custkey BIGINT, "
            "o_orderstatus STRING, o_orderpriority STRING"
        )
        t.append(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
            ).repartition(4)
        )
        t = cat.load_table(tname)
        ST.compute_table_stats(
            t,
            columns=["o_custkey", "o_orderstatus", "o_orderpriority"],
            with_sketches=True,
            sketch_k=65536,
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "theta_ndv", build)
    rows = []
    df = t.to_df()
    for c in ["o_custkey", "o_orderpriority", "o_orderstatus"]:
        sk = ST.theta_sketch(t, c)
        assert sk is not None and sk.is_exact, f"sketch for {c} not exact"
        # union law: half-sketches merge to the whole
        s1 = TH.column_sketch(df.filter("o_orderkey % 2 = 0"), c, k=65536)
        s2 = TH.column_sketch(df.filter("o_orderkey % 2 = 1"), c, k=65536)
        assert s1.union(s2).estimate() == sk.estimate(), f"union law broke for {c}"
        rows.append((c, int(sk.estimate()), bool(sk.is_exact)))
    return spark.createDataFrame(
        rows, "col STRING, ndv BIGINT, exact BOOLEAN"
    ).orderBy("col")


@query(
    "managed_encrypted_key_rotation",
    oracle="""
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def managed_encrypted_key_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encryption key rotation (the operational seam behind the
    reference's KeyManagementClient): a sealed table's entire object
    tree is re-sealed under a NEW key (idempotent, resumable pass),
    the old key stops opening any object, and appends + scans continue
    through the rotated plane — results must equal plain SQL."""
    key = (sf_dir, "rotated")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.encryption import (
            AesGcm,
            EncryptingFileIO,
            rotate_encryption_key,
        )
        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )

        scheme = f"rotdrv{abs(hash(sf_dir)) % 10**6}"
        wh = f"{scheme}://wh"
        inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        old_key, new_key = b"\x01\x02" * 16, b"\x0a\x0b" * 16
        register_file_io(wh + "/", EncryptingFileIO(inner, old_key))
        cat = Catalog(wh, spark)
        t = cat.create_table(
            "nation_rot", "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
        )
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        t.append(n.filter("n_nationkey < 13"))
        rotate_encryption_key(wh + "/", new_key)
        # the old key opens nothing anymore
        old_gcm = AesGcm(old_key)
        for p in inner.list_files(f"{wh}/nation_rot"):
            raw = inner.read_bytes(p)
            if raw[:4] == b"AGSP":
                try:
                    old_gcm.open(raw)
                    raise AssertionError(f"old key still opens {p}")
                except ValueError:
                    pass
        # post-rotation append seals under the new key; scan sees both
        cat.load_table("nation_rot").append(n.filter("n_nationkey >= 13"))
        _MOCK_FS_TABLES[key] = cat.load_table("nation_rot")
    t = _MOCK_FS_TABLES[key]
    return (
        t.to_df()
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "rest_catalog_lifecycle",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def rest_catalog_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-service lifecycle end-to-end (table/rest_catalog.py
    RestCatalog): config negotiation (server overrides win), bearer
    auth, nested namespace creation, table create + append with the
    service as the ONLY metadata authority, then a second client
    loading the same table through the service registry and
    aggregating it.  Mirrors the reference RESTSessionCatalog flow
    (core/src/main/java/org/apache/iceberg/rest/RESTSessionCatalog.java)."""
    key = (sf_dir, "restcat")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )
        from iceberg_geo_poc_spark.table.rest_catalog import (
            CatalogService,
            RestCatalog,
        )

        scheme = f"restdrv{abs(hash(sf_dir)) % 10**6}"
        wh = f"{scheme}://wh"
        register_file_io(
            wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        )
        svc = CatalogService(
            defaults={"write.metadata.compression": "none"},
            overrides={"commit.retry.num-retries": "5"},
            token="drv-token",
        )
        cat = RestCatalog(svc.handle, spark, warehouse=wh, token="drv-token")
        assert cat.properties["commit.retry.num-retries"] == "5"
        cat.create_namespace("prod")
        cat.create_namespace("prod.tpch")
        t = cat.create_table(
            "prod.tpch.supplier",
            "s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE",
        )
        s = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey", "s_acctbal"
        )
        t.append(s.coalesce(2))
        assert cat.list_tables("prod.tpch") == ["supplier"]
        # a second client sees the same catalog through the service
        reader = RestCatalog(svc.handle, spark, warehouse=wh, token="drv-token")
        _MOCK_FS_TABLES[key] = reader.load_table("prod.tpch.supplier")
    t = _MOCK_FS_TABLES[key]
    return (
        t.to_df()
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "managed_merge_insert_values",
    oracle="""
    WITH src AS (
      SELECT s_suppkey + CASE WHEN s_suppkey % 4 = 0 THEN 0 ELSE 500000 END
               AS value,
             ROUND(s_acctbal + 100, 2) AS newbal
      FROM supplier WHERE s_suppkey % 2 = 0
    ),
    tgt AS (
      SELECT s_suppkey AS id, ROUND(s_acctbal, 2) AS bal, 'base' AS tag
      FROM supplier
    )
    SELECT t.id, CASE WHEN s.value IS NOT NULL THEN s.newbal ELSE t.bal END
             AS bal,
           CASE WHEN s.value IS NOT NULL THEN 'merged' ELSE t.tag END AS tag
    FROM tgt t LEFT JOIN src s ON t.id = s.value
    UNION ALL
    SELECT s.value AS id, s.newbal AS bal, 'inserted' AS tag
    FROM src s LEFT JOIN tgt t ON t.id = s.value
    WHERE t.id IS NULL
    ORDER BY id
    """,
)
def managed_merge_insert_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with DIFFERENTLY-NAMED join keys (``ON t.id == s.value`` —
    the reference TestMerge by-source tests' join shape) and the
    explicit ``INSERT (cols) VALUES (exprs)`` form (its dominant insert
    spelling), driven through the SQL dispatcher; update, pass-through
    and the value-mapped insert are all replayed by the oracle."""

    def build(cat, tname):
        t = cat.create_table(tname, "id BIGINT, bal DOUBLE, tag STRING")
        sup = load_table(spark, sf_dir, "supplier")
        t.append(
            sup.select(
                F.col("s_suppkey").alias("id"),
                F.round("s_acctbal", 2).alias("bal"),
                F.lit("base").alias("tag"),
            )
        )
        sup.filter("s_suppkey % 2 = 0").select(
            (
                F.col("s_suppkey")
                + F.when(F.col("s_suppkey") % 4 == 0, 0).otherwise(500000)
            ).alias("value"),
            F.round(F.col("s_acctbal") + 100, 2).alias("newbal"),
        ).createOrReplaceTempView("merge_iv_src")
        cat.sql(
            f"MERGE INTO {tname} t USING merge_iv_src s ON t.id == s.value "
            "WHEN MATCHED THEN UPDATE SET bal = s.newbal, tag = 'merged' "
            "WHEN NOT MATCHED THEN "
            "INSERT (id, bal, tag) VALUES (s.value, s.newbal, 'inserted')"
        )
        # the SQL dispatcher commits through ITS OWN table handle —
        # reload so the returned handle sees the merged snapshot
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "merge_iv", build)
    return (
        t.to_df()
        .select("id", F.round("bal", 2).alias("bal"), "tag")
        .orderBy("id")
    )


@query(
    "rest_metrics_report",
    oracle="""
    WITH lo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                WHERE n_regionkey < 2),
         hi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                WHERE n_regionkey >= 2)
    SELECT 'commit-report' AS report_type, 1 AS n_files,
           0 AS n_pruned, (SELECT n FROM lo) AS n_records
    UNION ALL
    SELECT 'commit-report', 1, 0, (SELECT n FROM hi)
    UNION ALL
    SELECT 'scan-report', 1, 1, 0
    ORDER BY report_type, n_records
    """,
)
def rest_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST metrics reporting end-to-end (reference
    RESTSessionCatalog.java:407,421 + RESTMetricsReporter.java +
    requests/ReportMetricsRequest.java): a table created and loaded
    through the REST catalog POSTs its CommitReports (one per append,
    with file/record counts the oracle derives from the source parquet)
    and ScanReports (the pruned scan shape: two files, one skipped by
    stats) to the service's /metrics endpoint; the query re-reads them
    FROM THE SERVICE, so the wire path itself is value-verified."""
    key = (sf_dir, "restmetrics")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )
        from iceberg_geo_poc_spark.table.rest_catalog import (
            CatalogService,
            RestCatalog,
        )

        scheme = f"restmet{abs(hash(sf_dir)) % 10**6}"
        wh = f"{scheme}://wh"
        register_file_io(wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme))
        svc = CatalogService(token="met-token")
        cat = RestCatalog(svc.handle, spark, warehouse=wh, token="met-token")
        cat.create_namespace("obs")
        t = cat.create_table(
            "obs.nation", "n_nationkey BIGINT, n_regionkey BIGINT, n_name STRING"
        )
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_regionkey", "n_name"
        )
        # two appends -> two commit reports and two data files with
        # disjoint n_regionkey ranges (so the scan below prunes one)
        t.append(n.filter("n_regionkey < 2").coalesce(1))
        t = cat.load_table("obs.nation")
        t.append(n.filter("n_regionkey >= 2").coalesce(1))
        # one stats-pruned scan -> one scan report (1 result, 1 skipped)
        reader = cat.load_table("obs.nation")
        assert reader.scan(E.eq("n_regionkey", 0)).to_df().count() > 0
        rows = []
        for m in svc.metrics_reports():
            assert m["namespace"] == "obs" and m["name"] == "nation"
            body = m["report"]
            if m["report-type"] == "commit-report":
                rows.append(
                    (
                        "commit-report",
                        int(body["added_data_files"]),
                        0,
                        int(body["added_records"]),
                    )
                )
            else:
                # pruning may happen at FILE level (stats) or a whole
                # MANIFEST earlier (FastAppend manifest bounds) — both
                # are "files the scan never touched"
                rows.append(
                    (
                        "scan-report",
                        int(body["result_data_files"]),
                        int(body["skipped_data_files"])
                        + int(body["skipped_data_manifests"]),
                        0,
                    )
                )
        _MOCK_FS_TABLES[key] = rows
    return spark.createDataFrame(
        _MOCK_FS_TABLES[key],
        "report_type STRING, n_files BIGINT, n_pruned BIGINT, n_records BIGINT",
    ).orderBy("report_type", "n_records")


@query(
    "managed_posdelete_compaction",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 8 = 3 AND o_orderstatus <> 'F'
      AND o_totalprice <= 150000.0
    ORDER BY o_orderkey
    """,
)
def managed_posdelete_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_position_delete_files end-to-end (reference
    RewritePositionDeleteFilesSparkAction.java): two merge-on-read
    DELETEs leave two position-delete files; compaction rewrites them
    into ONE (asserted from the manifest), and the surviving rows are
    unchanged — the oracle pins them from the source parquet."""
    from iceberg_geo_poc_spark.table.maintenance import (
        rewrite_position_delete_files,
    )

    def build(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).filter("o_orderkey % 8 = 3")
        t.append(o.coalesce(2))
        t.delete(E.eq("o_orderstatus", "F"), mode="merge-on-read")
        t.delete(E.gt("o_totalprice", 150000.0), mode="merge-on-read")
        entries = t._entries()
        n_before = int((entries.content == "posdel").sum())
        assert n_before >= 2, f"expected >=2 delete files, got {n_before}"
        rewrite_position_delete_files(t)
        t = cat.load_table(tname)
        entries = t._entries()
        n_after = int((entries.content == "posdel").sum())
        assert n_after == 1, f"compaction left {n_after} delete files"
        return t

    t = _managed(spark, sf_dir, "posdel_compact", build)
    return t.to_df().select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    ).orderBy("o_orderkey")


@query(
    "managed_dv_delete",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 8 = 5 AND o_orderstatus <> 'F'
      AND o_totalprice <= 140000.0
    ORDER BY o_orderkey
    """,
)
def managed_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion vectors end-to-end (Iceberg v3 DV semantics; supersedes
    the v2 posdel path of reference data/.../DeleteFilter.java:160-233):
    two merge-on-read DELETEs leave position-delete parquet;
    convert_position_deletes_to_dvs replaces them with roaring-bitmap
    blobs in ONE Puffin sidecar; a DIRECT DV-mode delete then merges a
    further predicate into the existing vectors (one blob per data file
    asserted from the manifest), and the DV-filtered scan returns
    exactly the rows the oracle pins from the source parquet."""
    import json as _json

    from iceberg_geo_poc_spark.table.maintenance import (
        convert_position_deletes_to_dvs,
    )

    def build(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).filter("o_orderkey % 8 = 5")
        t.append(o.coalesce(2))
        t.delete(E.eq("o_orderstatus", "F"), mode="merge-on-read")
        t.delete(E.gt("o_totalprice", 150000.0), mode="merge-on-read")
        res = convert_position_deletes_to_dvs(t)
        t = cat.load_table(tname)
        entries = t._entries()
        assert int((entries.content == "posdel").sum()) == 0
        n_dv = int((entries.content == "dv").sum())
        assert n_dv == res["dv_blobs"] >= 1, f"expected dv entries, got {n_dv}"
        # direct v3-style write: merges with the converted DVs in-commit
        t.delete(E.gt("o_totalprice", 140000.0), mode="merge-on-read-dv")
        t = cat.load_table(tname)
        dv_ent = t._entries()
        dv_ent = dv_ent[dv_ent.content == "dv"]
        refs = [_json.loads(r.dv)["referenced"] for r in dv_ent.itertuples()]
        assert len(refs) == len(set(refs)), "one DV per data file"
        return t

    t = _managed(spark, sf_dir, "dv_delete", build)
    return t.to_df().select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    ).orderBy("o_orderkey")


@query(
    "managed_snapshot_lineage",
    oracle="""
    WITH base AS (SELECT COUNT(*) AS c FROM nation WHERE n_regionkey = 0),
    s2 AS (SELECT COUNT(*) AS c FROM nation WHERE n_regionkey <= 1),
    s3 AS (SELECT COUNT(*) AS c FROM nation WHERE n_regionkey <= 2)
    SELECT 0 AS ordinal, CAST(c AS BIGINT) AS n_rows FROM base
    UNION ALL SELECT 1, CAST(c AS BIGINT) FROM s2
    UNION ALL SELECT 2, CAST(c AS BIGINT) FROM s3
    ORDER BY ordinal
    """,
)
def managed_snapshot_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ancestors_of lineage walk (reference AncestorsOfProcedure.java):
    three appends form a snapshot chain; the query walks the ancestor
    list oldest-to-newest and time-travels to each, so the per-ancestor
    row counts prove both the lineage order and snapshot isolation."""

    def build(cat, tname):
        t = cat.create_table(tname, "n_nationkey BIGINT, n_regionkey BIGINT")
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_regionkey"
        )
        for rk in range(3):
            t.append(n.filter(f"n_regionkey = {rk}").coalesce(1))
            t = cat.load_table(tname)
        return t

    t = _managed(spark, sf_dir, "lineage", build)
    cat = _catalog(spark)
    tname = t.meta.location.rsplit("/", 1)[-1]
    chain = cat.ancestors_of(tname)
    assert len(chain) == 3, f"expected 3 ancestors, got {len(chain)}"
    ordered = sorted(chain, key=lambda s: s.sequence_number)
    rows = [
        (i, t.to_df(snapshot_id=s.snapshot_id).count())
        for i, s in enumerate(ordered)
    ]
    return spark.createDataFrame(rows, "ordinal INT, n_rows BIGINT")


@query(
    "managed_geo_encodings_scan",
    oracle="""
    WITH pts AS (
      SELECT (CAST(l_partkey % 360 AS DOUBLE) - 180.0 + l_discount) AS lon,
             (CAST(l_suppkey % 180 AS DOUBLE) - 90.0 + l_tax) AS lat
      FROM lineitem WHERE l_orderkey % 20 = 7),
    hits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts
      WHERE lon BETWEEN 20.0 AND 80.0 AND lat BETWEEN -15.0 AND 45.0)
    SELECT enc, n AS n_matched, TRUE AS pruned
    FROM (VALUES ('ewkb'), ('geojson'), ('wkb'), ('wkt')) v(enc), hits
    ORDER BY enc
    """,
)
def managed_geo_encodings_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All FOUR geometry encodings end-to-end (reference
    TestGeometryReadersAndWriters.java:75-78 parameterization): the same
    point set is written into four managed tables — ewkb/wkb (binary
    physical type) and wkt/geojson (string physical type) — each scanned
    with the same st_intersects window.  Counts must agree across
    encodings and with the SQL oracle, and every scan must have pruned
    at least one file off its bbox stats (stats are harvested from the
    ENCODED column, so a green row proves encode, decode-in-predicate,
    and stats parity for each encoding)."""
    from iceberg_geo_poc_spark.geo import box
    from iceberg_geo_poc_spark.geo.functions import (
        convert_encoding_udf,
        st_point,
    )

    window = box(20.0, -15.0, 80.0, 45.0)
    encodings = ("ewkb", "geojson", "wkb", "wkt")

    def build_one(cat, enc: str, tname: str):
        phys = "STRING" if enc in ("wkt", "geojson") else "BINARY"
        t = cat.create_table(
            tname, f"rowid BIGINT, geom {phys}", geometry_columns={"geom": enc}
        )
        pts = load_table(spark, sf_dir, "lineitem").filter(
            "l_orderkey % 20 = 7"
        ).select(
            F.monotonically_increasing_id().alias("rowid"),
            F.expr("CAST(l_partkey % 360 AS DOUBLE) - 180.0 + l_discount")
            .alias("lon"),
            st_point(
                F.expr("CAST(l_partkey % 360 AS DOUBLE) - 180.0 + l_discount"),
                F.expr("CAST(l_suppkey % 180 AS DOUBLE) - 90.0 + l_tax"),
            ).alias("wkb"),
        )
        geom = (
            F.col("wkb")
            if enc == "wkb"
            else convert_encoding_udf("wkb", enc)(F.col("wkb"))
        )
        # range-cluster by longitude so the window scan can prove bbox
        # pruning off the ENCODED column's harvested stats
        pts = (
            pts.withColumn("geom", geom)
            .repartitionByRange(4, F.col("lon"))
            .select("rowid", "geom")
        )
        t.append(pts)
        return cat.load_table(tname)

    key = (sf_dir, "geo_encodings")
    if key not in _TABLES:
        cat = _catalog(spark)
        tables = {}
        for enc in encodings:
            tname = f"genc_{enc}_{abs(hash(sf_dir)) % 10**8}"
            if cat.table_exists(tname):
                cat.drop_table(tname)
            tables[enc] = build_one(cat, enc, tname)
        _TABLES[key] = tables
    tables = _TABLES[key]
    rows = []
    for enc in encodings:
        t = tables[enc]
        scan = t.scan(where=E.st_intersects("geom", window))
        pruned = len(scan.files()) < scan.total_data_files()
        rows.append((enc, scan.to_df().count(), pruned))
    return spark.createDataFrame(rows, "enc STRING, n_matched BIGINT, pruned BOOLEAN")


@query(
    "sql_show_describe",
    oracle="""
    SELECT * FROM (VALUES
      ('ek', 'BIGINT', '', 0),
      ('ts', 'TIMESTAMP', '', 1),
      ('geom', 'BINARY', 'geometry(wkb)', 2),
      ('val', 'DECIMAL(12,2)', '', 3),
      ('# partition: ts_day', 'day', '', 4),
      ('# partition: ek_bucket_8', 'bucket[8]', '', 5)
    ) v(col_name, data_type, comment, ord)
    ORDER BY ord
    """,
)
def sql_show_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES / DESCRIBE TABLE statement surface through the SQL
    dispatcher (reference DSv2 catalog metadata statements): DESCRIBE
    must render the depth-aware field list — including a nested
    DECIMAL(12,2) whose comma must NOT split the row (the r5 fix),
    geometry encodings, and partition transforms — byte-for-byte as
    the oracle's literal table."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "ek BIGINT, ts TIMESTAMP, geom BINARY, val DECIMAL(12,2)",
            partition_by=[("ts", "day"), ("ek", "bucket[8]")],
            geometry_columns={"geom": "wkb"},
        )
        return t

    t = _managed(spark, sf_dir, "describe_t", build)
    cat = _catalog(spark)
    tname = t.meta.location.rsplit("/", 1)[-1]
    shown = [r["tableName"] for r in cat.sql("SHOW TABLES").collect()]
    assert tname in shown, "SHOW TABLES missed the table"
    rows = cat.sql(f"DESCRIBE TABLE {tname}").collect()  # 6 rows, driver-side
    return spark.createDataFrame(
        [(r["col_name"], r["data_type"], r["comment"], i) for i, r in enumerate(rows)],
        "col_name STRING, data_type STRING, comment STRING, ord INT",
    )


@query(
    "sql_ctas_roundtrip",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_sup,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier WHERE s_acctbal > 1000
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT through the SQL dispatcher (the statement
    the reference gets from Spark's native CTAS planning over its DSv2
    catalog): the SELECT runs through the dispatcher's own engine-table
    SELECT path, the new table's schema is inferred from the result,
    and the materialized table is a full citizen (snapshots, scans,
    further DML).  The grouped read-back must equal plain SQL."""

    def build(cat, tname):
        src = cat.create_table(
            tname,
            "s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE",
        )
        src.append(
            load_table(spark, sf_dir, "supplier").select(
                "s_suppkey", "s_nationkey", "s_acctbal"
            )
        )
        cat.sql(
            f"CREATE TABLE {tname}_flt AS "
            f"SELECT s_nationkey, s_acctbal FROM {tname} "
            f"WHERE s_acctbal > 1000"
        )
        t = cat.load_table(tname + "_flt")
        assert len(t.meta.snapshots) == 1
        return t

    t = _managed(spark, sf_dir, "ctas", build)
    return (
        t.to_df()
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_sup"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "managed_metrics_truncate_scan",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(LEAST(MAX(LENGTH(source)), 3) AS BIGINT) AS max_bound_len
    FROM documents
    WHERE source >= 'src15'
    GROUP BY source ORDER BY source
    """,
)
def managed_metrics_truncate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics modes end-to-end (reference MetricsModes.java +
    UnicodeUtil.truncateStringMax): a table written under
    ``write.metadata.metrics.default = truncate(3)`` stores string
    bounds as 3-char prefixes (lower) / incremented prefixes (upper).
    The scan's string predicate must still return EXACTLY the oracle
    rows — truncation only ever widens bounds, so pruning stays sound
    — and ``max_bound_len`` pins that the stored bounds really are
    truncated (3 == least(max(len(source)), 3); an untruncated writer
    would store 5-char bounds).  The MIN/MAX stats fast path refuses
    truncated string bounds (tests/test_metrics_modes.py)."""
    import json as _json

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "doc_id BIGINT, source STRING, n_chars BIGINT",
            properties={"write.metadata.metrics.default": "truncate(3)"},
        )
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        # several appends -> several files, each with truncated bounds
        t.append(docs.filter(F.col("doc_id") % 2 == 0).repartition(2))
        t.append(docs.filter(F.col("doc_id") % 2 == 1).repartition(2))
        return t

    t = _managed(spark, sf_dir, "metrics_trunc", build)
    ent = t._entries()
    blens = [
        len(b)
        for e in ent[ent.content == "data"].itertuples()
        for b in (
            _json.loads(e.lower).get("source"),
            _json.loads(e.upper).get("source"),
        )
        if isinstance(b, str)
    ]
    max_bound = max(blens) if blens else 0
    assert max_bound <= 3, f"bounds not truncated: {max_bound}"
    return (
        t.scan(where=E.ge("source", "src15"))
        .to_df()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.lit(max_bound).cast("long").alias("max_bound_len"),
        )
        .orderBy("source")
    )


@query(
    "managed_add_files_mapped",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_totalprice > 100000
    GROUP BY 1 ORDER BY 1
    """,
)
def managed_add_files_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-mapped file import (reference NameMapping.java / property
    ``schema.name-mapping.default``, AddFilesProcedure path): half of
    orders is written as FOREIGN parquet under different column names
    (order_id/price) and registered zero-copy with a name mapping; the
    other half is appended natively.  One scan reads BOTH populations —
    imported files resolve columns through the mapping (coalesce of
    canonical-or-mapped, still one vectorized scan), harvested stats
    were rekeyed so the price predicate prunes imported files too, and
    the grouped totals must equal plain SQL over the original table."""
    import glob
    import tempfile

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING",
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        native = orders.filter(F.col("o_orderkey") % 2 == 1)
        t.append(native)
        foreign = (
            orders.filter(F.col("o_orderkey") % 2 == 0)
            .select(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_totalprice").alias("price"),
                "o_orderstatus",
            )
        )
        fdir = tempfile.mkdtemp(prefix="igps_foreign_")
        foreign.coalesce(2).write.mode("overwrite").parquet(fdir)
        files = sorted(glob.glob(f"{fdir}/*.parquet"))
        cat.add_files(
            tname,
            files,
            name_mapping={"order_id": "o_orderkey", "price": "o_totalprice"},
        )
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "add_files_mapped", build)
    scan = t.scan(where=E.gt("o_totalprice", 100000.0))
    return (
        scan.to_df()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "managed_iceberg_bucket_import",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer WHERE c_acctbal > 0
    GROUP BY 1 ORDER BY 1
    """,
)
def managed_iceberg_bucket_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-SPEC bucket numbering for imported layouts (reference
    transforms/Bucket.java + BucketUtil.java; spec Appendix B: Murmur3-32
    seed 0 over single-value serialization, goldens pinned in
    tests/test_iceberg_bucket.py).  Half of customer arrives as a
    FOREIGN Iceberg-bucketed layout — one parquet file per spec bucket
    of c_custkey — and is registered zero-copy with
    ``derive_partition_values=True``: the import computes each file's
    partition tuple with the spec hash and asserts it matches the
    foreign directory layout.  The other half appends natively through
    the ``bucket[8,iceberg]`` transform, so both populations share ONE
    numbering (engine-native ``bucket[N]`` rides Spark's seed-42 hash
    and would silently disagree — documented in transforms.py).  The
    grouped totals must equal plain SQL over the original table."""
    import glob
    import json as _json
    import tempfile

    from iceberg_geo_poc_spark.table.iceberg_bucket import bucket_udf

    NB = 8

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING",
            partition_by=[("c_custkey", f"bucket[{NB},iceberg]")],
        )
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        # the "foreign Iceberg writer": one file per spec bucket
        foreign = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
            "b", bucket_udf(NB)(F.col("c_custkey"))
        )
        fdir = tempfile.mkdtemp(prefix="igps_ibucket_")
        foreign.repartition("b").write.partitionBy("b").mode(
            "overwrite"
        ).parquet(fdir)
        files = sorted(glob.glob(f"{fdir}/b=*/*.parquet"))
        cat.add_files(tname, files, derive_partition_values=True)
        t = cat.load_table(tname)
        ent = t._entries()
        for r in ent[ent.content == "data"].itertuples():
            layout_bucket = int(r.file_path.split("/b=")[1].split("/")[0])
            derived = _json.loads(r.partition)[f"c_custkey_bucket_{NB}"]
            assert derived == layout_bucket, (
                f"derived bucket {derived} != layout {layout_bucket}"
            )
        # native append goes through the same spec transform
        t.append(cust.filter(F.col("c_custkey") % 2 == 1))
        return cat.load_table(tname)

    t = _managed(spark, sf_dir, "ibucket_import", build)
    return (
        t.scan(where=E.gt("c_acctbal", 0.0))
        .to_df()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "managed_metadata_columns",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(0 AS BIGINT) AS min_pos,
           true AS partition_matches_rows
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def managed_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reserved metadata columns on scans (reference
    MetadataColumns.java: _file / _pos / _partition): an
    identity-partitioned events table scanned with
    ``metadata_columns=True`` exposes each row's source file, its
    row position within that file, and the file's partition tuple
    (manifest JSON, attached by one broadcast map).  The oracle pins
    the contract: grouping by the PARTITION TUPLE (not the data
    column) reproduces exact per-type counts, every group's minimum
    _pos is 0 (positions are per-file row indexes), and every row's
    partition tuple agrees with its own event_type value."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            _EVENTS_DDL,
            partition_by=[("event_type", "identity")],
        )
        t.append(_events_df(spark, sf_dir))
        return t

    t = _managed(spark, sf_dir, "meta_cols", build)
    df = t.scan(metadata_columns=True).to_df()
    ptype = F.get_json_object(F.col("_partition"), "$.event_type")
    return (
        df.groupBy(ptype.alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_pos").cast("long").alias("min_pos"),
            F.min(
                (ptype == F.col("event_type")) & F.col("_file").isNotNull()
            ).alias("partition_matches_rows"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_timestamp_ns_scan",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS d,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
    GROUP BY 1 ORDER BY 1
    """,
)
def managed_timestamp_ns_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 nanosecond timestamps (spec type ``timestamp_ns``,
    physical int64 epoch-nanos — the same INT64 the v3 parquet mapping
    prescribes): a table whose ``ts_ns`` column is registered via the
    ``schema.timestamp-ns-columns`` property, day-partitioned THROUGH
    the ns value (date transforms convert ns->micros before
    truncating).  The range scan carries exact int64 nanosecond
    bounds — past 2^53, so this also exercises the engine's
    Int64-exact predicate/stats path — and must prune to the
    in-range day partitions before reading a byte; per-day grouped
    results come from converting ns back to timestamps in codegen
    and must equal plain SQL over the original nano-precision rows."""

    def build(cat, tname):
        t = cat.create_table(
            tname,
            "event_id BIGINT, ts_ns BIGINT, value DOUBLE",
            partition_by=[("ts_ns", "day")],
            properties={"schema.timestamp-ns-columns": '["ts_ns"]'},
        )
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            (F.unix_micros("ts") * 1000).alias("ts_ns"),
            "value",
        )
        t.append(ev)
        return t

    t = _managed(spark, sf_dir, "ts_ns_scan", build)
    lo = 1704844800 * 1_000_000_000  # 2024-01-10T00:00:00Z as epoch-ns
    hi = 1705104000 * 1_000_000_000  # 2024-01-13T00:00:00Z
    scan = t.scan(where=E.and_(E.ge("ts_ns", lo), E.lt("ts_ns", hi)))
    assert len(scan.files()) < scan.total_data_files(), "day pruning had no effect"
    ts = F.timestamp_micros(F.expr("CAST(ts_ns DIV 1000 AS LONG)"))
    return (
        scan.to_df()
        .groupBy(F.date_format(ts, "yyyy-MM-dd").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("d")
    )


@query(
    "sql_view_roundtrip",
    oracle="""
    WITH v AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total_price
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_custkey)
    SELECT o_custkey, n_orders, total_price
    FROM v WHERE n_orders >= 8 ORDER BY o_custkey
    """,
)
def sql_view_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL view DDL end-to-end (reference view layer: core
    view/BaseView.java + spark-extensions TestViews.java): CREATE VIEW
    over an engine table through the dispatcher, then SELECT through the
    view with a further filter.  The stored view SQL is re-planned via
    the dispatcher's engine-table SELECT path at read time, so the
    base-table scan keeps manifest pruning; the grouped read-back must
    equal the same SQL inlined over raw parquet."""

    def build(cat, tname):
        src = cat.create_table(
            tname, "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        src.append(
            load_table(spark, sf_dir, "orders").select(
                "o_custkey", "o_orderstatus", "o_totalprice"
            )
        )
        cat.sql(
            f"CREATE OR REPLACE VIEW {tname}_v AS "
            f"SELECT o_custkey, COUNT(*) AS n_orders, "
            f"ROUND(SUM(o_totalprice), 2) AS total_price "
            f"FROM {tname} WHERE o_orderstatus = 'O' "
            f"GROUP BY o_custkey"
        )
        return src

    t = _managed(spark, sf_dir, "sqlview", build)
    cat = _catalog(spark)
    vname = f"sqlview_{abs(hash(sf_dir)) % 10**8}_v"
    return cat.sql(
        f"SELECT o_custkey, n_orders, total_price FROM {vname} "
        f"WHERE n_orders >= 8 ORDER BY o_custkey"
    )


@query(
    "sql_view_version_travel",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sql_view_version_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View time travel through SQL (reference core
    view/BaseViewVersion.java — 1-based version ids — surfaced in the
    dispatcher as ``FROM v VERSION AS OF n``): CREATE VIEW, then
    REPLACE it with a narrower definition, then read version 1.  The
    result must equal the ORIGINAL definition's SQL over raw parquet —
    proving the pinned version log, not the latest body, is planned."""

    def build(cat, tname):
        src = cat.create_table(
            tname, "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        src.append(
            load_table(spark, sf_dir, "orders").select(
                "o_custkey", "o_orderstatus", "o_totalprice"
            )
        )
        cat.sql(
            f"CREATE OR REPLACE VIEW {tname}_v AS "
            f"SELECT o_orderstatus, COUNT(*) AS n_orders, "
            f"ROUND(SUM(o_totalprice), 2) AS total_price "
            f"FROM {tname} GROUP BY o_orderstatus"
        )
        cat.sql(  # version 2 narrows the aggregate: travel must NOT see it
            f"CREATE OR REPLACE VIEW {tname}_v AS "
            f"SELECT o_orderstatus, COUNT(*) AS n_orders, "
            f"ROUND(SUM(o_totalprice), 2) AS total_price "
            f"FROM {tname} WHERE o_totalprice > 100000 "
            f"GROUP BY o_orderstatus"
        )
        return src

    _managed(spark, sf_dir, "sqlviewtt", build)
    cat = _catalog(spark)
    vname = f"sqlviewtt_{abs(hash(sf_dir)) % 10**8}_v"
    out = cat.sql(
        f"SELECT o_orderstatus, n_orders, total_price "
        f"FROM {vname} VERSION AS OF 1 ORDER BY o_orderstatus"
    )
    latest = cat.sql(
        f"SELECT o_orderstatus, n_orders, total_price "
        f"FROM {vname} ORDER BY o_orderstatus"
    )
    assert out.count() != latest.count() or (
        out.subtract(latest).count() > 0
    ), "version travel returned the latest view body"
    return out


@query(
    "managed_parquet_encrypted_scan",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders WHERE o_totalprice > 50000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def managed_parquet_encrypted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet MODULAR encryption end-to-end (PARQUET-1300; the
    reference rides parquet-mr's implementation through its write
    builders + encryption manager): a table whose property
    write.parquet.encryption.footer-key routes appends through the
    distributed pyarrow encrypted writer (per-file data keys wrapped by
    the registered master key via the engine's own AES-GCM), and scans
    through the in-place decrypting Arrow read.  The filtered grouped
    read-back must equal plain SQL over the unencrypted source, and the
    data files themselves refuse plaintext reads (asserted in build)."""

    def build(cat, tname):
        from iceberg_geo_poc_spark.table import parquet_crypto as PC

        PC.register_master_key("q_footer", bytes(range(42, 58)))
        t = cat.create_table(
            tname,
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
            properties={"write.parquet.encryption.footer-key": "q_footer"},
        )
        t.append(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
        )
        import pyarrow.parquet as pq

        p = t.scan().files()[0]
        try:
            pq.read_table(p)
            raise AssertionError("encrypted data file read back in plaintext")
        except OSError:
            pass
        return t

    t = _managed(spark, sf_dir, "pqenc", build)
    return (
        t.scan(where=E.gt("o_totalprice", 50000.0))
        .to_df()
        .where(F.col("o_totalprice") > 50000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "managed_encrypted_mor_scan",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE NOT (event_type = 'error') AND NOT (user_id % 97 = 13)
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_encrypted_mor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read on a MODULAR-ENCRYPTED table: a position delete
    (predicate) and an equality delete (keys) both persist as
    ENCRYPTED sidecars (plaintext reads refuse, asserted in build), and
    the scan applies them through the decrypting read.  The grouped
    read-back must equal plain SQL with both delete predicates
    inlined."""

    def build(cat, tname):
        from iceberg_geo_poc_spark.table import parquet_crypto as PC

        PC.register_master_key("mor_footer", bytes(range(7, 23)))
        t = cat.create_table(
            tname,
            _EVENTS_DDL,
            properties={"write.parquet.encryption.footer-key": "mor_footer"},
        )
        t.append(_events_df(spark, sf_dir))
        t.delete(E.eq("event_type", "error"), mode="merge-on-read")
        erased = (
            _events_df(spark, sf_dir)
            .select("user_id")
            .where(F.col("user_id") % 97 == 13)
            .distinct()
        )
        t.delete_by_keys(erased, key_cols=["user_id"])
        import pyarrow.parquet as pq

        ent = t._entries()
        sidecars = ent[ent.content.isin(["posdel", "eqdel"])].file_path
        assert len(sidecars) >= 2
        for p in sidecars:
            try:
                pq.read_table(p)
                raise AssertionError(f"sidecar {p} readable in plaintext")
            except OSError:
                pass
        return t

    t = _managed(spark, sf_dir, "encmor", build)
    return (
        t.to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_scd2_history",
    oracle="""
    WITH src AS (SELECT o_orderkey,
                        o_orderstatus AS s0,
                        ROUND(o_totalprice, 2) AS p
                 FROM orders),
    v1 AS (SELECT o_orderkey, s0 AS o_orderstatus, p,
                  CAST(1 AS BIGINT) AS valid_from_version,
                  CASE WHEN p > 300000 THEN CAST(2 AS BIGINT) END
                    AS valid_to_version
           FROM src),
    v2 AS (SELECT o_orderkey, 'X1' AS o_orderstatus, p,
                  CAST(2 AS BIGINT) AS valid_from_version,
                  CASE WHEN p > 400000 THEN CAST(3 AS BIGINT) END
                    AS valid_to_version
           FROM src WHERE p > 300000),
    v3 AS (SELECT o_orderkey, 'X2' AS o_orderstatus, p,
                  CAST(3 AS BIGINT) AS valid_from_version,
                  CASE WHEN p > 475000 THEN CAST(4 AS BIGINT) END
                    AS valid_to_version
           FROM src WHERE p > 400000),
    hist AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
             UNION ALL SELECT * FROM v3)
    SELECT o_orderkey, o_orderstatus, p AS o_totalprice,
           valid_from_version, valid_to_version,
           valid_to_version IS NULL AS is_current
    FROM hist ORDER BY o_orderkey, valid_from_version
    """,
)
def managed_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension history materialized from the table's
    row-level changelog (streaming/incremental.py::scd2_history;
    reference CreateChangelogViewProcedure + the downstream-MERGE
    pattern its docs describe): an append, two MoR status rewrites and
    a trailing MoR delete produce versioned intervals with commit-
    ordinal validity and is_current flags.  The oracle reconstructs the
    full expected history from raw parquet — version boundaries, close
    ordinals, and the delete-closed tail are all value-verified."""

    def build(cat, tname):
        t = cat.create_table(
            tname, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
        )
        t.append(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey",
                "o_orderstatus",
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
        )
        t.update(
            {"o_orderstatus": F.lit("X1")},
            where=E.gt("o_totalprice", 300000.0),
            mode="merge-on-read",
        )
        t.update(
            {"o_orderstatus": F.lit("X2")},
            where=E.gt("o_totalprice", 400000.0),
            mode="merge-on-read",
        )
        t.delete(E.gt("o_totalprice", 475000.0), mode="merge-on-read")
        return t

    t = _managed(spark, sf_dir, "scd2", build)
    from iceberg_geo_poc_spark.streaming.incremental import scd2_history

    return scd2_history(t, key_cols=["o_orderkey"]).orderBy(
        "o_orderkey", "valid_from_version"
    )


_REST_VIEW_CATS: dict = {}


@query(
    "rest_view_lifecycle",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def rest_view_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST-catalog VIEW lifecycle (reference REST spec /views
    endpoints, RESTViewCatalog shape): the service stores versioned
    view SQL under bearer auth; CREATE, REPLACE with a narrower body,
    list, then SELECT the PINNED version 1 through a second client —
    execution routes the stored SQL through the namespace catalog's
    dispatcher so the base-table scan keeps manifest pruning.  The
    read-back must equal version 1's SQL over raw parquet (and is
    asserted to differ from the latest body)."""
    import tempfile

    from iceberg_geo_poc_spark.table.rest_catalog import (
        CatalogService,
        RestCatalog,
    )

    key = (sf_dir, "restview")
    if key not in _REST_VIEW_CATS:
        svc = CatalogService(token="view-token")
        wh = tempfile.mkdtemp(prefix="igps_rv_")
        cat = RestCatalog(svc.handle, spark, warehouse=wh, token="view-token")
        cat.create_namespace("mart")
        t = cat.create_table(
            "mart.customer",
            "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE",
        )
        t.append(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            )
        )
        v = cat.create_view(
            "mart.seg_stats",
            "SELECT c_mktsegment, COUNT(*) AS n_customers, "
            "ROUND(SUM(c_acctbal), 2) AS total_bal "
            "FROM customer GROUP BY c_mktsegment",
        )
        assert v == 1
        v = cat.create_view(
            "mart.seg_stats",
            "SELECT c_mktsegment, COUNT(*) AS n_customers, "
            "ROUND(SUM(c_acctbal), 2) AS total_bal "
            "FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment",
            replace=True,
        )
        assert v == 2
        assert cat.list_views("mart") == ["seg_stats"]
        _REST_VIEW_CATS[key] = (svc, wh)
    svc, wh = _REST_VIEW_CATS[key]
    # a second client resolves the same view through the service
    reader = RestCatalog(svc.handle, spark, warehouse=wh, token="view-token")
    pinned = reader.select_view("mart.seg_stats", version=1).orderBy(
        "c_mktsegment"
    )
    latest = reader.select_view("mart.seg_stats")
    assert pinned.count() != latest.count() or (
        pinned.subtract(latest).count() > 0
    ), "pinned view version returned the latest body"
    return pinned


_REST_PAGED: dict = {}


@query(
    "rest_paginated_catalog",
    oracle="""
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           MIN(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def rest_paginated_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST catalog pagination + OAuth token refresh over REAL HTTP
    (reference RESTSessionCatalog: list endpoints drain pageToken pages;
    OAuth2Util.AuthSession refreshes the bearer token and retries on
    401).  A credentialed client shards ``nation`` across 5 tables,
    the service's issued tokens are revoked MID-LIFECYCLE (forced
    expiry), and the reader then drains a 2-per-page table listing —
    transparently refreshing — and unions every listed table back
    into the full relation."""
    import tempfile

    from iceberg_geo_poc_spark.table.rest_catalog import (
        CatalogService,
        RestCatalog,
    )
    from iceberg_geo_poc_spark.table.rest_http import HttpTransport, serve_catalog

    key = (sf_dir, "restpaged")
    if key not in _REST_PAGED:
        svc = CatalogService(
            defaults={"rest.page-size": "2"},
            credential="etl-client:etl-secret",
        )
        base_url, shutdown = serve_catalog(svc)
        try:
            wh = tempfile.mkdtemp(prefix="igps_rp_")
            cat = RestCatalog(
                HttpTransport(base_url), spark, warehouse=wh,
                credential="etl-client:etl-secret",
            )
            cat.create_namespace("pg")
            nation = load_table(spark, sf_dir, "nation").select(
                "n_nationkey", "n_name", "n_regionkey"
            )
            for i in range(5):
                t = cat.create_table(
                    f"pg.n{i}",
                    "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
                )
                t.append(
                    nation.filter(F.col("n_nationkey") % 5 == i).coalesce(1)
                )
            # forced token expiry: the next request 401s and the client
            # must refresh via /oauth_tokens before retrying
            svc.revoke_issued_tokens()
            reader = RestCatalog(
                HttpTransport(base_url), spark, warehouse=wh,
                credential="etl-client:etl-secret",
            )
            svc.revoke_issued_tokens()
            listed = reader.list_tables("pg")  # rest.page-size=2 -> 3 pages
            assert listed == [f"n{i}" for i in range(5)], listed
            parts = [reader.load_table(f"pg.{n}").to_df() for n in listed]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            _REST_PAGED[key] = df
        finally:
            shutdown()
    return (
        _REST_PAGED[key]
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "managed_merge_conditional",
    oracle="""
    WITH src AS (
      SELECT c_custkey AS k,
             CASE CAST(c_custkey % 7 AS INTEGER)
               WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'X' END AS op,
             ROUND(c_acctbal + 1000, 2) AS newbal
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS k,
             CASE WHEN c_custkey % 2 = 0 THEN 'I' ELSE 'S' END AS op,
             ROUND(c_acctbal, 2) AS newbal
      FROM customer WHERE c_custkey % 11 = 0
    ),
    tgt AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             ROUND(c_acctbal, 2) AS bal
      FROM customer
    ),
    merged AS (
      SELECT t.k,
             CASE WHEN s.op = 'U' THEN 'UPDATED' ELSE t.seg END AS seg,
             CASE WHEN s.op = 'U' THEN s.newbal ELSE t.bal END AS bal,
             COALESCE(s.op, '') AS op
      FROM tgt t LEFT JOIN src s ON s.k = t.k
      WHERE COALESCE(s.op, '') <> 'D'
    )
    SELECT k, seg, bal FROM merged
    UNION ALL
    SELECT s.k, NULL AS seg, s.newbal AS bal
    FROM src s LEFT JOIN tgt t ON t.k = s.k
    WHERE t.k IS NULL AND s.op <> 'S'
    ORDER BY k
    """,
)
def managed_merge_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional multi-clause MERGE (reference TestMerge: WHEN
    MATCHED AND s.op='D' THEN DELETE / AND s.op='U' THEN UPDATE /
    matched-but-no-clause rows pass through / NOT MATCHED AND gates the
    insert) — the full clause-election semantics value-verified: the
    oracle replays delete suppression, conditional update, pass-through
    and the gated insert over raw parquet."""

    def build(cat, tname):
        t = cat.create_table(
            tname, "k BIGINT, seg STRING, bal DOUBLE"
        )
        cust = load_table(spark, sf_dir, "customer")
        t.append(
            cust.select(
                F.col("c_custkey").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.round("c_acctbal", 2).alias("bal"),
            )
        )
        matched_src = cust.filter("c_custkey % 3 = 0").select(
            F.col("c_custkey").alias("k"),
            F.when(F.col("c_custkey") % 7 == 0, "D")
            .when(F.col("c_custkey") % 7 == 1, "U")
            .otherwise("X")
            .alias("op"),
            F.round(F.col("c_acctbal") + 1000, 2).alias("newbal"),
        )
        insert_src = cust.filter("c_custkey % 11 = 0").select(
            (F.col("c_custkey") + 1000000).alias("k"),
            F.when(F.col("c_custkey") % 2 == 0, "I").otherwise("S").alias("op"),
            F.round("c_acctbal", 2).alias("newbal"),
        )
        src = matched_src.unionByName(insert_src).withColumn(
            "bal", F.col("newbal")
        )
        t.merge(
            src,
            on=["k"],
            matched_clauses=[
                ("s.op = 'D'", "delete", None),
                (
                    "s.op = 'U'",
                    "update",
                    {"bal": F.col("s.newbal"), "seg": F.lit("UPDATED")},
                ),
            ],
            when_not_matched_insert=True,
            when_not_matched_condition="s.op <> 'S'",
        )
        return t

    t = _managed(spark, sf_dir, "merge_cond", build)
    return t.to_df().select("k", "seg", F.round("bal", 2).alias("bal")).orderBy("k")


@query(
    "managed_merge_by_source",
    oracle="""
    WITH src AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 6 = 0 THEN 'U' ELSE 'X' END AS op,
             ROUND(c_acctbal + 500, 2) AS newbal
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey + 2000000 AS k, 'I' AS op,
             ROUND(c_acctbal, 2) AS newbal
      FROM customer WHERE c_custkey % 13 = 0
    ),
    tgt AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             ROUND(c_acctbal, 2) AS bal
      FROM customer
    ),
    merged AS (
      SELECT t.k,
             CASE WHEN s.k IS NULL THEN 'ORPHAN' ELSE t.seg END AS seg,
             CASE WHEN s.op = 'U' THEN s.newbal ELSE t.bal END AS bal
      FROM tgt t LEFT JOIN src s ON s.k = t.k
      WHERE NOT (s.k IS NULL AND t.bal < 1000)
    )
    SELECT k, seg, bal FROM merged
    UNION ALL
    SELECT s.k, NULL AS seg, s.newbal AS bal
    FROM src s LEFT JOIN tgt t ON t.k = s.k
    WHERE t.k IS NULL
    ORDER BY k
    """,
)
def managed_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WHEN NOT MATCHED BY SOURCE (reference Spark 3.5 surface,
    TestMerge.java:116-177 — the SCD/sync-delete shape): target rows
    absent from the source are conditionally DELETEd (stale, bal <
    1000) or UPDATEd (flagged ORPHAN), matched rows follow the matched
    clauses, and absent source rows insert — all four families
    value-replayed by the oracle over raw parquet."""

    def build(cat, tname):
        t = cat.create_table(tname, "k BIGINT, seg STRING, bal DOUBLE")
        cust = load_table(spark, sf_dir, "customer")
        t.append(
            cust.select(
                F.col("c_custkey").alias("k"),
                F.col("c_mktsegment").alias("seg"),
                F.round("c_acctbal", 2).alias("bal"),
            )
        )
        matched_src = cust.filter("c_custkey % 2 = 0").select(
            F.col("c_custkey").alias("k"),
            F.when(F.col("c_custkey") % 6 == 0, "U").otherwise("X").alias("op"),
            F.round(F.col("c_acctbal") + 500, 2).alias("newbal"),
        )
        insert_src = cust.filter("c_custkey % 13 = 0").select(
            (F.col("c_custkey") + 2000000).alias("k"),
            F.lit("I").alias("op"),
            F.round("c_acctbal", 2).alias("newbal"),
        )
        src = matched_src.unionByName(insert_src).withColumn(
            "bal", F.col("newbal")
        )
        t.merge(
            src,
            on=["k"],
            matched_clauses=[
                ("s.op = 'U'", "update", {"bal": F.col("s.newbal")}),
            ],
            when_not_matched_insert=True,
            not_matched_by_source_clauses=[
                ("t.bal < 1000", "delete", None),
                (None, "update", {"seg": F.lit("ORPHAN")}),
            ],
        )
        return t

    t = _managed(spark, sf_dir, "merge_bysrc", build)
    return t.to_df().select("k", "seg", F.round("bal", 2).alias("bal")).orderBy("k")


@query(
    "managed_delta_snapshot",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderkey % 5 = 0 AND o_orderpriority <> '5-LOW'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def managed_delta_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake -> engine snapshot migration (reference
    delta-lake/.../BaseSnapshotDeltaLakeTableAction.java): Spark writes
    a hive-partitioned parquet layout (partition column PHYSICALLY
    ABSENT from the data files, exactly Delta's layout), a hand-built
    ``_delta_log`` adds every file in commit 0 and REMOVEs the 5-LOW
    partition in commit 1, and the migration replays the log, registers
    the live files zero-copy with footer stats + log-derived partition
    bounds, and injects the partition column at read time.  The oracle
    sees only rows that survived the remove."""
    key = (sf_dir, "delta_snap")
    if key not in _TABLES:
        import json as _json
        import os

        cat = _catalog(spark)
        tag = abs(hash(sf_dir)) % 10**8
        root = tempfile.mkdtemp(prefix="igps_delta_")
        df = (
            load_table(spark, sf_dir, "orders")
            .filter("o_orderkey % 5 = 0")
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
        )
        df.write.partitionBy("o_orderpriority").parquet(root, mode="overwrite")
        # harvest the layout into Delta add actions
        adds, removes = [], []
        for d in sorted(os.listdir(root)):
            if not d.startswith("o_orderpriority="):
                continue
            pval = d.split("=", 1)[1].replace("%20", " ")
            for fn in sorted(os.listdir(os.path.join(root, d))):
                if not fn.endswith(".parquet"):
                    continue
                rel = f"{d}/{fn}"
                act = {
                    "add": {
                        "path": rel,
                        "partitionValues": {"o_orderpriority": pval},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
                adds.append(act)
                if pval == "5-LOW":
                    removes.append(
                        {"remove": {"path": rel, "deletionTimestamp": 1,
                                    "dataChange": True}}
                    )
        schema = _json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "o_orderkey", "type": "long",
                     "nullable": True, "metadata": {}},
                    {"name": "o_totalprice", "type": "double",
                     "nullable": True, "metadata": {}},
                    {"name": "o_orderpriority", "type": "string",
                     "nullable": True, "metadata": {}},
                ],
            }
        )
        log = os.path.join(root, "_delta_log")
        os.makedirs(log, exist_ok=True)
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            f.write(_json.dumps({"metaData": {
                "id": "q-delta", "schemaString": schema,
                "partitionColumns": ["o_orderpriority"],
                "configuration": {}}}) + "\n")
            for a in adds:
                f.write(_json.dumps(a) + "\n")
        with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
            for a in removes:
                f.write(_json.dumps(a) + "\n")
        _TABLES[key] = cat.snapshot_delta_table(root, f"delta_snap_{tag}")
    t = _TABLES[key]
    return (
        t.to_df()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "managed_jdbc_view_lifecycle",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def managed_jdbc_view_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC-catalog VIEW lifecycle behind DB pointer rows (reference
    core/.../jdbc/JdbcViewOperations.java + JdbcUtil V1
    ``iceberg_views``): CREATE, REPLACE with a narrower body (pointer
    CAS advances), list via the DATABASE row (a DB-only reader's
    discovery surface), then SELECT the PINNED version 1 through the
    SQL dispatcher — which must differ from the latest body."""
    key = (sf_dir, "jdbc_view")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.jdbc_catalog import JdbcCatalog

        if "_jvcat" not in _CATALOGS:
            _CATALOGS["_jvcat"] = JdbcCatalog(
                tempfile.mkdtemp(prefix="igps_jvwh_"), spark,
                catalog_name="jv",
            )
        cat = _CATALOGS["_jvcat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"cust_jv_{tag}"
        t = cat.create_table(
            tname, "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE"
        )
        t.append(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            )
        )
        vname = f"seg_stats_{tag}"
        cat.sql(
            f"CREATE VIEW {vname} AS SELECT c_mktsegment, "
            f"COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal "
            f"FROM {tname} GROUP BY c_mktsegment"
        )
        cat.sql(
            f"CREATE OR REPLACE VIEW {vname} AS SELECT c_mktsegment, "
            f"COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal "
            f"FROM {tname} WHERE c_acctbal > 0 GROUP BY c_mktsegment"
        )
        # discovery through the DATABASE row, not the filesystem
        with cat.backend.db() as c:
            names = [
                r[0]
                for r in c.execute(
                    "SELECT view_name FROM iceberg_views WHERE view_name = ?",
                    (vname,),
                ).fetchall()
            ]
        assert names == [vname], "view must be discoverable from the DB row"
        assert len(cat.view_versions(vname)) == 2
        _TABLES[key] = (cat, vname)
    cat, vname = _TABLES[key]
    pinned = cat.sql(f"SELECT * FROM {vname} VERSION AS OF 1").orderBy(
        "c_mktsegment"
    )
    latest = cat.sql(f"SELECT * FROM {vname}")
    assert pinned.count() != latest.count() or (
        pinned.subtract(latest).count() > 0
    ), "pinned view version returned the latest body"
    return pinned


@query(
    "managed_nessie_catalog_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 5 = 0 AND NOT (event_type = 'error' AND value < 0.5)
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_nessie_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nessie catalog end-to-end (reference nessie/NessieCatalog.java +
    NessieIcebergClient commitMultipleOperations): table committed on
    main, the WHOLE CATALOG forked to an 'etl' branch, a CoW delete +
    an append land on etl via hash-CAS commits (one from a stale handle
    that conflicts and retries), main is asserted untouched, then the
    publish step fast-forwards main to etl's head and the table is read
    through its post-rename name — an atomic Delete+Put commit."""
    key = (sf_dir, "nessie_rt")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.nessie_catalog import NessieCatalog

        if "_nessiecat" not in _CATALOGS:
            _CATALOGS["_nessiecat"] = NessieCatalog(
                tempfile.mkdtemp(prefix="igps_nessiewh_"), spark
            )
        cat = _CATALOGS["_nessiecat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_nessie_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 5 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 4 = 0"))
        main_rows = t.to_df().count()
        cat.create_ref(f"etl_{tag}")
        cat.use_ref(f"etl_{tag}")
        stale = cat.load_table(tname)
        cat.load_table(tname).append(df.filter("event_id % 2 = 1"))
        # stale handle: loses the hash-CAS once, engine retry lands it
        stale.append(df.filter("event_id % 4 = 2"))
        cat.load_table(tname).delete(
            E.and_(E.eq("event_type", "error"), E.lt("value", 0.5))
        )
        # main untouched by everything on etl
        cat.use_ref("main")
        assert cat.load_table(tname).to_df().count() == main_rows
        # publish: fast-forward main to the etl head, then atomic rename
        cat.assign_ref("main", to=f"etl_{tag}")
        cat.rename_table(tname, f"events_nessie_final_{tag}")
        _TABLES[key] = (cat, f"events_nessie_final_{tag}")
    cat, name = _TABLES[key]
    cat.use_ref("main")
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_hive_catalog_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 7 = 0 AND event_type <> 'click'
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_hive_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-metastore catalog end-to-end (reference
    hive-metastore/HiveTableOperations.java doCommit +
    MetastoreLock.java): the metadata_location PARAMETER is the pointer
    of record; three appends — the third from a deliberately STALE
    handle whose base-location check fails once under the exclusive
    table lock and lands via the standard retry — then a CoW delete and
    a rename, with the final read resolved through the metastore entry
    under the post-rename name."""
    key = (sf_dir, "hive_rt")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.hive_catalog import HiveCatalog

        if "_hivecat" not in _CATALOGS:
            _CATALOGS["_hivecat"] = HiveCatalog(
                tempfile.mkdtemp(prefix="igps_hivewh_"), spark
            )
        cat = _CATALOGS["_hivecat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_hive_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 7 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        stale = cat.load_table(tname)
        t.append(df.filter("event_id % 4 = 1"))  # moves the parameter
        stale.append(df.filter("event_id % 4 = 3"))  # CAS fails once, retries
        cat.load_table(tname).delete(E.eq("event_type", "click"))
        cat.rename_table(tname, f"events_hive_final_{tag}")
        _TABLES[key] = (cat, f"events_hive_final_{tag}")
    cat, name = _TABLES[key]
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_glue_catalog_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 6 = 0 AND event_type <> 'view'
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_glue_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glue catalog end-to-end (reference aws/glue/GlueTableOperations
    .java:62-409 doCommit/persistGlueTable optimistic versionId CAS +
    GlueCatalog.renameTable): the v0 commit CREATES the Glue entry,
    three appends — the third from a deliberately STALE handle whose
    conditional UpdateTable loses once on the versionId and lands via
    the standard retry — then a CoW delete through the SQL dispatcher
    and the non-atomic create-then-drop rename, with the final read
    resolved through the Glue entry under the post-rename name."""
    key = (sf_dir, "glue_rt")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.glue_catalog import GlueCatalog

        if "_gluecat" not in _CATALOGS:
            _CATALOGS["_gluecat"] = GlueCatalog(
                tempfile.mkdtemp(prefix="igps_gluewh_"), spark
            )
        cat = _CATALOGS["_gluecat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_glue_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 6 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        stale = cat.load_table(tname)
        t.append(df.filter("event_id % 4 = 1"))  # bumps the versionId
        stale.append(df.filter("event_id % 4 = 3"))  # CAS loses once, retries
        cat.sql(f"DELETE FROM {tname} WHERE event_type = 'view'")
        cat.rename_table(tname, f"events_glue_final_{tag}")
        _TABLES[key] = (cat, f"events_glue_final_{tag}")
    cat, name = _TABLES[key]
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_dynamodb_catalog_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 9 = 0 AND NOT (event_type = 'purchase' AND value > 0.9)
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_dynamodb_catalog_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DynamoDB catalog end-to-end (reference aws/dynamodb/
    DynamoDbTableOperations.persistTable:200-250 conditional-expression
    CAS + DynamoDbCatalog.renameTable:416-474 transactional rename):
    the v0 commit PutItems the entry with attribute_not_exists(v),
    appends rotate the uuid version attribute — one from a STALE
    handle whose conditional UpdateItem loses once and retries — then
    a CoW delete and the ATOMIC TransactWriteItems rename, final read
    through the post-rename item."""
    key = (sf_dir, "dynamo_rt")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.dynamodb_catalog import DynamoDbCatalog

        if "_dynamocat" not in _CATALOGS:
            _CATALOGS["_dynamocat"] = DynamoDbCatalog(
                tempfile.mkdtemp(prefix="igps_dynwh_"), spark
            )
        cat = _CATALOGS["_dynamocat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_dyn_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 9 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        stale = cat.load_table(tname)
        t.append(df.filter("event_id % 4 = 1"))  # rotates the item version
        stale.append(df.filter("event_id % 4 = 3"))  # condition loses, retries
        cat.load_table(tname).delete(
            E.and_(E.eq("event_type", "purchase"), E.gt("value", 0.9))
        )
        cat.rename_table(tname, f"events_dyn_final_{tag}")
        _TABLES[key] = (cat, f"events_dyn_final_{tag}")
    cat, name = _TABLES[key]
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "managed_snowflake_readonly_resolve",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 11 = 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_snowflake_readonly_resolve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snowflake read-only catalog (reference snowflake/
    SnowflakeCatalog.java:1-269 + SnowflakeTableOperations): a table
    WRITTEN BY ANOTHER CATALOG (the fs catalog stands in for
    Snowflake's own write path) is registered in the service, resolved
    via GET_ICEBERG_TABLE_INFORMATION -> metadata document, re-resolved
    after the writer commits again (the pointer moves), and every
    mutation through the Snowflake handle refuses."""
    key = (sf_dir, "sf_ro")
    if key not in _TABLES:
        import os as _os

        from iceberg_geo_poc_spark.table.snowflake_catalog import (
            SnowflakeCatalog,
            SnowflakeService,
        )

        writer = _catalog(spark)
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_sfro_{tag}"
        t = writer.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 11 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        svc = SnowflakeService()

        def _ptr(tb):
            return _os.path.join(
                tb.location, "metadata", f"v{tb.meta.version}.metadata.json"
            )

        svc.register_iceberg_table("analytics", "prod", tname, _ptr(t))
        sfcat = SnowflakeCatalog(spark, svc)
        first = sfcat.load_table(f"analytics.prod.{tname}")
        n_first = first.to_df().count()
        # the loaded handle is read-only
        try:
            first.append(df.limit(1))
            raise AssertionError("snowflake table accepted a write")
        except ValueError:
            pass
        # writer commits again; Snowflake's answer moves; re-resolve
        t.append(df.filter("event_id % 2 = 1"))
        svc.register_iceberg_table("analytics", "prod", tname, _ptr(t))
        assert sfcat.load_table(f"analytics.prod.{tname}").to_df().count() > n_first
        _TABLES[key] = (sfcat, f"analytics.prod.{tname}")
    sfcat, name = _TABLES[key]
    return (
        sfcat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "rest_catalog_sigv4_http",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier
    WHERE s_acctbal > 0
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def rest_catalog_sigv4_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog lifecycle over the REAL HTTP binding with SigV4
    ENFORCED end-to-end (reference aws/RESTSigV4Signer.java +
    rest/HTTPClient.java): the server recomputes every request's
    signature (IAM posture), the OAuth bearer rides
    Original-Authorization under the signature, an UNSIGNED transport
    is refused at the door (403), and a second signed client loads the
    table committed through the wire."""
    key = (sf_dir, "sigv4cat")
    if key not in _MOCK_FS_TABLES:
        import pyarrow.fs as pafs

        from iceberg_geo_poc_spark.table.fileio import (
            ArrowFSFileIO,
            register_file_io,
        )
        from iceberg_geo_poc_spark.table.rest_catalog import (
            CatalogService,
            RestCatalog,
        )
        from iceberg_geo_poc_spark.table.rest_http import (
            HttpTransport,
            serve_catalog,
        )
        from iceberg_geo_poc_spark.table.rest_sigv4 import RESTSigV4Signer

        scheme = f"sig4drv{abs(hash(sf_dir)) % 10**6}"
        wh = f"{scheme}://wh"
        register_file_io(
            wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme)
        )
        secret = "drv-signing-secret/with+specials"
        svc = CatalogService(token="drv-token")
        url, _shutdown = serve_catalog(svc, sigv4_secret=secret)
        signer = RESTSigV4Signer().initialize(
            {
                "rest.signing-region": "us-east-1",
                "rest.access-key-id": "AKIDDRIVER",
                "rest.secret-access-key": secret,
            }
        )
        transport = HttpTransport(url, token="drv-token", signer=signer)
        # unsigned request: refused BEFORE the service runs
        assert (
            HttpTransport(url, token="drv-token")({"op": "head", "path": "x"})[
                "status"
            ]
            == 403
        )
        cat = RestCatalog(transport, spark, warehouse=wh, token="drv-token")
        cat.create_namespace("prod")
        t = cat.create_table(
            "prod.supplier_pos",
            "s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE",
        )
        s = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey", "s_acctbal"
        ).filter("s_acctbal > 0")
        t.append(s.coalesce(2))
        reader = RestCatalog(
            HttpTransport(url, token="drv-token", signer=signer),
            spark, warehouse=wh, token="drv-token",
        )
        _MOCK_FS_TABLES[key] = reader.load_table("prod.supplier_pos")
    t = _MOCK_FS_TABLES[key]
    return (
        t.to_df()
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "managed_glue_lock_manager_roundtrip",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    WHERE user_id % 8 = 0 AND event_type <> 'error'
    GROUP BY event_type ORDER BY event_type
    """,
)
def managed_glue_lock_manager_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Glue catalog in LOCK-MANAGER mode (reference
    GlueTableOperations.persistGlueTable: with a LockManager the
    UpdateTable goes UNCONDITIONAL — versionId preconditions engage
    only when lockManager is null; lock entity = 'db.tbl', lease-based
    DynamoDbLockManager): appends serialize through acquire/release
    with the under-lock re-read as the base check; one append from a
    deliberately STALE handle still lands via the engine retry; a CoW
    delete rides the same protocol."""
    key = (sf_dir, "glue_lm_rt")
    if key not in _TABLES:
        from iceberg_geo_poc_spark.table.dynamodb_catalog import (
            DynamoDbLockManager,
            DynamoService,
        )
        from iceberg_geo_poc_spark.table.glue_catalog import GlueCatalog

        if "_gluelmcat" not in _CATALOGS:
            _CATALOGS["_gluelmcat"] = GlueCatalog(
                tempfile.mkdtemp(prefix="igps_gluelmwh_"),
                spark,
                lock_manager=DynamoDbLockManager(
                    DynamoService(),
                    heartbeat_interval=0.03,
                    heartbeat_timeout=0.2,
                    acquire_timeout=30.0,
                ),
            )
        cat = _CATALOGS["_gluelmcat"]
        tag = abs(hash(sf_dir)) % 10**8
        tname = f"events_gluelm_{tag}"
        t = cat.create_table(
            tname, "event_id BIGINT, event_type STRING, value DOUBLE"
        )
        df = _events_df(spark, sf_dir).filter("user_id % 8 = 0").select(
            "event_id", "event_type", "value"
        )
        t.append(df.filter("event_id % 2 = 0"))
        stale = cat.load_table(tname)
        t.append(df.filter("event_id % 4 = 1"))  # moves the pointer
        stale.append(df.filter("event_id % 4 = 3"))  # base check under lock
        cat.load_table(tname).delete(E.eq("event_type", "error"))
        _TABLES[key] = (cat, tname)
    cat, name = _TABLES[key]
    return (
        cat.load_table(name)
        .to_df()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("event_type")
    )
