"""Table & partition statistics files (reference GenericStatisticsFile /
GenericPartitionStatisticsFile + SetStatistics/SetPartitionStatistics).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from iceberg_geo_poc_spark.table import Catalog
from iceberg_geo_poc_spark.table import statistics as ST
from iceberg_geo_poc_spark.table.maintenance import expire_snapshots


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


def _seed(spark, catalog, name="stats_t", n=500, mod=37):
    t = catalog.create_table(name, "id BIGINT, grp BIGINT, s STRING")
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % mod).alias("grp"),
        F.concat(F.lit("v"), (F.col("id") % 11).cast("string")).alias("s"),
    )
    t.append(df)
    return t


def test_compute_table_stats_registers_and_bounds_ndv(spark, catalog):
    t = _seed(spark, catalog)
    entry = ST.compute_table_stats(t)
    snap = t.current_snapshot()
    assert entry["snapshot-id"] == snap.snapshot_id
    assert os.path.exists(entry["statistics-path"])
    # the sidecar is a REAL Puffin file (reference format parity)
    from iceberg_geo_poc_spark.table import puffin as PF

    footer, payloads = PF.read_puffin(open(entry["statistics-path"], "rb").read())
    assert footer["properties"]["row-count"] == "500"
    by_col = {
        b["properties"]["column"]: (b, p)
        for b, p in zip(footer["blobs"], payloads)
    }
    for col, (blob, payload) in by_col.items():
        # blob payload = the NDV as an 8-byte LE long, matching the
        # blob-metadata property
        assert int.from_bytes(payload, "little") == int(blob["properties"]["ndv"])
    # HLL rsd=0.05: estimates within 3*rsd of exact for each column
    exact = {"id": 500, "grp": 37, "s": 11}
    for col, ex in exact.items():
        est = ST.ndv(t, col)
        assert est is not None
        assert abs(est - ex) / ex <= 0.15, (col, est, ex)
    # survives a metadata reload
    t2 = catalog.load_table("stats_t")
    assert ST.ndv(t2, "grp") == ST.ndv(t, "grp")


def test_set_statistics_replaces_same_snapshot(spark, catalog):
    t = _seed(spark, catalog, name="stats_replace")
    ST.compute_table_stats(t, columns=["grp"])
    first = ST.statistics_files(t)
    ST.compute_table_stats(t, columns=["grp", "s"])
    files = ST.statistics_files(t)
    # replaced, not appended: one stats file per snapshot
    assert len(files) == 1
    assert files[0]["statistics-path"] != first[0]["statistics-path"]
    cols = {b["columns"][0] for b in files[0]["blob-metadata"]}
    assert cols == {"grp", "s"}


def test_stats_fallback_to_latest_for_new_snapshot(spark, catalog):
    t = _seed(spark, catalog, name="stats_stale")
    ST.compute_table_stats(t, columns=["grp"])
    t.append(t.spark.range(5).select(
        F.col("id"), F.lit(99).alias("grp"), F.lit("x").alias("s")))
    # no stats for the new snapshot: accessor falls back to latest
    assert ST.ndv(t, "grp") is not None
    assert ST.ndv(t, "id") is None  # never computed for this column


def test_partition_stats_from_manifest_only(spark, catalog):
    t = catalog.create_table(
        "pstats_t", "id BIGINT, grp BIGINT", partition_by=[("grp", "identity")]
    )
    df = spark.range(300).select(F.col("id"), (F.col("id") % 3).alias("grp"))
    t.append(df.repartition(2))
    t.append(df.filter("grp = 0").repartition(1))
    ST.compute_partition_stats(t)
    ps = ST.read_partition_stats(t).toPandas()
    assert len(ps) == 3
    by_part = {
        json.loads(r["partition"]).get("grp"): r for _, r in ps.iterrows()
    }
    assert by_part["0"]["data_record_count"] == 200
    assert by_part["1"]["data_record_count"] == 100
    assert by_part["2"]["data_record_count"] == 100
    # grp=0 got the extra append's files
    assert by_part["0"]["data_file_count"] > by_part["1"]["data_file_count"]
    # delete-file counts present and zero
    assert int(ps["position_delete_file_count"].sum()) == 0


def test_partition_stats_count_delete_files(spark, catalog):
    from iceberg_geo_poc_spark.table import E

    t = catalog.create_table(
        "pstats_del", "id BIGINT, grp BIGINT", partition_by=[("grp", "identity")]
    )
    df = spark.range(100).select(F.col("id"), (F.col("id") % 2).alias("grp"))
    t.append(df)
    t.delete(E.eq("id", 3), mode="merge-on-read")
    ST.compute_partition_stats(t)
    ps = ST.read_partition_stats(t).toPandas()
    assert int(ps["position_delete_file_count"].sum()) >= 1


def test_expire_snapshots_drops_stats_of_expired(spark, catalog):
    t = _seed(spark, catalog, name="stats_expire")
    ST.compute_table_stats(t, columns=["grp"])
    old_path = ST.statistics_files(t)[0]["statistics-path"]
    t.append(t.spark.range(5).select(
        F.col("id"), F.lit(7).alias("grp"), F.lit("y").alias("s")))
    ST.compute_table_stats(t, columns=["grp"])
    res = expire_snapshots(t, keep_last=1)
    assert res["expired"] == 1
    assert res["expired_statistics_files"] == 1
    t = catalog.load_table("stats_expire")
    assert len(ST.statistics_files(t)) == 1
    assert not os.path.exists(old_path)


def test_delete_reachable_files_purge(spark, catalog, tmp_path):
    from iceberg_geo_poc_spark.table.maintenance import delete_reachable_files

    t = _seed(spark, catalog, name="purge_t")
    t.append(t.spark.range(3).select(
        F.col("id"), F.lit(1).alias("grp"), F.lit("z").alias("s")))
    ST.compute_table_stats(t, columns=["grp"])
    loc = t.location
    dry = delete_reachable_files(loc, dry_run=True)
    assert dry["data_files"] >= 2  # two appends
    assert dry["manifests"] >= 2
    assert dry["statistics_files"] == 1
    assert dry["metadata_versions"] >= 3
    assert os.path.exists(loc)
    res = delete_reachable_files(loc)
    assert res["data_files"] == dry["data_files"]
    assert not os.path.exists(loc)


def test_delete_reachable_refuses_unowned(spark, catalog):
    from iceberg_geo_poc_spark.table.maintenance import delete_reachable_files

    t = _seed(spark, catalog, name="purge_guard")
    t.meta.properties["gc.enabled"] = "false"
    from iceberg_geo_poc_spark.table import metadata as MD
    MD.write_new_metadata(t.meta, t.meta.version)
    with pytest.raises(ValueError, match="gc.enabled"):
        delete_reachable_files(t.location)


def test_drop_table_purge(spark, catalog):
    catalog_t = _seed(spark, catalog, name="purge_drop")
    loc = catalog_t.location
    catalog.drop_table("purge_drop", purge=True)
    assert not os.path.exists(loc)


def test_stats_aware_join_broadcasts_small_side(spark, catalog):
    from iceberg_geo_poc_spark.table.join_planning import (
        estimate_row_count,
        estimate_size_bytes,
        stats_aware_join,
    )

    big = catalog.create_table("saj_big", "k BIGINT, v DOUBLE")
    big.append(spark.range(20000).select(
        (F.col("id") % 50).alias("k"), F.rand(7).alias("v")))
    small = catalog.create_table("saj_small", "k BIGINT, name STRING")
    small.append(spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")))
    assert estimate_row_count(big) == 20000
    assert estimate_row_count(small) == 50
    assert estimate_size_bytes(small) < estimate_size_bytes(big)
    j = stats_aware_join(big, small, on="k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert j.count() == 20000


def test_statistics_metadata_tables(spark, catalog):
    from iceberg_geo_poc_spark.table.metadata_tables import inspect

    t = _seed(spark, catalog, name="stats_meta")
    ST.compute_table_stats(t, columns=["grp", "s"])
    ST.compute_partition_stats(t)
    t = catalog.load_table("stats_meta")
    stats = inspect(t, "statistics").toPandas()
    assert set(stats["columns"]) == {"grp", "s"}
    assert (stats["ndv"] > 0).all()
    ps = inspect(t, "partition_stats").toPandas()
    assert int(ps["data_record_count"].sum()) == 500


def test_puffin_format_roundtrip_and_guards():
    from iceberg_geo_poc_spark.table import puffin as PF

    blobs = [
        {"type": "ndv-long-v1", "fields": [0], "snapshot-id": 1,
         "sequence-number": 1, "properties": {"column": "a", "ndv": "42"}},
        {"type": "custom-bytes", "fields": [2], "snapshot-id": 1,
         "sequence-number": 1, "properties": {}},
    ]
    payloads = [(42).to_bytes(8, "little"), b"\xff\x00payload"]
    data = PF.write_puffin(blobs, payloads, {"created-by": "t"})
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"
    footer, got = PF.read_puffin(data)
    assert got == payloads
    assert footer["blobs"][0]["offset"] == 4  # first payload after magic
    assert footer["blobs"][1]["offset"] == 4 + 8
    assert footer["properties"] == {"created-by": "t"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        PF.read_puffin(b"NOPE" + data[4:])
    # compressed-footer flag rejected, not mis-parsed
    mangled = bytearray(data)
    mangled[-8] |= 0x01
    with _pytest.raises(NotImplementedError):
        PF.read_puffin(bytes(mangled))
