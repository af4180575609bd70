"""Fast-append manifest lists (reference FastAppend.java + Snapshot
manifest lists): append commits write a delta manifest and reuse the
parent's manifests, making commit cost O(new files); scans prune at the
manifest level; consolidation + GC respect manifest sharing.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from iceberg_geo_poc_spark.table import Catalog, E


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


def _seed(spark, catalog, name="fa_t", n_appends=4):
    t = catalog.create_table(name, "id BIGINT, grp BIGINT")
    for g in range(n_appends):
        df = spark.range(g * 100, (g + 1) * 100).select(
            F.col("id"), F.lit(g).alias("grp")
        )
        t.append(df.coalesce(1))
    return t


def test_append_reuses_parent_manifests(spark, catalog):
    t = _seed(spark, catalog)
    snaps = t.snapshots()
    assert [len(s.manifest_list()) for s in snaps] == [1, 2, 3, 4]
    # parent's manifests are the exact same files (reused, not rewritten)
    assert snaps[-1].manifest_list()[:3] == snaps[-2].manifest_list()
    # each delta manifest holds only its own append's entries
    import iceberg_geo_poc_spark.table.manifest as M

    delta = M.read_manifest(
        os.path.join(t.location, snaps[-1].manifest_list()[-1])
    )
    assert len(delta) == 1 and int(delta.record_count.sum()) == 100
    # full view still sees everything
    assert t.to_df().count() == 400


def test_append_commit_does_not_rewrite_prior_manifests(spark, catalog):
    t = _seed(spark, catalog, name="fa_mtime", n_appends=2)
    first_manifest = os.path.join(t.location, t.snapshots()[0].manifest_list()[0])
    mtime = os.path.getmtime(first_manifest)
    size = os.path.getsize(first_manifest)
    t.append(spark.range(1000, 1100).select(F.col("id"), F.lit(9).alias("grp")))
    assert os.path.getmtime(first_manifest) == mtime
    assert os.path.getsize(first_manifest) == size


def test_manifest_level_pruning_skips_unread(spark, catalog):
    t = _seed(spark, catalog)
    scan = t.scan(where=E.and_(E.ge("id", 250), E.lt("id", 260)))
    files = scan.files()
    assert len(files) == 1
    assert scan._kept_manifests is not None and len(scan._kept_manifests) == 1
    assert scan.to_df().count() == 10
    # summary totals answer total_data_files without reading manifests
    assert scan.total_data_files() == 4


def test_row_level_op_consolidates_manifest_list(spark, catalog):
    t = _seed(spark, catalog, name="fa_consolidate")
    t.delete(E.eq("grp", 1))
    snap = t.current_snapshot()
    assert len(snap.manifest_list()) == 1  # full-set commit consolidated
    assert t.to_df().count() == 300
    # appends after the delete grow the list again
    t.append(t.spark.range(500, 520).select(F.col("id"), F.lit(5).alias("grp")))
    assert len(t.current_snapshot().manifest_list()) == 2
    assert t.to_df().count() == 320


def test_mor_delete_applies_across_delta_manifests(spark, catalog):
    t = _seed(spark, catalog, name="fa_mor")
    t.delete(E.lt("id", 50), mode="merge-on-read")  # consolidates + posdel
    t.append(t.spark.range(1000, 1010).select(F.col("id"), F.lit(7).alias("grp")))
    # pruned scan over the post-delete append must still see deletes applied
    assert t.to_df().count() == 360
    scan = t.scan(where=E.lt("id", 100))
    assert scan.to_df().count() == 50  # ids 50..99 survive


def test_expire_respects_shared_manifests(spark, catalog):
    from iceberg_geo_poc_spark.table.maintenance import expire_snapshots

    t = _seed(spark, catalog, name="fa_expire")
    res = expire_snapshots(t, keep_last=1)
    assert res["expired"] == 3
    # shared delta manifests survive (the kept snapshot references them)
    t = catalog.load_table("fa_expire")
    assert t.to_df().count() == 400
    for rel in t.current_snapshot().manifest_list():
        assert os.path.exists(os.path.join(t.location, rel))


def test_snapshot_summary_totals_roll_forward(spark, catalog):
    t = _seed(spark, catalog, name="fa_totals")
    s = t.current_snapshot().summary
    assert s["total-records"] == 400
    assert s["total-data-files"] == 4
    assert s["added-records"] == 100


def test_rewrite_manifests_consolidates(spark, catalog):
    from iceberg_geo_poc_spark.table.maintenance import rewrite_manifests

    t = _seed(spark, catalog, name="fa_rm")
    assert len(t.current_snapshot().manifest_list()) == 4
    rewrite_manifests(t)
    assert len(t.current_snapshot().manifest_list()) == 1
    assert t.to_df().count() == 400


def test_incremental_read_over_delta_manifests(spark, catalog):
    from iceberg_geo_poc_spark.streaming.incremental import incremental_read

    t = _seed(spark, catalog, name="fa_incr")
    first = t.snapshots()[0].snapshot_id
    inc = incremental_read(t, from_snapshot_id=first)
    assert inc.count() == 300


def test_manifest_list_growth_bounded_by_merge_threshold(spark, catalog):
    t = catalog.create_table(
        "fa_merge",
        "id BIGINT",
        properties={"commit.manifest.min-count-to-merge": "4"},
    )
    for i in range(10):
        t.append(spark.range(i * 10, (i + 1) * 10).coalesce(1))
        assert len(t.current_snapshot().manifest_list()) <= 4
    assert t.to_df().count() == 100
    # counts stay exact through the merge/delta alternation
    assert t.current_snapshot().summary["total-records"] == 100


def test_spatial_manifest_level_pruning(spark, catalog):
    """Geometry bbox bounds ride in the snapshot's per-manifest bounds:
    a quadrant-window spatial scan over quadrant-wise fast appends skips
    the other quadrants' manifests unread."""
    from iceberg_geo_poc_spark.geo import box
    from iceberg_geo_poc_spark.geo.functions import st_point
    from iceberg_geo_poc_spark.table import E as EE

    t = catalog.create_table(
        "fa_geo", "id BIGINT, geom BINARY", geometry_columns={"geom": "wkb"}
    )
    for qx, qy in [(1, 1), (-1, 1), (-1, -1), (1, -1)]:
        df = spark.range(50).select(
            F.col("id"),
            st_point(
                (F.col("id") % 10 + 1) * 0.1 * qx,
                (F.col("id") % 7 + 1) * 0.1 * qy,
            ).alias("geom"),
        )
        t.append(df.coalesce(1))
    assert len(t.current_snapshot().manifest_list()) == 4
    scan = t.scan(where=EE.st_intersects("geom", box(0.01, 0.01, 5.0, 5.0)))
    files = scan.files()
    assert len(files) == 1
    assert len(scan._kept_manifests) == 1  # three manifests never read
    assert scan.to_df().count() == 50
    # disjoint window: whole-snapshot bbox skip, zero manifests read
    scan2 = t.scan(where=EE.st_intersects("geom", box(50.0, 50.0, 60.0, 60.0)))
    assert scan2.files() == []


def test_distributed_planning_parity_over_manifest_list(spark, catalog):
    """The Spark-side planning fallback prunes the SAME file set as the
    pandas path when the snapshot holds multiple delta manifests."""
    t = catalog.create_table(
        "fa_spark_plan",
        "id BIGINT, grp BIGINT",
        properties={"planning.spark-fallback-threshold": "1"},
    )
    for g in range(4):
        t.append(
            spark.range(g * 100, (g + 1) * 100)
            .select(F.col("id"), F.lit(g).alias("grp"))
            .coalesce(1)
        )
    pred = E.and_(E.ge("id", 150), E.lt("id", 260))
    scan = t.scan(where=pred)
    files_spark = sorted(scan.files())
    # same table, pandas path (raise the threshold back up)
    t.meta.properties["planning.spark-fallback-threshold"] = "1000000"
    scan2 = t.scan(where=pred)
    files_pandas = sorted(scan2.files())
    assert files_spark == files_pandas
    assert 0 < len(files_pandas) < 4
    assert scan2.to_df().count() == 110


def test_orphan_sweep_removes_lost_commit_manifests(spark, catalog):
    from iceberg_geo_poc_spark.table.maintenance import remove_orphan_files

    t = _seed(spark, catalog, name="fa_orphan_m", n_appends=2)
    # simulate a lost commit attempt: stray manifest file nobody references
    import iceberg_geo_poc_spark.table.manifest as M

    stray = os.path.join(t.location, "metadata", "manifests", "snap-999.parquet")
    M.write_manifest(t._entries().head(1), stray)
    orphans = remove_orphan_files(t)
    assert stray in orphans
    assert not os.path.exists(stray)
    # live delta manifests untouched
    t = catalog.load_table("fa_orphan_m")
    assert t.to_df().count() == 200
