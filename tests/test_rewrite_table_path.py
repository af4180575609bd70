"""rewrite_table_path: relocation/DR copies with absolute paths rewritten
(reference RewriteTablePathSparkAction)."""

from __future__ import annotations

import json

import pytest

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table import maintenance as X
from iceberg_geo_poc_spark.table import manifest as M


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "wh"), spark)


def _mk(spark, catalog, name, partition_by=None):
    t = catalog.create_table(
        name, "id BIGINT, v STRING", partition_by=partition_by or []
    )
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(100)], "id BIGINT, v STRING"
        ).repartition(3)
    )
    return t


def test_relocated_copy_reads_identically(spark, catalog, tmp_path):
    t = _mk(spark, catalog, "src")
    t.delete(E.lt("id", 10), mode="merge-on-read")      # posdel layer
    t = catalog.load_table("src")
    t.delete(E.ge("id", 95), mode="merge-on-read-dv")   # DV layer
    t = catalog.load_table("src")
    before = sorted((r.id, r.v) for r in t.to_df().collect())

    tgt = str(tmp_path / "relocated")
    res = X.rewrite_table_path(t, tgt)
    assert res["copied"] == len(res["plan"]) and res["plan"]
    assert res["manifests"] >= 1 and not res["external"]

    # no object in the copy's metadata references the old location
    src_loc = t.location.rstrip("/")
    moved = catalog.register_table("moved", tgt)
    import os

    for s in moved.meta.snapshots:
        for mp in s.manifest_list():
            # manifest fields are location-relative (location-independent
            # by construction); the resolved file must exist at the target
            assert not os.path.isabs(mp)
            ent = M.read_manifest(os.path.join(tgt, mp))
            for r in ent.itertuples():
                assert not r.file_path.startswith(src_loc + "/")
                if r.content == "dv":
                    assert not json.loads(r.dv)["referenced"].startswith(
                        src_loc + "/"
                    )

    # identical rows, snapshots, and time travel through the copy
    after = sorted((r.id, r.v) for r in moved.to_df().collect())
    assert after == before
    assert len(moved.meta.snapshots) == len(t.meta.snapshots)
    first = moved.meta.snapshots[0].snapshot_id
    assert moved.to_df(snapshot_id=first).count() == 100
    # posdel contents were rewritten, so MoR deletes still apply: rows
    # 0-9 and 95-99 stay invisible in the copy
    ids = {r.id for r in moved.to_df().collect()}
    assert ids == set(range(10, 95))


def test_plan_only_mode_writes_metadata_but_not_data(spark, catalog, tmp_path):
    import os

    t = _mk(spark, catalog, "src2")
    tgt = str(tmp_path / "relocated2")
    res = X.rewrite_table_path(t, tgt, copy_files=False)
    assert res["copied"] == 0 and res["plan"]
    # metadata + manifests exist; planned data files do not
    assert os.path.exists(os.path.join(tgt, "metadata"))
    for _, dst in res["plan"]:
        assert not os.path.exists(dst)
    # executing the plan completes the copy
    for src_p, dst in res["plan"]:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(src_p, "rb") as a, open(dst, "wb") as b:
            b.write(a.read())
    moved = catalog.register_table("moved2", tgt)
    assert moved.to_df().count() == 100


def test_imported_files_stay_external(spark, catalog, tmp_path):
    import glob

    d = str(tmp_path / "foreign")
    spark.createDataFrame(
        [(i, "x") for i in range(20)], "id BIGINT, v STRING"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    catalog.create_table("imp", "id BIGINT, v STRING")
    t = catalog.add_files("imp", sorted(glob.glob(f"{d}/*.parquet")))
    tgt = str(tmp_path / "relocated3")
    res = X.rewrite_table_path(t, tgt)
    assert res["external"] and not res["plan"]
    moved = catalog.register_table("moved3", tgt)
    assert moved.meta.properties.get("gc.enabled") == "false"
    assert moved.to_df().count() == 20


def test_sql_call_rewrite_table_path(spark, catalog, tmp_path):
    from iceberg_geo_poc_spark.table.sql import dispatch_sql

    _mk(spark, catalog, "sqlsrc")
    tgt = str(tmp_path / "sqlreloc")
    res = dispatch_sql(
        catalog,
        f"CALL system.rewrite_table_path(table => 'sqlsrc', "
        f"target_location => '{tgt}')",
    )
    assert res["copied"] > 0
    moved = catalog.register_table("sqlmoved", tgt)
    assert moved.to_df().count() == 100


def test_relocation_across_backends_posix_to_object_store(
    spark, catalog, tmp_path
):
    """DR migration to a DIFFERENT storage backend: a posix table
    relocated onto the mock object store through the FileIO seam; the
    registered copy scans identically (driver-side Arrow read path)."""
    import uuid as _uuid

    import pyarrow.fs as pafs

    from iceberg_geo_poc_spark.table.fileio import (
        ArrowFSFileIO,
        register_file_io,
    )

    t = _mk(spark, catalog, "xsrc")
    t.delete(E.lt("id", 5), mode="merge-on-read")
    t = catalog.load_table("xsrc")
    scheme = f"xs{_uuid.uuid4().hex[:6]}"
    register_file_io(f"{scheme}://", ArrowFSFileIO(pafs._MockFileSystem(), scheme))
    # relocate INTO the destination catalog's warehouse (the realistic
    # migration flow; posix register_table symlinks cannot span schemes)
    dest_cat = Catalog(f"{scheme}://wh", spark)
    tgt = f"{scheme}://wh/xmoved"
    res = X.rewrite_table_path(t, tgt)
    assert res["copied"] == len(res["plan"]) > 0
    moved = dest_cat.load_table("xmoved")
    assert sorted(r.id for r in moved.to_df().collect()) == list(range(5, 100))
