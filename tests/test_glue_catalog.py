"""GlueCatalog: optimistic versionId commit protocol (reference
aws/glue/GlueTableOperations.java:62-409 doCommit/persistGlueTable +
GlueCatalog.java renameTable/namespaces).

Load-bearing properties: the metadata_location PARAMETER is the
pointer of record (orphan documents invisible); there is NO lock —
commits arbitrate through the conditional UpdateTable carrying the
versionId the committer read (ConcurrentModificationException = lost
race = engine retry); the FIRST commit is CreateTable with
AlreadyExists as the same signal; rename is a non-atomic
create-then-drop that keeps the pointer; non-Iceberg Glue tables are
invisible (checkIfTableIsIceberg)."""

from __future__ import annotations

import os
import threading

import pytest

from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.glue_catalog import (
    ConcurrentModification,
    EntityAlreadyExists,
    GlueCatalog,
    GlueService,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return GlueCatalog(str(tmp_path / "wh"), spark)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"r{i}") for i in range(lo, hi)], "a BIGINT, b STRING"
    ).coalesce(1)


def test_create_load_roundtrip_and_sql(spark, cat):
    t = cat.create_table("t1", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 10))
    t.delete(E.lt("a", 3))
    assert cat.load_table("t1").to_df().count() == 7
    assert cat.list_tables() == ["t1"]
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("t1", "a BIGINT")
    rows = cat.sql("SELECT COUNT(*) AS n FROM t1").collect()
    assert rows[0].n == 7


def test_pointer_is_source_of_truth(spark, cat):
    t = cat.create_table("t2", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))  # v1
    loc = t.location
    orphan = os.path.join(loc, "metadata", "v2.metadata.json")
    with open(orphan, "wb") as f:
        f.write(b'{"torn": "never committed"}')
    assert MD.read_metadata(loc).version == 1
    assert cat.load_table("t2").to_df().count() == 5
    cat.load_table("t2").append(_df(spark, 5, 8))  # claims v2 conditionally
    assert cat.load_table("t2").to_df().count() == 8


def test_stale_handle_version_id_cas(spark, cat):
    t1 = cat.create_table("t3", "a BIGINT, b STRING")
    t1.append(_df(spark, 0, 5))
    t2 = cat.load_table("t3")
    t1.append(_df(spark, 5, 10))  # bumps the versionId
    t2.append(_df(spark, 10, 15))  # conditional update fails once, retries
    assert cat.load_table("t3").to_df().count() == 15


def test_concurrent_appends_serialize_through_version_id(spark, cat):
    # 8 simultaneous committers, no lock anywhere: every commit races
    # on the conditional UpdateTable; the unluckiest can lose once per
    # interleaved winner, so the retry budget scales with contention
    t = cat.create_table(
        "t4", "a BIGINT, b STRING",
        properties={"commit.retry.num-retries": "30"},
    )
    t.append(_df(spark, 0, 1))
    errs = []

    def worker(i):
        try:
            cat.load_table("t4").append(_df(spark, 10 * i, 10 * i + 2))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 9)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert cat.load_table("t4").to_df().count() == 1 + 8 * 2


def test_service_conditional_update_unit():
    """The GlueService primitive itself: update_table with a stale
    versionId raises ConcurrentModificationException; without a
    version_id the update is unconditional (reference: versionId only
    set when the SDK supports it and no LockManager is configured)."""
    svc = GlueService()
    svc.create_database("default")
    svc.create_table("default", "u", parameters={"p": "1"})
    e = svc.get_table("default", "u")
    assert e["version_id"] == "1"
    svc.update_table("default", "u", {"p": "2"}, version_id="1")
    assert svc.get_table("default", "u")["version_id"] == "2"
    with pytest.raises(ConcurrentModification):
        svc.update_table("default", "u", {"p": "3"}, version_id="1")
    svc.update_table("default", "u", {"p": "3"})  # unconditional
    assert svc.get_table("default", "u")["parameters"]["p"] == "3"
    with pytest.raises(EntityAlreadyExists):
        svc.create_table("default", "u")


def test_first_commit_create_race_one_winner(spark, cat):
    """Two catalogs over the SAME service racing the v0 CreateTable:
    exactly one wins (AlreadyExists = lost race)."""
    svc = cat.service
    cat2 = GlueCatalog(cat.warehouse, cat.spark, service=svc)
    t = cat.create_table("race", "a BIGINT")
    assert cat2.table_exists("race")
    with pytest.raises(ValueError, match="already exists"):
        cat2.create_table("race", "a BIGINT")
    assert t.meta.version == 0


def test_rename_create_then_drop(spark, cat):
    t = cat.create_table("r1", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 4))
    cat.rename_table("r1", "r2")
    assert not cat.table_exists("r1")
    assert cat.load_table("r2").to_df().count() == 4
    # the renamed table keeps committing (location unchanged; the
    # backend resolves the entry by location reverse-scan)
    cat.load_table("r2").append(_df(spark, 4, 6))
    assert cat.load_table("r2").to_df().count() == 6
    with pytest.raises(FileNotFoundError):
        cat.rename_table("r1", "r3")


def test_non_iceberg_glue_table_invisible(spark, cat):
    """checkIfTableIsIceberg: a plain Glue table (no ICEBERG
    table_type) is, for Iceberg, the same as no table."""
    cat.service.create_table(
        "default", "csvtab",
        parameters={"metadata_location": "/x/y", "table_type": "HIVE"},
    )
    assert not cat.table_exists("csvtab")
    with pytest.raises(FileNotFoundError, match="not an iceberg"):
        cat.load_table("csvtab")
    assert cat.list_tables() == []


def test_namespaces(spark, cat):
    cat.create_namespace("analytics", {"owner": "ml"})
    assert "analytics" in cat.list_namespaces()
    assert cat.namespace_properties("analytics")["owner"] == "ml"
    t = cat.create_table("analytics.ev", "a BIGINT")
    t.append(spark.createDataFrame([(1,)], "a BIGINT"))
    assert cat.list_tables("analytics") == ["ev"]
    with pytest.raises(ValueError):
        cat.create_namespace("analytics")
    cat.create_namespace("analytics", if_not_exists=True)
    with pytest.raises(ConcurrentModification, match="not empty"):
        cat.drop_namespace("analytics")
    cat.drop_table("analytics.ev")
    cat.drop_namespace("analytics")
    assert "analytics" not in cat.list_namespaces()


def test_time_travel_and_row_level_through_glue(spark, cat):
    t = cat.create_table("tt", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 6))
    s1 = t.current_snapshot().snapshot_id
    t = cat.load_table("tt")
    t.update({"b": "X"}, E.eq("a", 2))
    assert (2, "X") in {
        (r.a, r.b) for r in cat.load_table("tt").to_df().collect()
    }
    old = cat.load_table("tt").scan(snapshot_id=s1).to_df()
    assert (2, "X") not in {(r.a, r.b) for r in old.collect()}


def test_older_metadata_versions_remain_readable(spark, cat):
    """uuid-suffixed documents: canonical v{N} names are never written,
    but a reader pinned to a previous version must still resolve."""
    import json

    t = cat.create_table("told", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 5, 10))
    be = MD.backend_for(t.location)
    cur_v = t.meta.version
    assert cur_v >= 2
    for v in range(cur_v + 1):
        p = os.path.join(t.location, "metadata", f"v{v}.metadata.json")
        assert be.exists(p), f"v{v} invisible"
        assert json.loads(be.read(p))["location"] == t.location
    p = os.path.join(t.location, "metadata", f"v{cur_v + 1}.metadata.json")
    assert not be.exists(p)
    with pytest.raises(FileNotFoundError):
        be.read(p)


def test_glue_with_lock_manager_mode(spark, tmp_path):
    """LockManager mode (reference persistGlueTable: versionId only
    when lockManager == null): commits serialize through
    acquire/release and the UpdateTable goes unconditional; the
    under-lock re-read still rejects stale bases, and 8-way contention
    still lands every append."""
    import threading

    from iceberg_geo_poc_spark.table.dynamodb_catalog import (
        DynamoDbLockManager,
        DynamoService,
    )

    lm = DynamoDbLockManager(
        DynamoService(),
        heartbeat_interval=0.03,
        heartbeat_timeout=0.15,
        acquire_timeout=30.0,
    )
    cat = GlueCatalog(str(tmp_path / "whlm"), spark, lock_manager=lm)
    t = cat.create_table(
        "lk", "a BIGINT, b STRING",
        properties={"commit.retry.num-retries": "30"},
    )
    t.append(_df(spark, 0, 1))
    # stale handle: the under-lock re-read sees the moved pointer and
    # the version check rejects; the engine retry lands it
    stale = cat.load_table("lk")
    t.append(_df(spark, 1, 3))
    stale.append(_df(spark, 3, 5))
    assert cat.load_table("lk").to_df().count() == 5
    errs = []

    def worker(i):
        try:
            cat.load_table("lk").append(_df(spark, 10 * i, 10 * i + 2))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 9)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert cat.load_table("lk").to_df().count() == 5 + 8 * 2
    lm.close()


def test_glue_snapshot_and_register(spark, cat, tmp_path):
    t = cat.create_table("src", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    snap = cat.snapshot_table("src", "snapped")
    assert snap.to_df().count() == 5
    assert snap.meta.properties["gc.enabled"] == "false"
    # register: adopt the source's current metadata under a new name
    ptr = cat.service.get_table("default", "src")["parameters"][
        "metadata_location"
    ]
    reg = cat.register_table("adopted", ptr)
    assert reg.to_df().count() == 5


def test_ambiguous_orphan_docs_refuse(spark, cat):
    """code-review r14: multiple same-version documents (crash
    orphans) make old-version resolution AMBIGUOUS — refuse rather
    than risk answering with an uncommitted document."""
    import os

    t = cat.create_table("amb", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 3))
    t.append(_df(spark, 3, 6))
    be = MD.backend_for(t.location)
    mdir = os.path.join(t.location, "metadata")
    p_v1 = os.path.join(mdir, "v1.metadata.json")
    assert be.exists(p_v1)  # unique doc resolves
    # plant a second v1-* doc (a crash orphan)
    with open(os.path.join(mdir, "v1-deadbeef.metadata.json"), "wb") as f:
        f.write(b'{"torn": true}')
    assert not be.exists(p_v1)
    with pytest.raises(FileNotFoundError):
        be.read(p_v1)
    # the CURRENT version is pointer-resolved, immune to orphans
    assert be.exists(os.path.join(mdir, "v2.metadata.json"))


def test_non_iceberg_commit_rejected_before_doc_write(spark, cat, tmp_path):
    """code-review r14: the checkIfTableIsIceberg rejection must fire
    BEFORE the candidate document writes (no leaked orphan)."""
    import os

    loc = os.path.join(cat.warehouse, "default", "hv")
    cat.service.create_table(
        "default", "hv",
        parameters={"metadata_location": "/x/y", "table_type": "HIVE"},
        location=loc,
    )
    mdir = os.path.join(loc, "metadata")
    with pytest.raises(ValueError, match="not an iceberg"):
        cat.backend.put_if_absent(
            os.path.join(mdir, "v1.metadata.json"), b"{}"
        )
    assert not os.path.exists(mdir) or os.listdir(mdir) == []


def test_out_of_warehouse_location_refused_loudly(cat):
    """code-review r14 advisory: _ident_of sliced location by warehouse
    length without checking the prefix, silently deriving a garbage
    identity for out-of-warehouse locations.  It must refuse loudly on
    the commit path, and _entry_for_location must still resolve
    REGISTERED out-of-warehouse entries via the reverse scan."""
    be = cat.backend
    with pytest.raises(ValueError, match="outside the configured warehouse"):
        be._ident_of("/somewhere/else/db/tbl")
    # a registered entry with an external location still resolves
    cat.service.create_table(
        "default", "ext",
        parameters={"metadata_location": "/elsewhere/ext/metadata/v1.metadata.json",
                    "table_type": "ICEBERG"},
        location="/elsewhere/ext",
    )
    ident, entry = be._entry_for_location("/elsewhere/ext")
    assert ident == ("default", "ext")
    assert entry["location"] == "/elsewhere/ext"
