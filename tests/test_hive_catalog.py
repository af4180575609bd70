"""HiveCatalog: metastore lock/heartbeat commit protocol (reference
hive-metastore/HiveTableOperations.java:170-260 doCommit +
MetastoreLock.java acquire/heartbeat/unlock).

Load-bearing properties: the metadata_location PARAMETER is the
pointer of record (orphan documents invisible); commits serialize
through the EXCLUSIVE per-table lock with a WAITING->ACQUIRED poll;
the base-location check under the lock is the CAS; a lock whose
heartbeats stop is EVICTED after the transaction timeout so a crashed
committer cannot wedge the table — and the evicted holder must NOT be
able to alter the entry afterwards."""

from __future__ import annotations

import os
import threading
import time

import pytest

from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.hive_catalog import (
    HiveCatalog,
    HiveMetastoreService,
    LockException,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return HiveCatalog(str(tmp_path / "wh"), spark)


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
    cat.load_table("t2").append(_df(spark, 5, 8))  # claims v2 under lock
    assert cat.load_table("t2").to_df().count() == 8


def test_stale_handle_base_location_cas(spark, cat):
    t1 = cat.create_table("t3", "a BIGINT, b STRING")
    t1.append(_df(spark, 0, 5))
    t2 = cat.load_table("t3")
    t1.append(_df(spark, 5, 10))  # moves the parameter
    t2.append(_df(spark, 10, 15))  # base-location check fails once, retries
    assert cat.load_table("t3").to_df().count() == 15


def test_concurrent_appends_serialize_through_lock(spark, cat):
    # 8 simultaneous committers: the unluckiest can lose the
    # base-location CAS once per interleaved winner, so the retry
    # budget scales with contention (reference
    # TableProperties.COMMIT_NUM_RETRIES, raised the same way in the
    # reference's own concurrency tests)
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


def test_expired_lock_taken_over_and_holder_fenced(spark, tmp_path):
    """A committer that stops heartbeating loses the lock after the
    transaction timeout: the next waiter acquires, and the evicted
    holder's heartbeat raises (so its commit backs off instead of
    clobbering)."""
    svc = HiveMetastoreService(txn_timeout_sec=0.15)
    svc.create_database("default")
    svc.create_table_entry("default", "tt", "/x/tt")
    lid_a, state_a = svc.lock("default", "tt")
    assert state_a == "ACQUIRED"
    lid_b, state_b = svc.lock("default", "tt")
    assert state_b == "WAITING"
    # A misses its heartbeats; B (like any polling waiter) keeps beating
    time.sleep(0.1)
    svc.heartbeat(lid_b)
    time.sleep(0.1)
    assert svc.check_lock(lid_b) == "ACQUIRED"  # eviction + takeover
    with pytest.raises(LockException):
        svc.heartbeat(lid_a)
    with pytest.raises(LockException):
        svc.check_lock(lid_a)
    svc.unlock(lid_b)


def test_lock_queue_fifo(spark):
    svc = HiveMetastoreService()
    svc.create_database("default")
    a, sa = svc.lock("default", "q")
    b, sb = svc.lock("default", "q")
    c, sc = svc.lock("default", "q")
    assert (sa, sb, sc) == ("ACQUIRED", "WAITING", "WAITING")
    svc.unlock(a)
    assert svc.check_lock(b) == "ACQUIRED"
    assert svc.check_lock(c) == "WAITING"
    svc.unlock(b)
    assert svc.check_lock(c) == "ACQUIRED"


def test_databases_rename_drop(spark, cat):
    cat.create_namespace("raw", {"owner": "ingest"})
    assert "raw" in cat.list_namespaces()
    assert cat.namespace_properties("raw")["owner"] == "ingest"
    t = cat.create_table("raw.ev", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 4))
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("raw")
    cat.rename_table("raw.ev", "raw.ev2")
    assert not cat.table_exists("raw.ev")
    assert cat.load_table("raw.ev2").to_df().count() == 4
    # renamed table keeps its location; commits still arbitrate
    cat.load_table("raw.ev2").append(_df(spark, 4, 6))
    assert cat.load_table("raw.ev2").to_df().count() == 6
    cat.drop_table("raw.ev2")
    assert cat.list_tables("raw") == []
    cat.drop_namespace("raw")
    assert "raw" not in cat.list_namespaces()


def test_time_travel_and_row_level_through_hive(spark, cat):
    cat.sql("CREATE TABLE hsql (a BIGINT, b STRING)")
    _df(spark, 0, 10).createOrReplaceTempView("__hive_src")
    cat.sql("INSERT INTO hsql SELECT * FROM __hive_src")
    cat.sql("UPDATE hsql SET b = 'x' WHERE a >= 8")
    t = cat.load_table("hsql")
    snaps = t.snapshots()
    assert len(snaps) == 2
    assert t.scan(snapshot_id=snaps[0].snapshot_id).to_df().count() == 10
    assert (
        cat.sql("SELECT COUNT(*) AS n FROM hsql WHERE b = 'x'").collect()[0].n
        == 2
    )


def test_hive_views_virtual_view_entries(spark, cat):
    """Views are VIRTUAL_VIEW metastore entries (reference
    HiveViewOperations): pointer in table parameters, replace advances
    it under the table lock, tables and views share the name space but
    table APIs exclude views."""
    t = cat.create_table("vt", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 10))
    cat.sql("CREATE VIEW v_small AS SELECT a FROM vt WHERE a < 3")
    cat.sql("CREATE OR REPLACE VIEW v_small AS SELECT a FROM vt WHERE a < 5")
    assert cat.list_views() == ["v_small"]
    assert cat.list_tables() == ["vt"]  # view excluded from tables
    assert not cat.table_exists("v_small")
    entry = cat.service.get_table("default", "v_small")
    assert entry["parameters"]["table_type"] == "VIRTUAL_VIEW"
    assert len(cat.view_versions("v_small")) == 2
    assert cat.sql("SELECT * FROM v_small VERSION AS OF 1").count() == 3
    assert cat.sql("SELECT * FROM v_small").count() == 5
    cat.sql("DROP VIEW v_small")
    assert cat.list_views() == []
    with pytest.raises(KeyError):
        cat.view_sql("v_small")


def test_hive_view_replace_race_one_loses(spark, cat):
    cat.create_table("vr", "a BIGINT, b STRING").append(_df(spark, 0, 4))
    cat.create_view("vdup", "SELECT a FROM vr")
    stale_entry = cat._view_entry("vdup")
    cat.create_view("vdup", "SELECT a FROM vr WHERE a < 2", replace=True)
    # simulate a racer whose PRE-LOCK read saw the old pointer; the
    # re-read UNDER the lock sees the truth and the base check loses
    calls = {"n": 0}
    real = type(cat)._view_entry

    def fake(name):
        calls["n"] += 1
        return stale_entry if calls["n"] == 1 else real(cat, name)

    cat._view_entry = fake
    try:
        with pytest.raises(MD.CommitConflict):
            cat.create_view("vdup", "SELECT a FROM vr WHERE a < 1", replace=True)
    finally:
        del cat._view_entry
    assert "a < 2" in cat.view_sql("vdup")


def test_hive_snapshot_and_register(spark, cat, tmp_path):
    t = cat.create_table("t8", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    clone = cat.snapshot_table("t8", "t8_clone")
    assert clone.to_df().count() == 5
    clone.append(_df(spark, 5, 8))
    assert cat.load_table("t8_clone").to_df().count() == 8
    assert cat.load_table("t8").to_df().count() == 5
    # register the ORIGINAL's current metadata under a new name
    src = cat.service.get_table("default", "t8")
    from iceberg_geo_poc_spark.table.hive_catalog import METADATA_LOCATION_PROP

    reg = cat.register_table("t8_reg", src["parameters"][METADATA_LOCATION_PROP])
    assert reg.to_df().count() == 5
