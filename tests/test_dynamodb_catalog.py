"""DynamoDbCatalog: conditional-expression commit protocol (reference
aws/dynamodb/DynamoDbCatalog.java:1-698 + DynamoDbTableOperations.java
persistTable:200-250).

Load-bearing properties: items keyed by (identifier, namespace) with a
uuid version attribute ``v`` rotated on EVERY write; commits are
UpdateItem conditional on the version the committer read
(ConditionalCheckFailedException = lost race = retry); first commit is
PutItem with attribute_not_exists(v); rename is an ATOMIC
TransactWriteItems [conditional Delete, conditional Put]; drop is a
conditional DeleteItem."""

from __future__ import annotations

import os
import threading

import pytest

from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.dynamodb_catalog import (
    ConditionalCheckFailed,
    DynamoDbCatalog,
    DynamoService,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return DynamoDbCatalog(str(tmp_path / "wh"), spark)


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
    assert cat.sql("SELECT COUNT(*) AS n FROM t1").collect()[0].n == 7


def test_pointer_is_source_of_truth(spark, cat):
    t = cat.create_table("t2", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))  # v1
    orphan = os.path.join(t.location, "metadata", "v2.metadata.json")
    with open(orphan, "wb") as f:
        f.write(b'{"torn": "never committed"}')
    assert MD.read_metadata(t.location).version == 1
    cat.load_table("t2").append(_df(spark, 5, 8))
    assert cat.load_table("t2").to_df().count() == 8


def test_stale_handle_conditional_update(spark, cat):
    t1 = cat.create_table("t3", "a BIGINT, b STRING")
    t1.append(_df(spark, 0, 5))
    t2 = cat.load_table("t3")
    t1.append(_df(spark, 5, 10))  # rotates the item version
    t2.append(_df(spark, 10, 15))  # condition fails once, retries
    assert cat.load_table("t3").to_df().count() == 15


def test_concurrent_appends_serialize_through_condition(spark, cat):
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


def test_service_conditionals_unit():
    svc = DynamoService()
    svc.put_item({"identifier": "NAMESPACE", "namespace": "d"})
    with pytest.raises(ConditionalCheckFailed):
        svc.put_item({"identifier": "NAMESPACE", "namespace": "d"})
    row = svc.get_item("NAMESPACE", "d")
    v1 = row["v"]
    svc.update_item("NAMESPACE", "d", {"p.x": "1"}, expected_version=v1)
    with pytest.raises(ConditionalCheckFailed):
        svc.update_item("NAMESPACE", "d", {"p.x": "2"}, expected_version=v1)
    v2 = svc.get_item("NAMESPACE", "d")["v"]
    assert v2 != v1 and svc.get_item("NAMESPACE", "d")["p.x"] == "1"
    with pytest.raises(ConditionalCheckFailed):
        svc.delete_item("NAMESPACE", "d", expected_version=v1)
    svc.delete_item("NAMESPACE", "d", expected_version=v2)
    assert svc.get_item("NAMESPACE", "d") is None


def test_transactional_rename_atomicity(spark, cat):
    t = cat.create_table("r1", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 4))
    cat.rename_table("r1", "r2")
    assert not cat.table_exists("r1")
    assert cat.load_table("r2").to_df().count() == 4
    # renamed table keeps committing (location unchanged)
    cat.load_table("r2").append(_df(spark, 4, 6))
    assert cat.load_table("r2").to_df().count() == 6
    # rename onto an existing name: the transaction refuses ATOMICALLY —
    # the source row survives
    cat.create_table("r3", "a BIGINT")
    with pytest.raises(ConditionalCheckFailed):
        cat.rename_table("r2", "r3")
    assert cat.table_exists("r2") and cat.table_exists("r3")


def test_namespaces_as_sentinel_items(spark, cat):
    cat.create_namespace("analytics", {"owner": "ml"})
    assert "analytics" in cat.list_namespaces()
    assert cat.namespace_properties("analytics")["owner"] == "ml"
    t = cat.create_table("analytics.ev", "a BIGINT")
    t.append(spark.createDataFrame([(1,)], "a BIGINT"))
    assert cat.list_tables("analytics") == ["ev"]
    with pytest.raises(ValueError):
        cat.create_namespace("analytics")
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("analytics")
    cat.drop_table("analytics.ev")
    cat.drop_namespace("analytics")
    assert "analytics" not in cat.list_namespaces()
    with pytest.raises(KeyError):
        cat.create_table("missing_ns.t", "a BIGINT")


def test_time_travel_and_row_level_through_dynamo(spark, cat):
    t = cat.create_table("tt", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 6))
    s1 = t.current_snapshot().snapshot_id
    cat.load_table("tt").update({"b": "X"}, E.eq("a", 2))
    assert (2, "X") in {
        (r.a, r.b) for r in cat.load_table("tt").to_df().collect()
    }
    old = cat.load_table("tt").scan(snapshot_id=s1).to_df()
    assert (2, "X") not in {(r.a, r.b) for r in old.collect()}


def test_older_metadata_versions_remain_readable(spark, cat):
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


def test_dynamo_snapshot_and_register(spark, cat):
    t = cat.create_table("src", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    snap = cat.snapshot_table("src", "snapped")
    assert snap.to_df().count() == 5
    assert snap.meta.properties["gc.enabled"] == "false"
    ptr = cat.service.get_item("default.src", "default")["p.metadata_location"]
    reg = cat.register_table("adopted", ptr)
    assert reg.to_df().count() == 5
