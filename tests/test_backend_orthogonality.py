"""Commit-backend orthogonality (VERDICT r13 task 6): the CoW
runtime matched-file narrowing and WAP-branch DML are TABLE-layer
features — they must behave identically no matter which catalog
arbitrates the metadata pointer.  One narrowing shape and one WAP
shape run parameterized over every commit backend {fs, jdbc, nessie,
hive, glue, dynamodb}; any backend-specific breakage (pointer
redirection, version naming, read-path interception) surfaces here."""

from __future__ import annotations

import pytest

from iceberg_geo_poc_spark.table import Catalog
from iceberg_geo_poc_spark.table import expressions as E

BACKENDS = ["fs", "jdbc", "nessie", "hive", "glue", "dynamodb"]


def _make_catalog(kind: str, spark, tmp_path):
    wh = str(tmp_path / f"wh_{kind}")
    if kind == "fs":
        return Catalog(wh, spark)
    if kind == "jdbc":
        from iceberg_geo_poc_spark.table.jdbc_catalog import JdbcCatalog

        return JdbcCatalog(wh, spark)
    if kind == "nessie":
        from iceberg_geo_poc_spark.table.nessie_catalog import NessieCatalog

        return NessieCatalog(wh, spark)
    if kind == "hive":
        from iceberg_geo_poc_spark.table.hive_catalog import HiveCatalog

        return HiveCatalog(wh, spark)
    if kind == "glue":
        from iceberg_geo_poc_spark.table.glue_catalog import GlueCatalog

        return GlueCatalog(wh, spark)
    if kind == "dynamodb":
        from iceberg_geo_poc_spark.table.dynamodb_catalog import DynamoDbCatalog

        return DynamoDbCatalog(wh, spark)
    raise ValueError(kind)


def _mk_interleaved(spark, catalog, name):
    """4 files with fully-overlapping id ranges: stats pruning cannot
    separate them, so any narrowing observed is the runtime probe."""
    t = catalog.create_table(name, "id BIGINT, v STRING")
    for lo, hi in ((1, 100), (2, 99), (3, 98), (4, 97)):
        t.append(
            spark.createDataFrame(
                [(lo, f"lo{lo}"), (hi, f"hi{hi}")], "id BIGINT, v STRING"
            ).coalesce(1)
        )
    return t


@pytest.mark.parametrize("kind", BACKENDS)
def test_cow_narrowing_on_every_backend(kind, spark, tmp_path):
    cat = _make_catalog(kind, spark, tmp_path)
    t = _mk_interleaved(spark, cat, "nar")
    # id=4 is inside every file's [min,max] but present in ONE file
    snap = t.delete(E.eq("id", 4))
    assert snap.summary["candidate-files"] == 4, kind
    assert snap.summary["rewritten-files"] == 1, kind
    t2 = cat.load_table("nar")
    ent = t2._entries()
    assert len(ent[ent.content == "data"]) == 4, kind
    assert sorted(r.id for r in t2.to_df().collect()) == [
        1, 2, 3, 97, 98, 99, 100
    ], kind
    # UPDATE narrows the same way through this backend
    snap = cat.load_table("nar").update({"v": "X"}, E.eq("id", 97))
    assert snap.summary["rewritten-files"] == 1, kind
    assert (97, "X") in {
        (r.id, r.v) for r in cat.load_table("nar").to_df().collect()
    }, kind


@pytest.mark.parametrize("kind", BACKENDS)
def test_wap_branch_dml_on_every_backend(kind, spark, tmp_path):
    cat = _make_catalog(kind, spark, tmp_path)
    t = _mk_interleaved(spark, cat, "wap")
    main_head = t.meta.current_snapshot_id
    spark.conf.set("spark.wap.branch", "audit")
    try:
        cat.sql("DELETE FROM wap WHERE id = 99")
        cat.sql("INSERT INTO wap VALUES (7777, 'wap')")
        t = cat.load_table("wap")
        assert t.meta.refs["audit"]["type"] == "branch", kind
        assert t.meta.current_snapshot_id == main_head, kind  # main untouched
        ids = {r.id for r in cat.sql("SELECT id FROM wap").collect()}
        assert 99 not in ids and 7777 in ids, kind
    finally:
        spark.conf.unset("spark.wap.branch")
    # plain read resolves to main again
    ids = {r.id for r in cat.sql("SELECT id FROM wap").collect()}
    assert 99 in ids and 7777 not in ids, kind
