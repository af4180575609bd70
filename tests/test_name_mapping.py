"""Name mapping (reference NameMapping.java) + metadata columns."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from iceberg_geo_poc_spark.table import Catalog, E


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "wh"), spark)


def _foreign_dir(spark, tmp_path, rows, schema):
    d = str(tmp_path / "foreign")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    import glob

    return sorted(glob.glob(f"{d}/*.parquet"))


def test_mapped_import_reads_and_prunes(catalog, spark, tmp_path):
    t = catalog.create_table("m", "id BIGINT, val DOUBLE, tag STRING")
    t.append(
        spark.createDataFrame(
            [(1, 1.5, "native")], "id LONG, val DOUBLE, tag STRING"
        )
    )
    files = _foreign_dir(
        spark,
        tmp_path,
        [(100, 9.5, "imported"), (200, 0.5, "imported")],
        "ident LONG, amount DOUBLE, tag STRING",
    )
    catalog.add_files(
        "m", files, name_mapping={"ident": "id", "amount": "val"}
    )
    t = catalog.load_table("m")
    got = sorted(
        (r["id"], r["val"], r["tag"]) for r in t.to_df().collect()
    )
    assert got == [(1, 1.5, "native"), (100, 9.5, "imported"), (200, 0.5, "imported")]
    # manifest stats were rekeyed to canonical names -> pruning works
    ent = t._entries()
    imported = ent[ent.file_path.isin(files)].iloc[0]
    assert json.loads(imported.lower)["id"] == 100
    assert json.loads(imported.upper)["val"] == 9.5
    # predicate on a mapped column: correct rows from both populations
    rows = sorted(
        r["id"] for r in t.scan(where=E.gt("val", 1.0)).to_df().collect()
    )
    assert rows == [1, 100]
    # property persisted in reference form
    assert json.loads(
        t.meta.properties["schema.name-mapping.default"]
    ) == {"ident": "id", "amount": "val"}


def test_mapping_validation(catalog, spark, tmp_path):
    catalog.create_table("v", "id BIGINT, val DOUBLE")
    files = _foreign_dir(spark, tmp_path, [(1, 2.0)], "a LONG, b DOUBLE")
    with pytest.raises(ValueError, match="not in table schema"):
        catalog.add_files("v", files, name_mapping={"a": "nope"})
    with pytest.raises(ValueError, match="collides"):
        catalog.add_files("v", files, name_mapping={"id": "val"})


def test_metadata_columns_scan(catalog, spark):
    t = catalog.create_table(
        "mc", "id BIGINT, grp STRING", partition_by=[("grp", "identity")]
    )
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(10)], "id LONG, grp STRING"
        )
    )
    df = t.scan(metadata_columns=True).to_df()
    rows = df.collect()
    assert all(r["_file"] and r["_pos"] >= 0 for r in rows)
    for r in rows:
        assert json.loads(r["_partition"])["grp"] == r["grp"]
    # positions are per-file row indexes
    assert min(r["_pos"] for r in rows) == 0
    # MoR delete: deleted rows vanish but metadata columns survive
    t.delete(E.eq("id", 0), mode="merge-on-read")
    t = catalog.load_table("mc")
    rows2 = t.scan(metadata_columns=True).to_df().collect()
    assert len(rows2) == 9 and all(r["_file"] for r in rows2)


def test_timestamp_ns_day_transform_partitions(catalog, spark):
    t = catalog.create_table(
        "ns",
        "id BIGINT, ts_ns BIGINT",
        partition_by=[("ts_ns", "day")],
        properties={"schema.timestamp-ns-columns": '["ts_ns"]'},
    )
    day = 86_400 * 1_000_000_000
    rows = [(i, i % 3 * day + 12_345 + i) for i in range(30)]
    t.append(spark.createDataFrame(rows, "id LONG, ts_ns LONG"))
    ent = t._entries()
    parts = {
        json.loads(r.partition)["ts_ns_day"]
        for r in ent[ent.content == "data"].itertuples()
    }
    assert parts == {"1970-01-01", "1970-01-02", "1970-01-03"}
    # exact int64 range scan prunes to one day's files
    scan = t.scan(where=E.and_(E.ge("ts_ns", day), E.lt("ts_ns", 2 * day)))
    assert len(scan.files()) < scan.total_data_files()
    assert sorted(r["id"] for r in scan.to_df().collect()) == [
        i for i in range(30) if i % 3 == 1
    ]


def test_timestamp_ns_negative_epoch_floors(catalog, spark):
    # Pre-1970 nanos must FLOOR into the earlier day (reference
    # Timestamps.java rides Math.floorDiv) — -1ns is 1969-12-31, and a
    # full negative day lands on 1969-12-31 too, not 1969-12-30.
    t = catalog.create_table(
        "nsneg",
        "id BIGINT, ts_ns BIGINT",
        partition_by=[("ts_ns", "day")],
        properties={"schema.timestamp-ns-columns": '["ts_ns"]'},
    )
    day = 86_400 * 1_000_000_000
    rows = [(0, -1), (1, -day), (2, -day - 1), (3, 0), (4, 1)]
    t.append(spark.createDataFrame(rows, "id LONG, ts_ns LONG"))
    ent = t._entries()
    by_id = {}
    for r in ent[ent.content == "data"].itertuples():
        part = json.loads(r.partition)["ts_ns_day"]
        by_id[part] = by_id.get(part, 0) + int(r.record_count)
    assert by_id == {"1969-12-30": 1, "1969-12-31": 2, "1970-01-01": 2}
