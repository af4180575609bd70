"""Delta Lake -> engine snapshot migration (reference
delta-lake/.../BaseSnapshotDeltaLakeTableAction.java +
TestSnapshotDeltaLakeTable): replay _delta_log (JSON commits and the
_last_checkpoint parquet), register the LIVE file set zero-copy, map
partitionValues into manifest partition tuples + bounds, and
materialize the physically-absent identity partition columns at read
time."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_geo_poc_spark.table import Catalog
from iceberg_geo_poc_spark.table import expressions as E


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "wh"), spark)


def _write_part(path, ids, vs):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vs, pa.float64())}),
        path,
    )


_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta_action(partition_cols):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA,
            "partitionColumns": partition_cols,
            "configuration": {},
        }
    }


def _commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _mk_delta(tmp_path, name="dl"):
    """Partitioned Delta table: g=a has 2 files (one later REMOVEd),
    g=b has 1; data files OMIT the partition column g."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    _write_part(os.path.join(root, "g=a/part-0000.parquet"), [1, 2], [1.5, 2.5])
    _write_part(os.path.join(root, "g=a/part-0001.parquet"), [3], [3.5])
    _write_part(os.path.join(root, "g=b/part-0002.parquet"), [4, 5], [4.5, 5.5])
    _commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(["g"]),
            {"add": {"path": "g=a/part-0000.parquet", "partitionValues": {"g": "a"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "g=a/part-0001.parquet", "partitionValues": {"g": "a"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    _commit(
        log,
        1,
        [
            {"add": {"path": "g=b/part-0002.parquet", "partitionValues": {"g": "b"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"remove": {"path": "g=a/part-0001.parquet", "deletionTimestamp": 1,
                        "dataChange": True}},
        ],
    )
    return root


def test_snapshot_partitioned_delta(spark, catalog, tmp_path):
    root = _mk_delta(tmp_path)
    t = catalog.snapshot_delta_table(root, "dlt")
    rows = sorted((r.id, r.v, r.g) for r in t.to_df().collect())
    # part-0001 was removed in commit 1: id=3 must be gone; g injected
    assert rows == [(1, 1.5, "a"), (2, 2.5, "a"), (4, 4.5, "b"), (5, 5.5, "b")]
    # partition predicate prunes at the MANIFEST (log-known bounds)
    assert len(t.scan(where=E.eq("g", "b")).files()) == 1
    assert len(t.scan(where=E.eq("g", "a")).files()) == 1
    # data-column stats came from the parquet footers
    assert len(t.scan(where=E.gt("id", 3)).files()) == 1
    assert t.meta.properties["gc.enabled"] == "false"


def test_post_migration_appends_mix(spark, catalog, tmp_path):
    root = _mk_delta(tmp_path, "dl2")
    t = catalog.snapshot_delta_table(root, "dlt2")
    t.append(
        spark.createDataFrame([(9, 9.5, "c")], "id BIGINT, v DOUBLE, g STRING")
    )
    rows = sorted((r.id, r.g) for r in t.to_df().collect())
    assert rows == [(1, "a"), (2, "a"), (4, "b"), (5, "b"), (9, "c")]
    # engine-written file carries g physically; injection is a no-op on
    # it (identity transform), and partition pruning still works
    assert {r.g for r in t.scan(where=E.eq("g", "c")).to_df().collect()} == {"c"}


def test_snapshot_from_checkpoint(spark, catalog, tmp_path):
    """_last_checkpoint short-circuits replay: the checkpoint parquet
    carries the state at N, only commits > N re-apply."""
    root = _mk_delta(tmp_path, "dl3")
    log = os.path.join(root, "_delta_log")
    # checkpoint at version 1 == live set {part-0000 (g=a), part-0002 (g=b)}
    add_t = pa.array(
        [
            {"path": "g=a/part-0000.parquet", "partitionValues": {"g": "a"}},
            {"path": "g=b/part-0002.parquet", "partitionValues": {"g": "b"}},
            None,
        ],
        pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
            ]
        ),
    )
    md = json.loads(json.dumps(_meta_action(["g"])))["metaData"]
    meta_t = pa.array(
        [None, None,
         {"id": md["id"], "schemaString": md["schemaString"],
          "partitionColumns": md["partitionColumns"]}],
        pa.struct(
            [
                ("id", pa.string()),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
            ]
        ),
    )
    pq.write_table(
        pa.table({"add": add_t, "metaData": meta_t}),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 3}, f)
    # poison the pre-checkpoint commit: replay must NOT read it
    os.remove(os.path.join(log, f"{0:020d}.json"))
    # a post-checkpoint commit removes g=b
    _commit(log, 2, [{"remove": {"path": "g=b/part-0002.parquet",
                                 "deletionTimestamp": 2, "dataChange": True}}])
    t = catalog.snapshot_delta_table(root, "dlt3")
    rows = sorted((r.id, r.g) for r in t.to_df().collect())
    assert rows == [(1, "a"), (2, "a")]


def test_unpartitioned_delta(spark, catalog, tmp_path):
    root = str(tmp_path / "dl4")
    log = os.path.join(root, "_delta_log")
    _write_part(os.path.join(root, "part-0000.parquet"), [1, 2], [1.0, 2.0])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    _commit(
        log,
        0,
        [
            {"metaData": {"id": "x", "schemaString": schema,
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "part-0000.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    t = catalog.snapshot_delta_table(root, "dlt4")
    assert "read.inject-partition-values" not in t.meta.properties
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2]


def test_not_a_delta_table(catalog, tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        catalog.snapshot_delta_table(str(tmp_path / "nope"), "x")


def test_decimal_partition_exact_injection_and_pruning(spark, catalog, tmp_path):
    """A decimal partition value with >15 significant digits must
    inject EXACTLY (lit(str).cast(decimal), never through float) and
    its log-known bounds must widen directionally so eq-pruning keeps
    the right file (ADVICE r13: float(value) corrupted both)."""
    from decimal import Decimal

    hi = "1234567890123.4567890123"  # 23 sig digits: float() rounds it
    lo = "2.0000000001"
    root = str(tmp_path / "dldec")
    log = os.path.join(root, "_delta_log")
    _write_part(os.path.join(root, "d=hi/part-0000.parquet"), [1], [1.0])
    _write_part(os.path.join(root, "d=lo/part-0001.parquet"), [2], [2.0])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "d", "type": "decimal(38,10)", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    _commit(
        log,
        0,
        [
            {"metaData": {"id": "x", "schemaString": schema,
                          "partitionColumns": ["d"], "configuration": {}}},
            {"add": {"path": "d=hi/part-0000.parquet",
                     "partitionValues": {"d": hi},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "d=lo/part-0001.parquet",
                     "partitionValues": {"d": lo},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    t = catalog.snapshot_delta_table(root, "dltdec")
    got = {r.id: r.d for r in t.to_df().collect()}
    # exact to the last digit — float round-trip would end ...4567890123
    # with the tail rounded
    assert got[1] == Decimal(hi)
    assert got[2] == Decimal(lo)
    # bounds prune: the widened lower/upper still bracket the exact
    # value, and the two partitions are far enough apart to separate
    assert len(t.scan(where=E.gt("d", 1000.0)).files()) == 1
    assert len(t.scan(where=E.lt("d", 1000.0)).files()) == 1
