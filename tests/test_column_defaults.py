"""Default column values (Iceberg v3 initial-default / write-default).

Spec semantics under test (Iceberg spec "Default values"; reference
TableMetadata default plumbing):

- initial-default: every row of a file committed BEFORE the column
  evolution reads the default — applied at scan time, no rewrite;
- write-default: a later writer that OMITS the column entirely gets it
  filled; a writer that supplies the column keeps its values, explicit
  NULLs included (absent-column vs null-value are different things);
- rewrites (compaction, CoW) materialize the resolved values
  physically without drifting them.
"""

from __future__ import annotations

import pytest

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table import maintenance as MAINT


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


def _chan(t):
    return {r.a: r.channel for r in t.to_df().collect()}


def _mk_evolved(spark, catalog, name):
    t = catalog.create_table(name, "a BIGINT, b STRING")
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(10)], "a BIGINT, b STRING"
        ).coalesce(1)
    )
    return catalog.add_column_with_default(
        name, "channel", "STRING", initial_default="legacy", write_default="web"
    )


def test_initial_default_for_pre_evolution_rows(spark, catalog):
    t = _mk_evolved(spark, catalog, "d1")
    assert _chan(t) == {i: "legacy" for i in range(10)}


def test_write_default_fills_omitted_column(spark, catalog):
    t = _mk_evolved(spark, catalog, "d2")
    t.append(
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(10, 15)], "a BIGINT, b STRING"
        ).coalesce(1)
    )
    got = _chan(t)
    assert all(got[i] == "legacy" for i in range(10))
    assert all(got[i] == "web" for i in range(10, 15))


def test_explicit_values_and_nulls_kept(spark, catalog):
    t = _mk_evolved(spark, catalog, "d3")
    t.append(
        spark.createDataFrame(
            [(20, "x", "app"), (21, "y", None)],
            "a BIGINT, b STRING, channel STRING",
        ).coalesce(1)
    )
    got = _chan(t)
    assert got[20] == "app"
    assert got[21] is None  # explicit NULL survives (not write-default)
    assert got[0] == "legacy"


def test_defaults_materialize_through_compaction(spark, catalog):
    t = _mk_evolved(spark, catalog, "d4")
    t.append(
        spark.createDataFrame(
            [(10, "n", None), (11, "n", "app")],
            "a BIGINT, b STRING, channel STRING",
        ).coalesce(1)
    )
    before = _chan(t)
    res = MAINT.rewrite_data_files(
        t, target_file_size=512 * 1024 * 1024, min_input_files=2
    )
    assert res.rewritten_files > 0
    t = catalog.load_table("d4")
    assert _chan(t) == before
    # after compaction no live file predates the evolution, so the scan
    # takes the verbatim branch (values are physical now)
    ent = t._entries()
    data = ent[ent.content == "data"]
    added = t.meta.column_defaults["channel"]["added-at-seq"]
    assert (data.sequence_number > added).all()


def test_cow_delete_preserves_defaults(spark, catalog):
    t = _mk_evolved(spark, catalog, "d5")
    t.delete(E.lt("a", 3))
    t = catalog.load_table("d5")
    got = _chan(t)
    assert set(got) == set(range(3, 10))
    assert all(v == "legacy" for v in got.values())


def test_predicate_on_defaulted_column(spark, catalog):
    t = _mk_evolved(spark, catalog, "d6")
    t.append(
        spark.createDataFrame(
            [(10, "n", "app")], "a BIGINT, b STRING, channel STRING"
        ).coalesce(1)
    )
    rows = t.scan(where=E.eq("channel", "legacy")).to_df().collect()
    assert sorted(r.a for r in rows) == list(range(10))


def test_duplicate_add_rejected(spark, catalog):
    _mk_evolved(spark, catalog, "d7")
    with pytest.raises(ValueError):
        catalog.add_column_with_default(
            "d7", "channel", "STRING", initial_default="x"
        )


def test_defaults_survive_metadata_roundtrip(spark, catalog):
    _mk_evolved(spark, catalog, "d8")
    t = catalog.load_table("d8")  # fresh read of serialized metadata
    d = t.meta.column_defaults["channel"]
    assert d["initial"] == "legacy" and d["write"] == "web"
    assert _chan(t)[0] == "legacy"


def test_sql_add_column_default(spark, tmp_path):
    from iceberg_geo_poc_spark.table import Catalog

    cat = Catalog(str(tmp_path / "wh_sqld"), spark)
    cat.sql("CREATE TABLE dft (id BIGINT, name STRING)")
    t = cat.load_table("dft")
    t.append(spark.createDataFrame([(1, "a")], "id LONG, name STRING"))
    cat.sql("ALTER TABLE dft ADD COLUMN score DOUBLE DEFAULT 1.5")
    t = cat.load_table("dft")
    # pre-evolution rows read the initial default
    assert t.to_df().collect()[0]["score"] == 1.5
    # writers omitting the column get the write default
    t.append(spark.createDataFrame([(2, "b")], "id LONG, name STRING"))
    got = {r["id"]: r["score"] for r in t.to_df().collect()}
    assert got == {1: 1.5, 2: 1.5}
    # string defaults parse through quotes
    cat.sql("ALTER TABLE dft ADD COLUMN tag STRING DEFAULT 'x'")
    t = cat.load_table("dft")
    assert {r["tag"] for r in t.to_df().collect()} == {"x"}
