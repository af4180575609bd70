"""SnowflakeCatalog: read-only metadata_location resolution (reference
snowflake/SnowflakeCatalog.java:1-269 + SnowflakeTableOperations +
SnowflakeTableMetadata.snowflakeLocationToIcebergLocation).

Load-bearing properties: the catalog resolves tables ANOTHER system
wrote (GET_ICEBERG_TABLE_INFORMATION -> JSON -> metadata document),
identifiers are DATABASE.SCHEMA.TABLE, listTables is SCHEMA-level
only, Snowflake path syntaxes translate (azure:// -> wasbs://,
gcs:// -> gs://), and every mutation refuses."""

from __future__ import annotations

import pytest

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table.snowflake_catalog import (
    SnowflakeCatalog,
    SnowflakeService,
    snowflake_location_to_iceberg_location,
)


@pytest.fixture()
def writer_cat(spark, tmp_path):
    """The writer of record: a plain fs catalog whose tables Snowflake
    'manages' (the test stands in for Snowflake's own write path)."""
    return Catalog(str(tmp_path / "wh"), spark)


@pytest.fixture()
def sf(spark, writer_cat):
    svc = SnowflakeService()
    svc.register_database("analytics")
    svc.register_schema("analytics", "prod")
    return SnowflakeCatalog(spark, svc), svc, writer_cat


def _mk_table(spark, writer_cat, name, n=10):
    t = writer_cat.create_table(name, "a BIGINT, b STRING")
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(n)], "a BIGINT, b STRING"
        )
    )
    return t


def _current_ptr(t):
    import os

    return os.path.join(
        t.location, "metadata", f"v{t.meta.version}.metadata.json"
    )


def test_resolve_and_read(spark, sf):
    cat, svc, writer = sf
    t = _mk_table(spark, writer, "ev")
    svc.register_iceberg_table("analytics", "prod", "ev", _current_ptr(t))
    got = cat.load_table("analytics.prod.ev")
    assert got.to_df().count() == 10
    assert cat.table_exists("analytics.prod.ev")
    assert not cat.table_exists("analytics.prod.nope")
    assert cat.list_tables("analytics.prod") == ["analytics.prod.ev"]
    assert cat.list_namespaces() == ["analytics"]
    assert cat.list_namespaces("analytics") == ["analytics.prod"]
    assert cat.namespace_exists("analytics.prod")
    assert not cat.namespace_exists("analytics.dev")


def test_resolution_follows_the_writer(spark, sf):
    """Each load re-queries GET_ICEBERG_TABLE_INFORMATION: after the
    writer commits and Snowflake's answer moves, the reader sees the
    new version (doRefresh posture, not a pinned static clone)."""
    cat, svc, writer = sf
    t = _mk_table(spark, writer, "mv", 5)
    svc.register_iceberg_table("analytics", "prod", "mv", _current_ptr(t))
    assert cat.load_table("analytics.prod.mv").to_df().count() == 5
    t.append(spark.createDataFrame([(99, "x")], "a BIGINT, b STRING"))
    svc.register_iceberg_table("analytics", "prod", "mv", _current_ptr(t))
    assert cat.load_table("analytics.prod.mv").to_df().count() == 6


def test_loaded_table_is_read_only(spark, sf):
    cat, svc, writer = sf
    t = _mk_table(spark, writer, "ro")
    svc.register_iceberg_table("analytics", "prod", "ro", _current_ptr(t))
    got = cat.load_table("analytics.prod.ro")
    with pytest.raises(ValueError, match="SnowflakeCatalog"):
        got.append(spark.createDataFrame([(1, "x")], "a BIGINT, b STRING"))
    with pytest.raises(ValueError, match="SnowflakeCatalog"):
        got.delete(E.eq("a", 1))
    # scans (incl. time travel over the resolved doc) still work
    assert got.scan(where=E.lt("a", 3)).to_df().count() == 3


def test_catalog_mutations_refuse(sf):
    cat, _, _ = sf
    with pytest.raises(NotImplementedError, match="createTable"):
        cat.create_table("analytics.prod.x", "a BIGINT")
    with pytest.raises(NotImplementedError, match="dropTable"):
        cat.drop_table("analytics.prod.x")
    with pytest.raises(NotImplementedError, match="renameTable"):
        cat.rename_table("a.b.c", "a.b.d")
    with pytest.raises(NotImplementedError, match="createNamespace"):
        cat.create_namespace("new")
    with pytest.raises(NotImplementedError, match="dropNamespace"):
        cat.drop_namespace("analytics")


def test_identifier_and_level_validation(sf):
    cat, _, _ = sf
    with pytest.raises(ValueError, match="DATABASE.SCHEMA.TABLE"):
        cat.load_table("justtable")
    with pytest.raises(ValueError, match="SCHEMA level"):
        cat.list_tables("analytics")
    with pytest.raises(ValueError, match="max namespace depth"):
        cat.list_namespaces("analytics.prod")


def test_snowflake_path_translation():
    assert (
        snowflake_location_to_iceberg_location(
            "azure://acct.blob.core.windows.net/container/vol/path"
        )
        == "wasbs://container@acct.blob.core.windows.net/vol/path"
    )
    assert (
        snowflake_location_to_iceberg_location("gcs://bucket/p/q")
        == "gs://bucket/p/q"
    )
    assert (
        snowflake_location_to_iceberg_location("s3://bucket/p")
        == "s3://bucket/p"
    )
    assert (
        snowflake_location_to_iceberg_location("/posix/path/v1.metadata.json")
        == "/posix/path/v1.metadata.json"
    )
    with pytest.raises(ValueError, match="failed to match"):
        snowflake_location_to_iceberg_location("azure://not-a-valid-host")
