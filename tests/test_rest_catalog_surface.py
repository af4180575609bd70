"""RestCatalog: the full catalog lifecycle with the service as the ONLY
metadata authority (reference RESTSessionCatalog surface — config
negotiation, namespaces, table registry, bearer auth), data files on an
object-store FileIO (pyarrow mock fs)."""

from __future__ import annotations

import uuid

import pytest
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.table.fileio import ArrowFSFileIO, register_file_io
from iceberg_geo_poc_spark.table.rest_catalog import CatalogService, RestCatalog

TOKEN = "secret-bearer"


@pytest.fixture()
def service():
    return CatalogService(
        defaults={"write.metadata.compression": "none", "client.pool": "2"},
        overrides={"commit.retry.num-retries": "7"},
        token=TOKEN,
    )


@pytest.fixture()
def warehouse():
    import pyarrow.fs as pafs

    scheme = f"rest{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    register_file_io(wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme))
    return wh


def _cat(service, warehouse, spark, **kw):
    return RestCatalog(
        service.handle, spark, warehouse=warehouse, token=TOKEN, **kw
    )


def test_auth_rejected_without_token(service, warehouse, spark):
    with pytest.raises(PermissionError):
        RestCatalog(service.handle, spark, warehouse=warehouse, token="wrong")


def test_config_negotiation_merge(service, warehouse, spark):
    cat = _cat(
        service, warehouse, spark,
        properties={"client.pool": "8", "commit.retry.num-retries": "1"},
    )
    # defaults < client-supplied < server overrides
    assert cat.properties["write.metadata.compression"] == "none"
    assert cat.properties["client.pool"] == "8"
    assert cat.properties["commit.retry.num-retries"] == "7"


def test_namespace_crud(service, warehouse, spark):
    cat = _cat(service, warehouse, spark)
    cat.create_namespace("prod", {"owner": "data-eng"})
    cat.create_namespace("prod.events")
    with pytest.raises(ValueError):  # parent must exist first
        cat.create_namespace("stage.raw")
    with pytest.raises(ValueError):  # duplicate
        cat.create_namespace("prod")
    assert cat.list_namespaces() == ["prod"]
    assert cat.list_namespaces("prod") == ["prod.events"]
    assert cat.namespace_properties("prod") == {"owner": "data-eng"}
    props = cat.update_namespace("prod", {"tier": "gold"}, removals=["owner"])
    assert props == {"tier": "gold"}
    with pytest.raises(ValueError):  # non-empty: child namespace exists
        cat.drop_namespace("prod")
    cat.drop_namespace("prod.events")
    cat.drop_namespace("prod")
    assert not cat.namespace_exists("prod")


def test_table_lifecycle_service_authoritative(service, warehouse, spark):
    cat = _cat(service, warehouse, spark)
    cat.create_namespace("prod")
    cat.create_namespace("prod.events")
    t = cat.create_table("prod.events.clicks", "id BIGINT, cat STRING")
    t.append(
        spark.range(50).select(
            "id", (F.col("id") % 3).cast("string").alias("cat")
        )
    )
    assert cat.list_tables("prod.events") == ["clicks"]
    assert cat.table_exists("prod.events.clicks")
    assert not cat.table_exists("prod.events.ghost")
    got = cat.load_table("prod.events.clicks").to_df()
    assert got.count() == 50
    # name claim is arbitrated in the service: second create conflicts
    with pytest.raises(ValueError):
        cat.create_table("prod.events.clicks", "id BIGINT")
    # a second client against the same service sees the same catalog
    cat2 = _cat(service, warehouse, spark)
    assert cat2.list_tables("prod.events") == ["clicks"]
    assert cat2.load_table("prod.events.clicks").to_df().count() == 50
    # metadata documents live in the service, nowhere else
    assert service.handle(
        {"op": "list", "path": f"{warehouse}/prod/events/clicks/", "token": TOKEN}
    )["paths"]
    cat.drop_table("prod.events.clicks", purge=True)
    assert cat.list_tables("prod.events") == []
    assert not service.handle(
        {"op": "list", "path": f"{warehouse}/prod/events/clicks/", "token": TOKEN}
    )["paths"]
    cat.drop_namespace("prod.events")
    cat.drop_namespace("prod")


def test_create_rolls_back_registry_on_failure(service, warehouse, spark):
    cat = _cat(service, warehouse, spark)
    cat.create_namespace("ns")
    with pytest.raises(ValueError):
        cat.create_table("ns.bad", "id BIGINT", file_format="bogus")
    # the claimed name was released, so a corrected create succeeds
    assert cat.list_tables("ns") == []
    cat.create_table("ns.bad", "id BIGINT")
    assert cat.list_tables("ns") == ["bad"]


def test_namespace_scoped_ddl_surface(service, warehouse, spark):
    cat = _cat(service, warehouse, spark)
    cat.create_namespace("ddl")
    cat.create_table("ddl.t", "id BIGINT, v DOUBLE")
    inner = cat.catalog_for_namespace("ddl")
    inner.alter_table_properties("t", {"commit.manifest.min-count-to-merge": "4"})
    t = cat.load_table("ddl.t")
    assert t.meta.properties["commit.manifest.min-count-to-merge"] == "4"
    with pytest.raises(ValueError):
        cat.catalog_for_namespace("missing")


def test_view_lifecycle_versioned(service, spark, tmp_path):
    """REST view verbs (reference REST spec /views endpoints): CREATE
    refuses duplicates without replace, versions are 1-based and
    pinnable, list/drop work, and select_view executes the stored SQL
    through the namespace catalog's dispatcher."""
    cat = RestCatalog(
        service.handle, spark, warehouse=str(tmp_path / "wh"), token=TOKEN
    )
    cat.create_namespace("mart")
    t = cat.create_table("mart.kv", "k BIGINT, v STRING")
    t.append(spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(10)], "k BIGINT, v STRING"
    ).coalesce(1))
    assert cat.create_view(
        "mart.top", "SELECT v, COUNT(*) AS n FROM kv GROUP BY v"
    ) == 1
    with pytest.raises(ValueError):
        cat.create_view("mart.top", "SELECT 1 AS x")
    assert cat.create_view(
        "mart.top",
        "SELECT v, COUNT(*) AS n FROM kv WHERE k >= 8 GROUP BY v",
        replace=True,
    ) == 2
    assert cat.list_views("mart") == ["top"]
    v1 = {(r.v, r.n) for r in cat.select_view("mart.top", version=1).collect()}
    v2 = {(r.v, r.n) for r in cat.select_view("mart.top").collect()}
    assert v1 == {("a", 5), ("b", 5)}
    assert v2 == {("a", 1), ("b", 1)}
    cat.drop_view("mart.top")
    assert cat.list_views("mart") == []
    with pytest.raises(ValueError):
        cat.view_sql("mart.top")


def test_paginated_listings(service, warehouse, spark):
    """List endpoints paginate (reference REST spec pageToken/pageSize;
    RESTSessionCatalog drains pages until no next-page-token): the
    client reassembles the full listing across pages, both via the
    rest.page-size config property and an explicit page_size."""
    cat = _cat(service, warehouse, spark)
    cat.create_namespace("paged")
    for i in range(7):
        cat.create_namespace(f"paged.ns{i}")
        cat.create_table(f"paged.ns0.t{i}", "a BIGINT")
        cat.create_view(f"paged.ns0.v{i}", "SELECT 1 AS x")
    # server-side slicing honored: one raw page holds page_size entries
    page = service.handle({
        "op": "list_tables", "namespace": "paged.ns0",
        "page_size": 3, "token": TOKEN,
    })
    assert page["tables"] == ["t0", "t1", "t2"]
    assert page["next_page_token"] == "3"
    # client drains all pages, any size, including size > total
    for size in (1, 2, 3, 100):
        assert cat.list_tables("paged.ns0", page_size=size) == [
            f"t{i}" for i in range(7)
        ]
        assert cat.list_namespaces("paged", page_size=size) == [
            f"paged.ns{i}" for i in range(7)
        ]
        assert cat.list_views("paged.ns0", page_size=size) == [
            f"v{i}" for i in range(7)
        ]
    # rest.page-size property paginates implicitly
    cat2 = _cat(service, warehouse, spark, properties={"rest.page-size": "2"})
    assert cat2.list_tables("paged.ns0") == [f"t{i}" for i in range(7)]


def test_oauth_token_refresh_on_401(service, warehouse, spark):
    """Client-credentials flow (reference OAuth2Util / AuthSession):
    a credentialed client exchanges the credential for a bearer token;
    when the service invalidates issued tokens (expiry), the next
    request 401s and the client refreshes ONCE and retries."""
    svc = CatalogService(
        defaults={"write.metadata.compression": "none"},
        credential="client-id:client-secret",
    )
    with pytest.raises(PermissionError):
        RestCatalog(svc.handle, spark, warehouse=warehouse, credential="wrong")
    cat = RestCatalog(
        svc.handle, spark, warehouse=warehouse,
        credential="client-id:client-secret",
    )
    cat.create_namespace("oa")
    tok_before = cat._token
    svc.revoke_issued_tokens()  # simulate token expiry
    # transparently refreshes and succeeds
    cat.create_namespace("oa.sub")
    assert cat._token != tok_before
    assert cat.list_namespaces("oa") == ["oa.sub"]
    # a static-token client without a credential cannot refresh: hard 401
    svc2 = CatalogService(token="fixed", credential="c:s")
    cat2 = RestCatalog(svc2.handle, spark, warehouse=warehouse, token="fixed")
    svc2._token = "rotated-away"
    with pytest.raises(PermissionError):
        cat2.create_namespace("nope")


def test_metrics_reports_reach_service(service, warehouse, spark):
    """Scan/commit reports flow to the service's /metrics endpoint
    (reference RESTSessionCatalog.java:407,421 + RESTMetricsReporter):
    an append POSTs a commit-report, a filtered scan a scan-report,
    both stamped with the table identity; a broken transport is
    swallowed (reporting never fails the query)."""
    from iceberg_geo_poc_spark.table.rest_catalog import RestMetricsReporter

    cat = _cat(service, warehouse, spark)
    cat.create_namespace("obs")
    t = cat.create_table("obs.m", "a BIGINT, b STRING")
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(6)], "a BIGINT, b STRING"
        ).coalesce(1)
    )
    from iceberg_geo_poc_spark.table import expressions as E

    assert cat.load_table("obs.m").scan(E.ge("a", 0)).to_df().count() == 6
    reports = service.metrics_reports()
    kinds = {m["report-type"] for m in reports}
    assert kinds == {"commit-report", "scan-report"}
    assert all(
        m["namespace"] == "obs" and m["name"] == "m" for m in reports
    )
    commit = next(
        m["report"] for m in reports if m["report-type"] == "commit-report"
    )
    assert commit["added_records"] == 6 and commit["added_data_files"] == 1
    assert commit["operation"] == "append"
    scan = next(
        m["report"] for m in reports if m["report-type"] == "scan-report"
    )
    assert scan["result_data_files"] == 1
    assert scan["filter_desc"] is not None
    # reporter failures are swallowed (reporting must not break queries)
    def broken(req):
        raise ConnectionError("service down")

    RestMetricsReporter(broken, "obs", "m").report(
        type("R", (), {"__name__": "x"})  # arbitrary payload, still safe
    )
