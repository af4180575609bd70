"""HTTP binding of the catalog service (table/rest_http.py): full
lifecycle and RACING commits across a real TCP round-trip."""

from __future__ import annotations

import threading
import uuid

import pytest
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.fileio import ArrowFSFileIO, register_file_io
from iceberg_geo_poc_spark.table.rest_catalog import (
    CatalogService,
    RestCatalog,
    ServiceCommitBackend,
)
from iceberg_geo_poc_spark.table.rest_http import HttpTransport, serve_catalog


@pytest.fixture()
def http_service():
    svc = CatalogService(
        overrides={"commit.retry.num-retries": "9"}, token="http-tok"
    )
    url, shutdown = serve_catalog(svc)
    yield svc, url
    shutdown()


def test_transport_verbs_and_auth(http_service):
    svc, url = http_service
    t = HttpTransport(url, token="http-tok")
    assert t({"op": "create", "path": "a/b", "body": b"\x00\xffbin"})["status"] == 201
    assert t({"op": "create", "path": "a/b", "body": b"x"})["status"] == 409
    assert t({"op": "get", "path": "a/b"})["body"] == b"\x00\xffbin"
    assert t({"op": "list", "path": "a/"})["paths"] == ["a/b"]
    # wrong/missing token -> 401 from the service through the wire
    bad = HttpTransport(url, token="nope")
    assert bad({"op": "head", "path": "a/b"})["status"] == 401
    assert HttpTransport(url)({"op": "head", "path": "a/b"})["status"] == 401


def test_rest_catalog_lifecycle_over_http(http_service, spark):
    svc, url = http_service
    import pyarrow.fs as pafs

    scheme = f"http{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    register_file_io(wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme))
    cat = RestCatalog(HttpTransport(url, token="http-tok"), spark, warehouse=wh)
    assert cat.properties["commit.retry.num-retries"] == "9"
    cat.create_namespace("web")
    t = cat.create_table("web.pages", "id BIGINT, host STRING")
    t.append(
        spark.range(40).select(
            "id", (F.col("id") % 5).cast("string").alias("host")
        )
    )
    assert cat.list_tables("web") == ["pages"]
    assert cat.load_table("web.pages").to_df().count() == 40
    # every metadata document reached the service over HTTP
    docs = HttpTransport(url, token="http-tok")(
        {"op": "list", "path": f"{wh}/web/pages/"}
    )["paths"]
    assert any(p.endswith(".metadata.json") for p in docs)


def test_racing_commits_across_http(http_service, spark):
    """Two writers committing through separate HTTP transports: the
    service's conditional create arbitrates exactly one winner per
    version; the loser's retry loop lands on the refreshed base."""
    svc, url = http_service
    import pyarrow.fs as pafs

    scheme = f"race{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    register_file_io(wh + "/", ArrowFSFileIO(pafs._MockFileSystem(), scheme))
    MD.register_commit_backend(
        wh + "/", ServiceCommitBackend(HttpTransport(url, token="http-tok"))
    )
    from iceberg_geo_poc_spark.table.catalog import Catalog

    cat = Catalog(wh, spark)
    cat.create_table("c", "id BIGINT, v DOUBLE")
    errs: list[Exception] = []

    def run(base):
        try:
            Catalog(wh, spark).load_table("c").append(
                spark.range(50).select(
                    (F.col("id") + base).alias("id"),
                    (F.col("id") * 0.5).alias("v"),
                )
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=run, args=(b,)) for b in (0, 1000)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    t = cat.load_table("c")
    assert t.to_df().count() == 100
    assert len(t.meta.snapshots) == 2


def test_sigv4_enforced_endpoint_roundtrip():
    """The IAM-fronted deployment shape (reference RESTSigV4Signer):
    the server enforces SigV4; a signed transport's verbs work, the
    bearer token survives relocation to Original-Authorization, and
    unsigned / wrongly-keyed requests are refused before the service
    runs."""
    from iceberg_geo_poc_spark.table.rest_sigv4 import RESTSigV4Signer

    svc = CatalogService(token="http-tok")
    sk = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
    url, shutdown = serve_catalog(svc, sigv4_secret=sk)
    try:
        signer = RESTSigV4Signer().initialize(
            {
                "rest.signing-region": "us-east-1",
                "rest.access-key-id": "AKIDEXAMPLE",
                "rest.secret-access-key": sk,
            }
        )
        t = HttpTransport(url, token="http-tok", signer=signer)
        assert t({"op": "create", "path": "s/x", "body": b"payload"})["status"] == 201
        assert t({"op": "get", "path": "s/x"})["body"] == b"payload"
        # bearer still enforced UNDER SigV4 (it rode Original-Authorization)
        bad_tok = HttpTransport(url, token="nope", signer=signer)
        assert bad_tok({"op": "head", "path": "s/x"})["status"] == 401
        # unsigned request: refused at the door
        unsigned = HttpTransport(url, token="http-tok")
        assert unsigned({"op": "head", "path": "s/x"})["status"] == 403
        # wrong signing key: refused
        wrong = RESTSigV4Signer().initialize(
            {
                "rest.signing-region": "us-east-1",
                "rest.access-key-id": "AKIDEXAMPLE",
                "rest.secret-access-key": "not-the-secret",
            }
        )
        t_wrong = HttpTransport(url, token="http-tok", signer=wrong)
        assert t_wrong({"op": "head", "path": "s/x"})["status"] == 403
    finally:
        shutdown()
