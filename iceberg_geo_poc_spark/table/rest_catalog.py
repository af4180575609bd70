"""Catalog-service commit arbitration — the REST-catalog shape.

Python analogue of the reference's REST catalog commit path
(core/src/main/java/org/apache/iceberg/rest/RESTSessionCatalog.java:
commits are arbitrated SERVER-side by a conditional update, so writers
on different hosts need no shared filesystem or client-side lock; a
loser gets a conflict response and retries against the refreshed base —
the same optimistic protocol as SnapshotProducer.java:369-409, with the
atomic swap moved into the service).

Two pieces:

- ``CatalogService`` — the in-process reference implementation of the
  service contract: an atomic ``create(path, payload)`` (insert-if-
  absent, the If-None-Match conditional PUT) plus plain get/put/list.
  One instance models the service; arbitration happens under ITS lock,
  not the client's — which is what makes the multi-writer story hold
  across hosts (every client could be a separate process or machine
  talking to the same service).

- ``ServiceCommitBackend`` — a ``CommitBackend`` whose four operations
  are delegated through an injectable ``transport`` callable
  (request-dict in, response-dict out).  The default transport calls a
  local ``CatalogService`` directly; a production deployment would swap
  in an HTTP client hitting the same verbs — the protocol, retry
  behavior, and conflict semantics stay identical, which is the point
  of the seam.

Metadata documents live in the service in this implementation (fine at
metadata scale — a few KB per version).  A pointer-style variant
(service holds only the current-version pointer, documents on object
storage via table/fileio.py) composes trivially: put_if_absent on the
version path IS the pointer CAS.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from iceberg_geo_poc_spark.table.metadata import CommitBackend

Transport = Callable[[dict], dict]


class CatalogService:
    """In-process catalog service: atomic conditional create, plus the
    namespace / table-registry / config surface of the reference REST
    catalog (RESTSessionCatalog.java — /v1/config negotiation,
    /v1/namespaces CRUD, /v1/namespaces/{ns}/tables listing), all
    arbitrated under the service lock so multi-host clients need no
    shared filesystem."""

    def __init__(
        self,
        defaults: dict[str, str] | None = None,
        overrides: dict[str, str] | None = None,
        token: str | None = None,
        credential: str | None = None,
    ) -> None:
        self._docs: dict[str, bytes] = {}
        self._namespaces: dict[str, dict[str, str]] = {}
        self._tables: dict[str, dict[str, str]] = {}  # ns -> {table: location}
        # ns -> {view: [versioned SQL]} (reference REST spec /views
        # endpoints; versions are 1-based like BaseViewVersion ids)
        self._views: dict[str, dict[str, list[dict]]] = {}
        self._defaults = dict(defaults or {})
        self._overrides = dict(overrides or {})
        self._token = token
        # OAuth client-credentials flow (reference OAuth2Util /
        # RESTSessionCatalog AuthSession): clients holding ``credential``
        # exchange it for a short-lived bearer token via the
        # ``oauth_tokens`` verb; the service may invalidate issued
        # tokens at any time (expiry), after which clients refresh.
        self._credential = credential
        self._issued_tokens: set[str] = set()
        # ScanReport/CommitReport payloads POSTed by clients (reference
        # /v1/{prefix}/namespaces/{ns}/tables/{table}/metrics endpoint,
        # RESTSessionCatalog.java:407,421 + ReportMetricsRequest.java)
        self._metrics: list[dict] = []
        self._lock = threading.Lock()

    def metrics_reports(self) -> list[dict]:
        """Reports received via the ``report_metrics`` verb (each:
        namespace, name, report-type, report payload), oldest first."""
        with self._lock:
            return [dict(m) for m in self._metrics]

    def revoke_issued_tokens(self) -> None:
        """Invalidate every OAuth-issued token (simulates token expiry —
        the next authed request gets 401 and must refresh)."""
        with self._lock:
            self._issued_tokens.clear()

    @staticmethod
    def _paginate(req: dict, items: list, key: str) -> dict:
        """Slice ``items`` per the request's page_size/page_token
        (reference REST spec pageToken/pageSize on list endpoints;
        RESTSessionCatalog paginates until no next-page-token).  The
        token is an opaque cursor — here the start offset."""
        size = req.get("page_size")
        if size is None:
            return {"status": 200, key: items}
        size = int(size)
        if size < 1:
            return {"status": 400, "error": "page_size must be >= 1"}
        start = int(req.get("page_token") or 0)
        out = {"status": 200, key: items[start : start + size]}
        if start + size < len(items):
            out["next_page_token"] = str(start + size)
        return out

    def handle(self, req: dict) -> dict:
        """The service contract: one verb per request dict.

        Document verbs: ``get`` / ``head`` / ``create`` (conditional,
        409 on conflict) / ``put`` (last-writer-wins) / ``list``
        (prefix).  Catalog verbs: ``config``, ``create_namespace`` /
        ``get_namespace`` / ``list_namespaces`` / ``drop_namespace`` /
        ``update_namespace``, ``register_table`` / ``list_tables`` /
        ``get_table`` / ``drop_table_entry``.  When the service was
        created with a ``token``, every request must carry it (the
        bearer-auth shape; 401 otherwise).
        """
        op = req["op"]
        path = req.get("path", "")
        if op == "oauth_tokens":
            # the auth endpoint itself is pre-auth (reference
            # /v1/oauth/tokens, client_credentials grant)
            if self._credential is None or req.get("credential") != self._credential:
                return {"status": 401, "error": "invalid client credential"}
            import uuid

            tok = uuid.uuid4().hex
            with self._lock:
                self._issued_tokens.add(tok)
            return {"status": 200, "token": tok}
        if self._token is not None or self._credential is not None:
            got = req.get("token")
            static_ok = self._token is not None and got == self._token
            if not static_ok and got not in self._issued_tokens:
                return {"status": 401}
        with self._lock:
            if op == "get":
                if path not in self._docs:
                    return {"status": 404}
                return {"status": 200, "body": self._docs[path]}
            if op == "head":
                return {"status": 200 if path in self._docs else 404}
            if op == "create":
                if path in self._docs:
                    return {"status": 409}  # conflict: a writer won
                self._docs[path] = bytes(req["body"])
                return {"status": 201}
            if op == "put":
                self._docs[path] = bytes(req["body"])
                return {"status": 200}
            if op == "list":
                return {
                    "status": 200,
                    "paths": sorted(
                        p for p in self._docs if p.startswith(path)
                    ),
                }
            if op == "config":
                # client settings = defaults < client-supplied < overrides
                return {
                    "status": 200,
                    "defaults": dict(self._defaults),
                    "overrides": dict(self._overrides),
                }
            if op == "create_namespace":
                ns = req["namespace"]
                if not ns or ns in self._namespaces:
                    return {"status": 409 if ns else 400}
                parent = ns.rpartition(".")[0]
                if parent and parent not in self._namespaces:
                    return {"status": 404, "error": f"parent {parent} missing"}
                self._namespaces[ns] = dict(req.get("properties") or {})
                self._tables.setdefault(ns, {})
                return {"status": 201}
            if op == "get_namespace":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                return {"status": 200, "properties": dict(self._namespaces[ns])}
            if op == "list_namespaces":
                parent = req.get("parent", "")
                names = sorted(
                    n
                    for n in self._namespaces
                    if (
                        n.rpartition(".")[0] == parent
                        if parent
                        else "." not in n
                    )
                )
                return self._paginate(req, names, "namespaces")
            if op == "update_namespace":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                props = self._namespaces[ns]
                for k in req.get("removals") or []:
                    props.pop(k, None)
                props.update(req.get("updates") or {})
                return {"status": 200, "properties": dict(props)}
            if op == "drop_namespace":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                children = any(
                    n.rpartition(".")[0] == ns for n in self._namespaces
                )
                if self._tables.get(ns) or children:
                    return {"status": 409, "error": "namespace not empty"}
                del self._namespaces[ns]
                self._tables.pop(ns, None)
                return {"status": 204}
            if op == "register_table":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                tbl = req["name"]
                if tbl in self._tables[ns]:
                    return {"status": 409}
                self._tables[ns][tbl] = req["location"]
                return {"status": 201}
            if op == "list_tables":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                return self._paginate(req, sorted(self._tables[ns]), "tables")
            if op == "get_table":
                ns = req["namespace"]
                loc = self._tables.get(ns, {}).get(req["name"])
                if loc is None:
                    return {"status": 404}
                return {"status": 200, "location": loc}
            if op == "drop_table_entry":
                ns = req["namespace"]
                if req["name"] not in self._tables.get(ns, {}):
                    return {"status": 404}
                del self._tables[ns][req["name"]]
                return {"status": 204}
            if op == "create_view":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                views = self._views.setdefault(ns, {})
                name = req["name"]
                if name in views and not req.get("replace"):
                    return {"status": 409}
                views.setdefault(name, []).append({"sql": req["sql"]})
                return {"status": 201, "version": len(views[name])}
            if op == "get_view":
                vers = self._views.get(req["namespace"], {}).get(req["name"])
                if not vers:
                    return {"status": 404}
                ver = req.get("version") or len(vers)
                if not 1 <= ver <= len(vers):
                    return {"status": 404, "error": f"no version {ver}"}
                return {
                    "status": 200,
                    "sql": vers[ver - 1]["sql"],
                    "version": ver,
                    "versions": len(vers),
                }
            if op == "list_views":
                ns = req["namespace"]
                if ns not in self._namespaces:
                    return {"status": 404}
                return self._paginate(
                    req, sorted(self._views.get(ns, {})), "views"
                )
            if op == "drop_view_entry":
                ns = req["namespace"]
                if req["name"] not in self._views.get(ns, {}):
                    return {"status": 404}
                del self._views[ns][req["name"]]
                return {"status": 204}
            if op == "report_metrics":
                # reference ReportMetricsRequest: report-type discriminates
                # scan-report / commit-report; the service must accept and
                # never block the client (fire-and-forget observability)
                rtype = req.get("report_type")
                if rtype not in ("scan-report", "commit-report"):
                    return {"status": 400, "error": f"bad report-type {rtype!r}"}
                self._metrics.append(
                    {
                        "namespace": req.get("namespace"),
                        "name": req.get("name"),
                        "report-type": rtype,
                        "report": dict(req.get("report") or {}),
                    }
                )
                return {"status": 204}
            if op == "delete":
                self._docs.pop(path, None)
                return {"status": 204}
        return {"status": 400}


class ServiceCommitBackend(CommitBackend):
    """CommitBackend over a catalog-service transport.

    Holds NO client-side lock: correctness under concurrent commits
    comes entirely from the service's conditional create, so two
    backends on different hosts (or processes) arbitrate exactly like
    two threads here.
    """

    def __init__(self, transport: Transport):
        self.transport = transport

    @classmethod
    def local(cls, service: CatalogService) -> "ServiceCommitBackend":
        return cls(service.handle)

    def read(self, path: str) -> bytes:
        resp = self.transport({"op": "get", "path": path})
        if resp["status"] == 404:
            raise FileNotFoundError(path)
        return resp["body"]

    def exists(self, path: str) -> bool:
        return self.transport({"op": "head", "path": path})["status"] == 200

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        resp = self.transport({"op": "create", "path": path, "body": payload})
        if resp["status"] == 201:
            return True
        if resp["status"] == 409:
            return False
        raise IOError(f"catalog service error {resp['status']} for {path}")

    def put(self, path: str, payload: bytes) -> None:
        resp = self.transport({"op": "put", "path": path, "body": payload})
        if resp["status"] != 200:
            raise IOError(f"catalog service error {resp['status']} for {path}")

    def delete(self, path: str) -> None:
        self.transport({"op": "delete", "path": path})


class RestMetricsReporter:
    """Client-side MetricsReporter that POSTs ScanReport/CommitReport
    payloads to the catalog service (reference RESTMetricsReporter.java:
    the report rides a ReportMetricsRequest to the table's /metrics
    endpoint, bearer-authed, and NEVER fails the query — transport or
    service errors are swallowed)."""

    def __init__(self, transport, namespace: str, name: str) -> None:
        self._transport = transport
        self._namespace = namespace
        self._name = name

    def report(self, rpt) -> None:
        import dataclasses

        rtype = (
            "commit-report"
            if type(rpt).__name__ == "CommitReport"
            else "scan-report"
        )
        try:
            self._transport(
                {
                    "op": "report_metrics",
                    "namespace": self._namespace,
                    "name": self._name,
                    "report_type": rtype,
                    "report": dataclasses.asdict(rpt),
                }
            )
        except Exception:  # noqa: BLE001 — observability must not break queries
            pass


class RestCatalog:
    """Namespace-aware catalog client running ENTIRELY against a
    catalog-service transport: the service is the only metadata
    authority — table registry, namespace tree, config negotiation,
    and the metadata documents themselves (via ServiceCommitBackend);
    only data/manifest files go through the registered FileIO.

    Mirrors the reference's RESTSessionCatalog surface
    (core/src/main/java/org/apache/iceberg/rest/RESTSessionCatalog.java):
    /v1/config settings merge (defaults < client < overrides),
    namespace CRUD with parent/empty checks, per-namespace table
    listing, bearer-token auth, and the conditional-PUT commit path.
    Table identifiers are dotted: ``ns.table`` / ``a.b.table``.
    """

    def __init__(
        self,
        transport: Transport,
        spark,
        warehouse: str | None = None,
        token: str | None = None,
        credential: str | None = None,
        properties: dict[str, str] | None = None,
    ):
        # auth session (reference OAuth2Util.AuthSession): a static
        # ``token`` rides every request as-is; a ``credential`` is
        # exchanged for a bearer token up front, and a 401 on any later
        # request triggers ONE refresh + retry (expired-token recovery —
        # the RESTSessionCatalog token-refresh shape).
        self._raw_transport = transport
        self._credential = credential
        self._token = token
        if credential is not None:
            self._token = self._fetch_token()

        def base(req: dict) -> dict:
            if self._token is not None:
                req = {**req, "token": self._token}
            resp = self._raw_transport(req)
            if resp.get("status") == 401 and self._credential is not None:
                self._token = self._fetch_token()
                resp = self._raw_transport({**req, "token": self._token})
            return resp

        self.transport = base
        cfg = self._call("config")
        # reference AuthSession/config semantics: server defaults are
        # overridable by the client, server overrides always win
        self.properties = {
            **cfg.get("defaults", {}),
            **(properties or {}),
            **cfg.get("overrides", {}),
        }
        wh = self.properties.get("warehouse", warehouse)
        if not wh:
            raise ValueError("no warehouse: pass one or set it in config")
        self.warehouse = wh.rstrip("/")
        self.spark = spark
        self._metric_locs: set[str] = set()
        from iceberg_geo_poc_spark.table import metadata as MD

        MD.register_commit_backend(
            self.warehouse + "/", ServiceCommitBackend(self.transport)
        )

    def _fetch_token(self) -> str:
        resp = self._raw_transport(
            {"op": "oauth_tokens", "credential": self._credential}
        )
        if resp.get("status") != 200:
            raise PermissionError(
                "catalog service rejected client credential (oauth_tokens)"
            )
        return resp["token"]

    def _call(self, op: str, **kw) -> dict:
        resp = self.transport({"op": op, **kw})
        status = resp.get("status", 500)
        if status == 401:
            raise PermissionError(f"catalog service rejected credentials ({op})")
        if status >= 400:
            detail = resp.get("error", "")
            raise ValueError(f"catalog service {status} for {op} {kw}: {detail}")
        return resp

    def _list_paged(self, op: str, key: str, **kw) -> list[str]:
        """Drain a paginated list endpoint (reference RESTSessionCatalog:
        keep requesting with the returned next-page-token until absent).
        Page size comes from the ``rest.page-size`` config property; when
        unset, one unpaginated request (the server returns everything)."""
        size = kw.pop("page_size", None) or self.properties.get("rest.page-size")
        if size is None:
            return self._call(op, **kw)[key]
        out: list[str] = []
        token: str | None = None
        while True:
            req = dict(kw, page_size=int(size))
            if token is not None:
                req["page_token"] = token
            resp = self._call(op, **req)
            out.extend(resp[key])
            token = resp.get("next_page_token")
            if token is None:
                return out

    # -- namespaces --------------------------------------------------------
    def create_namespace(
        self, namespace: str, properties: dict[str, str] | None = None
    ) -> None:
        self._call(
            "create_namespace", namespace=namespace, properties=properties or {}
        )

    def list_namespaces(self, parent: str = "", page_size: int | None = None) -> list[str]:
        return self._list_paged(
            "list_namespaces", "namespaces", parent=parent, page_size=page_size
        )

    def namespace_properties(self, namespace: str) -> dict[str, str]:
        return self._call("get_namespace", namespace=namespace)["properties"]

    def update_namespace(
        self,
        namespace: str,
        updates: dict[str, str] | None = None,
        removals: list[str] | None = None,
    ) -> dict[str, str]:
        return self._call(
            "update_namespace",
            namespace=namespace,
            updates=updates or {},
            removals=removals or [],
        )["properties"]

    def drop_namespace(self, namespace: str) -> None:
        self._call("drop_namespace", namespace=namespace)

    def namespace_exists(self, namespace: str) -> bool:
        return self.transport(
            {"op": "get_namespace", "namespace": namespace}
        )["status"] == 200

    # -- tables ------------------------------------------------------------
    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        ns, _, tbl = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"table identifier {identifier!r} must be namespace-qualified"
            )
        return ns, tbl

    def _location(self, ns: str, tbl: str) -> str:
        return "/".join([self.warehouse, *ns.split("."), tbl])

    def _register_metrics(self, ns: str, tbl: str, loc: str) -> None:
        """Route this table's scan/commit reports to the service
        (reference RESTSessionCatalog.java:407,421 — every table loaded
        through the REST catalog reports to its /metrics endpoint).
        Keyed on the table's ACTUAL location (the service may have
        registered one differing from warehouse/ns/tbl — the reports
        are emitted against it, not the client-computed path).
        Idempotent per catalog instance; the newest registration for a
        location wins in the reporter registry (same service either way)."""
        from iceberg_geo_poc_spark.table import reporting as RPT

        if loc in self._metric_locs:
            return
        RPT.register_metrics_reporter(
            loc, RestMetricsReporter(self.transport, ns, tbl)
        )
        self._metric_locs.add(loc)

    def _ns_catalog(self, ns: str):
        from iceberg_geo_poc_spark.table.catalog import Catalog

        return Catalog("/".join([self.warehouse, *ns.split(".")]), self.spark)

    def create_table(self, identifier: str, schema_ddl: str, **kwargs):
        """Claim the name in the service registry FIRST (atomic under
        the service lock — the create-table race arbitration), then
        write the table metadata through the service commit backend;
        a failed metadata write rolls the registry entry back."""
        ns, tbl = self._split(identifier)
        self._call(
            "register_table",
            namespace=ns,
            name=tbl,
            location=self._location(ns, tbl),
        )
        try:
            out = self._ns_catalog(ns).create_table(tbl, schema_ddl, **kwargs)
        except Exception:
            self._call("drop_table_entry", namespace=ns, name=tbl)
            raise
        self._register_metrics(ns, tbl, out.location)
        return out

    def load_table(self, identifier: str):
        from iceberg_geo_poc_spark.table import metadata as MD
        from iceberg_geo_poc_spark.table.table import Table

        ns, tbl = self._split(identifier)
        loc = self._call("get_table", namespace=ns, name=tbl)["location"]
        self._register_metrics(ns, tbl, loc)
        return Table(MD.read_metadata(loc), self.spark)

    def table_exists(self, identifier: str) -> bool:
        ns, tbl = self._split(identifier)
        return self.transport(
            {"op": "get_table", "namespace": ns, "name": tbl}
        )["status"] == 200

    def list_tables(self, namespace: str, page_size: int | None = None) -> list[str]:
        return self._list_paged(
            "list_tables", "tables", namespace=namespace, page_size=page_size
        )

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        """Remove the registry entry, the table's metadata documents in
        the service, and (``purge=True``) its data files via FileIO."""
        from iceberg_geo_poc_spark.table.fileio import io_for

        ns, tbl = self._split(identifier)
        loc = self._call("get_table", namespace=ns, name=tbl)["location"]
        self._call("drop_table_entry", namespace=ns, name=tbl)
        for doc in self._call("list", path=loc + "/")["paths"]:
            self._call("delete", path=doc)
        if purge:
            fio = io_for(loc)
            for f in fio.list_files(loc):
                fio.delete(f)

    # -- views ---------------------------------------------------------------
    def create_view(
        self, identifier: str, sql: str, replace: bool = False
    ) -> int:
        """Store a versioned SQL view in the SERVICE (reference REST
        spec /v1/.../views endpoints; RESTViewCatalog shape).  Returns
        the new 1-based version id."""
        ns, name = self._split(identifier)
        return self._call(
            "create_view", namespace=ns, name=name, sql=sql, replace=replace
        )["version"]

    def view_sql(self, identifier: str, version: int | None = None) -> str:
        ns, name = self._split(identifier)
        return self._call(
            "get_view", namespace=ns, name=name, version=version
        )["sql"]

    def list_views(self, namespace: str, page_size: int | None = None) -> list[str]:
        return self._list_paged(
            "list_views", "views", namespace=namespace, page_size=page_size
        )

    def drop_view(self, identifier: str) -> None:
        ns, name = self._split(identifier)
        self._call("drop_view_entry", namespace=ns, name=name)

    def select_view(self, identifier: str, version: int | None = None):
        """Plan the (optionally pinned) stored view SQL through the
        namespace catalog's SQL dispatcher, so engine-table references
        in the body keep manifest pruning — the service is the only
        authority for the view text, the dispatcher for execution."""
        ns, _ = self._split(identifier)
        return self._ns_catalog(ns).sql(self.view_sql(identifier, version))

    def catalog_for_namespace(self, namespace: str):
        """Expose the full single-namespace DDL/maintenance surface
        (branches, tags, schema evolution, ...) rooted at this
        namespace's warehouse prefix."""
        if not self.namespace_exists(namespace):
            raise ValueError(f"namespace {namespace} does not exist")
        return self._ns_catalog(namespace)
