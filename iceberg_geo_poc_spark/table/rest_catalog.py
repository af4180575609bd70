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
    """In-process catalog service: atomic conditional create."""

    def __init__(self) -> None:
        self._docs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def handle(self, req: dict) -> dict:
        """The service contract: one verb per request dict.

        verbs: ``get`` / ``head`` / ``create`` (conditional, 409 on
        conflict) / ``put`` (last-writer-wins) / ``list`` (prefix).
        """
        op = req["op"]
        path = req.get("path", "")
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
