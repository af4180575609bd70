"""HTTP binding for the catalog service — the transport seam made real.

`table/rest_catalog.py` defines the service contract as request-dict ->
response-dict through an injectable transport.  This module binds that
contract to actual HTTP with only the standard library:

- :func:`serve_catalog` — a threading HTTP server wrapping a
  ``CatalogService``: one POST endpoint, JSON body = the request dict
  (bytes base64-wrapped), bearer token read from the ``Authorization``
  header — the wire shape of the reference's REST catalog
  (core/src/main/java/org/apache/iceberg/rest/RESTClient.java /
  HTTPClient.java), collapsed to one verb-dispatching route the way
  the service contract collapses the resource paths.

- :class:`HttpTransport` — a client-side transport callable using
  ``urllib.request``; drop it into ``RestCatalog`` /
  ``ServiceCommitBackend`` and every catalog/commit verb rides a real
  TCP round-trip.

The tests run full table lifecycles and RACING commits across the
HTTP boundary, proving the in-process arbitration semantics survive a
real network hop (the multi-host story end-to-end).
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from iceberg_geo_poc_spark.table.rest_catalog import CatalogService


def _encode(obj: dict) -> bytes:
    def default(v):
        if isinstance(v, (bytes, bytearray)):
            return {"__b64__": base64.b64encode(bytes(v)).decode()}
        raise TypeError(type(v).__name__)

    return json.dumps(obj, default=default).encode()


def _decode(raw: bytes) -> dict:
    def hook(d):
        if set(d) == {"__b64__"}:
            return base64.b64decode(d["__b64__"])
        return d

    return json.loads(raw.decode(), object_hook=hook)


class _Handler(BaseHTTPRequestHandler):
    service: CatalogService  # set by serve_catalog on the subclass
    sigv4_secret: str | None = None  # set by serve_catalog when enforcing

    def do_POST(self):  # noqa: N802 (stdlib naming)
        length = int(self.headers.get("Content-Length", "0"))
        raw = self.rfile.read(length)
        if self.sigv4_secret is not None:
            # IAM-side posture: recompute the signature from the
            # received request; unsigned/tampered requests are refused
            # before the service sees them
            from iceberg_geo_poc_spark.table.rest_sigv4 import verify_sigv4

            url = f"http://{self.headers.get('Host', '')}{self.path}"
            if not verify_sigv4(
                "POST", url, dict(self.headers.items()), raw,
                self.sigv4_secret, max_skew_seconds=900,
            ):
                body = _encode({"status": 403, "error": "SigV4 check failed"})
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
        req = _decode(raw)
        # the bearer token: straight Authorization, or the
        # Original-Authorization a SigV4 signer relocated it to
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("Bearer "):
            auth = self.headers.get("Original-Authorization", "")
        if auth.startswith("Bearer "):
            req["token"] = auth[len("Bearer "):]
        resp = self.service.handle(req)
        body = _encode(resp)
        # transport is always 200; the service status rides in the body
        # (one-route binding keeps client-side handling uniform)
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


def serve_catalog(
    service: CatalogService, port: int = 0, sigv4_secret: str | None = None
):
    """Start a threading HTTP server for ``service`` on localhost.

    Returns ``(base_url, shutdown)``; ``port=0`` picks a free port.
    ``sigv4_secret`` enforces SigV4 on every request (the IAM-fronted
    deployment shape the reference's RESTSigV4Signer targets).
    """
    handler = type(
        "BoundHandler", (_Handler,),
        {"service": service, "sigv4_secret": sigv4_secret},
    )
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def shutdown():
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)

    return f"http://127.0.0.1:{server.server_address[1]}", shutdown


class HttpTransport:
    """Client transport: request dict -> POST -> response dict.

    The bearer token travels in the Authorization header (not the JSON
    body), matching how the reference's HTTPClient attaches auth.

    ``signer`` (optional) is a ``rest_sigv4.RESTSigV4Signer`` — when
    set, every request is SigV4-signed AFTER the bearer header attaches
    (the signer relocates it to Original-Authorization and covers it
    with the signature), matching the reference's interceptor order
    (RESTSigV4Signer.java runs on the fully-built request).
    """

    def __init__(
        self,
        base_url: str,
        token: str | None = None,
        timeout: float = 10.0,
        signer=None,
    ):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.timeout = timeout
        self.signer = signer

    def __call__(self, req: dict) -> dict:
        import urllib.request

        body = dict(req)
        body.pop("token", None)  # token rides the header, never the body
        headers = {"Content-Type": "application/json"}
        token = req.get("token", self.token)
        if token is not None:
            headers["Authorization"] = f"Bearer {token}"
        url = self.base_url + "/v1/catalog"
        payload = _encode(body)
        if self.signer is not None:
            headers = self.signer.process("POST", url, headers, payload)
        http_req = urllib.request.Request(
            url, data=payload, headers=headers, method="POST"
        )
        with urllib.request.urlopen(http_req, timeout=self.timeout) as resp:
            return _decode(resp.read())
