"""AWS Signature Version 4 signing for REST catalog requests.

Python analogue of the reference's
``aws/src/main/java/org/apache/iceberg/aws/RESTSigV4Signer.java``: an
HTTP request interceptor that SigV4-signs every REST catalog call
(the deployment shape where the Iceberg REST endpoint sits behind AWS
IAM — e.g. API Gateway / Glue's REST frontends), with the reference's
two distinctive behaviors:

- an EXISTING ``Authorization`` header (the catalog's OAuth bearer
  token) is RELOCATED to ``Original-Authorization`` before signing, so
  both auth schemes ride one request
  (``RESTSigV4Signer.RELOCATED_HEADER_PREFIX`` /
  ``convertHeaders``);
- the payload hash rides in ``x-amz-content-sha256``, with the
  well-known SHA-256-of-empty-string constant for body-less requests
  (``RESTSigV4Signer.EMPTY_BODY_SHA256``).

The SigV4 algorithm itself is the public AWS specification (canonical
request -> string-to-sign -> HMAC-SHA256 key derivation chain ->
signature); this module implements it from that spec with the
standard library only and validates against the official AWS
documentation test vector (see ``tests/test_rest_sigv4.py``).

Scale note: signing is O(header count + body hash) per request —
microseconds next to any catalog round-trip.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse
from datetime import datetime, timezone

EMPTY_BODY_SHA256 = (
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
)
RELOCATED_HEADER_PREFIX = "Original-"
_ALGORITHM = "AWS4-HMAC-SHA256"

# AwsProperties.REST_SIGNER_NAME default (the API Gateway service name)
DEFAULT_SIGNING_NAME = "execute-api"


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _uri_encode(s: str, encode_slash: bool = True) -> str:
    """SigV4's URI encoding: RFC 3986 unreserved chars pass through,
    everything else percent-encodes (space -> %20, never +)."""
    safe = "-_.~" if encode_slash else "-_.~/"
    return urllib.parse.quote(s, safe=safe)


def canonical_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload_hash: str,
) -> tuple[str, str]:
    """Build the SigV4 canonical request; returns (canonical_request,
    signed_headers)."""
    parts = urllib.parse.urlsplit(url)
    path = parts.path or "/"
    # canonical URI: each path segment URI-encoded (slashes kept)
    canon_uri = _uri_encode(path, encode_slash=False) or "/"
    # canonical query: split the RAW string (parse_qsl would turn '+'
    # into a space and change what AWS canonicalizes), unquote each
    # part, re-encode strictly, and sort by the ENCODED name/value —
    # the spec sorts encoded forms, and encoded vs decoded order can
    # differ (e.g. 'a%2Fb' vs 'a-b')
    pairs = []
    if parts.query:
        for part in parts.query.split("&"):
            k, _, v = part.partition("=")
            pairs.append(
                (_uri_encode(urllib.parse.unquote(k)),
                 _uri_encode(urllib.parse.unquote(v)))
            )
    canon_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))
    # canonical headers: lowercase names, trimmed values, sorted
    lower = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    names = sorted(lower)
    canon_headers = "".join(f"{n}:{lower[n]}\n" for n in names)
    signed_headers = ";".join(names)
    cr = "\n".join(
        [method.upper(), canon_uri, canon_query, canon_headers,
         signed_headers, payload_hash]
    )
    return cr, signed_headers


def signing_key(
    secret_key: str, date: str, region: str, service: str
) -> bytes:
    """The SigV4 key-derivation chain:
    kSecret -> kDate -> kRegion -> kService -> kSigning."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    body: bytes | None,
    *,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    session_token: str | None = None,
    amz_date: str | None = None,
) -> dict[str, str]:
    """SigV4-sign one request; returns the COMPLETE header map to send
    (input headers + host/x-amz-date/x-amz-content-sha256/Authorization).

    ``amz_date`` pins the timestamp (ISO basic ``YYYYMMDDTHHMMSSZ``)
    for deterministic tests; production callers omit it."""
    parts = urllib.parse.urlsplit(url)
    if amz_date is None:
        amz_date = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    date = amz_date[:8]
    payload_hash = (
        EMPTY_BODY_SHA256 if not body else _sha256_hex(body)
    )
    out = dict(headers)
    out.setdefault("host", parts.netloc)
    out["x-amz-date"] = amz_date
    out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["x-amz-security-token"] = session_token
    cr, signed_headers = canonical_request(method, url, out, payload_hash)
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [_ALGORITHM, amz_date, scope, _sha256_hex(cr.encode())]
    )
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode(),
        hashlib.sha256,
    ).hexdigest()
    out["Authorization"] = (
        f"{_ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={sig}"
    )
    return out


class RESTSigV4Signer:
    """Request interceptor matching the reference's surface: configure
    from catalog properties, then apply to (method, url, headers, body)
    returning the signed header map.

    Properties (reference AwsProperties):
    - ``rest.signing-region`` (required)
    - ``rest.signing-name`` (default ``execute-api``)
    - ``rest.access-key-id`` / ``rest.secret-access-key`` /
      ``rest.session-token``
    """

    def __init__(self) -> None:
        self.region: str | None = None
        self.signing_name = DEFAULT_SIGNING_NAME
        self.access_key: str | None = None
        self.secret_key: str | None = None
        self.session_token: str | None = None

    def initialize(self, properties: dict[str, str]) -> "RESTSigV4Signer":
        self.region = properties.get("rest.signing-region")
        self.signing_name = properties.get(
            "rest.signing-name", DEFAULT_SIGNING_NAME
        )
        self.access_key = properties.get("rest.access-key-id")
        self.secret_key = properties.get("rest.secret-access-key")
        self.session_token = properties.get("rest.session-token")
        if not self.region:
            raise ValueError("rest.signing-region is required for SigV4")
        if not self.access_key or not self.secret_key:
            raise ValueError(
                "rest.access-key-id / rest.secret-access-key are required"
            )
        return self

    def process(
        self,
        method: str,
        url: str,
        headers: dict[str, str],
        body: bytes | None,
        amz_date: str | None = None,
    ) -> dict[str, str]:
        """Sign one request.  An existing Authorization header (the
        catalog's OAuth bearer) relocates to Original-Authorization
        BEFORE signing — it is covered by the signature and both auth
        schemes survive (reference convertHeaders)."""
        prepared = {}
        for k, v in headers.items():
            if k.lower() == "authorization":
                prepared[RELOCATED_HEADER_PREFIX + k] = v
            else:
                prepared[k] = v
        return sign_request(
            method,
            url,
            prepared,
            body,
            access_key=self.access_key,
            secret_key=self.secret_key,
            region=self.region,
            service=self.signing_name,
            session_token=self.session_token,
            amz_date=amz_date,
        )


def verify_sigv4(
    method: str,
    url: str,
    received_headers: dict[str, str],
    body: bytes | None,
    secret_key: str,
    max_skew_seconds: int | None = None,
) -> bool:
    """Server-side verification: recompute the signature from the
    received request and compare (the IAM-side check a SigV4 endpoint
    performs).  Uses only the headers listed in SignedHeaders.

    ``max_skew_seconds`` enables the IAM freshness window: a request
    whose x-amz-date differs from current UTC time by more than the
    window is refused even if the signature matches, so a captured
    signed request cannot be replayed indefinitely (real IAM endpoints
    use ~15 minutes; ``serve_catalog`` passes 900).  The default None
    skips the clock check — that is the entry point for verifying the
    archived AWS documentation test vectors, whose pinned 2015 dates
    are by construction stale."""
    auth = None
    for k, v in received_headers.items():
        if k.lower() == "authorization" and v.startswith(_ALGORITHM):
            auth = v
    if auth is None:
        return False
    # malformed headers answer False (the endpoint's 403), never raise
    try:
        fields = dict(
            f.strip().split("=", 1) for f in auth[len(_ALGORITHM):].split(",")
        )
        cred = fields["Credential"].split("/")
        access_key, date, region, service = cred[0], cred[1], cred[2], cred[3]
        signed = fields["SignedHeaders"].split(";")
        fields["Signature"]  # noqa: B018 — presence check
    except (ValueError, KeyError, IndexError):
        return False
    lower = {k.lower(): v for k, v in received_headers.items()}
    subset = {n: lower[n] for n in signed if n in lower}
    if set(signed) - set(subset):
        return False
    amz_date = lower.get("x-amz-date", "")
    if max_skew_seconds is not None:
        # freshness before cryptography: a stale-dated request is
        # refused regardless of signature validity (replay window)
        import datetime as _dt

        try:
            then = _dt.datetime.strptime(
                amz_date, "%Y%m%dT%H%M%SZ"
            ).replace(tzinfo=_dt.timezone.utc)
        except ValueError:
            return False
        now = _dt.datetime.now(_dt.timezone.utc)
        if abs((now - then).total_seconds()) > max_skew_seconds:
            return False
    expected = sign_request(
        method,
        url,
        {k: v for k, v in subset.items()
         if k not in ("x-amz-date", "x-amz-content-sha256",
                      "x-amz-security-token")},
        body,
        access_key=access_key,
        secret_key=secret_key,
        region=region,
        service=service,
        session_token=lower.get("x-amz-security-token"),
        amz_date=amz_date,
    )
    return hmac.compare_digest(
        expected["Authorization"].split("Signature=")[1],
        fields["Signature"],
    )
