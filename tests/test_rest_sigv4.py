"""SigV4 signing for REST catalog requests (reference
aws/RESTSigV4Signer.java): the algorithm against the OFFICIAL AWS
documentation test vector, the reference's Original-Authorization
relocation, empty-body constant, and a signed round-trip through the
real HTTP catalog binding with server-side verification."""

from __future__ import annotations

import pytest

from iceberg_geo_poc_spark.table.rest_sigv4 import (
    EMPTY_BODY_SHA256,
    RESTSigV4Signer,
    canonical_request,
    sign_request,
    signing_key,
    verify_sigv4,
)

# The AWS General Reference "Signature Version 4 signing process"
# worked example (public documentation): GET iam ListUsers,
# 2015-08-30, us-east-1, credentials AKIDEXAMPLE / wJalr...
_AK = "AKIDEXAMPLE"
_SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
_URL = "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"
_DATE = "20150830T123600Z"


def _vector_headers():
    return {
        "content-type": "application/x-www-form-urlencoded; charset=utf-8",
        "host": "iam.amazonaws.com",
    }


def test_aws_doc_vector_signing_key():
    # documented kSigning for 20150830/us-east-1/iam/aws4_request
    assert signing_key(_SK, "20150830", "us-east-1", "iam").hex() == (
        "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )


def test_aws_doc_vector_canonical_request_hash():
    import hashlib

    headers = dict(_vector_headers(), **{"x-amz-date": _DATE})
    cr, signed = canonical_request("GET", _URL, headers, EMPTY_BODY_SHA256)
    assert signed == "content-type;host;x-amz-date"
    # documented hash of the canonical request
    assert hashlib.sha256(cr.encode()).hexdigest() == (
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"
    )


def test_aws_doc_vector_final_signature():
    # the docs' GET example carries no x-amz-content-sha256 header, so
    # sign with exactly the documented header set: build the canonical
    # request manually through sign_request minus the content header
    import hashlib
    import hmac as _hmac

    headers = dict(_vector_headers(), **{"x-amz-date": _DATE})
    cr, signed = canonical_request("GET", _URL, headers, EMPTY_BODY_SHA256)
    sts = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            _DATE,
            "20150830/us-east-1/iam/aws4_request",
            hashlib.sha256(cr.encode()).hexdigest(),
        ]
    )
    sig = _hmac.new(
        signing_key(_SK, "20150830", "us-east-1", "iam"),
        sts.encode(),
        hashlib.sha256,
    ).hexdigest()
    # documented final signature
    assert sig == (
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_sign_request_self_verifies():
    out = sign_request(
        "POST",
        "https://api.example.com/v1/catalog",
        {"Content-Type": "application/json"},
        b'{"verb": "list_tables"}',
        access_key=_AK,
        secret_key=_SK,
        region="us-west-2",
        service="execute-api",
    )
    assert out["x-amz-content-sha256"] != EMPTY_BODY_SHA256
    assert verify_sigv4(
        "POST", "https://api.example.com/v1/catalog", out,
        b'{"verb": "list_tables"}', _SK,
    )
    # tampered body fails
    assert not verify_sigv4(
        "POST", "https://api.example.com/v1/catalog", out,
        b'{"verb": "drop_table"}', _SK,
    )
    # wrong secret fails
    assert not verify_sigv4(
        "POST", "https://api.example.com/v1/catalog", out,
        b'{"verb": "list_tables"}', "not-the-secret",
    )


def test_empty_body_uses_documented_constant():
    out = sign_request(
        "GET", "https://api.example.com/v1/config", {}, None,
        access_key=_AK, secret_key=_SK, region="us-east-1",
        service="execute-api",
    )
    assert out["x-amz-content-sha256"] == EMPTY_BODY_SHA256
    assert verify_sigv4(
        "GET", "https://api.example.com/v1/config", out, None, _SK
    )


def test_bearer_token_relocates_and_is_signed():
    """Reference convertHeaders: the catalog's OAuth bearer relocates
    to Original-Authorization BEFORE signing — covered by the
    signature, so stripping it breaks verification."""
    signer = RESTSigV4Signer().initialize(
        {
            "rest.signing-region": "eu-west-1",
            "rest.access-key-id": _AK,
            "rest.secret-access-key": _SK,
        }
    )
    assert signer.signing_name == "execute-api"
    out = signer.process(
        "POST",
        "https://api.example.com/v1/catalog",
        {"Authorization": "Bearer catalog-oauth-token"},
        b"{}",
    )
    assert out["Original-Authorization"] == "Bearer catalog-oauth-token"
    assert out["Authorization"].startswith("AWS4-HMAC-SHA256 ")
    assert "original-authorization" in out["Authorization"]  # signed
    assert verify_sigv4(
        "POST", "https://api.example.com/v1/catalog", out, b"{}", _SK
    )
    tampered = dict(out)
    tampered["Original-Authorization"] = "Bearer stolen-token"
    assert not verify_sigv4(
        "POST", "https://api.example.com/v1/catalog", tampered, b"{}", _SK
    )


def test_session_token_included_and_signed():
    signer = RESTSigV4Signer().initialize(
        {
            "rest.signing-region": "us-east-1",
            "rest.signing-name": "glue",
            "rest.access-key-id": _AK,
            "rest.secret-access-key": _SK,
            "rest.session-token": "FwoGZXIvYXdzEJr...",
        }
    )
    out = signer.process("GET", "https://glue.us-east-1.amazonaws.com/v1/config", {}, None)
    assert out["x-amz-security-token"] == "FwoGZXIvYXdzEJr..."
    assert verify_sigv4(
        "GET", "https://glue.us-east-1.amazonaws.com/v1/config", out, None, _SK
    )


def test_initialize_validation():
    with pytest.raises(ValueError, match="signing-region"):
        RESTSigV4Signer().initialize({"rest.access-key-id": "a",
                                      "rest.secret-access-key": "b"})
    with pytest.raises(ValueError, match="access-key"):
        RESTSigV4Signer().initialize({"rest.signing-region": "us-east-1"})


def test_malformed_authorization_returns_false_not_raises():
    """code-review r14: a garbage AWS4-HMAC-SHA256 header must answer
    False (the endpoint's 403), never raise out of the handler."""
    for bad in (
        "AWS4-HMAC-SHA256 garbage",
        "AWS4-HMAC-SHA256 Credential=onlykey, SignedHeaders=host",
        "AWS4-HMAC-SHA256 Credential=a/b, Signature=zz",
        "AWS4-HMAC-SHA256 ",
    ):
        assert not verify_sigv4(
            "GET", "https://x.example.com/", {"Authorization": bad}, None,
            _SK,
        )


def test_canonical_query_sorts_encoded_and_preserves_plus():
    """code-review r14: SigV4 sorts by URI-ENCODED names and a literal
    '+' in the raw query must not decode to space."""
    cr, _ = canonical_request(
        "GET",
        "https://x.example.com/path?b=1+1&a%2Fb=2&a-b=3",
        {"host": "x.example.com"},
        EMPTY_BODY_SHA256,
    )
    qline = cr.split("\n")[2]
    # '+' re-encodes as %2B (a plus, not a space -> %20)
    assert "b=1%2B1" in qline
    # encoded sort: 'a%2Fb' (%2F='/') vs 'a-b' — '%'(0x25) < '-'(0x2D)
    assert qline.index("a%2Fb=2") < qline.index("a-b=3")
    # signed round-trip still verifies with tricky queries
    url = "https://x.example.com/v1/q?b=1+1&a%2Fb=2&a-b=3"
    out = sign_request("GET", url, {}, None, access_key=_AK, secret_key=_SK,
                       region="us-east-1", service="execute-api")
    assert verify_sigv4("GET", url, out, None, _SK)


def test_freshness_window_rejects_stale_dates():
    """code-review r14 advisory: with max_skew_seconds set (the
    serve_catalog posture) a captured request with a stale x-amz-date
    is refused even though its signature verifies — replay window.
    The default None continues to accept the archived 2015 doc
    vectors."""
    url = "https://api.example.com/v1/catalog"
    body = b'{"verb": "list_tables"}'
    fresh = sign_request(
        "POST", url, {"Content-Type": "application/json"}, body,
        access_key=_AK, secret_key=_SK, region="us-west-2",
        service="execute-api",
    )
    # current-time signature passes with the window enforced
    assert verify_sigv4("POST", url, fresh, body, _SK, max_skew_seconds=900)
    # pinned 2015 date: valid signature, stale clock -> refused
    stale = sign_request(
        "POST", url, {"Content-Type": "application/json"}, body,
        access_key=_AK, secret_key=_SK, region="us-west-2",
        service="execute-api", amz_date="20150830T123600Z",
    )
    assert verify_sigv4("POST", url, stale, body, _SK)  # no window: ok
    assert not verify_sigv4(
        "POST", url, stale, body, _SK, max_skew_seconds=900
    )
    # malformed date with the window on -> refused, never raises
    broken = dict(fresh, **{"x-amz-date": "not-a-date"})
    assert not verify_sigv4(
        "POST", url, broken, body, _SK, max_skew_seconds=900
    )
