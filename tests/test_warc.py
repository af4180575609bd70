"""WARC ingestion (operators/warc.py): record walk, gzip members,
HTTP envelope strip, HTML text extraction."""

from __future__ import annotations

import gzip

from iceberg_geo_poc_spark.operators.warc import (
    build_warc,
    extract_documents,
    html_to_text,
    http_body,
    parse_warc,
)

PAGES = [
    ("https://a.example/1", "<html><body><p>alpha beta</p></body></html>"),
    ("https://a.example/2", "<html><body>gamma <b>delta</b></body></html>"),
]


def test_roundtrip_plain_and_gzipped():
    for gz in (False, True):
        data = build_warc(PAGES, gzip_members=gz)
        recs = parse_warc(data)
        assert [r["type"] for r in recs] == ["warcinfo", "response", "response"]
        resp = [r for r in recs if r["type"] == "response"]
        assert [r["headers"]["warc-target-uri"] for r in resp] == [
            u for u, _ in PAGES
        ]
        bodies = [http_body(r["payload"]).decode() for r in resp]
        assert bodies == [p for _, p in PAGES]


def test_gzip_members_are_independent():
    data = build_warc(PAGES, gzip_members=True)
    # every record is its own member: the stream contains 3 gzip magics
    assert data.count(b"\x1f\x8b\x08") >= 3
    # a plain single-stream gzip of the whole thing also parses
    plain = build_warc(PAGES)
    assert [r["type"] for r in parse_warc(gzip.compress(plain))] == [
        "warcinfo", "response", "response",
    ]


def test_truncated_tail_is_dropped():
    data = build_warc(PAGES)
    recs = parse_warc(data[: len(data) - len(data) // 3])
    # parser returns the complete prefix records, never raises
    assert all(r["type"] in ("warcinfo", "response") for r in recs)
    assert len(recs) < 3


def test_html_to_text_strips_and_decodes():
    page = (
        "<html><head><title>nope</title><style>p{}</style></head>"
        "<body><script>var s = '<p>fake</p>';</script>"
        "<H1 class=\"x\">Title</H1>\n<p>one\t two</p>"
        "<p>&lt;tag&gt; &amp; &#39;q&#39;</p><!-- no --></body></html>"
    )
    assert html_to_text(page) == "Title one two <tag> & 'q'"


def test_html_to_text_plain_passthrough():
    assert html_to_text("just   words\nhere") == "just words here"


def test_canonical_urls_variants(spark):
    from iceberg_geo_poc_spark.operators.text import url_dedup

    rows = [
        (0, "https://www.Site7.example/a/b/?utm_source=x&utm_campaign=y"),
        (1, "HTTP://site7.example/a/b"),
        (2, "https://site7.example/a/b#frag"),
        (3, "https://other.example/a/b"),
        (4, "https://site7.example/a/b?id=9"),  # real param survives
        # utm stripping must anchor to a ?/& boundary:
        (5, "https://site7.example/docs/utm_source=x.html"),  # path segment
        (6, "https://site7.example/a/b?xutm_a=b"),  # longer param name
        (7, "https://site7.example/a/b?id=9&utm_ref=z"),  # trailing utm
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    out = {r.canonical_url: (r.keeper_doc_id, r.n_urls) for r in url_dedup(df).collect()}
    assert out["site7.example/a/b"] == (0, 3)
    assert out["other.example/a/b"] == (3, 1)
    assert out["site7.example/a/b?id=9"] == (4, 2)
    assert out["site7.example/docs/utm_source=x.html"] == (5, 1)
    assert out["site7.example/a/b?xutm_a=b"] == (6, 1)


def test_extract_documents_spark(spark):
    import pandas as pd

    chunk1 = build_warc(PAGES, gzip_members=True)
    chunk2 = build_warc(
        [("https://b.example/3", "<html><body>epsilon</body></html>")]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"payload": [chunk1, chunk2]})
    )
    out = extract_documents(df).orderBy("url").collect()
    assert [r.url for r in out] == [
        "https://a.example/1", "https://a.example/2", "https://b.example/3",
    ]
    assert [r.text for r in out] == ["alpha beta", "gamma delta", "epsilon"]
    assert all(r.n_bytes > 0 and r.warc_date for r in out)
