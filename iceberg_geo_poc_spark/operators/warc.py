"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl path.

The single largest public training-data source ships as WARC files:
concatenated records (warcinfo / request / response), each response
wrapping an HTTP message whose body is HTML, with every record gzipped
as its own member in the Common Crawl layout.  A 100 TB text-corpus
build starts by turning those bytes into a documents table; this module
implements that stage Spark-first:

- ``parse_warc``: record splitter for plain or member-gzipped WARC
  (stdlib zlib; gzip members split via ``unused_data``), header parse,
  HTTP envelope strip.
- ``html_to_text``: dependency-free extraction — drops head/script/
  style/comments, strips tags, decodes entities (stdlib ``html``),
  collapses whitespace.  The spec-level subset that covers the
  dominant cost of web-text extraction; a production pipeline can swap
  a fancier extractor behind the same operator seam.
- ``extract_documents``: mapInPandas over a binary WARC-payload column
  -> (url, warc_date, text) rows.  Embarrassingly parallel, no
  shuffle: each executor parses its own WARC chunks, which is exactly
  how Common Crawl is consumed at scale (one file per task).
- ``build_warc``: fixture/synthesis writer (warcinfo + response
  records, optional per-record gzip members) so tests and the DuckDB
  oracle can reproduce the expected output byte-for-byte.
"""

from __future__ import annotations

import gzip
import html as _html
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = "\r\n"


# -- writer (fixtures / corpus synthesis) -----------------------------------

def _warc_record(rtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    head.append(f"Content-Length: {len(payload)}")
    return (
        (_CRLF.join(head) + _CRLF + _CRLF).encode()
        + payload
        + b"\r\n\r\n"
    )


def build_warc(
    pages: list[tuple[str, str]],
    gzip_members: bool = False,
    date: str = "2020-01-01T00:00:00Z",
) -> bytes:
    """[(url, html)] -> WARC bytes: one warcinfo record + one response
    record per page; ``gzip_members=True`` compresses each record as its
    own gzip member (the Common Crawl layout)."""
    records = [
        _warc_record(
            "warcinfo",
            {"WARC-Date": date, "Content-Type": "application/warc-fields"},
            b"software: iceberg-geo-poc-spark warc writer\r\n",
        )
    ]
    for url, page in pages:
        body = page.encode("utf-8")
        http = (
            "HTTP/1.1 200 OK" + _CRLF
            + "Content-Type: text/html; charset=utf-8" + _CRLF
            + f"Content-Length: {len(body)}" + _CRLF + _CRLF
        ).encode() + body
        records.append(
            _warc_record(
                "response",
                {
                    "WARC-Date": date,
                    "WARC-Target-URI": url,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    if gzip_members:
        return b"".join(gzip.compress(r) for r in records)
    return b"".join(records)


# -- parser -----------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes."""
    out = []
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(rest))
        rest = d.unused_data
    if rest:
        out.append(rest)
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or member-gzipped) -> record dicts with keys
    ``type``, ``headers``, ``payload`` (bytes)."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            pos += 1
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split(_CRLF)
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "headers": headers,
                "payload": payload,
            }
        )
        pos = hdr_end + 4 + length + 4  # trailing \r\n\r\n
    return records


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record payload."""
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4 :] if sep >= 0 else payload


# -- HTML -> text ------------------------------------------------------------

_DROP_BLOCKS = re.compile(
    r"<head\b.*?</head\s*>|<script\b.*?</script\s*>|<style\b.*?</style\s*>"
    r"|<!--.*?-->",
    re.S | re.I,
)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def html_to_text(page: str) -> str:
    """Visible text: drop head/script/style/comments, strip tags,
    decode entities, collapse whitespace."""
    page = _DROP_BLOCKS.sub(" ", page)
    page = _TAGS.sub(" ", page)
    page = _html.unescape(page)
    return _WS.sub(" ", page).strip()


# -- Spark operator ----------------------------------------------------------

WARC_DOC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("text", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def extract_documents(warc_chunks: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Binary WARC chunks -> one row per response record: (url,
    warc_date, visible text, raw html byte count).  Pure per-partition
    map (Arrow both ways) — Common Crawl's files are independent, so
    at 100 TB this runs as one task per file with zero shuffle."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, texts, sizes = [], [], [], []
            for payload in pdf[payload_col]:
                for rec in parse_warc(payload):
                    if rec["type"] != "response":
                        continue
                    body = http_body(rec["payload"])
                    urls.append(rec["headers"].get("warc-target-uri", ""))
                    dates.append(rec["headers"].get("warc-date", ""))
                    texts.append(html_to_text(body.decode("utf-8", "replace")))
                    sizes.append(len(body))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_date": dates,
                    "text": texts,
                    "n_bytes": pd.array(sizes, dtype="int64"),
                }
            )

    return warc_chunks.mapInPandas(_batches, WARC_DOC_SCHEMA)
