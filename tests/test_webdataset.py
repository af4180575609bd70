"""WebDataset tar-shard ingestion (operators/webdataset.py)."""

from __future__ import annotations

from iceberg_geo_poc_spark.operators.webdataset import (
    build_shard,
    extract_samples,
    group_samples,
    parse_shard,
)

MEMBERS = [
    ("000001.txt", b"hello world"),
    ("000001.json", b'{"lang":"en"}'),
    ("000002.txt", b"zwei"),
    ("a/b/000003.seg.png", b"\x89PNGfake"),
    ("v1.2/000004.jpg", b"\xff\xd8fake"),
]


def test_parse_roundtrip_plain_and_gz():
    for gz in (False, True):
        got = parse_shard(build_shard(MEMBERS, gzipped=gz))
        assert got == [
            ("000001", "txt", b"hello world"),
            ("000001", "json", b'{"lang":"en"}'),
            ("000002", "txt", b"zwei"),
            # first-dot-of-BASENAME split: multi-extension stays intact
            ("a/b/000003", "seg.png", b"\x89PNGfake"),
            # ... and dotted directories stay in the key, not the ext
            ("v1.2/000004", "jpg", b"\xff\xd8fake"),
        ]


def test_build_shard_deterministic():
    assert build_shard(MEMBERS) == build_shard(MEMBERS)


def test_zip_shard_roundtrip():
    from iceberg_geo_poc_spark.operators.webdataset import build_zip_shard

    data = build_zip_shard(MEMBERS)
    assert data[:2] == b"PK"
    assert parse_shard(data) == parse_shard(build_shard(MEMBERS))
    assert build_zip_shard(MEMBERS) == build_zip_shard(MEMBERS)


def test_extract_and_group_spark(spark):
    import pandas as pd

    shard1 = build_shard(MEMBERS[:3])
    shard2 = build_shard([("000009.txt", b"late"), ("000009.cls", b"cat")], gzipped=True)
    df = spark.createDataFrame(
        pd.DataFrame({"shard_id": pd.array([1, 2], dtype="int64"),
                      "payload": [shard1, shard2]})
    )
    members = extract_samples(df)
    assert members.count() == 5
    samples = {
        (r.shard_id, r.key): r for r in group_samples(members).collect()
    }
    s1 = samples[(1, "000001")]
    assert s1.exts == ["json", "txt"]
    assert bytes(s1.parts["txt"]) == b"hello world"
    assert s1.sample_bytes == len(b"hello world") + len(b'{"lang":"en"}')
    s9 = samples[(2, "000009")]
    assert s9.exts == ["cls", "txt"]
    assert bytes(s9.parts["cls"]) == b"cat"
