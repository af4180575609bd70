"""Iceberg-spec bucket hash goldens.

Expected hashes are the PUBLISHED test values from the Iceberg table
spec, Appendix B "32-bit Hash Requirements" (the same values the
reference pins in api/src/test/java/org/apache/iceberg/transforms/
TestBucketing.java) — third-party goldens, not produced by this repo.
"""

import datetime
import struct
import uuid
from decimal import Decimal

import numpy as np
import pytest

from iceberg_geo_poc_spark.table import iceberg_bucket as B


# (value-as-serialized-input, icetype, expected murmur3 seed-0 hash)
SPEC_GOLDENS = [
    (34, "int", 2017239379),
    (34, "long", 2017239379),
    (Decimal("14.20"), "decimal", -500754589),
    # 2017-11-16 = 17486 days from epoch
    (17486, "date", -653330422),
    # 22:31:08 = 81068000000 micros from midnight
    (81068000000, "time", -662762989),
    # 2017-11-16T22:31:08 = 1510871468000000 micros from epoch
    (1510871468000000, "timestamp", -2047944441),
    # timestamp_ns hashes the floored micros value (v3 spec rule)
    (1510871468000000999, "timestamp_ns", -2047944441),
    ("iceberg", "string", 1210000089),
    (uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"), "uuid", 1488055340),
    (b"\x00\x01\x02\x03", "binary", -188683207),
    (b"\x00\x01\x02\x03", "fixed", -188683207),
]


@pytest.mark.parametrize("value,icetype,expected", SPEC_GOLDENS)
def test_spec_hash_goldens(value, icetype, expected):
    assert B.hash_value(value, icetype) == expected


def test_bucket_value_spec_example():
    # spec worked example: bucket hash masked to non-negative, mod N
    assert B.bucket_value(34, "int", 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert B.bucket_value(None, "int", 16) is None


def test_float_refused():
    with pytest.raises(ValueError):
        B.serialize_single(1.0, "double")
    with pytest.raises(ValueError):
        B.bucket_series(__import__("pandas").Series([1.0, 2.0]), 4)


def test_vectorized_long_matches_scalar():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, 200),
            np.array([0, 1, -1, 34, 2**63 - 1, -(2**63)]),
        ]
    )
    vec = B.murmur3_long_vec(vals)
    for v, h in zip(vals, vec):
        assert B.murmur3_x86_32(struct.pack("<q", int(v)), 0) == int(h)


def test_bucket_series_dtype_dispatch():
    import pandas as pd

    n = 8
    ints = pd.Series([34, None, 0, -5], dtype="Int64")
    got = B.bucket_series(ints, n)
    assert got[0] == B.bucket_value(34, "long", n)
    assert got[1] is pd.NA or got.isna()[1]
    # strings
    strs = pd.Series(["iceberg", None, ""])
    gs = B.bucket_series(strs, n)
    assert gs[0] == B.bucket_value("iceberg", "string", n)
    # dates hash as days-from-epoch
    dates = pd.Series([datetime.date(2017, 11, 16)])
    assert B.bucket_series(dates, n)[0] == B.bucket_value(17486, "date", n)
    # datetime64 hashes as micros
    ts = pd.Series(pd.to_datetime(["2017-11-16T22:31:08"]))
    assert B.bucket_series(ts, n)[0] == B.bucket_value(
        1510871468000000, "timestamp", n
    )
    # bytes
    bs = pd.Series([b"\x00\x01\x02\x03"])
    assert B.bucket_series(bs, n)[0] == B.bucket_value(
        b"\x00\x01\x02\x03", "binary", n
    )


def test_decimal_serialization_minimal_twos_complement():
    # 14.20 unscaled = 1420 = 0x058C (2 bytes, minimal big-endian)
    assert B.serialize_single(Decimal("14.20"), "decimal") == b"\x05\x8c"
    assert B.serialize_single(Decimal("-1"), "decimal") == b"\xff"
    assert B.serialize_single(Decimal("0"), "decimal") == b"\x00"


# -- imported Iceberg-bucketed layout ----------------------------------------


@pytest.fixture()
def catalog(spark, tmp_path):
    from iceberg_geo_poc_spark.table import Catalog

    return Catalog(str(tmp_path / "wh"), spark)


def _write_foreign_bucketed(spark, tmp_path, n_buckets=4, n_rows=80):
    """Simulate a genuine Iceberg writer: one parquet file per spec
    bucket of the key column (spec numbering proven by the Appendix B
    goldens above)."""
    import glob

    import pandas as pd

    keys = list(range(100, 100 + n_rows))
    by_bucket = {}
    for k in keys:
        by_bucket.setdefault(B.bucket_value(k, "long", n_buckets), []).append(k)
    paths = []
    for b, ks in sorted(by_bucket.items()):
        d = str(tmp_path / f"foreign_b{b}")
        pdf = pd.DataFrame({"k": ks, "v": [f"r{k}" for k in ks]})
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(d)
        (p,) = sorted(glob.glob(f"{d}/*.parquet"))
        paths.append((b, p))
    return paths


def test_add_files_derives_spec_bucket_partitions(catalog, spark, tmp_path):
    import json

    n_buckets = 4
    foreign = _write_foreign_bucketed(spark, tmp_path, n_buckets)
    t = catalog.create_table(
        "imp",
        "k BIGINT, v STRING",
        partition_by=[("k", f"bucket[{n_buckets},iceberg]")],
    )
    t = catalog.add_files(
        "imp", [p for _, p in foreign], derive_partition_values=True
    )
    ent = t._entries()
    got = {
        r.file_path: json.loads(r.partition)[f"k_bucket_{n_buckets}"]
        for r in ent[ent.content == "data"].itertuples()
    }
    assert got == {p: b for b, p in foreign}
    # engine appends use the SAME spec numbering: new rows of a known key
    # land in the key's spec bucket
    t.append(spark.createDataFrame([(100, "new")], "k BIGINT, v STRING"))
    ent = t._entries()
    b100 = B.bucket_value(100, "long", n_buckets)
    new = [
        r for r in ent[ent.content == "data"].itertuples()
        if r.file_path not in got
    ]
    assert len(new) == 1
    assert json.loads(new[0].partition)[f"k_bucket_{n_buckets}"] == b100
    # scan over the mixed table is exact
    assert sorted(r.k for r in t.to_df().collect()) == sorted(
        list(range(100, 180)) + [100]
    )


def test_add_files_rejects_multi_tuple_file(catalog, spark, tmp_path):
    import glob

    d = str(tmp_path / "bad")
    spark.createDataFrame(
        [(i, "x") for i in range(50)], "k BIGINT, v STRING"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    paths = sorted(glob.glob(f"{d}/*.parquet"))
    catalog.create_table(
        "bad", "k BIGINT, v STRING", partition_by=[("k", "bucket[4,iceberg]")]
    )
    with pytest.raises(ValueError, match="spans"):
        catalog.add_files("bad", paths, derive_partition_values=True)


# -- property tests (hypothesis) ----------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_prop_long_hash_matches_vectorized(v):
    import struct

    assert B.murmur3_long_vec(np.array([v]))[0] == B.murmur3_x86_32(
        struct.pack("<q", v), 0
    )


@given(st.integers(min_value=-(10**30), max_value=10**30))
@settings(max_examples=200, deadline=None)
def test_prop_decimal_serialization_minimal_and_roundtrips(unscaled):
    b = B.serialize_single(unscaled, "decimal")
    # minimal two's complement: round-trips and has no redundant byte
    assert int.from_bytes(b, "big", signed=True) == unscaled
    if len(b) > 1:
        shorter = b[1:]
        assert int.from_bytes(shorter, "big", signed=True) != unscaled


@given(st.text(max_size=40), st.integers(min_value=1, max_value=1024))
@settings(max_examples=200, deadline=None)
def test_prop_bucket_value_range_and_determinism(s, n):
    v = B.bucket_value(s, "string", n)
    assert 0 <= v < n
    assert v == B.bucket_value(s, "string", n)
