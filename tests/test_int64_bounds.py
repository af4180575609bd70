"""BIGINT stats > 2^53 must never round through float64.

Regression suite for the silent row-loss bug: pandas/numpy float64
promotion of manifest stat columns rounded large int64 bounds, and the
pruning evaluators then compared the rounded bound exactly against the
un-rounded literal — inclusive eval dropped live files from scans, and
strict eval could authorize a metadata-only DELETE that destroyed rows
that should survive.  The reference keeps bounds in typed buffers
(api/src/main/java/org/apache/iceberg/types/Conversions.java:123-126);
this engine's analogue is nullable Int64 end-to-end.
"""

from __future__ import annotations

import pandas as pd

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table import vector_eval as V

BIG = 48831927308626283  # > 2^53; float64 rounds it to ...280
P53 = 2**53
P62 = 2**62


def _mk(spark, tmp_path_factory, name, rows):
    cat = Catalog(str(tmp_path_factory.mktemp("wh")), spark)
    t = cat.create_table(name, "k BIGINT, s STRING")
    t.append(
        spark.createDataFrame([(k, f"r{i}") for i, k in enumerate(rows)],
                              "k BIGINT, s STRING").coalesce(1)
    )
    return t


def test_scan_exact_bound_above_2p53(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory, "big1", [BIG])
    got = [r.k for r in t.scan(where=E.ge("k", BIG)).to_df().collect()]
    assert got == [BIG]
    got = [r.k for r in t.scan(where=E.eq("k", BIG)).to_df().collect()]
    assert got == [BIG]
    # one above must NOT match
    assert t.scan(where=E.ge("k", BIG + 1)).to_df().count() == 0


def test_scan_straddles_2p53(spark, tmp_path_factory):
    ks = [P53 - 1, P53, P53 + 1, P53 + 3, -P53 - 7, P62 + 12345]
    t = _mk(spark, tmp_path_factory, "big2", ks)
    # a second append exercises concat of stats frames (the original
    # promotion point was pd.concat with the prior entries frame)
    more = [P62 + 12346, -(P62) - 3]
    t.append(
        spark.createDataFrame([(k, "x") for k in more], "k BIGINT, s STRING").coalesce(1)
    )
    allk = sorted(ks + more)
    for bound in (P53, P53 + 1, P62 + 12345, P62 + 12346, -P53 - 7):
        got = sorted(r.k for r in t.scan(where=E.ge("k", bound)).to_df().collect())
        assert got == [k for k in allk if k >= bound], f"ge {bound}"
        got = sorted(r.k for r in t.scan(where=E.le("k", bound)).to_df().collect())
        assert got == [k for k in allk if k <= bound], f"le {bound}"
        got = sorted(r.k for r in t.scan(where=E.eq("k", bound)).to_df().collect())
        assert got == [k for k in allk if k == bound], f"eq {bound}"


def test_metadata_delete_strict_eval_exact(spark, tmp_path_factory):
    # one file holds [2^62, 2^62+1, 2^62+2]; float64 cannot tell these
    # apart, so a rounding strict evaluator claims "all rows match
    # k >= 2^62+1" and metadata-drops the whole file, destroying k=2^62
    t = _mk(spark, tmp_path_factory, "big3", [P62, P62 + 1, P62 + 2])
    plan = t._plan_cow(E.ge("k", P62 + 1))
    assert plan["full"] == [], "strict eval must not claim full match"
    assert len(plan["partial"]) == 1
    t.delete(E.ge("k", P62 + 1))
    got = sorted(r.k for r in t.to_df().collect())
    assert got == [P62]


def test_metadata_delete_fastpath_still_fires(spark, tmp_path_factory):
    # genuine full-file match must still take the metadata-only path
    t = _mk(spark, tmp_path_factory, "big4", [P62, P62 + 1, P62 + 2])
    plan = t._plan_cow(E.ge("k", P62))
    assert len(plan["full"]) == 1 and plan["partial"] == []
    t.delete(E.ge("k", P62))
    assert t.to_df().count() == 0


def test_manifest_bounds_and_roundtrip_exact(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory, "big5", [BIG - 5, BIG])
    entries = t._entries()
    assert str(entries["lo__k"].dtype) == "Int64"
    assert int(entries["lo__k"].iloc[0]) == BIG - 5
    assert int(entries["hi__k"].iloc[0]) == BIG
    b = M.manifest_bounds(entries)
    assert b["k"] == [BIG - 5, BIG]
    # snapshot summary carries exact ints through JSON metadata
    snap = t.current_snapshot()
    assert snap.summary["bounds"]["k"] == [BIG - 5, BIG]


def test_concat_entries_preserves_int64():
    a = M.entries_dataframe([])
    b = M.entries_dataframe(
        [
            {
                "content": "data",
                "file_path": "/f1",
                "file_size": 10,
                "record_count": 1,
                "sequence_number": 1,
                "snapshot_id": 1,
                "partition": "{}",
                "lower": f'{{"k": {BIG}}}',
                "upper": f'{{"k": {BIG}}}',
                "nulls": '{"k": 0}',
                "bbox": "{}",
                "eq_cols": None,
            }
        ]
    )
    out = M.concat_entries([a, b])
    assert str(out["lo__k"].dtype) == "Int64"
    assert int(out["lo__k"].iloc[0]) == BIG
    # and with a frame missing the column entirely on the nonempty side
    c = M.entries_dataframe(
        [
            {
                "content": "data",
                "file_path": "/f2",
                "file_size": 10,
                "record_count": 1,
                "sequence_number": 2,
                "snapshot_id": 2,
                "partition": "{}",
                "lower": "{}",
                "upper": "{}",
                "nulls": "{}",
                "bbox": "{}",
                "eq_cols": None,
            }
        ]
    )
    out2 = M.concat_entries([b, c])
    assert str(out2["lo__k"].dtype) == "Int64"
    assert int(out2["lo__k"].iloc[0]) == BIG
    assert pd.isna(out2["lo__k"].iloc[1])


def test_vector_eval_int_exactness_direct():
    df = pd.DataFrame(
        {
            "content": ["data"],
            "file_path": ["/f"],
            "record_count": pd.array([3], dtype="Int64"),
            "lo__k": pd.array([P62], dtype="Int64"),
            "hi__k": pd.array([P62 + 2], dtype="Int64"),
            "nu__k": pd.array([0.0], dtype="float64"),
        }
    )
    sv = V.StatsView(df)
    # inclusive: hi=2^62+2 >= 2^62+3 is False exactly
    assert not V.might_match(E.ge("k", P62 + 3), sv)[0]
    assert V.might_match(E.ge("k", P62 + 2), sv)[0]
    # strict: lo=2^62 >= 2^62+1 is False exactly (float64 says True)
    assert not V.all_match(E.ge("k", P62 + 1), sv)[0]
    assert V.all_match(E.ge("k", P62), sv)[0]
    # literal outside int64 range never matches ge, always matches le
    assert not V.might_match(E.ge("k", 2**63 + 1), sv)[0]
    assert V.might_match(E.le("k", 2**63 + 1), sv)[0]
