"""Bloom-filter prefilter + ST_Collect aggregate unit tests."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.operators import dedup


def test_bloom_no_false_negatives(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "s STRING"
    )
    bits = dedup.build_bloom_bits(keys, F.col("s"), m_bits=1 << 14, k=5)
    assert bits.dtype == np.uint64 and len(bits) == (1 << 14) // 64
    # every inserted key must survive the filter
    kept = dedup.bloom_filter_rows(keys, F.col("s"), bits, k=5)
    assert kept.count() == 500


def test_bloom_rejects_most_absent_keys(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "s STRING"
    )
    bits = dedup.build_bloom_bits(keys, F.col("s"), m_bits=1 << 17, k=5)
    probe = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "s STRING"
    )
    survivors = dedup.bloom_filter_rows(probe, F.col("s"), bits, k=5).count()
    # m/n = 262 bits per key, k=5 -> FPR well under 1%; allow 5% slack
    assert survivors <= 100, survivors


def test_bloom_build_partitioning_invariant(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(300)], "s STRING"
    )
    a = dedup.build_bloom_bits(keys.coalesce(1), F.col("s"), m_bits=1 << 14)
    b = dedup.build_bloom_bits(keys.repartition(13), F.col("s"), m_bits=1 << 14)
    assert np.array_equal(a, b)


def test_decontaminate_bloom_matches_exact(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta other words here"),  # heavy overlap w/ 0
        (2, "totally different text with no overlap at all"),
        (3, "alpha beta gamma delta epsilon zeta"),  # exact copy of 0
        (4, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: r["contamination"]
        for r in dedup.decontaminate_bloom(
            corpus, bench, threshold=0.5
        ).collect()
    }
    exact = {
        r["doc_id"]: r["contamination"]
        for r in dedup.contamination_check(
            corpus, bench, threshold=0.5
        ).collect()
    }
    assert got == exact
    assert 3 in got and got[3] == 1.0
    assert 2 not in got


def test_collect_aggr_homogeneous_and_mixed(spark):
    from iceberg_geo_poc_spark.geo import geometry as G
    from iceberg_geo_poc_spark.geo.functions import st_collect_aggr
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb

    pts = [geometry_to_wkb(G.Point(float(i), float(i))) for i in range(4)]
    polys = [
        geometry_to_wkb(G.box(0.0, 0.0, 1.0, 1.0)),
        geometry_to_wkb(G.box(2.0, 2.0, 3.0, 4.0)),
    ]
    df = spark.createDataFrame(
        [("p", b) for b in pts] + [("g", b) for b in polys],
        "grp STRING, geom BINARY",
    )
    out = {
        r["grp"]: r
        for r in st_collect_aggr(df, "geom", ["grp"]).collect()
    }
    mp = geometry_from_wkb(bytes(out["p"]["collection"]))
    assert isinstance(mp, G.MultiPoint) and out["p"]["n_parts"] == 4
    assert mp.bounds == (0.0, 0.0, 3.0, 3.0)
    mpoly = geometry_from_wkb(bytes(out["g"]["collection"]))
    assert isinstance(mpoly, G.MultiPolygon) and mpoly.area == 3.0

    mixed = spark.createDataFrame(
        [("m", pts[0]), ("m", polys[0])], "grp STRING, geom BINARY"
    )
    coll = geometry_from_wkb(
        bytes(st_collect_aggr(mixed, "geom", ["grp"]).collect()[0]["collection"])
    )
    assert isinstance(coll, G.GeometryCollection)
    assert coll.area == 1.0
