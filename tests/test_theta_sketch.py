"""Theta/KMV sketches: estimator contract, mergeability, persistence."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_geo_poc_spark.table import theta as TH


def _hashes(n, seed):
    return np.random.default_rng(seed).integers(
        0, 2**64, size=n, dtype=np.uint64
    )


def test_exact_below_k():
    h = _hashes(1000, 1)
    sk = TH.ThetaSketch.from_hashes(h, k=4096)
    assert sk.is_exact
    assert sk.estimate() == len(np.unique(h))


def test_estimator_error_bound_above_k():
    # n >> k: relative error concentrates around 1/sqrt(k-2) (~3.1% at
    # k=1024); allow 4 sigma
    k, n = 1024, 500_000
    h = _hashes(n, 2)
    sk = TH.ThetaSketch.from_hashes(h, k=k)
    assert not sk.is_exact
    n_true = len(np.unique(h))
    rel = abs(sk.estimate() - n_true) / n_true
    assert rel < 4 / np.sqrt(k - 2), f"relative error {rel:.4f}"


def test_union_matches_combined_build():
    k = 512
    a, b = _hashes(100_000, 3), _hashes(100_000, 4)
    sa = TH.ThetaSketch.from_hashes(a, k=k)
    sb = TH.ThetaSketch.from_hashes(b, k=k)
    u = sa.union(sb)
    both = TH.ThetaSketch.from_hashes(np.concatenate([a, b]), k=k)
    # union of sketches == sketch of union (theta sketches are exact
    # under union, not just approximately mergeable)
    assert u.theta == both.theta
    assert np.array_equal(u.hashes, both.hashes)
    # associativity/commutativity
    u2 = sb.union(sa)
    assert u2.theta == u.theta and np.array_equal(u2.hashes, u.hashes)


def test_union_exact_small_sketches():
    sa = TH.ThetaSketch.from_hashes(_hashes(100, 5), k=4096)
    sb = TH.ThetaSketch.from_hashes(_hashes(150, 6), k=4096)
    u = sa.union(sb)
    assert u.is_exact
    want = len(np.unique(np.concatenate([sa.hashes, sb.hashes])))
    assert u.estimate() == want


def test_serialization_roundtrip():
    for n in (0, 10, 5000):
        sk = TH.ThetaSketch.from_hashes(_hashes(n, 7), k=1024)
        rt = TH.ThetaSketch.from_bytes(sk.to_bytes())
        assert rt.k == sk.k and rt.theta == sk.theta
        assert np.array_equal(rt.hashes, sk.hashes)


def test_union_requires_same_k():
    sa = TH.ThetaSketch.from_hashes(_hashes(10, 8), k=64)
    sb = TH.ThetaSketch.from_hashes(_hashes(10, 9), k=128)
    with pytest.raises(ValueError):
        sa.union(sb)


def test_column_sketch_spark_and_persistence(spark, tmp_path):
    from iceberg_geo_poc_spark.table import Catalog
    from iceberg_geo_poc_spark.table import statistics as ST

    cat = Catalog(str(tmp_path / "wh"), spark)
    t = cat.create_table("th", "id BIGINT, grp BIGINT")
    import pyspark.sql.functions as F

    t.append(
        spark.range(20_000).select(
            F.col("id"), (F.col("id") % 137).alias("grp")
        ).repartition(8)
    )
    t = cat.load_table("th")
    # direct build: grp has exactly 137 distinct values -> exact
    sk = TH.column_sketch(t.to_df(), "grp", k=4096)
    assert sk.is_exact and sk.estimate() == 137
    # high-cardinality column estimates within the k=1024 error bound
    sk_id = TH.column_sketch(t.to_df(), "id", k=1024)
    assert abs(sk_id.estimate() - 20_000) / 20_000 < 4 / np.sqrt(1022)
    # persisted through the statistics file + read back
    ST.compute_table_stats(t, columns=["grp"], with_sketches=True)
    t = cat.load_table("th")
    got = ST.theta_sketch(t, "grp")
    assert got is not None and got.is_exact and got.estimate() == 137
    # sketches from two table halves union to the whole (mergeability —
    # the property the theta family exists for)
    df = t.to_df()
    s1 = TH.column_sketch(df.filter("id % 2 = 0"), "grp", k=4096)
    s2 = TH.column_sketch(df.filter("id % 2 = 1"), "grp", k=4096)
    assert s1.union(s2).estimate() == 137


def test_intersection_estimator():
    k = 1024
    a = _hashes(200_000, 10)
    b = np.concatenate([a[:100_000], _hashes(150_000, 11)])
    sa = TH.ThetaSketch.from_hashes(a, k=k)
    sb = TH.ThetaSketch.from_hashes(b, k=k)
    true_common = len(np.intersect1d(np.unique(a), np.unique(b)))
    est = sa.estimate_intersection(sb)
    # intersection error is looser than union (fewer retained samples);
    # allow 15% at this overlap ratio
    assert abs(est - true_common) / true_common < 0.15
    # exact sketches intersect exactly
    s1 = TH.ThetaSketch.from_hashes(_hashes(500, 12), k=4096)
    s2 = TH.ThetaSketch.from_hashes(
        np.concatenate([s1.hashes[:200], _hashes(300, 13)]), k=4096
    )
    want = len(np.intersect1d(s1.hashes, s2.hashes))
    assert s1.estimate_intersection(s2) == want


def test_join_cardinality_estimate_exact_uniform(spark, tmp_path):
    import pyspark.sql.functions as F

    from iceberg_geo_poc_spark.table import Catalog
    from iceberg_geo_poc_spark.table import join_planning as JP
    from iceberg_geo_poc_spark.table import statistics as ST

    cat = Catalog(str(tmp_path / "wh"), spark)
    # A: keys 0..999 x4 copies; B: keys 500..1499 x2; common = 500
    a = cat.create_table("ja", "k BIGINT, i BIGINT")
    a.append(
        spark.range(4000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("i")
        )
    )
    b = cat.create_table("jb", "k BIGINT, i BIGINT")
    b.append(
        spark.range(2000).select(
            (F.col("id") % 1000 + 500).alias("k"), F.col("id").alias("i")
        )
    )
    a, b = cat.load_table("ja"), cat.load_table("jb")
    ST.compute_table_stats(a, columns=["k"], with_sketches=True)
    ST.compute_table_stats(b, columns=["k"], with_sketches=True)
    a, b = cat.load_table("ja"), cat.load_table("jb")
    est = JP.estimate_join_cardinality(a, b, "k")
    assert est is not None and est["exact"]
    assert est["common_keys"] == 500
    actual = a.to_df().join(b.to_df().select("k"), "k").count()
    assert actual == 500 * 4 * 2
    assert est["rows"] == actual
