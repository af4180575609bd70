"""Parity of the FUSED pair kernels (geo/functions.py, r15 batch 6) with
the composed builder + predicate UDFs they replace in the spatial-join
queries.

The fused kernels exist for one reason: run the builder WKB assembly and
the packed-geometry predicate in a single ArrowEvalPython crossing
instead of three (guide §4 — eliminate boundary round trips).  They MUST
be a physical fusion only, so every test here asserts value identity
against the composed public UDFs over batches that exercise nulls, NaN
coordinates, hit/miss geometry and the ragged/multi-ring packs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import iceberg_geo_poc_spark.geo.functions as GF

RNG = np.random.default_rng(1507)


def _arr(vals) -> pa.Array:
    return pa.array(vals, type=pa.float64(), from_pandas=True)


def _coords(n: int, lo: float, hi: float, nulls: bool = True) -> pa.Array:
    vals = RNG.uniform(lo, hi, n).tolist()
    if nulls and n >= 10:
        vals[3] = None
        vals[7] = float("nan")
    return _arr(vals)


def _assert_same(fused: pa.Array, composed: pa.Array, what: str) -> None:
    assert len(fused) == len(composed), what
    f, c = fused.to_pylist(), composed.to_pylist()
    assert f == c, f"{what}: fused {f[:10]} != composed {c[:10]}"


N = 64


@pytest.fixture(scope="module")
def diamond_batch():
    # overlapping value ranges so the batch has hits, misses and
    # near-boundary pairs
    return dict(
        ax=_coords(N, -10, 10), ay=_coords(N, -10, 10),
        ar=_arr([0.3] * N),
        bx=_coords(N, -10, 10), by=_coords(N, -10, 10),
        br=_arr([4.405] * N),
    )


def test_diamond_pair_intersects_parity(diamond_batch):
    d = diamond_batch
    fused = GF._diamond_pair_intersects_udf.func(
        d["ax"], d["ay"], d["ar"], d["bx"], d["by"], d["br"]
    )
    a = GF.st_diamond_udf.func(d["ax"], d["ay"], d["ar"])
    b = GF.st_diamond_udf.func(d["bx"], d["by"], d["br"])
    composed = GF.st_intersects_udf.func(a, b)
    _assert_same(fused, composed, "diamond intersects")
    # sanity: the batch is not degenerate (has both outcomes)
    vals = set(v for v in fused.to_pylist() if v is not None)
    assert vals == {True, False}


def test_subdiv_pair_intersects_parity(diamond_batch):
    d = diamond_batch
    ak = _arr([1.0 + (i % 2) for i in range(N)])
    bk = _arr([1.0 + (i % 3) for i in range(N)])
    fused = GF._subdiv_pair_intersects_udf.func(
        d["ax"], d["ay"], d["ar"], ak, d["bx"], d["by"], d["br"], bk
    )
    a = GF._subdiv_diamond_udf.func(d["ax"], d["ay"], d["ar"], ak)
    b = GF._subdiv_diamond_udf.func(d["bx"], d["by"], d["br"], bk)
    composed = GF.st_intersects_udf.func(a, b)
    _assert_same(fused, composed, "subdivided-diamond intersects")


def test_diamond_pair_covers_parity(diamond_batch):
    # orientation of the query: big diamond (a...) covers small (b...),
    # conjoined with the grid join's intersects(small, big)
    d = diamond_batch
    fused = GF._diamond_pair_covers_udf.func(
        d["bx"], d["by"], d["br"], d["ax"], d["ay"], d["ar"]
    )
    big = GF.st_diamond_udf.func(d["bx"], d["by"], d["br"])
    small = GF.st_diamond_udf.func(d["ax"], d["ay"], d["ar"])
    import pyarrow.compute as pc

    composed = pc.and_kleene(
        GF.st_intersects_udf.func(small, big),
        GF.st_covers_udf.func(big, small),
    )
    _assert_same(fused, composed, "diamond covers")
    vals = set(v for v in fused.to_pylist() if v is not None)
    assert vals == {True, False}


def test_diamond_annulus_pair_parity(diamond_batch):
    d = diamond_batch
    ro = _arr([4.405] * N)
    ri = _arr([2.195] * N)
    fused = GF._diamond_annulus_pair_intersects_udf.func(
        d["ax"], d["ay"], d["ar"], d["bx"], d["by"], ro, ri
    )
    a = GF.st_diamond_udf.func(d["ax"], d["ay"], d["ar"])
    b = GF._annulus_udf.func(d["bx"], d["by"], ro, ri)
    composed = GF.st_intersects_udf.func(a, b)
    _assert_same(fused, composed, "diamond x annulus intersects")
    # the hole must matter: some small diamonds fall strictly inside it
    fused_no_hole = GF._diamond_pair_intersects_udf.func(
        d["ax"], d["ay"], d["ar"], d["bx"], d["by"], ro
    )
    assert fused.to_pylist() != fused_no_hole.to_pylist()


def test_point_envelope_pair_parity():
    px = _coords(N, -20, 20)
    py = _coords(N, -20, 20)
    x0 = _coords(N, -20, 0, nulls=False)
    y0 = _coords(N, -20, 0, nulls=False)
    x1 = pa.array([v + 15.0 for v in x0.to_pylist()], type=pa.float64())
    y1 = pa.array([v + 15.0 for v in y0.to_pylist()], type=pa.float64())
    fused = GF._point_envelope_pair_intersects_udf.func(px, py, x0, y0, x1, y1)
    composed = GF.st_intersects_udf.func(
        GF.st_point_udf.func(px, py),
        GF.st_makeenvelope_udf.func(x0, y0, x1, y1),
    )
    _assert_same(fused, composed, "point x envelope intersects")


def test_point_envelope_constant_window_parity():
    # the geo_window shape: constant literal envelope against a point
    # column — must match st_intersects(point, geo_literal(box)) exactly,
    # including the closed-boundary semantics
    from iceberg_geo_poc_spark.geo import box
    from iceberg_geo_poc_spark.geo.wkb import geometry_to_wkb

    px = _arr([10.0, 9.999999, 60.0, 60.000001, 35.0, None, float("nan")])
    py = _arr([-20.0, -20.0, 30.0, 30.0, 5.0, 1.0, 2.0])
    n = len(px)
    fused = GF._point_envelope_pair_intersects_udf.func(
        px, py,
        _arr([10.0] * n), _arr([-20.0] * n), _arr([60.0] * n), _arr([30.0] * n),
    )
    lit = pa.array([geometry_to_wkb(box(10.0, -20.0, 60.0, 30.0))] * n)
    composed = GF.st_intersects_udf.func(GF.st_point_udf.func(px, py), lit)
    _assert_same(fused, composed, "point x constant window")
    assert fused.to_pylist()[:5] == [True, False, True, False, True]


def test_point_pair_distance_parity():
    ax = _coords(N, -50, 50)
    ay = _coords(N, -50, 50)
    bx = _coords(N, -50, 50)
    by = _coords(N, -50, 50)
    fused = GF._point_pair_distance_udf.func(ax, ay, bx, by)
    composed = GF.st_distance_udf.func(
        GF.st_point_udf.func(ax, ay), GF.st_point_udf.func(bx, by)
    )
    _assert_same(fused, composed, "point pair distance")


def test_fused_queries_match_composed_form(spark):
    """End-to-end: the fused diamond query equals the composed
    st_diamond + st_intersects formulation it replaced, row for row.
    Runs at sf0.01 — sf0.001's 60 lineitem rows produce zero join hits,
    which would make the equality vacuous."""
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.01"

    from iceberg_geo_poc_spark.geo.functions import st_diamond, st_intersects
    from iceberg_geo_poc_spark.geo.spatial_join import grid_spatial_join
    from iceberg_geo_poc_spark.queries.geo_queries import (
        _lineitem_points,
        geo_diamond_join_counts,
    )
    from iceberg_geo_poc_spark.session import load_table

    fused = [tuple(r) for r in geo_diamond_join_counts(spark, sf_dir).collect()]

    pts = _lineitem_points(spark, sf_dir)
    pdiamonds = pts.select(
        "l_orderkey", "lon", "lat",
        st_diamond("lon", "lat", F.lit(0.3)).alias("pgeom"),
    )
    cells = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") % 340).cast("double") - 166.0).alias("cx"),
        (((F.col("s_suppkey") * 7) % 160).cast("double") - 76.0).alias("cy"),
    )
    cdiamonds = cells.select(
        "s_suppkey", "cx", "cy",
        st_diamond("cx", "cy", F.lit(4.405)).alias("rgeom"),
    )
    j = grid_spatial_join(
        pdiamonds, cdiamonds, left_geom="pgeom", right_geom="rgeom",
        cell_size=6.0,
        left_bounds=("lon - 0.3D", "lat - 0.3D", "lon + 0.3D", "lat + 0.3D"),
        right_bounds=(
            "cx - 4.405D", "cy - 4.405D", "cx + 4.405D", "cy + 4.405D",
        ),
    )
    composed = [
        tuple(r)
        for r in j.groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_diamonds"))
        .orderBy("s_suppkey")
        .collect()
    ]
    assert fused == composed and len(fused) > 0
