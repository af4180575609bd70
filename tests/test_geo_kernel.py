"""Geometry kernel unit tests (no Spark).

Mirrors the reference's unit-test strategy: codec round-trips,
predicate semantics on the quadrant-fixture shapes
(reference data/.../havasu/TestGeometryReadersAndWriters.java:100-144),
and the Hilbert locality properties
(reference api/.../transforms/TestHilbert.java:60-115).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from iceberg_geo_poc_spark.geo import (
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
    geometry_from_wkb,
    geometry_from_wkt,
    geometry_to_wkb,
    geometry_to_wkt,
)
from iceberg_geo_poc_spark.geo.geojson import geometry_from_geojson, geometry_to_geojson
from iceberg_geo_poc_spark.geo.hilbert import hilbert_index_geoms, hilbert_index_xy


SAMPLES = [
    Point(1.5, -2.25),
    LineString([(0, 0), (1, 1), (2, 0)]),
    Polygon([(0, 0), (4, 0), (4, 4), (0, 4)]),
    Polygon([(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]]),
    MultiPoint([(0, 0), (2, 3)]),
    MultiLineString([[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
    MultiPolygon([Polygon([(0, 0), (1, 0), (1, 1)]), Polygon([(5, 5), (6, 5), (6, 6)])]),
    GeometryCollection([Point(1, 2), LineString([(0, 0), (1, 0)])]),
]


@pytest.mark.parametrize("g", SAMPLES, ids=lambda g: type(g).__name__)
def test_wkb_roundtrip(g):
    assert geometry_from_wkb(geometry_to_wkb(g)) == g


@pytest.mark.parametrize("g", SAMPLES, ids=lambda g: type(g).__name__)
def test_ewkb_roundtrip(g):
    assert geometry_from_wkb(geometry_to_wkb(g, srid=4326)) == g


@pytest.mark.parametrize("g", SAMPLES, ids=lambda g: type(g).__name__)
def test_wkt_roundtrip(g):
    assert geometry_from_wkt(geometry_to_wkt(g)) == g


@pytest.mark.parametrize("g", SAMPLES, ids=lambda g: type(g).__name__)
def test_geojson_roundtrip(g):
    assert geometry_from_geojson(geometry_to_geojson(g)) == g


def test_wkt_parse_forms():
    assert geometry_from_wkt("POINT (1 2)") == Point(1, 2)
    assert geometry_from_wkt("POINT EMPTY").is_empty()
    g = geometry_from_wkt("MULTIPOINT ((1 1), (2 2))")
    assert g == geometry_from_wkt("MULTIPOINT (1 1, 2 2)")
    with pytest.raises(ValueError):
        geometry_from_wkt("POINT (1 2) trailing")


def test_big_endian_wkb():
    import struct

    raw = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert geometry_from_wkb(raw) == Point(3.0, 4.0)


# -- quadrant fixture shapes (F1) ------------------------------------------

def quadrant_rows():
    """4 files x 10 ids x {point, polygon=buffer(0.5)} per the reference."""
    rows = []  # (file_idx, id, geom)
    next_id = 0
    for quadrant in range(4):
        for k in range(1, 11):
            sx = (1, -1, -1, 1)[quadrant]
            sy = (1, 1, -1, -1)[quadrant]
            center = Point(sx * k, sy * k)
            rows.append((quadrant, next_id, center))
            rows.append((quadrant, next_id, center.buffer(0.5)))
            next_id += 1
    return rows


GOLDEN = [
    # (predicate, window, expected_rows) from TestGeometryReadersAndWriters.java:229-263
    ("intersects", Point(1, 1), 2),
    ("intersects", Point(0, 0), 0),
    ("intersects", Point(1.5, 1.5), 0),
    ("intersects", box(0.5, -1.1, 1.1, 1.1), 4),
    ("intersects", box(0, 0, 0.75, 0.75), 1),
    ("intersects", box(0.75, 0.75, 1.25, 1.25), 2),
    ("covers", Point(1, 1), 2),
    ("covers", Point(0, 0), 0),
    ("covers", Point(1.5, 1.5), 0),
    ("covers", box(0, 0, 0.75, 0.75), 0),
    ("covers", box(0.75, 0.75, 1.25, 1.25), 1),
]


@pytest.mark.parametrize("pred,window,expected", GOLDEN,
                         ids=[f"{p}-{i}" for i, (p, _, _) in enumerate(GOLDEN)])
def test_quadrant_predicate_goldens(pred, window, expected):
    rows = quadrant_rows()
    n = sum(1 for _, _, g in rows if getattr(g, pred)(window))
    assert n == expected


def test_combined_id_and_intersects():
    # id <= 10 AND st_intersects(envelope [0.5,1.1]x[-1.1,1.1]) -> 2 rows
    rows = quadrant_rows()
    w = box(0.5, -1.1, 1.1, 1.1)
    n = sum(1 for _, i, g in rows if i <= 10 and g.intersects(w))
    assert n == 2


def test_part_filter_and_intersects():
    # part = 3 AND the same envelope -> 2 rows (quadrant 3 = +x,-y)
    rows = quadrant_rows()
    w = box(0.5, -1.1, 1.1, 1.1)
    n = sum(1 for q, _, g in rows if q == 3 and g.intersects(w))
    assert n == 2


# -- predicate edge semantics ---------------------------------------------

def test_covers_boundary_vs_contains():
    poly = box(0, 0, 2, 2)
    edge_pt = Point(0, 1)
    assert poly.covers(edge_pt)
    assert not poly.contains(edge_pt)
    assert poly.contains(Point(1, 1))


def test_polygon_hole_semantics():
    donut = Polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        holes=[[(3, 3), (7, 3), (7, 7), (3, 7)]],
    )
    assert donut.covers(Point(1, 1))
    assert not donut.covers(Point(5, 5))  # inside the hole
    assert donut.covers(Point(3, 5))  # on the hole boundary
    # a window strictly inside the hole does not intersect the donut
    assert not donut.intersects(box(4, 4, 6, 6))
    # a window spanning the hole edge does
    assert donut.intersects(box(2, 4, 6, 6))


def test_area_distance_centroid():
    sq = box(0, 0, 4, 4)
    assert sq.area == pytest.approx(16)
    donut = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]])
    assert donut.area == pytest.approx(15)
    assert Point(0, 3).distance(Point(4, 0)) == pytest.approx(5)
    assert Point(5, 2).distance(sq) == pytest.approx(1)
    assert sq.centroid() == Point(2, 2)
    circle = Point(3, 3).buffer(0.5)
    c = circle.centroid()
    assert c.x == pytest.approx(3) and c.y == pytest.approx(3)
    assert circle.area == pytest.approx(math.pi * 0.25, rel=0.01)


# -- hilbert properties (F3) -----------------------------------------------

def _idx(x, y, res=10):
    return int(hilbert_index_xy(np.array([x]), np.array([y]), res)[0])


def test_hilbert_null_semantics():
    assert _idx(200, 10) == -1  # out of world bounds
    assert hilbert_index_geoms([None], 10)[0] == -1
    assert hilbert_index_geoms([Point(float("nan"), float("nan"))], 10)[0] == -1


def test_hilbert_locality_ordering():
    # reference TestHilbert.java:60-83 — closer points => closer indexes
    v0 = _idx(10, 10)
    v1 = _idx(15, 15)
    v2 = _idx(30, 30)
    v3 = _idx(-60, -30)
    v4 = _idx(-61, -31)
    assert abs(v3 - v4) < abs(v0 - v1) < abs(v1 - v2) < abs(v0 - v3)


def test_hilbert_polygon_envelope_center():
    sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    assert hilbert_index_geoms([sq], 10)[0] >= 0


def test_hilbert_custom_extent():
    idx = hilbert_index_xy(np.array([300.0]), np.array([200.0]), 10, (0, 0, 1000, 1000))
    assert idx[0] >= 0
    idx2 = hilbert_index_xy(np.array([-10.0]), np.array([-10.0]), 10, (0, 0, 1000, 1000))
    assert idx2[0] == -1


def _grid_points(res):
    """One coordinate per grid cell under the reference's (2^res-1)/extent
    scale (HilbertCurve2D.java:62-66): x_i = minx + i*extent/(n-1)."""
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    gx = -180 + xs.ravel() * (360.0 / (n - 1))
    gy = -90 + ys.ravel() * (180.0 / (n - 1))
    return xs, ys, gx, gy


def test_hilbert_bijective_on_grid():
    # every cell of a res-4 grid maps to a unique index in [0, 2^8)
    res = 4
    n = 1 << res
    _, _, gx, gy = _grid_points(res)
    idx = hilbert_index_xy(gx, gy, res)
    assert len(set(idx.tolist())) == n * n
    assert idx.min() == 0 and idx.max() == n * n - 1


def test_hilbert_adjacent_cells_adjacent_indexes():
    # the defining property of the Hilbert curve: consecutive indexes are
    # adjacent grid cells (tested at integer-cell level; float coordinate
    # snapping at exact cell boundaries is allowed to go either way)
    from iceberg_geo_poc_spark.geo.hilbert import hilbert_d_from_cells

    res = 5
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    idx = hilbert_d_from_cells(xs.ravel(), ys.ravel(), res)
    assert len(set(idx.tolist())) == n * n
    order = np.argsort(idx)
    cx, cy = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(cx)) + np.abs(np.diff(cy))
    assert (steps == 1).all()


def test_fast_poly_predicate_matches_kernel():
    """The vectorized point-vs-polygon path must agree with the scalar
    kernel on every predicate, including boundary points, holes, concave
    shells, NaN (empty) points, and nulls."""
    import random

    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.wkb import geometry_to_wkb
    from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt

    # concave polygon with a hole
    poly = geometry_from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0),"
        " (2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    multi = geometry_from_wkt(
        "MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((6 6, 9 6, 9 9, 6 9, 6 6)))"
    )
    rng = random.Random(13)
    pts = [(rng.uniform(-2, 12), rng.uniform(-2, 12)) for _ in range(300)]
    # deliberate edge cases: boundary corners/edges, hole boundary, NaN
    pts += [
        (0.0, 0.0), (10.0, 0.0), (5.0, 0.0), (0.0, 5.0), (5.0, 5.0),
        (2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.5, 2.5),  # hole pts
        (float("nan"), 1.0),
    ]
    from iceberg_geo_poc_spark.geo.geometry import Point

    wkbs = [geometry_to_wkb(Point(x, y)) for x, y in pts] + [None]
    for g in (poly, multi):
        glit = geometry_to_wkb(g)
        a = pd.Series(wkbs, dtype=object)
        b = pd.Series([glit] * len(wkbs), dtype=object)
        for name, col_receiver in (
            ("intersects", True), ("disjoint", True), ("within", True),
            ("covers", False), ("contains", False),
        ):
            if col_receiver:
                got = GF._fast_poly_predicate(name, a, b)
            else:
                got = GF._fast_poly_predicate(name, b, a)
            assert got is not None, f"fast path refused {name}"
            for i, w in enumerate(wkbs):
                if w is None:
                    assert got[i] is None
                    continue
                from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb

                p = geometry_from_wkb(w)
                want = (
                    getattr(p, name)(g) if col_receiver else getattr(g, name)(p)
                )
                assert bool(got[i]) == want, (
                    f"{name} receiver={'pt' if col_receiver else 'poly'} "
                    f"pt={pts[i]}: fast={got[i]} kernel={want}"
                )


def test_fast_rect_rect_predicate_matches_kernel():
    """Vectorized rectangle-vs-rectangle (both sides columns) must agree
    with the scalar kernel: overlapping, touching, contained, disjoint,
    and identical rectangles."""
    import random

    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.geometry import box
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb

    rng = random.Random(29)

    def rand_rect():
        x0 = rng.uniform(-50, 50)
        y0 = rng.uniform(-50, 50)
        return box(x0, y0, x0 + rng.uniform(0.1, 30), y0 + rng.uniform(0.1, 30))

    pairs = [(rand_rect(), rand_rect()) for _ in range(200)]
    # constructed cases: touching edges/corners, nested, equal
    r = box(0, 0, 10, 10)
    pairs += [
        (r, box(10, 0, 20, 10)),   # shared edge
        (r, box(10, 10, 20, 20)),  # shared corner
        (r, box(2, 2, 8, 8)),      # nested
        (r, box(0, 0, 10, 10)),    # identical
        (r, box(11, 0, 20, 10)),   # disjoint
        (box(2, 2, 8, 8), r),      # nested, reversed
    ]
    a = pd.Series([geometry_to_wkb(p[0]) for p in pairs] + [None], dtype=object)
    b = pd.Series([geometry_to_wkb(p[1]) for p in pairs] + [geometry_to_wkb(r)], dtype=object)
    for name in ("intersects", "disjoint", "covers", "within", "contains"):
        got = GF._fast_rect_rect_predicate(name, a, b)
        assert got is not None
        assert got.iloc[len(pairs)] is None  # null row stays null
        for i, (ga, gb) in enumerate(pairs):
            want = getattr(ga, name)(gb)
            assert bool(got.iloc[i]) == want, (
                f"{name} pair {i}: {ga.bounds} vs {gb.bounds}: "
                f"fast={got.iloc[i]} kernel={want}"
            )
    # non-rect polygon on either side must refuse (falls to generic path)
    from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt

    tri = geometry_to_wkb(geometry_from_wkt("POLYGON ((0 0, 5 0, 3 4, 0 0))"))
    mixed = pd.Series([geometry_to_wkb(r), tri], dtype=object)
    rects = pd.Series([geometry_to_wkb(r)] * 2, dtype=object)
    assert GF._fast_rect_rect_predicate("intersects", mixed, rects) is None


def _star_poly(rng, cx, cy, rmin, rmax, nv=None, hole=False):
    """Random simple (star-shaped) polygon around (cx, cy); optionally
    with one small hole. Always valid: shell simple, hole strictly inside."""
    import math as m

    from iceberg_geo_poc_spark.geo.geometry import Polygon

    nv = nv or rng.randint(3, 9)
    angles = sorted(rng.uniform(0, 2 * m.pi) for _ in range(nv))
    # de-dup near-equal angles to keep the ring simple
    angles = [a for i, a in enumerate(angles) if i == 0 or a - angles[i - 1] > 1e-3]
    if len(angles) < 3:
        angles = [0.0, 2.1, 4.2]
    shell = [
        (cx + rng.uniform(rmin, rmax) * m.cos(a), cy + rng.uniform(rmin, rmax) * m.sin(a))
        for a in angles
    ]
    shell.append(shell[0])
    holes = []
    if hole:
        hr = rmin * 0.3
        holes.append(
            [
                (cx + hr, cy), (cx, cy + hr), (cx - hr, cy), (cx, cy - hr),
                (cx + hr, cy),
            ]
        )
    return Polygon(shell, holes)


def test_fast_polypoly_predicate_matches_kernel():
    """The vectorized polygon×polygon path must agree with the scalar
    kernel pair-by-pair: overlapping, touching, nested, hole-nested,
    rotated, concave, and far-apart polygons, plus nulls."""
    import random

    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.geometry import Polygon
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb

    rng = random.Random(29)
    pairs = []
    for _ in range(250):
        ax, ay = rng.uniform(-5, 5), rng.uniform(-5, 5)
        bx = ax + rng.uniform(-3, 3)
        by = ay + rng.uniform(-3, 3)
        pa = _star_poly(rng, ax, ay, 0.5, 2.0, hole=rng.random() < 0.3)
        pb = _star_poly(rng, bx, by, 0.3, 1.5, hole=rng.random() < 0.3)
        pairs.append((pa, pb))
    # deterministic edge cases
    sq = Polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    inner = Polygon([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)])
    touch_edge = Polygon([(4, 1), (6, 1), (6, 3), (4, 3), (4, 1)])
    touch_corner = Polygon([(4, 4), (5, 4), (5, 5), (4, 5), (4, 4)])
    far = Polygon([(100, 100), (101, 100), (101, 101), (100, 101), (100, 100)])
    donut = Polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        [[(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]],
    )
    in_hole = Polygon([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)])
    spans_hole = Polygon([(1, 4), (9, 4), (9, 6), (1, 6), (1, 4)])
    pairs += [
        (sq, inner), (inner, sq), (sq, touch_edge), (sq, touch_corner),
        (sq, far), (donut, in_hole), (in_hole, donut), (donut, spans_hole),
        (sq, sq),
    ]
    a = pd.Series([geometry_to_wkb(p) for p, _ in pairs] + [None], dtype=object)
    b = pd.Series([geometry_to_wkb(q) for _, q in pairs] + [geometry_to_wkb(sq)],
                  dtype=object)
    for name in ("intersects", "disjoint", "covers", "within", "contains"):
        got = GF._fast_polypoly_predicate(name, a, b)
        assert got is not None, f"polypoly fast path refused {name}"
        assert got[len(pairs)] is None  # null in -> null out
        for i, (p, q) in enumerate(pairs):
            want = getattr(p, name)(q)
            assert bool(got[i]) == want, (
                f"{name} pair {i}: fast={got[i]} kernel={want} "
                f"a={p.shell[:3]}... b={q.shell[:3]}..."
            )


def test_fast_polypoly_multipolygon_matches_kernel():
    """MultiPolygon rows (valid: disjoint parts, optional holes) run the
    vectorized intersects/disjoint path and must agree with the scalar
    kernel; covers-family falls back to the scalar kernel for multi-part
    batches (geometry._covers is per-part, the pooled tables are not)."""
    import random

    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.geometry import MultiPolygon, Polygon
    from iceberg_geo_poc_spark.geo.wkb import geometry_to_wkb

    rng = random.Random(31)

    def mp(cx, cy):
        # 1-3 disjoint star parts on a coarse grid (valid multipolygon)
        parts = []
        for k in range(rng.randint(1, 3)):
            px, py = cx + 6 * k, cy
            parts.append(
                _star_poly(rng, px, py, 0.4, 1.8, hole=rng.random() < 0.4)
            )
        return MultiPolygon(parts)

    pairs = []
    for _ in range(200):
        ax, ay = rng.uniform(-5, 5), rng.uniform(-5, 5)
        ga = mp(ax, ay)
        gb = (
            mp(ax + rng.uniform(-3, 9), ay + rng.uniform(-3, 3))
            if rng.random() < 0.7
            else _star_poly(rng, ax + rng.uniform(-2, 8), ay, 0.3, 1.5)
        )
        pairs.append((ga, gb))
    # deterministic: B inside one part / in the gap / spanning nothing
    two = MultiPolygon([
        Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
        Polygon([(5, 0), (7, 0), (7, 2), (5, 2), (5, 0)]),
    ])
    inside1 = Polygon([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)])
    in_gap = Polygon([(3, 0.5), (4, 0.5), (4, 1.5), (3, 1.5), (3, 0.5)])
    spanning = Polygon([(1, 0.5), (6, 0.5), (6, 1.5), (1, 1.5), (1, 0.5)])
    pairs += [(two, inside1), (two, in_gap), (two, spanning), (two, two)]
    a = pd.Series([geometry_to_wkb(p) for p, _ in pairs] + [None], dtype=object)
    b = pd.Series(
        [geometry_to_wkb(q) for _, q in pairs] + [geometry_to_wkb(inside1)],
        dtype=object,
    )
    for name in ("intersects", "disjoint"):
        got = GF._fast_polypoly_predicate(name, a, b)
        assert got is not None, f"multipolygon fast path refused {name}"
        assert got[len(pairs)] is None
        for i, (p, q) in enumerate(pairs):
            want = getattr(p, name)(q)
            assert bool(got[i]) == want, f"{name} pair {i}: fast={got[i]} kernel={want}"
    # covers-family: multi-part rows → scalar fallback (None), single-part
    # MultiPolygon wrappers still vectorize
    assert GF._fast_polypoly_predicate("covers", a, b) is None
    one = MultiPolygon([Polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])])
    aa = pd.Series([geometry_to_wkb(one)], dtype=object)
    bb = pd.Series([geometry_to_wkb(inside1)], dtype=object)
    got = GF._fast_polypoly_predicate("covers", aa, bb)
    assert got is not None and bool(got[0])


def test_subdivided_diamond_and_annulus_builders():
    """st_subdivided_diamond emits ragged-but-identical geometry (extra
    vertices on the edges); st_annulus emits a two-ring holed polygon —
    and BOTH run through the vectorized pack, not the scalar fallback."""
    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb

    cx = pd.Series([0.0, 10.0, None])
    cy = pd.Series([0.0, 5.0, 1.0])
    sub = GF.st_subdivided_diamond_builder(
        cx, cy, pd.Series([2.0, 3.0, 1.0]), pd.Series([1, 4, 2])
    )
    assert sub[2] is None
    g0, g1 = geometry_from_wkb(sub[0]), geometry_from_wkb(sub[1])
    assert len(g0.shell) == 5 and len(g1.shell) == 17  # 4k+1 vertices
    # subdivision preserves the region: same bbox, same point membership
    assert g1.intersects(geometry_from_wkb(sub[1]))
    ann = GF.st_annulus_builder(
        cx[:2], cy[:2], pd.Series([4.0, 4.0]), pd.Series([2.0, 2.0])
    )
    a0 = geometry_from_wkb(ann[0])
    assert len(a0.holes) == 1
    from iceberg_geo_poc_spark.geo.geometry import Point

    assert not a0.intersects(Point(0.0, 0.0))  # center is in the hole
    assert a0.intersects(Point(3.0, 0.0))  # ring interior
    # the ragged vectorized pack accepts both shapes (no scalar fallback)
    mixed = pd.Series(list(sub[:2]) + list(ann), dtype=object)
    pk = GF._polys_packed(mixed)
    assert pk is not None and pk.ok.all()
    assert list(pk.hv_cnt) == [0, 0, 4, 4]  # annuli carry hole vertices
    # end-to-end parity of the vectorized intersects on this mixed batch
    probe = GF.st_diamond_builder(
        pd.Series([0.0] * 4), pd.Series([0.0] * 4), pd.Series([0.5] * 4)
    )
    got = GF._fast_polypoly_predicate("intersects", mixed, probe)
    assert got is not None
    want = [
        geometry_from_wkb(mixed[i]).intersects(geometry_from_wkb(probe[i]))
        for i in range(4)
    ]
    assert [bool(v) for v in got] == want


def test_polys_packed_never_raises_on_garbage():
    """The vectorized pack's contract is None-or-correct: arbitrary
    bytes (truncations, bit flips, random noise) must make it DECLINE
    to the scalar kernel, never crash or mis-pack."""
    import random

    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.geometry import Polygon
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb

    rng = random.Random(47)
    valid = geometry_to_wkb(
        Polygon([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)])
    )
    cases = [b"", b"\x01", valid[: len(valid) // 2], valid + b"\x00\x00"]
    for _ in range(300):
        kind = rng.randrange(3)
        if kind == 0:  # random noise
            cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 120))))
        elif kind == 1:  # bit-flipped valid polygon
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cases.append(bytes(b))
        else:  # truncated / padded valid polygon
            cut = rng.randrange(len(valid) + 8)
            cases.append(valid[:cut] + b"\xff" * rng.randrange(4))
    for chunk_start in range(0, len(cases), 32):
        batch = cases[chunk_start : chunk_start + 32]
        s = pd.Series(batch, dtype=object)
        pk = GF._polys_packed(s)  # must not raise
        if pk is None:
            continue
        # accepted batch: every ok row must round-trip through the
        # scalar parser to the same bbox (no silent mis-parse)
        for i, raw in enumerate(batch):
            if not pk.ok[i] or pk.empty[i]:
                continue
            g = geometry_from_wkb(raw)
            xs = [p[0] for ring in ([g.shell] + list(g.holes)) for p in ring]
            ys = [p[1] for ring in ([g.shell] + list(g.holes)) for p in ring]
            assert pk.bx0[i] == min(xs) and pk.bx1[i] == max(xs)
            assert pk.by0[i] == min(ys) and pk.by1[i] == max(ys)


def test_fast_polypoly_refuses_mixed_batches():
    """Non-polygon rows must push the whole batch to the generic kernel."""
    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.geometry import Point, Polygon
    from iceberg_geo_poc_spark.geo.wkb import geometry_to_wkb

    sq = geometry_to_wkb(Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]))
    pt = geometry_to_wkb(Point(0.5, 0.5))
    a = pd.Series([sq, pt], dtype=object)
    b = pd.Series([sq, sq], dtype=object)
    assert GF._fast_polypoly_predicate("intersects", a, b) is None
    # and unknown predicates are refused outright
    assert GF._fast_polypoly_predicate("touches", b, b) is None


def test_ragged_collinear_drop_agrees_with_scalar_kernel():
    """Property: the vectorized ragged pack (which now DROPS on-chord
    interior vertices before the predicate stages) must agree with the
    scalar kernel — which sees the subdivided geometry verbatim — on
    intersects/covers/within over random convex polygons whose edges
    are subdivided with exactly-interpolated points."""
    import random

    import numpy as np
    import pandas as pd

    from iceberg_geo_poc_spark.geo import functions as GF
    from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb

    rng = random.Random(88)

    def convex_poly(cx, cy, r, n_corners, subdiv):
        import math

        pts = []
        angles = sorted(
            rng.uniform(0, 2 * math.pi) for _ in range(n_corners)
        )
        corners = [
            (cx + r * math.cos(a), cy + r * math.sin(a)) for a in angles
        ]
        for i, (x0, y0) in enumerate(corners):
            x1, y1 = corners[(i + 1) % len(corners)]
            for k in range(subdiv):
                t = k / subdiv
                pts.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
        pts.append(pts[0])
        import struct

        b = b"\x01\x03\x00\x00\x00" + struct.pack("<I", 1)
        b += struct.pack("<I", len(pts))
        for x, y in pts:
            b += struct.pack("<dd", x, y)
        return b

    wa, wb = [], []
    for _ in range(120):
        wa.append(
            convex_poly(
                rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(0.5, 3),
                rng.randrange(3, 7), rng.randrange(1, 4),
            )
        )
        wb.append(
            convex_poly(
                rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(0.5, 3),
                rng.randrange(3, 7), rng.randrange(1, 4),
            )
        )
    sa, sb = pd.Series(wa, dtype=object), pd.Series(wb, dtype=object)
    for pred in ("intersects", "covers", "within"):
        fast = GF._fast_polypoly_predicate(pred, sa, sb)
        assert fast is not None
        for i, (a, b) in enumerate(zip(wa, wb)):
            want = getattr(geometry_from_wkb(a), pred)(geometry_from_wkb(b))
            assert fast[i] == want, (pred, i)
