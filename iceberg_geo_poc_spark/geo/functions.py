"""Geo scalar functions as Arrow-batched pandas UDFs.

The reference deliberately keeps scalar geo functions out of the table
format and defers to an engine library via an SPI (reference
spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/geo/spi/
GeospatialLibrary.java:25-36); this module is our engine library.  The
function set covers what the reference's tests exercise plus envelope
math used by its metrics writer (SURVEY §2.7): st_point,
st_geomfromtext/wkb/geojson, st_astext/asbinary/asgeojson,
st_intersects, st_covers, st_within, st_contains, st_buffer,
st_envelope, st_centroid, st_x/st_y/st_xmin/st_ymin/st_xmax/st_ymax,
st_area, st_length, st_distance, st_hilbert.

Column representation: BinaryType carrying standard WKB.  All UDFs are
``pandas_udf`` (Arrow batch transfer); nothing here is row-at-a-time.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_geo_poc_spark.geo import geometry as G
from iceberg_geo_poc_spark.geo.encoding import decode as decode_enc
from iceberg_geo_poc_spark.geo.encoding import encode as encode_enc
from iceberg_geo_poc_spark.geo.geojson import geometry_to_geojson
from iceberg_geo_poc_spark.geo.hilbert import DEFAULT_BOUNDS, hilbert_index_geoms
from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb
from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt, geometry_to_wkt


def _decode_series(s: pd.Series) -> list:
    return [None if v is None else geometry_from_wkb(v) for v in s]


# -- vectorized fast paths -------------------------------------------------
#
# The dominant geo workload at scale is point columns tested against a
# constant rectangular window (the reference's own golden fixture shape,
# TestGeometryReadersAndWriters.java:229-263).  For that shape we bypass
# per-row WKB object decoding entirely: a plain little-endian 2D point is
# exactly 21 bytes (01 01000000 <x><y>), so a whole Arrow batch decodes to
# two numpy float64 arrays with one frombuffer.  Anything non-point (or a
# non-rectangular literal) falls back to the generic kernel, so semantics
# are unchanged — this is a physical fast path, not a semantic fork.

_POINT_HEADER = b"\x01\x01\x00\x00\x00"


def _points_xy(s: pd.Series):
    """(x, y, valid) numpy views if every non-null value is plain point WKB."""
    arr = s.to_numpy(dtype=object, copy=False)
    n = len(arr)
    mask = np.zeros(n, dtype=bool)
    chunks = []
    for i, v in enumerate(arr):
        if v is None:
            continue
        if len(v) == 21 and bytes(v[:5]) == _POINT_HEADER:
            mask[i] = True
            chunks.append(bytes(v))
        else:
            return None
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    if chunks:
        xy = np.frombuffer(b"".join(chunks), dtype=[("h", "V5"), ("x", "<f8"), ("y", "<f8")])
        x[mask] = xy["x"]
        y[mask] = xy["y"]
    return x, y, mask


def _const_geometry(s: pd.Series):
    """Decoded geometry if the whole batch is one identical literal."""
    if len(s) == 0:
        return None
    v0 = s.iloc[0]
    if v0 is None:
        return None
    v0 = bytes(v0)
    for v in s.to_numpy(dtype=object, copy=False):
        if v is None or bytes(v) != v0:
            return None
    return geometry_from_wkb(v0)


def _rect_bounds(g):
    """(xmin, ymin, xmax, ymax) if g is an axis-aligned rectangle polygon."""
    if not isinstance(g, G.Polygon) or g.is_empty() or g.holes:
        return None
    b = g.bounds
    xmin, ymin, xmax, ymax = b
    corners = {(xmin, ymin), (xmin, ymax), (xmax, ymin), (xmax, ymax)}
    verts = {(cx, cy) for cx, cy in g.shell}
    if verts != corners:
        return None
    return b


def _fast_rect_predicate(name: str, a: pd.Series, b: pd.Series):
    """Vectorized point-vs-rectangle evaluation; None if shape doesn't apply."""
    if name not in ("intersects", "disjoint", "covers", "within", "contains"):
        return None
    for pts_side, const_side, swapped in ((a, b, False), (b, a, True)):
        g = _const_geometry(const_side)
        if g is None:
            continue
        rect = _rect_bounds(g)
        if rect is None:
            return None  # constant but non-rect literal: generic kernel
        pts = _points_xy(pts_side)
        if pts is None:
            return None
        x, y, mask = pts
        xmin, ymin, xmax, ymax = rect
        closed = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
        strict = (x > xmin) & (x < xmax) & (y > ymin) & (y < ymax)
        if name == "intersects":
            res = closed
        elif name == "disjoint":
            res = ~closed
        elif name == "covers":
            # covers(rect, point) when the rect is the receiver
            res = closed if swapped else None
        elif name == "within":
            # within(point, rect) = covers(rect, point): boundary-INCLUSIVE,
            # matching the generic kernel (Geometry.within delegates to
            # covers) — only contains() excludes the boundary.
            res = closed if not swapped else None
        else:  # contains(rect, point)
            res = strict if swapped else None
        if res is None:
            return None
        out = pd.Series(res.astype(object))
        out[~mask] = None
        return out
    return None


# -- constructors ----------------------------------------------------------

@pandas_udf(BinaryType())
def st_point_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    # direct WKB byte assembly: 01 01000000 <x><y>, no Geometry objects
    header = b"\x01\x01\x00\x00\x00"
    if x.dtype.kind == "f" and y.dtype.kind == "f":
        # whole-batch assembly: one (n, 21) byte matrix, then slice views
        n = len(x)
        raw = np.empty((n, 21), dtype=np.uint8)
        raw[:, :5] = np.frombuffer(header, dtype=np.uint8)
        raw[:, 5:13] = x.to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
        raw[:, 13:21] = y.to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
        buf = raw.tobytes()
        return pd.Series([buf[i * 21 : i * 21 + 21] for i in range(n)])
    out = [
        None
        if xv is None or yv is None
        else header + struct.pack("<dd", float(xv), float(yv))
        for xv, yv in zip(x, y)
    ]
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_geomfromtext_udf(wkt: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_to_wkb(geometry_from_wkt(v)) for v in wkt]
    )


@pandas_udf(BinaryType())
def st_geomfromgeojson_udf(gj: pd.Series) -> pd.Series:
    from iceberg_geo_poc_spark.geo.geojson import geometry_from_geojson

    return pd.Series(
        [None if v is None else geometry_to_wkb(geometry_from_geojson(v)) for v in gj]
    )


@pandas_udf(BinaryType())
def st_geomfromwkb_udf(wkb: pd.Series) -> pd.Series:
    # normalize any WKB/EWKB (incl. SRID words, big-endian) to plain LE WKB
    return pd.Series(
        [None if v is None else geometry_to_wkb(geometry_from_wkb(v)) for v in wkb]
    )


# -- accessors -------------------------------------------------------------

@pandas_udf(StringType())
def st_astext_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_to_wkt(geometry_from_wkb(v)) for v in wkb]
    )


@pandas_udf(StringType())
def st_asgeojson_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_to_geojson(geometry_from_wkb(v)) for v in wkb]
    )


def _coord_accessor(wkb: pd.Series, idx: int) -> pd.Series:
    pts = _points_xy(wkb)
    if pts is not None:
        return pd.Series(pts[idx])
    out = np.full(len(wkb), np.nan)
    for i, v in enumerate(wkb):
        if v is None:
            continue
        g = geometry_from_wkb(v)
        if isinstance(g, G.Point) and not g.is_empty():
            out[i] = g.x if idx == 0 else g.y
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_x_udf(wkb: pd.Series) -> pd.Series:
    return _coord_accessor(wkb, 0)


@pandas_udf(DoubleType())
def st_y_udf(wkb: pd.Series) -> pd.Series:
    return _coord_accessor(wkb, 1)


def _bounds_accessor(wkb: pd.Series, idx: int) -> pd.Series:
    pts = _points_xy(wkb)
    if pts is not None:
        # a point's bbox is itself: idx 0/2 -> x, 1/3 -> y
        return pd.Series(pts[idx % 2])
    out = np.full(len(wkb), np.nan)
    for i, v in enumerate(wkb):
        if v is None:
            continue
        b = geometry_from_wkb(v).bounds
        if b is not None:
            out[i] = b[idx]
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_xmin_udf(wkb: pd.Series) -> pd.Series:
    return _bounds_accessor(wkb, 0)


@pandas_udf(DoubleType())
def st_ymin_udf(wkb: pd.Series) -> pd.Series:
    return _bounds_accessor(wkb, 1)


@pandas_udf(DoubleType())
def st_xmax_udf(wkb: pd.Series) -> pd.Series:
    return _bounds_accessor(wkb, 2)


@pandas_udf(DoubleType())
def st_ymax_udf(wkb: pd.Series) -> pd.Series:
    return _bounds_accessor(wkb, 3)


_BOUNDS_TYPE = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)


@pandas_udf(_BOUNDS_TYPE)
def st_bounds_udf(wkb: pd.Series) -> pd.DataFrame:
    """All four envelope bounds in ONE Arrow pass (points hit the
    vectorized numpy path; other shapes decode once, not four times) —
    used by the spatial join, where four separate accessor UDFs would
    quadruple the Python transfer cost."""
    pts = _points_xy(wkb)
    if pts is not None:
        x, y, _mask = pts
        return pd.DataFrame({"xmin": x, "ymin": y, "xmax": x, "ymax": y})
    n = len(wkb)
    cols = {k: np.full(n, np.nan) for k in ("xmin", "ymin", "xmax", "ymax")}
    for i, v in enumerate(wkb):
        if v is None:
            continue
        b = geometry_from_wkb(v).bounds
        if b is not None:
            cols["xmin"][i], cols["ymin"][i], cols["xmax"][i], cols["ymax"][i] = b
    return pd.DataFrame(cols)


@pandas_udf(DoubleType())
def st_area_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if v is None else geometry_from_wkb(v).area for v in wkb]
    )


@pandas_udf(DoubleType())
def st_length_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [np.nan if v is None else geometry_from_wkb(v).length for v in wkb]
    )


@pandas_udf(BooleanType())
def st_isempty_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_from_wkb(v).is_empty() for v in wkb]
    )


# -- predicates ------------------------------------------------------------

def _binary_predicate(name: str):
    method = name

    @pandas_udf(BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        fast = _fast_rect_predicate(method, a, b)
        if fast is not None:
            return fast
        out = []
        for av, bv in zip(a, b):
            if av is None or bv is None:
                out.append(None)
            else:
                ga = geometry_from_wkb(av)
                gb = geometry_from_wkb(bv)
                out.append(getattr(ga, method)(gb))
        return pd.Series(out)

    return _udf


st_intersects_udf = _binary_predicate("intersects")
st_covers_udf = _binary_predicate("covers")
st_within_udf = _binary_predicate("within")
st_contains_udf = _binary_predicate("contains")
st_disjoint_udf = _binary_predicate("disjoint")


@pandas_udf(DoubleType())
def st_distance_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    # fast path: point column vs constant point literal -> vectorized hypot
    for pts_side, const_side in ((a, b), (b, a)):
        g = _const_geometry(const_side)
        if g is None:
            continue
        if not (isinstance(g, G.Point) and not g.is_empty()):
            break
        pts = _points_xy(pts_side)
        if pts is None:
            break
        x, y, _ = pts
        return pd.Series(np.hypot(x - g.x, y - g.y))
    out = []
    for av, bv in zip(a, b):
        if av is None or bv is None:
            out.append(np.nan)
        else:
            out.append(geometry_from_wkb(av).distance(geometry_from_wkb(bv)))
    return pd.Series(out)


@pandas_udf(BooleanType())
def st_dwithin_udf(a: pd.Series, b: pd.Series, dist: pd.Series) -> pd.Series:
    out = []
    for av, bv, dv in zip(a, b, dist):
        if av is None or bv is None or dv is None:
            out.append(None)
        else:
            out.append(
                geometry_from_wkb(av).distance(geometry_from_wkb(bv)) <= float(dv)
            )
    return pd.Series(out)


# -- transforms ------------------------------------------------------------

@pandas_udf(BinaryType())
def st_buffer_udf(wkb: pd.Series, dist: pd.Series) -> pd.Series:
    out = []
    for v, d in zip(wkb, dist):
        if v is None or d is None:
            out.append(None)
        else:
            out.append(geometry_to_wkb(geometry_from_wkb(v).buffer(float(d))))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_envelope_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_to_wkb(geometry_from_wkb(v).envelope()) for v in wkb]
    )


@pandas_udf(BinaryType())
def st_makeenvelope_udf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> pd.Series:
    from iceberg_geo_poc_spark.geo.geometry import box as _box

    out = []
    for a, b, c, d in zip(xmin, ymin, xmax, ymax):
        if a is None or b is None or c is None or d is None:
            out.append(None)
        else:
            out.append(geometry_to_wkb(_box(float(a), float(b), float(c), float(d))))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_centroid_udf(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else geometry_to_wkb(geometry_from_wkb(v).centroid()) for v in wkb]
    )


# -- hilbert ---------------------------------------------------------------

@pandas_udf(LongType())
def st_hilbert_udf(
    wkb: pd.Series,
    resolution: pd.Series,
    minx: pd.Series,
    miny: pd.Series,
    maxx: pd.Series,
    maxy: pd.Series,
) -> pd.Series:
    if len(wkb) == 0:
        return pd.Series([], dtype="Int64")
    res = int(resolution.iloc[0])
    bounds = (
        float(minx.iloc[0]),
        float(miny.iloc[0]),
        float(maxx.iloc[0]),
        float(maxy.iloc[0]),
    )
    geoms = _decode_series(wkb)
    idx = hilbert_index_geoms(geoms, res, bounds)
    return pd.Series(idx).astype("Int64").where(pd.Series(idx) >= 0, None)


# -- column-level API ------------------------------------------------------

def st_point(x, y) -> Column:
    return st_point_udf(F.col(x) if isinstance(x, str) else x,
                        F.col(y) if isinstance(y, str) else y)


def st_geomfromtext(c) -> Column:
    return st_geomfromtext_udf(F.col(c) if isinstance(c, str) else c)


def geo_literal(g: G.Geometry) -> Column:
    """A geometry literal column (WKB bytes)."""
    return F.lit(bytearray(geometry_to_wkb(g)))


def st_intersects(a, b) -> Column:
    return st_intersects_udf(_c(a), _c(b))


def st_covers(a, b) -> Column:
    return st_covers_udf(_c(a), _c(b))


def st_within(a, b) -> Column:
    return st_within_udf(_c(a), _c(b))


def st_contains(a, b) -> Column:
    return st_contains_udf(_c(a), _c(b))


def st_distance(a, b) -> Column:
    return st_distance_udf(_c(a), _c(b))


def st_dwithin(a, b, dist) -> Column:
    return st_dwithin_udf(_c(a), _c(b), F.lit(dist) if not hasattr(dist, "cast") else dist)


def st_makeenvelope(xmin, ymin, xmax, ymax) -> Column:
    return st_makeenvelope_udf(_c(xmin), _c(ymin), _c(xmax), _c(ymax))


def st_hilbert(
    geom, resolution: int, bounds: tuple[float, float, float, float] = DEFAULT_BOUNDS
) -> Column:
    return st_hilbert_udf(
        _c(geom),
        F.lit(resolution),
        F.lit(bounds[0]),
        F.lit(bounds[1]),
        F.lit(bounds[2]),
        F.lit(bounds[3]),
    )


def _c(v) -> Column:
    if isinstance(v, str):
        return F.col(v)
    if isinstance(v, G.Geometry):
        return geo_literal(v)
    return v


_SQL_FUNCTIONS = {
    "st_point": st_point_udf,
    "st_geomfromtext": st_geomfromtext_udf,
    "st_geomfromgeojson": st_geomfromgeojson_udf,
    "st_geomfromwkb": st_geomfromwkb_udf,
    "st_astext": st_astext_udf,
    "st_asgeojson": st_asgeojson_udf,
    "st_x": st_x_udf,
    "st_y": st_y_udf,
    "st_xmin": st_xmin_udf,
    "st_ymin": st_ymin_udf,
    "st_xmax": st_xmax_udf,
    "st_ymax": st_ymax_udf,
    "st_area": st_area_udf,
    "st_length": st_length_udf,
    "st_isempty": st_isempty_udf,
    "st_intersects": st_intersects_udf,
    "st_covers": st_covers_udf,
    "st_within": st_within_udf,
    "st_contains": st_contains_udf,
    "st_disjoint": st_disjoint_udf,
    "st_distance": st_distance_udf,
    "st_dwithin": st_dwithin_udf,
    "st_buffer": st_buffer_udf,
    "st_envelope": st_envelope_udf,
    "st_centroid": st_centroid_udf,
    "st_hilbert": st_hilbert_udf,
}


def register_geo_functions(spark: SparkSession) -> None:
    """Expose the st_* surface to spark.sql (temp function registry)."""
    for name, udf in _SQL_FUNCTIONS.items():
        spark.udf.register(name, udf)


# encoding conversion between the four physical encodings
def convert_encoding_udf(src: str, dst: str):
    @pandas_udf(BinaryType() if dst in ("ewkb", "wkb") else StringType())
    def _conv(col: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else encode_enc(decode_enc(v, src), dst) for v in col]
        )

    return _conv
