"""WKT codec (2D) — the ``wkt`` physical-STRING geometry encoding
(reference api/.../havasu/GeometryEncoding.java:41-48)."""

from __future__ import annotations

import re

from iceberg_geo_poc_spark.geo.geometry import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


class _P:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.s) and self.s[self.pos].isspace():
            self.pos += 1

    def word(self) -> str:
        self.skip_ws()
        m = re.match(r"[A-Za-z]+", self.s[self.pos:])
        if not m:
            raise ValueError(f"expected word at {self.pos} in {self.s!r}")
        self.pos += m.end()
        return m.group(0).upper()

    def peek_word(self) -> str | None:
        save = self.pos
        try:
            w = self.word()
        except ValueError:
            return None
        self.pos = save
        return w

    def expect(self, ch: str):
        self.skip_ws()
        if self.pos >= len(self.s) or self.s[self.pos] != ch:
            raise ValueError(f"expected {ch!r} at {self.pos} in {self.s!r}")
        self.pos += 1

    def try_char(self, ch: str) -> bool:
        self.skip_ws()
        if self.pos < len(self.s) and self.s[self.pos] == ch:
            self.pos += 1
            return True
        return False

    def number(self) -> float:
        self.skip_ws()
        m = re.match(_NUM, self.s[self.pos:])
        if not m:
            raise ValueError(f"expected number at {self.pos} in {self.s!r}")
        self.pos += m.end()
        return float(m.group(0))


def _coord(p: _P):
    return (p.number(), p.number())


def _coord_seq(p: _P):
    p.expect("(")
    coords = [_coord(p)]
    while p.try_char(","):
        coords.append(_coord(p))
    p.expect(")")
    return coords


def _rings(p: _P):
    p.expect("(")
    rings = [_coord_seq(p)]
    while p.try_char(","):
        rings.append(_coord_seq(p))
    p.expect(")")
    return rings


def _is_empty(p: _P) -> bool:
    if p.peek_word() == "EMPTY":
        p.word()
        return True
    return False


def geometry_from_wkt(text: str) -> Geometry:
    p = _P(text.strip())
    g = _parse(p)
    p.skip_ws()
    if p.pos != len(p.s):
        raise ValueError(f"trailing characters in WKT: {text!r}")
    return g


def _parse(p: _P) -> Geometry:
    tag = p.word()
    if tag == "POINT":
        if _is_empty(p):
            return Point(float("nan"), float("nan"))
        p.expect("(")
        x, y = _coord(p)
        p.expect(")")
        return Point(x, y)
    if tag == "LINESTRING":
        if _is_empty(p):
            return LineString([])
        return LineString(_coord_seq(p))
    if tag == "POLYGON":
        if _is_empty(p):
            return Polygon([])
        rings = _rings(p)
        return Polygon(rings[0], rings[1:])
    if tag == "MULTIPOINT":
        if _is_empty(p):
            return MultiPoint([])
        p.expect("(")
        pts = []
        while True:
            if p.try_char("("):
                pts.append(_coord(p))
                p.expect(")")
            else:
                pts.append(_coord(p))
            if not p.try_char(","):
                break
        p.expect(")")
        return MultiPoint(pts)
    if tag == "MULTILINESTRING":
        if _is_empty(p):
            return MultiLineString([])
        return MultiLineString(_rings(p))
    if tag == "MULTIPOLYGON":
        if _is_empty(p):
            return MultiPolygon([])
        p.expect("(")
        polys = []
        while True:
            rings = _rings(p)
            polys.append(Polygon(rings[0], rings[1:]))
            if not p.try_char(","):
                break
        p.expect(")")
        return MultiPolygon(polys)
    if tag == "GEOMETRYCOLLECTION":
        if _is_empty(p):
            return GeometryCollection([])
        p.expect("(")
        geoms = [_parse(p)]
        while p.try_char(","):
            geoms.append(_parse(p))
        p.expect(")")
        return GeometryCollection(geoms)
    raise ValueError(f"unsupported WKT type {tag}")


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _fmt_coords(coords) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in coords)


def geometry_to_wkt(g: Geometry) -> str:
    if isinstance(g, Point):
        if g.is_empty():
            return "POINT EMPTY"
        return f"POINT ({_fmt(g.x)} {_fmt(g.y)})"
    if isinstance(g, LineString):
        if g.is_empty():
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_fmt_coords(g.coords)})"
    if isinstance(g, Polygon):
        if g.is_empty():
            return "POLYGON EMPTY"
        rings = [g.shell, *g.holes]
        inner = ", ".join(f"({_fmt_coords(r)})" for r in rings)
        return f"POLYGON ({inner})"
    if isinstance(g, MultiPoint):
        if g.is_empty():
            return "MULTIPOINT EMPTY"
        inner = ", ".join(f"({_fmt(p.x)} {_fmt(p.y)})" for p in g.points)
        return f"MULTIPOINT ({inner})"
    if isinstance(g, MultiLineString):
        if g.is_empty():
            return "MULTILINESTRING EMPTY"
        inner = ", ".join(f"({_fmt_coords(ln.coords)})" for ln in g.lines)
        return f"MULTILINESTRING ({inner})"
    if isinstance(g, MultiPolygon):
        if g.is_empty():
            return "MULTIPOLYGON EMPTY"
        parts = []
        for poly in g.polygons:
            rings = [poly.shell, *poly.holes]
            parts.append("(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")")
        return f"MULTIPOLYGON ({', '.join(parts)})"
    if isinstance(g, GeometryCollection):
        if g.is_empty():
            return "GEOMETRYCOLLECTION EMPTY"
        return f"GEOMETRYCOLLECTION ({', '.join(geometry_to_wkt(s) for s in g.geoms)})"
    raise ValueError(f"cannot format {type(g).__name__} as WKT")
