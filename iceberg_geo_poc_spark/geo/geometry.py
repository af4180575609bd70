"""2D geometry model + predicates (pure Python).

Covers the surface the reference exercises: the spatial predicates
used for row-level evaluation and data skipping (ST_INTERSECTS /
ST_COVERS; reference api/.../expressions/Expression.java:47-48,
BoundLiteralPredicate.java:88-97) plus the envelope math used by the
bbox metrics writer (reference core/.../havasu/GeometryFieldMetrics.java:58-88)
and the scalar function set needed by its tests (st_point, st_buffer
on points, st_x/st_y, area, distance, centroid).

Semantics follow the OGC simple-features definitions JTS implements:
- ``intersects``: geometries share at least one point.
- ``covers``: no point of the argument lies outside the receiver
  (boundary contact allowed).
- ``contains``: covers AND at least one interior-interior intersection.

Supported types are 2D Point / MultiPoint / LineString /
MultiLineString / Polygon (shell + holes) / MultiPolygon /
GeometryCollection.  Z/M coordinates are not supported (the reference
stores XY bounds only).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

_EPS = 1e-12


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def _orient(ax, ay, bx, by, cx, cy) -> float:
    """Signed area of triangle abc (positive = counter-clockwise)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(px, py, ax, ay, bx, by) -> bool:
    """Is p on closed segment ab (collinear + within bbox)?"""
    if abs(_orient(ax, ay, bx, by, px, py)) > _EPS * max(
        1.0, abs(ax), abs(ay), abs(bx), abs(by), abs(px), abs(py)
    ):
        return False
    return (
        min(ax, bx) - _EPS <= px <= max(ax, bx) + _EPS
        and min(ay, by) - _EPS <= py <= max(ay, by) + _EPS
    )


def _segments_intersect(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    """Do closed segments ab and cd share at least one point?"""
    d1 = _orient(cx, cy, dx, dy, ax, ay)
    d2 = _orient(cx, cy, dx, dy, bx, by)
    d3 = _orient(ax, ay, bx, by, cx, cy)
    d4 = _orient(ax, ay, bx, by, dx, dy)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    if _on_segment(ax, ay, cx, cy, dx, dy):
        return True
    if _on_segment(bx, by, cx, cy, dx, dy):
        return True
    if _on_segment(cx, cy, ax, ay, bx, by):
        return True
    if _on_segment(dx, dy, ax, ay, bx, by):
        return True
    return False


def _segments_cross_properly(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    """Intersection point interior to both segments (strict crossing)."""
    d1 = _orient(cx, cy, dx, dy, ax, ay)
    d2 = _orient(cx, cy, dx, dy, bx, by)
    d3 = _orient(ax, ay, bx, by, cx, cy)
    d4 = _orient(ax, ay, bx, by, dx, dy)
    return ((d1 > _EPS and d2 < -_EPS) or (d1 < -_EPS and d2 > _EPS)) and (
        (d3 > _EPS and d4 < -_EPS) or (d3 < -_EPS and d4 > _EPS)
    )


def _point_seg_dist2(px, py, ax, ay, bx, by) -> float:
    vx, vy = bx - ax, by - ay
    wx, wy = px - ax, py - ay
    vv = vx * vx + vy * vy
    if vv <= _EPS:
        return wx * wx + wy * wy
    t = max(0.0, min(1.0, (wx * vx + wy * vy) / vv))
    dx, dy = px - (ax + t * vx), py - (ay + t * vy)
    return dx * dx + dy * dy


def _seg_seg_dist2(ax, ay, bx, by, cx, cy, dx, dy) -> float:
    if _segments_intersect(ax, ay, bx, by, cx, cy, dx, dy):
        return 0.0
    return min(
        _point_seg_dist2(ax, ay, cx, cy, dx, dy),
        _point_seg_dist2(bx, by, cx, cy, dx, dy),
        _point_seg_dist2(cx, cy, ax, ay, bx, by),
        _point_seg_dist2(dx, dy, ax, ay, bx, by),
    )


def _ring_contains(ring: list[tuple[float, float]], px: float, py: float) -> int:
    """Point-in-ring: 0 outside, 1 inside, 2 on boundary (ray casting)."""
    n = len(ring)
    inside = False
    for i in range(n - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        if _on_segment(px, py, ax, ay, bx, by):
            return 2
        if (ay > py) != (by > py):
            x_at = ax + (py - ay) * (bx - ax) / (by - ay)
            if x_at > px:
                inside = not inside
    return 1 if inside else 0


# --------------------------------------------------------------------------
# geometry classes
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Geometry:
    def is_empty(self) -> bool:
        raise NotImplementedError

    @property
    def bounds(self) -> tuple[float, float, float, float] | None:
        """(xmin, ymin, xmax, ymax) or None for empty geometry."""
        pts = list(self._coords())
        if not pts:
            return None
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return (min(xs), min(ys), max(xs), max(ys))

    def _coords(self):
        raise NotImplementedError

    def _segments(self):
        return iter(())

    # -- predicates ------------------------------------------------------
    def intersects(self, other: "Geometry") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        b1, b2 = self.bounds, other.bounds
        if b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]:
            return False
        return _intersects(self, other)

    def covers(self, other: "Geometry") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        b1, b2 = self.bounds, other.bounds
        if not (
            b1[0] <= b2[0] + _EPS
            and b1[1] <= b2[1] + _EPS
            and b1[2] >= b2[2] - _EPS
            and b1[3] >= b2[3] - _EPS
        ):
            return False
        return _covers(self, other)

    def within(self, other: "Geometry") -> bool:
        return other.covers(self)

    def contains(self, other: "Geometry") -> bool:
        # OGC contains = covers with interior-interior intersection; for
        # the point-in-polygon case this excludes pure boundary contact.
        if not self.covers(other):
            return False
        if isinstance(self, (Polygon, MultiPolygon)) and isinstance(other, Point):
            return _poly_locate(self, other.x, other.y) == 1
        return True

    def disjoint(self, other: "Geometry") -> bool:
        return not self.intersects(other)

    def distance(self, other: "Geometry") -> float:
        if self.is_empty() or other.is_empty():
            return float("nan")
        if self.intersects(other):
            return 0.0
        best = math.inf
        a_segs = list(self._segments())
        b_segs = list(other._segments())
        a_pts = list(self._coords())
        b_pts = list(other._coords())
        if a_segs and b_segs:
            for s1 in a_segs:
                for s2 in b_segs:
                    best = min(best, _seg_seg_dist2(*s1, *s2))
        elif a_segs:
            for px, py in b_pts:
                for s1 in a_segs:
                    best = min(best, _point_seg_dist2(px, py, *s1))
        elif b_segs:
            for px, py in a_pts:
                for s2 in b_segs:
                    best = min(best, _point_seg_dist2(px, py, *s2))
        else:
            for px, py in a_pts:
                for qx, qy in b_pts:
                    best = min(best, (px - qx) ** 2 + (py - qy) ** 2)
        return math.sqrt(best)

    # -- measures --------------------------------------------------------
    @property
    def area(self) -> float:
        return 0.0

    @property
    def length(self) -> float:
        return 0.0

    def centroid(self) -> "Point":
        pts = list(self._coords())
        if not pts:
            return Point(float("nan"), float("nan"))
        return Point(
            sum(p[0] for p in pts) / len(pts), sum(p[1] for p in pts) / len(pts)
        )

    def envelope(self) -> "Geometry":
        b = self.bounds
        if b is None:
            return Polygon([])
        xmin, ymin, xmax, ymax = b
        if xmin == xmax and ymin == ymax:
            return Point(xmin, ymin)
        return box(xmin, ymin, xmax, ymax)

    def buffer(self, dist: float, quad_segs: int = 16) -> "Geometry":
        raise NotImplementedError(
            f"buffer is implemented for Point only (got {type(self).__name__}); "
            "general polygon offsetting is out of scope for this kernel"
        )


@dataclass(frozen=True)
class Point(Geometry):
    x: float
    y: float

    def is_empty(self) -> bool:
        return math.isnan(self.x) or math.isnan(self.y)

    def _coords(self):
        if not self.is_empty():
            yield (self.x, self.y)

    def centroid(self) -> "Point":
        return self

    def buffer(self, dist: float, quad_segs: int = 16) -> "Geometry":
        """Circle approximated by a 4*quad_segs-gon (JTS-style buffer)."""
        if self.is_empty() or dist <= 0:
            return Polygon([])
        n = max(4, 4 * quad_segs)
        ring = [
            (
                self.x + dist * math.cos(2 * math.pi * i / n),
                self.y + dist * math.sin(2 * math.pi * i / n),
            )
            for i in range(n)
        ]
        ring.append(ring[0])
        return Polygon(ring)


@dataclass(frozen=True)
class MultiPoint(Geometry):
    points: tuple[Point, ...] = field(default_factory=tuple)

    def __init__(self, points=()):
        object.__setattr__(self, "points", tuple(
            p if isinstance(p, Point) else Point(*p) for p in points
        ))

    def is_empty(self) -> bool:
        return all(p.is_empty() for p in self.points)

    def _coords(self):
        for p in self.points:
            yield from p._coords()


@dataclass(frozen=True)
class LineString(Geometry):
    coords: tuple[tuple[float, float], ...] = field(default_factory=tuple)

    def __init__(self, coords=()):
        object.__setattr__(self, "coords", tuple((float(x), float(y)) for x, y in coords))

    def is_empty(self) -> bool:
        return len(self.coords) == 0

    def _coords(self):
        yield from self.coords

    def _segments(self):
        for i in range(len(self.coords) - 1):
            a, b = self.coords[i], self.coords[i + 1]
            yield (a[0], a[1], b[0], b[1])

    @property
    def length(self) -> float:
        return sum(
            math.dist(self.coords[i], self.coords[i + 1])
            for i in range(len(self.coords) - 1)
        )

    def centroid(self) -> Point:
        # length-weighted centroid of segments
        total, cx, cy = 0.0, 0.0, 0.0
        for i in range(len(self.coords) - 1):
            a, b = self.coords[i], self.coords[i + 1]
            ln = math.dist(a, b)
            total += ln
            cx += ln * (a[0] + b[0]) / 2
            cy += ln * (a[1] + b[1]) / 2
        if total <= _EPS:
            return super().centroid()
        return Point(cx / total, cy / total)


@dataclass(frozen=True)
class MultiLineString(Geometry):
    lines: tuple[LineString, ...] = field(default_factory=tuple)

    def __init__(self, lines=()):
        object.__setattr__(self, "lines", tuple(
            ln if isinstance(ln, LineString) else LineString(ln) for ln in lines
        ))

    def is_empty(self) -> bool:
        return all(ln.is_empty() for ln in self.lines)

    def _coords(self):
        for ln in self.lines:
            yield from ln._coords()

    def _segments(self):
        for ln in self.lines:
            yield from ln._segments()

    @property
    def length(self) -> float:
        return sum(ln.length for ln in self.lines)


def _close_ring(coords):
    coords = [(float(x), float(y)) for x, y in coords]
    if coords and coords[0] != coords[-1]:
        coords.append(coords[0])
    return tuple(coords)


@dataclass(frozen=True)
class Polygon(Geometry):
    shell: tuple[tuple[float, float], ...] = field(default_factory=tuple)
    holes: tuple[tuple[tuple[float, float], ...], ...] = field(default_factory=tuple)

    def __init__(self, shell=(), holes=()):
        object.__setattr__(self, "shell", _close_ring(shell))
        object.__setattr__(self, "holes", tuple(_close_ring(h) for h in holes))

    def is_empty(self) -> bool:
        return len(self.shell) == 0

    def _coords(self):
        yield from self.shell
        for h in self.holes:
            yield from h

    def _segments(self):
        rings = (self.shell, *self.holes)
        for ring in rings:
            for i in range(len(ring) - 1):
                a, b = ring[i], ring[i + 1]
                yield (a[0], a[1], b[0], b[1])

    @property
    def area(self) -> float:
        def ring_area(ring):
            s = 0.0
            for i in range(len(ring) - 1):
                ax, ay = ring[i]
                bx, by = ring[i + 1]
                s += ax * by - bx * ay
            return abs(s) / 2

        return ring_area(self.shell) - sum(ring_area(h) for h in self.holes)

    def centroid(self) -> Point:
        def ring_acc(ring, sign):
            a2, cx, cy = 0.0, 0.0, 0.0
            for i in range(len(ring) - 1):
                ax, ay = ring[i]
                bx, by = ring[i + 1]
                cross = ax * by - bx * ay
                a2 += cross
                cx += (ax + bx) * cross
                cy += (ay + by) * cross
            return sign * a2, sign * cx, sign * cy

        a2, cx, cy = ring_acc(self.shell, 1.0)
        for h in self.holes:
            # holes subtract; ring orientation may vary so normalize by sign
            ha2, hcx, hcy = ring_acc(h, 1.0)
            if (a2 >= 0) == (ha2 >= 0):
                ha2, hcx, hcy = -ha2, -hcx, -hcy
            a2 += ha2
            cx += hcx
            cy += hcy
        if abs(a2) <= _EPS:
            return super().centroid()
        return Point(cx / (3 * a2), cy / (3 * a2))


@dataclass(frozen=True)
class MultiPolygon(Geometry):
    polygons: tuple[Polygon, ...] = field(default_factory=tuple)

    def __init__(self, polygons=()):
        object.__setattr__(self, "polygons", tuple(polygons))

    def is_empty(self) -> bool:
        return all(p.is_empty() for p in self.polygons)

    def _coords(self):
        for p in self.polygons:
            yield from p._coords()

    def _segments(self):
        for p in self.polygons:
            yield from p._segments()

    @property
    def area(self) -> float:
        return sum(p.area for p in self.polygons)


@dataclass(frozen=True)
class GeometryCollection(Geometry):
    geoms: tuple[Geometry, ...] = field(default_factory=tuple)

    def __init__(self, geoms=()):
        object.__setattr__(self, "geoms", tuple(geoms))

    def is_empty(self) -> bool:
        return all(g.is_empty() for g in self.geoms)

    def _coords(self):
        for g in self.geoms:
            yield from g._coords()

    def _segments(self):
        for g in self.geoms:
            yield from g._segments()

    @property
    def area(self) -> float:
        return sum(g.area for g in self.geoms)


def box(xmin: float, ymin: float, xmax: float, ymax: float) -> Polygon:
    """Axis-aligned rectangle polygon (CCW)."""
    return Polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)])


# --------------------------------------------------------------------------
# predicate dispatch
# --------------------------------------------------------------------------

def _parts(g: Geometry):
    """Flatten to simple parts (Point / LineString / Polygon)."""
    if isinstance(g, MultiPoint):
        yield from (p for p in g.points if not p.is_empty())
    elif isinstance(g, MultiLineString):
        yield from (ln for ln in g.lines if not ln.is_empty())
    elif isinstance(g, MultiPolygon):
        yield from (p for p in g.polygons if not p.is_empty())
    elif isinstance(g, GeometryCollection):
        for sub in g.geoms:
            yield from _parts(sub)
    else:
        if not g.is_empty():
            yield g


def _poly_locate(poly: Geometry, px: float, py: float) -> int:
    """0 outside, 1 interior, 2 boundary — polygon or multipolygon."""
    if isinstance(poly, MultiPolygon):
        out = 0
        for p in poly.polygons:
            loc = _poly_locate(p, px, py)
            if loc == 2:
                return 2
            out = max(out, loc)
        return out
    loc = _ring_contains(list(poly.shell), px, py)
    if loc != 1:
        return loc
    for h in poly.holes:
        hloc = _ring_contains(list(h), px, py)
        if hloc == 2:
            return 2  # on hole boundary = on polygon boundary
        if hloc == 1:
            return 0  # strictly inside a hole = outside
    return 1


def _simple_intersects(a: Geometry, b: Geometry) -> bool:
    ta = 0 if isinstance(a, Point) else (1 if isinstance(a, LineString) else 2)
    tb = 0 if isinstance(b, Point) else (1 if isinstance(b, LineString) else 2)
    if ta > tb:
        a, b, ta, tb = b, a, tb, ta
    if ta == 0 and tb == 0:
        return abs(a.x - b.x) <= _EPS and abs(a.y - b.y) <= _EPS
    if ta == 0 and tb == 1:
        return any(_on_segment(a.x, a.y, *s) for s in b._segments())
    if ta == 0 and tb == 2:
        return _poly_locate(b, a.x, a.y) != 0
    if ta == 1 and tb == 1:
        return any(
            _segments_intersect(*s1, *s2) for s1 in a._segments() for s2 in b._segments()
        )
    if ta == 1 and tb == 2:
        if any(_poly_locate(b, x, y) != 0 for x, y in a._coords()):
            return True
        return any(
            _segments_intersect(*s1, *s2) for s1 in a._segments() for s2 in b._segments()
        )
    # polygon-polygon
    if any(_poly_locate(b, x, y) != 0 for x, y in a.shell):
        return True
    if any(_poly_locate(a, x, y) != 0 for x, y in b.shell):
        return True
    return any(
        _segments_intersect(*s1, *s2) for s1 in a._segments() for s2 in b._segments()
    )


def _intersects(a: Geometry, b: Geometry) -> bool:
    return any(
        _simple_intersects(pa, pb) for pa in _parts(a) for pb in _parts(b)
    )


def _simple_covers(a: Geometry, b: Geometry) -> bool:
    """Does simple part a cover simple part b?"""
    if isinstance(a, Point):
        return all(
            abs(x - a.x) <= _EPS and abs(y - a.y) <= _EPS for x, y in b._coords()
        )
    if isinstance(a, LineString):
        if isinstance(b, Polygon):
            return False
        segs = list(a._segments())
        return all(
            any(_on_segment(x, y, *s) for s in segs) for x, y in b._coords()
        )
        # NOTE: point-set coverage of a linestring by vertices only is
        # exact for points/multipoints; linestring-covers-linestring with
        # differing vertex sets is approximated by vertex sampling.
    # a is Polygon
    if isinstance(b, Polygon):
        if not all(_poly_locate(a, x, y) != 0 for x, y in b.shell):
            return False
        # boundary of b must not properly cross boundary of a
        if any(
            _segments_cross_properly(*s1, *s2)
            for s1 in b._segments()
            for s2 in a._segments()
        ):
            return False
        # a's holes must not bite into b's interior
        for hole in a.holes:
            for hx, hy in hole[:-1]:
                if _poly_locate(b, hx, hy) == 1:
                    return False
        return True
    # b is Point or LineString
    if not all(_poly_locate(a, x, y) != 0 for x, y in b._coords()):
        return False
    if isinstance(b, LineString):
        if any(
            _segments_cross_properly(*s1, *s2)
            for s1 in b._segments()
            for s2 in a._segments()
        ):
            return False
        # midpoint sampling guards against segments leaving a concave shell
        for x1, y1, x2, y2 in b._segments():
            if _poly_locate(a, (x1 + x2) / 2, (y1 + y2) / 2) == 0:
                return False
    return True


def _covers(a: Geometry, b: Geometry) -> bool:
    # every simple part of b must be covered by the union of a's parts;
    # approximated as: some part of a covers it (exact when a's parts are
    # disjoint, which holds for valid multi-geometries).
    return all(
        any(_simple_covers(pa, pb) for pa in _parts(a)) for pb in _parts(b)
    )
