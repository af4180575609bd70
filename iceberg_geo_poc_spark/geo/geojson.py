"""GeoJSON codec — the ``geojson`` physical-STRING geometry encoding
(reference api/.../havasu/GeometryEncoding.java:49-56, jts2geojson in
the reference's dependency list gradle/libs.versions.toml:92)."""

from __future__ import annotations

import json

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


def geometry_from_geojson(text: str | dict) -> Geometry:
    obj = json.loads(text) if isinstance(text, str) else text
    t = obj["type"]
    if t == "Point":
        c = obj["coordinates"]
        if not c:
            return Point(float("nan"), float("nan"))
        return Point(c[0], c[1])
    if t == "LineString":
        return LineString(obj["coordinates"])
    if t == "Polygon":
        rings = obj["coordinates"]
        if not rings:
            return Polygon([])
        return Polygon(rings[0], rings[1:])
    if t == "MultiPoint":
        return MultiPoint(obj["coordinates"])
    if t == "MultiLineString":
        return MultiLineString(obj["coordinates"])
    if t == "MultiPolygon":
        return MultiPolygon(
            [Polygon(rings[0], rings[1:]) for rings in obj["coordinates"] if rings]
        )
    if t == "GeometryCollection":
        return GeometryCollection(
            [geometry_from_geojson(g) for g in obj["geometries"]]
        )
    raise ValueError(f"unsupported GeoJSON type {t}")


def geometry_to_geojson(g: Geometry) -> str:
    return json.dumps(_to_obj(g), separators=(",", ":"))


def _to_obj(g: Geometry) -> dict:
    if isinstance(g, Point):
        coords = [] if g.is_empty() else [g.x, g.y]
        return {"type": "Point", "coordinates": coords}
    if isinstance(g, LineString):
        return {"type": "LineString", "coordinates": [list(c) for c in g.coords]}
    if isinstance(g, Polygon):
        rings = [] if g.is_empty() else [g.shell, *g.holes]
        return {
            "type": "Polygon",
            "coordinates": [[list(c) for c in ring] for ring in rings],
        }
    if isinstance(g, MultiPoint):
        return {
            "type": "MultiPoint",
            "coordinates": [[p.x, p.y] for p in g.points if not p.is_empty()],
        }
    if isinstance(g, MultiLineString):
        return {
            "type": "MultiLineString",
            "coordinates": [[list(c) for c in ln.coords] for ln in g.lines],
        }
    if isinstance(g, MultiPolygon):
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [[list(c) for c in ring] for ring in (p.shell, *p.holes)]
                for p in g.polygons
                if not p.is_empty()
            ],
        }
    if isinstance(g, GeometryCollection):
        return {
            "type": "GeometryCollection",
            "geometries": [_to_obj(s) for s in g.geoms],
        }
    raise ValueError(f"cannot format {type(g).__name__} as GeoJSON")
