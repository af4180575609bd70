"""WKB / EWKB codec (2D).

Mirrors the encodings the reference persists (reference
api/src/main/java/org/apache/iceberg/types/havasu/GeometryEncoding.java:
``ewkb`` (default) and ``wkb`` are physical BINARY; stats bounds are
serialized as WKB points via Conversions.toByteBuffer,
api/.../types/Conversions.java:123-126).

EWKB = PostGIS extension: geometry-type word carries flag bits
(0x20000000 = SRID present; Z/M flags unsupported here — the reference
stores XY envelopes only).
"""

from __future__ import annotations

import struct

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

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_COLLECTION = 7

_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000
_EWKB_M_FLAG = 0x40000000


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str, size: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v


def _read_geometry(r: _Reader) -> Geometry:
    (byte_order,) = r.read("B", 1)
    endian = "<" if byte_order == 1 else ">"
    (type_word,) = r.read(endian + "I", 4)
    has_srid = bool(type_word & _EWKB_SRID_FLAG)
    if type_word & (_EWKB_Z_FLAG | _EWKB_M_FLAG):
        raise ValueError("Z/M WKB coordinates are not supported (2D only)")
    gtype = type_word & 0xFF
    # ISO WKB encodes Z as +1000, M as +2000
    if gtype != type_word & 0x0FFFFFFF and not has_srid:
        iso = (type_word & 0x0FFFFFFF) // 1000
        if iso in (1, 2, 3):
            raise ValueError("Z/M WKB coordinates are not supported (2D only)")
    if has_srid:
        r.read(endian + "I", 4)  # SRID kept out of the value model
    if gtype == _WKB_POINT:
        x, y = r.read(endian + "dd", 16)
        return Point(x, y)
    if gtype == _WKB_LINESTRING:
        return LineString(_read_coords(r, endian))
    if gtype == _WKB_POLYGON:
        (nrings,) = r.read(endian + "I", 4)
        rings = [_read_coords(r, endian) for _ in range(nrings)]
        if not rings:
            return Polygon([])
        return Polygon(rings[0], rings[1:])
    if gtype in (_WKB_MULTIPOINT, _WKB_MULTILINESTRING, _WKB_MULTIPOLYGON, _WKB_COLLECTION):
        (n,) = r.read(endian + "I", 4)
        subs = [_read_geometry(r) for _ in range(n)]
        if gtype == _WKB_MULTIPOINT:
            return MultiPoint([p for p in subs])
        if gtype == _WKB_MULTILINESTRING:
            return MultiLineString([ln.coords for ln in subs])
        if gtype == _WKB_MULTIPOLYGON:
            return MultiPolygon(subs)
        return GeometryCollection(subs)
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _read_coords(r: _Reader, endian: str):
    (n,) = r.read(endian + "I", 4)
    flat = r.read(endian + "d" * (2 * n), 16 * n)
    return list(zip(flat[0::2], flat[1::2]))


def geometry_from_wkb(data: bytes) -> Geometry:
    return _read_geometry(_Reader(bytes(data)))


def _write_coords(out: bytearray, coords):
    out += struct.pack("<I", len(coords))
    for x, y in coords:
        out += struct.pack("<dd", x, y)


def _write_geometry(out: bytearray, g: Geometry, srid: int | None):
    out += b"\x01"  # little endian
    def type_word(t: int) -> bytes:
        w = t | (_EWKB_SRID_FLAG if srid is not None else 0)
        return struct.pack("<I", w)

    if isinstance(g, Point):
        out += type_word(_WKB_POINT)
        if srid is not None:
            out += struct.pack("<I", srid)
        out += struct.pack("<dd", g.x, g.y)
    elif isinstance(g, LineString):
        out += type_word(_WKB_LINESTRING)
        if srid is not None:
            out += struct.pack("<I", srid)
        _write_coords(out, g.coords)
    elif isinstance(g, Polygon):
        out += type_word(_WKB_POLYGON)
        if srid is not None:
            out += struct.pack("<I", srid)
        rings = [g.shell, *g.holes] if not g.is_empty() else []
        out += struct.pack("<I", len(rings))
        for ring in rings:
            _write_coords(out, ring)
    elif isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
        t = {
            MultiPoint: _WKB_MULTIPOINT,
            MultiLineString: _WKB_MULTILINESTRING,
            MultiPolygon: _WKB_MULTIPOLYGON,
            GeometryCollection: _WKB_COLLECTION,
        }[type(g)]
        subs = (
            g.points
            if isinstance(g, MultiPoint)
            else g.lines
            if isinstance(g, MultiLineString)
            else g.polygons
            if isinstance(g, MultiPolygon)
            else g.geoms
        )
        out += type_word(t)
        if srid is not None:
            out += struct.pack("<I", srid)
        out += struct.pack("<I", len(subs))
        for sub in subs:
            _write_geometry(out, sub, None)
    else:
        raise ValueError(f"cannot encode {type(g).__name__} as WKB")


def geometry_to_wkb(g: Geometry, srid: int | None = None) -> bytes:
    """Encode as WKB; pass ``srid`` for EWKB with an SRID word."""
    out = bytearray()
    _write_geometry(out, g, srid)
    return bytes(out)
