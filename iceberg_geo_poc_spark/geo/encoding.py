"""Geometry encodings: ewkb | wkb | wkt | geojson.

Mirrors reference api/src/main/java/org/apache/iceberg/types/havasu/
GeometryEncoding.java:26-69 — ewkb/wkb are physical BINARY, wkt/geojson
physical STRING.  The engine-facing Spark column is BinaryType (WKB)
for binary encodings and StringType for text encodings, tagged via
column metadata ``{"geo_encoding": <name>}``.
"""

from __future__ import annotations

from iceberg_geo_poc_spark.geo.geojson import geometry_from_geojson, geometry_to_geojson
from iceberg_geo_poc_spark.geo.geometry import Geometry
from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb
from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt, geometry_to_wkt

ENCODINGS = ("ewkb", "wkb", "wkt", "geojson")
BINARY_ENCODINGS = ("ewkb", "wkb")
STRING_ENCODINGS = ("wkt", "geojson")

GEO_ENCODING_METADATA_KEY = "geo_encoding"


def spark_physical_type(encoding: str) -> str:
    if encoding in BINARY_ENCODINGS:
        return "binary"
    if encoding in STRING_ENCODINGS:
        return "string"
    raise ValueError(f"unknown geometry encoding {encoding!r}")


def decode(value, encoding: str) -> Geometry | None:
    if value is None:
        return None
    if encoding in ("ewkb", "wkb"):
        return geometry_from_wkb(value)
    if encoding == "wkt":
        return geometry_from_wkt(value)
    if encoding == "geojson":
        return geometry_from_geojson(value)
    raise ValueError(f"unknown geometry encoding {encoding!r}")


def encode(g: Geometry | None, encoding: str):
    if g is None:
        return None
    if encoding == "ewkb":
        return geometry_to_wkb(g, srid=4326)
    if encoding == "wkb":
        return geometry_to_wkb(g)
    if encoding == "wkt":
        return geometry_to_wkt(g)
    if encoding == "geojson":
        return geometry_to_geojson(g)
    raise ValueError(f"unknown geometry encoding {encoding!r}")
