"""Pure-Python geometry kernel.

The reference stores geometry engine-agnostically (WKB/WKT/GeoJSON
bytes; reference api/src/main/java/org/apache/iceberg/types/havasu/
GeometryEncoding.java:26-69) and hands row values to a pluggable
library (JTS via an SPI).  Our Spark-side geometry "type" is
BinaryType carrying WKB; this package is the library behind the UDF
boundary — no JVM geo dependency, no Shapely (not available in the
target environment), just a small computational-geometry core +
codecs, vectorized inside Arrow-batched pandas UDFs.
"""

from iceberg_geo_poc_spark.geo.geometry import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
)
from iceberg_geo_poc_spark.geo.wkb import geometry_from_wkb, geometry_to_wkb
from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt, geometry_to_wkt

__all__ = [
    "Geometry",
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
    "box",
    "geometry_from_wkb",
    "geometry_to_wkb",
    "geometry_from_wkt",
    "geometry_to_wkt",
]
