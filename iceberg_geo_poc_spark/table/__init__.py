"""Versioned table layer: snapshots, manifests, stats-based pruning.

Python re-expression of the reference's table format core (Apache
Iceberg + havasu geo extension): metadata JSON log + per-file stats
manifests (including geometry bounding boxes) drive planning-time file
pruning; Spark executes the pruned scan.
"""

from iceberg_geo_poc_spark.table.catalog import Catalog
from iceberg_geo_poc_spark.table.jdbc_catalog import JdbcCatalog
from iceberg_geo_poc_spark.table import expressions as E

__all__ = ["Catalog", "JdbcCatalog", "E"]
