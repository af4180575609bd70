"""iceberg_geo_poc_spark — a PySpark-native lakehouse engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo wherobots/iceberg-geo-poc ("Havasu": Apache Iceberg +
geospatial extensions).  The reference is a *table format + metadata /
pruning layer* that delegates relational execution to the host engine;
this package mirrors that split:

- ``table/``      Python implementation of the versioned table layer
                  (snapshots, manifests, per-file stats incl. geometry
                  bounding boxes, planning-time pruning, row-level ops).
- ``geo/``        pure-Python geometry kernel (WKB/WKT/GeoJSON codecs,
                  spatial predicates) exposed as Arrow-batched pandas
                  UDFs — the Spark-side geometry type is BinaryType(WKB),
                  mirroring the reference's engine-agnostic encoding
                  design (reference: api/.../havasu/GeometryEncoding.java).
- ``functions/``  system scalar functions (bucket/truncate/years/…/hilbert)
                  mirroring reference spark/.../functions/SparkFunctions.java.
- ``operators/``  large-scale data-pipeline operators (dedup, similarity
                  search, text analysis, multimodal columns).
- ``streaming/``  incremental snapshot-diff reads and changelog scans.

Relational execution (joins/aggs/windows/set-ops) is stock Spark SQL,
declared and oracle-tested in ``queries.py``.
"""

__version__ = "0.1.0"
