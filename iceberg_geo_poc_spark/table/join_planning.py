"""Statistics-aware join planning over managed tables.

Reference parity: the reference publishes table statistics to the host
engine's cost-based optimizer — ``SparkScan.estimateStatistics()``
(``spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/
SparkScan.java``) reports row count + size so Spark picks broadcast
joins, and the NDV blobs registered via SetStatistics feed CBO
cardinality estimates.  A pure-Python engine cannot hook Spark's
internal Statistics propagation for file-source scans, so the planning
decision moves one level up: ``stats_aware_join`` consults the SAME
metadata (manifest record/byte totals — exact; statistics-file NDVs)
and applies an explicit ``broadcast()`` hint to the side that fits
under the threshold — the decision Spark's CBO would have made with the
reference's reported stats.

Zero data IO: every estimate comes from the manifest frame / statistics
file already on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iceberg_geo_poc_spark.table.table import Table

DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024  # Spark's autoBroadcast default


def estimate_row_count(table: Table) -> int:
    """Exact live-data record total from the manifest (data entries;
    MoR deletes make this an upper bound, same as the reference's
    totalRecordCount estimate)."""
    ent = table._entries()
    if ent.empty:
        return 0
    return int(ent[ent.content == "data"].record_count.sum())


def estimate_size_bytes(table: Table) -> int:
    ent = table._entries()
    if ent.empty:
        return 0
    return int(ent[ent.content == "data"].file_size.sum())


def ndv_estimate(table: Table, column: str) -> int | None:
    """NDV from the registered statistics file (falls back to None —
    callers treat missing stats as 'unknown', never as zero)."""
    from iceberg_geo_poc_spark.table import statistics as ST

    return ST.ndv(table, column)


def stats_aware_join(
    left: Table,
    right: Table,
    on: list[str] | str,
    how: str = "inner",
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Join two managed tables, broadcasting the side whose manifest
    byte total fits under ``broadcast_threshold`` (smaller side wins the
    hint if both fit).  Returns the joined DataFrame; join keys resolve
    by name on both sides (equi-join — the broadcastable shape)."""
    ldf, rdf = left.to_df(), right.to_df()
    lsz, rsz = estimate_size_bytes(left), estimate_size_bytes(right)
    if min(lsz, rsz) <= broadcast_threshold:
        if rsz <= lsz:
            rdf = F.broadcast(rdf)
        else:
            ldf = F.broadcast(ldf)
    return ldf.join(rdf, on=on, how=how)
