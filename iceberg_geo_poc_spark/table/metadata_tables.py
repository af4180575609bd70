"""Metadata tables: table internals queryable as DataFrames.

Analogue of reference core/src/main/java/org/apache/iceberg/
MetadataTableType.java:23-39 (SNAPSHOTS, HISTORY, FILES, MANIFESTS,
PARTITIONS, REFS, ...): ``inspect(table, "snapshots")`` returns a
DataFrame built from the metadata JSON / manifest parquet.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table.table import Table

METADATA_TABLES = (
    "snapshots",
    "history",
    "entries",
    "files",
    "delete_files",
    "manifests",
    "partitions",
    "refs",
    "metadata_log_entries",
)


def inspect(table: Table, name: str) -> DataFrame:
    spark = table.spark
    if name == "snapshots":
        rows = [
            (
                s.snapshot_id,
                s.parent_id,
                s.sequence_number,
                s.timestamp_ms,
                s.operation,
                json.dumps(s.summary),
            )
            for s in table.meta.snapshots
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id LONG, parent_id LONG, sequence_number LONG, "
            "committed_at_ms LONG, operation STRING, summary STRING",
        )
    if name == "history":
        rows = [
            (s.timestamp_ms, s.snapshot_id, s.parent_id,
             s.snapshot_id == table.meta.current_snapshot_id)
            for s in table.meta.snapshots
        ]
        return spark.createDataFrame(
            rows,
            "made_current_at_ms LONG, snapshot_id LONG, parent_id LONG, "
            "is_current_ancestor BOOLEAN",
        )
    if name in ("entries", "files", "delete_files"):
        entries = table._entries()
        if name == "files":
            sub = entries[entries.content == "data"]
        elif name == "delete_files":
            sub = entries[entries.content.isin(["posdel", "eqdel"])]
        else:
            sub = entries
        if sub.empty:
            return spark.createDataFrame(
                [],
                "content STRING, file_path STRING, file_size LONG, record_count LONG, "
                "sequence_number LONG, partition STRING, lower STRING, upper STRING, "
                "nulls STRING, bbox STRING",
            )
        cols = [
            "content", "file_path", "file_size", "record_count",
            "sequence_number", "partition", "lower", "upper", "nulls", "bbox",
        ]
        return spark.createDataFrame(sub[cols])
    if name == "manifests":
        rows = []
        for s in table.meta.snapshots:
            p = os.path.join(table.location, s.manifest)
            rows.append(
                (s.manifest, os.path.getsize(p) if os.path.exists(p) else None,
                 s.snapshot_id)
            )
        return spark.createDataFrame(
            rows, "path STRING, length LONG, added_snapshot_id LONG"
        )
    if name == "partitions":
        entries = table._entries()
        data = entries[entries.content == "data"]
        if data.empty:
            return spark.createDataFrame(
                [], "partition STRING, file_count LONG, record_count LONG, total_size LONG"
            )
        agg = (
            data.groupby("partition")
            .agg(
                file_count=("file_path", "count"),
                record_count=("record_count", "sum"),
                total_size=("file_size", "sum"),
            )
            .reset_index()
        )
        return spark.createDataFrame(agg)
    if name == "refs":
        rows = [
            (rname, r["type"], r["snapshot-id"]) for rname, r in table.meta.refs.items()
        ]
        return spark.createDataFrame(rows, "name STRING, type STRING, snapshot_id LONG")
    if name == "metadata_log_entries":
        mdir = os.path.join(table.location, "metadata")
        rows = []
        for fname in sorted(os.listdir(mdir)):
            if fname.endswith(".metadata.json"):
                p = os.path.join(mdir, fname)
                rows.append(
                    (fname, int(os.path.getmtime(p) * 1000), os.path.getsize(p))
                )
        return spark.createDataFrame(
            rows, "file STRING, modified_at_ms LONG, length LONG"
        )
    raise ValueError(f"unknown metadata table {name!r}; one of {METADATA_TABLES}")
