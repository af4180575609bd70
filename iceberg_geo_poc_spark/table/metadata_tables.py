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
    "data_files",
    "delete_files",
    "manifests",
    "all_manifests",
    "all_entries",
    "all_files",
    "all_data_files",
    "all_delete_files",
    "position_deletes",
    "partitions",
    "refs",
    "metadata_log_entries",
    "statistics",
    "partition_stats",
)

_ENTRY_COLS = [
    "content", "file_path", "file_size", "record_count",
    "sequence_number", "partition", "lower", "upper", "nulls", "nans", "bbox",
]
_ENTRY_DDL = (
    "content STRING, file_path STRING, file_size LONG, record_count LONG, "
    "sequence_number LONG, partition STRING, lower STRING, upper STRING, "
    "nulls STRING, nans STRING, bbox STRING"
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
    if name in (
        "entries", "files", "data_files", "delete_files",
        "all_entries", "all_files", "all_data_files", "all_delete_files",
    ):
        if name.startswith("all_"):
            # union across every valid snapshot, deduped by path — the
            # reference's ALL_* metadata tables (MetadataTableType.java)
            import pandas as pd

            parts = [table._entries(s) for s in table.meta.snapshots]
            entries = (
                pd.concat(parts, ignore_index=True).drop_duplicates(
                    subset=["file_path"]
                )
                if parts
                else table._entries()
            )
            kind = name[4:]
        else:
            entries = table._entries()
            kind = name
        if kind in ("files", "data_files"):
            sub = entries[entries.content == "data"]
        elif kind == "delete_files":
            sub = entries[entries.content.isin(["posdel", "eqdel", "dv"])]
        else:
            sub = entries
        if sub.empty:
            return spark.createDataFrame([], _ENTRY_DDL)
        sub = sub.copy()
        if "nans" not in sub.columns:
            sub["nans"] = None  # legacy manifests predate nan counts
        # delete-file entries carry no nan stats: normalize NaN -> None
        sub["nans"] = sub["nans"].map(lambda s: s if isinstance(s, str) else None)
        return spark.createDataFrame(sub[_ENTRY_COLS], _ENTRY_DDL)
    if name == "position_deletes":
        # row-level content of the position-delete files (reference
        # PositionDeletesTable): one row per deleted (file_path, pos).
        # Deletion-vector blobs contribute their decoded positions with
        # the Puffin sidecar as delete_file.
        entries = table._entries()
        dpaths = entries[entries.content == "posdel"].file_path.tolist()
        parts = []
        if dpaths and table._modular_footer_key():
            # encrypted sidecars: decrypting Arrow read synthesizes the
            # per-row source sidecar path as __file_path
            from iceberg_geo_poc_spark.table import parquet_crypto as PC

            parts.append(
                PC.read_encrypted_df(
                    spark,
                    dpaths,
                    "file_path STRING, pos BIGINT",
                    PC.master_keys(),
                    need_pos=True,
                ).select(
                    "file_path", "pos",
                    F.col("__file_path").alias("delete_file"),
                )
            )
        elif dpaths:
            parts.append(
                spark.read.parquet(*dpaths)
                .withColumn(
                    "delete_file",
                    F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", ""),
                )
                .select("file_path", "pos", "delete_file")
            )
        dv_ent = entries[entries.content == "dv"]
        if len(dv_ent):
            import json as _json

            from iceberg_geo_poc_spark.table import deletion_vectors as DVEC

            descs = []
            for r in dv_ent.itertuples():
                d = _json.loads(r.dv)
                descs.append(
                    (r.file_path, d["referenced"], int(d["offset"]), int(d["length"]))
                )
            dv_rows = DVEC.dv_deletes_df(spark, descs)
            dv_map = spark.createDataFrame(
                [(p, ref) for p, ref, _o, _l in descs],
                "delete_file STRING, __file_path STRING",
            )
            parts.append(
                dv_rows.join(dv_map, "__file_path").select(
                    F.col("__file_path").alias("file_path"),
                    F.col("__pos").alias("pos"),
                    "delete_file",
                )
            )
        if not parts:
            return spark.createDataFrame(
                [], "file_path STRING, pos LONG, delete_file STRING"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if name in ("manifests", "all_manifests"):
        snaps = (
            table.meta.snapshots
            if name == "all_manifests"
            else ([table.current_snapshot()] if table.current_snapshot() else [])
        )
        from iceberg_geo_poc_spark.table.fileio import io_for

        _fio = io_for(table.location)
        rows = []
        for s in snaps:
            for rel in s.manifest_list():
                p = os.path.join(table.location, rel)
                rows.append(
                    (rel, _fio.size(p) if _fio.exists(p) else None,
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
        from iceberg_geo_poc_spark.table.fileio import io_for

        _fio = io_for(table.location)
        mdir = os.path.join(table.location, "metadata")
        rows = []
        for fname in sorted(_fio.listdir(mdir)):
            if fname.endswith(".metadata.json"):
                p = os.path.join(mdir, fname)
                rows.append(
                    (fname, _fio.mtime_ms(p) or 0, _fio.size(p))
                )
        return spark.createDataFrame(
            rows, "file STRING, modified_at_ms LONG, length LONG"
        )
    if name == "statistics":
        # reference exposes registered StatisticsFile entries on metadata
        # (TableMetadata.statisticsFiles); one row per (file, column blob)
        rows = []
        for sf in table.meta.statistics_files:
            for blob in sf.get("blob-metadata", []):
                rows.append(
                    (
                        sf["snapshot-id"],
                        sf["statistics-path"],
                        sf["file-size-in-bytes"],
                        blob.get("type"),
                        ",".join(blob.get("columns", [])),
                        int(blob.get("properties", {}).get("ndv", -1)),
                    )
                )
        return spark.createDataFrame(
            rows,
            "snapshot_id LONG, path STRING, file_size_in_bytes LONG, "
            "blob_type STRING, columns STRING, ndv LONG",
        )
    if name == "partition_stats":
        from iceberg_geo_poc_spark.table.statistics import read_partition_stats

        return read_partition_stats(table)
    raise ValueError(f"unknown metadata table {name!r}; one of {METADATA_TABLES}")
