"""Python DataSource: managed tables as a REAL Structured Streaming
source (and a batch source), registered as format "iceberg_geo_poc".

This is the engine's analogue of the reference's DSv2 integration
(spark/.../source/SparkMicroBatchStream.java:68-117 — offsets are
snapshot positions, admission via max files per batch;
HavasuIcebergSource.java:29-34 — the named format).  PySpark 4's
DataSource API runs the *planning* callbacks on the driver and
``read(partition)`` on executors, exactly the split the reference has
between MicroBatchStream (driver) and PartitionReader (executor):

- offsets are JSON dicts ``{"snapshot_id": ...}`` checkpointed by the
  streaming engine — restarts resume exactly-once from the checkpoint,
- ``partitions(start, end)`` = files appended along the snapshot
  ancestry between the two offsets (one InputPartition per data file),
- ``read`` yields Arrow record batches straight from the parquet file
  (no Python row loop).

Usage::

    spark.dataSource.register(TableDataSource)
    (spark.readStream.format("iceberg_geo_poc")
        .option("location", table.location).load()
        .writeStream...)

The streaming source consumes APPENDS (like the reference's stream,
which errors on overwrites unless configured to skip); the batch path
serves delete-free snapshots and refuses merge-on-read state (use the
engine scan API for that).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "iceberg_geo_poc"


class _FilePartition(InputPartition):
    def __init__(self, path: str, cols: list[tuple[str, str]]):
        self.path = path
        self.cols = cols  # (physical name in file, logical output name)


def _read_meta(location: str) -> dict:
    """Load table metadata as plain JSON (driver-side, no SparkSession —
    the DataSource API pickles this class, so it must not hold one)."""
    mdir = os.path.join(location, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        version = int(f.read().strip())
    # the hint may lag a just-committed version; roll forward
    while os.path.exists(os.path.join(mdir, f"v{version + 1}.metadata.json")):
        version += 1
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as f:
        return json.load(f)


def _ancestry(meta: dict, to_id: int) -> list[int]:
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    chain = []
    cur = to_id
    while cur is not None:
        chain.append(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    return list(reversed(chain))


def _manifest_data_files(location: str, meta: dict, snapshot_id: int) -> list[str]:
    import pyarrow.parquet as pq

    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    path = os.path.join(location, by_id[snapshot_id]["manifest"])
    t = pq.read_table(path, columns=["content", "file_path"])
    return [
        p
        for c, p in zip(t.column("content").to_pylist(), t.column("file_path").to_pylist())
        if c == "data"
    ]


def _column_pairs(meta: dict) -> list[tuple[str, str]]:
    """(physical, logical) name pairs in schema order."""
    renames = meta.get("renames", {})
    out = []
    for f in meta["schema-ddl"].split(","):
        name = f.strip().split()[0]
        out.append((name, renames.get(name, name)))
    return out


def _conform(table, cols: list[tuple[str, str]]):
    """Project a pyarrow table to the declared schema (order + logical
    names).  Files written before an add-column carry fewer columns —
    those must go through the engine scan API instead."""
    missing = [p for p, _ in cols if p not in table.column_names]
    if missing:
        raise ValueError(
            f"data file lacks columns {missing}; read this table through "
            f"Table.scan (schema-evolution aware) instead of the DataSource"
        )
    out = table.select([p for p, _ in cols])
    out = out.rename_columns([lg for _, lg in cols])
    # Spark writes INT96 timestamps that pyarrow surfaces as ns; Spark's
    # Arrow ingestion only accepts us — normalize
    import pyarrow as pa

    fields, changed = [], False
    for f in out.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            fields.append(pa.field(f.name, pa.timestamp("us", f.type.tz)))
            changed = True
        else:
            fields.append(f)
    if changed:
        out = out.cast(pa.schema(fields))
    return out


class _StreamReader(DataSourceStreamReader):
    def __init__(self, location: str, skip_non_append: bool = False):
        self.location = location
        self.skip_non_append = skip_non_append

    def initialOffset(self) -> dict:
        return {"snapshot_id": None}

    def latestOffset(self) -> dict:
        meta = _read_meta(self.location)
        return {"snapshot_id": meta.get("current-snapshot-id")}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        end_id = end.get("snapshot_id")
        if end_id is None:
            return []
        meta = _read_meta(self.location)
        pairs = _column_pairs(meta)
        chain = _ancestry(meta, end_id)
        start_id = start.get("snapshot_id")
        if start_id is not None:
            chain = chain[chain.index(start_id) + 1:]
            base = set(_manifest_data_files(self.location, meta, start_id))
        else:
            base = set()
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        files: list[str] = []
        for sid in chain:
            cur = set(_manifest_data_files(self.location, meta, sid))
            op = by_id[sid].get("operation", "append")
            if op != "append":
                # Overwrite/compaction/MoR snapshots re-list rewritten files
                # as "new" and may carry delete files this reader cannot
                # apply — streaming them would duplicate or resurrect rows.
                # The reference SparkMicroBatchStream throws here unless
                # skip-overwrite/skip-delete is configured; mirror that.
                if self.skip_non_append:
                    base = cur
                    continue
                raise ValueError(
                    f"streaming read hit a non-append snapshot {sid} "
                    f"(operation={op!r}); set option "
                    f"skip-non-append-snapshots=true to skip it"
                )
            files.extend(sorted(cur - base))
            base = cur
        return [_FilePartition(p, pairs) for p in files if os.path.exists(p)]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        yield from _conform(pq.read_table(partition.path), partition.cols).to_batches()

    def commit(self, end: dict) -> None:
        pass


class _BatchReader(DataSourceReader):
    def __init__(self, location: str):
        self.location = location

    def partitions(self) -> Sequence[InputPartition]:
        meta = _read_meta(self.location)
        cur = meta.get("current-snapshot-id")
        if cur is None:
            return []
        import pyarrow.parquet as pq

        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        mpath = os.path.join(self.location, by_id[cur]["manifest"])
        t = pq.read_table(mpath, columns=["content", "file_path"])
        contents = t.column("content").to_pylist()
        if any(c in ("posdel", "eqdel") for c in contents):
            raise ValueError(
                "batch DataSource read of a table with merge-on-read deletes: "
                "use the engine scan API (Table.scan) which applies them"
            )
        pairs = _column_pairs(meta)
        return [
            _FilePartition(p, pairs)
            for c, p in zip(contents, t.column("file_path").to_pylist())
            if c == "data" and os.path.exists(p)
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        yield from _conform(pq.read_table(partition.path), partition.cols).to_batches()


class TableDataSource(DataSource):
    """format("iceberg_geo_poc").option("location", <table dir>)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        meta = _read_meta(self.options["location"])
        renames = meta.get("renames", {})
        parts = []
        for f in meta["schema-ddl"].split(","):
            toks = f.strip().split(None, 1)
            parts.append(f"{renames.get(toks[0], toks[0])} {toks[1]}")
        return ", ".join(parts)

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options["location"])

    def streamReader(self, schema) -> DataSourceStreamReader:
        skip = str(
            self.options.get("skip-non-append-snapshots", "false")
        ).lower() == "true"
        return _StreamReader(self.options["location"], skip_non_append=skip)
