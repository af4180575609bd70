"""Table metadata: versioned JSON log + snapshot lineage + refs.

Python analogue of reference core/src/main/java/org/apache/iceberg/
TableMetadata.java and the commit machinery of SnapshotProducer.java:369-409:
each commit writes ``v{N}.metadata.json`` with an exclusive-create
(put-if-absent) and then advances ``version-hint.text``; a concurrent
commit loses the create race and retries against the new base —
optimistic concurrency without any lock service.  On an object store
the exclusive create maps to a conditional PUT (If-None-Match).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence_number: int
    timestamp_ms: int
    operation: str  # append | overwrite | delete | replace
    manifest: str  # manifest parquet path relative to table root
    summary: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "snapshot-id": self.snapshot_id,
            "parent-snapshot-id": self.parent_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "operation": self.operation,
            "manifest": self.manifest,
            "summary": self.summary,
        }

    @staticmethod
    def from_json(o: dict) -> "Snapshot":
        return Snapshot(
            o["snapshot-id"],
            o.get("parent-snapshot-id"),
            o["sequence-number"],
            o["timestamp-ms"],
            o["operation"],
            o["manifest"],
            o.get("summary", {}),
        )


@dataclass
class GeoField:
    """Geometry column declaration: encoding + physical Spark type."""

    column: str
    encoding: str  # ewkb | wkb | wkt | geojson

    def to_json(self) -> dict:
        return {"column": self.column, "encoding": self.encoding}


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    schema_ddl: str  # Spark DDL string ("id BIGINT, geom BINARY, ...")
    partition_spec: list[dict]  # PartitionField json
    geo_fields: dict[str, str]  # column -> encoding
    properties: dict[str, str]
    current_snapshot_id: int | None
    snapshots: list[Snapshot]
    last_sequence_number: int
    refs: dict[str, dict] = field(default_factory=dict)  # branches/tags
    version: int = 0
    schema_log: list[dict] = field(default_factory=list)
    # physical column name (as written in data files) -> current logical
    # name; the Python analogue of Iceberg's rename-by-field-id (schema
    # evolution never rewrites data files, Schema.java:51)
    renames: dict[str, str] = field(default_factory=dict)

    # ---- serialization -------------------------------------------------
    def to_json(self) -> dict:
        return {
            "format-version": 1,
            "table-uuid": self.table_uuid,
            "location": self.location,
            "schema-ddl": self.schema_ddl,
            "partition-spec": self.partition_spec,
            "geo-fields": self.geo_fields,
            "properties": self.properties,
            "current-snapshot-id": self.current_snapshot_id,
            "snapshots": [s.to_json() for s in self.snapshots],
            "last-sequence-number": self.last_sequence_number,
            "refs": self.refs,
            "schema-log": self.schema_log,
            "renames": self.renames,
        }

    @staticmethod
    def from_json(o: dict, version: int) -> "TableMetadata":
        return TableMetadata(
            table_uuid=o["table-uuid"],
            location=o["location"],
            schema_ddl=o["schema-ddl"],
            partition_spec=o["partition-spec"],
            geo_fields=o.get("geo-fields", {}),
            properties=o.get("properties", {}),
            current_snapshot_id=o.get("current-snapshot-id"),
            snapshots=[Snapshot.from_json(s) for s in o.get("snapshots", [])],
            last_sequence_number=o.get("last-sequence-number", 0),
            refs=o.get("refs", {}),
            version=version,
            schema_log=o.get("schema-log", []),
            renames=o.get("renames", {}),
        )

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found")

    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot:
        """Latest ancestor snapshot at or before the timestamp."""
        eligible = [s for s in self.snapshots if s.timestamp_ms <= timestamp_ms]
        if not eligible:
            raise KeyError(f"no snapshot at or before {timestamp_ms}")
        return max(eligible, key=lambda s: s.timestamp_ms)


# -- metadata IO with optimistic commit ------------------------------------

def metadata_dir(location: str) -> str:
    return os.path.join(location, "metadata")


def _metadata_path(location: str, version: int) -> str:
    return os.path.join(metadata_dir(location), f"v{version}.metadata.json")


def _hint_path(location: str) -> str:
    return os.path.join(metadata_dir(location), "version-hint.text")


def read_metadata(location: str) -> TableMetadata:
    hint = _hint_path(location)
    with open(hint) as f:
        version = int(f.read().strip())
    # the hint may lag a just-committed version; roll forward
    while os.path.exists(_metadata_path(location, version + 1)):
        version += 1
    with open(_metadata_path(location, version)) as f:
        return TableMetadata.from_json(json.load(f), version)


def write_new_metadata(meta: TableMetadata, base_version: int) -> int:
    """Put-if-absent commit of v{base+1}; raises CommitConflict if lost.

    Cross-PROCESS safe, not just cross-thread: the full document is
    written and fsynced to a private temp file first, then hard-linked to
    the final name.  ``os.link`` fails atomically when the target exists
    (the filesystem analogue of a conditional PUT / If-None-Match), and a
    reader can never observe a torn ``v{N}.metadata.json`` — the name
    only ever appears with complete contents.  A writer crashing mid-
    commit leaves only a ``.tmp`` that no reader or committer considers.
    (Reference parity: SnapshotProducer.java:369-409 retry loop over the
    catalog's atomic swap.)
    """
    version = base_version + 1
    path = _metadata_path(meta.location, version)
    os.makedirs(metadata_dir(meta.location), exist_ok=True)
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(meta.to_json(), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        raise CommitConflict(
            f"metadata version {version} already committed by a concurrent writer"
        ) from e
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
    hint_tmp = f"{_hint_path(meta.location)}.{uuid.uuid4().hex[:8]}.tmp"
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, _hint_path(meta.location))
    meta.version = version
    return version


class CommitConflict(Exception):
    pass


def new_snapshot_id() -> int:
    return uuid.uuid4().int & ((1 << 62) - 1)


def now_ms() -> int:
    return int(time.time() * 1000)
