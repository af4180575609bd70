"""Hive-metastore catalog — lock/heartbeat commit protocol.

Python analogue of the reference's ``hive-metastore`` module
(``HiveCatalog.java``, ``HiveTableOperations.java:170-260``,
``MetastoreLock.java``): the metastore holds one table entry per
Iceberg table whose ``metadata_location`` PARAMETER is the pointer of
record; a commit

1. writes the new metadata document,
2. takes the metastore's EXCLUSIVE table lock (``lock`` may answer
   WAITING — the committer polls ``check_lock`` until ACQUIRED, and
   HEARTBEATS while holding it; a lock whose heartbeats stop is evicted
   after the transaction timeout so a crashed committer cannot wedge
   the table),
3. re-reads the entry under the lock and verifies the base
   ``metadata_location`` still matches (the CommitFailedException CAS),
4. ``alter_table`` sets ``metadata_location`` / ``previous_metadata_location``,
5. unlocks in a finally.

The environment has no Hive metastore service, so
``HiveMetastoreService`` implements the semantics in-process (the same
posture as the REST catalog's ``CatalogService`` and the Nessie
stand-in): FIFO lock queues per table with heartbeat-expiry takeover,
databases, table entries with parameter maps, atomic-under-lock
``alter_table``.  The client-side protocol — poll-until-acquired,
heartbeat-before-persist (``lock.ensureActive``), base-location check,
finally-unlock — is the reference's, which is the part that matters:
it is exactly what a real HMS deployment exercises.

Scale: the metastore sees one lock cycle + one parameter CAS per
commit, never data volume; lock queues are per-table so hot tables
serialize their own committers without blocking others (the
reference's known HMS throughput property).
"""

from __future__ import annotations

import os
import shutil
import threading
import time
import uuid

from pyspark.sql import SparkSession

from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.catalog import Catalog
from iceberg_geo_poc_spark.table.jdbc_catalog import _V_RE, _split_metadata_path
from iceberg_geo_poc_spark.table.table import Table

METADATA_LOCATION_PROP = "metadata_location"
PREVIOUS_METADATA_LOCATION_PROP = "previous_metadata_location"


class LockException(Exception):
    """Lock lost / heartbeat failed (reference LockException)."""


class HiveMetastoreService:
    """In-process HMS semantics: databases, table entries, EXCLUSIVE
    per-table lock queues with heartbeat expiry."""

    def __init__(self, txn_timeout_sec: float = 20.0) -> None:
        self._lock = threading.RLock()
        self.txn_timeout = txn_timeout_sec
        self._dbs: dict[str, dict] = {}
        self._tables: dict[tuple[str, str], dict] = {}
        # (db, tbl) -> ordered [lock_id, ...]; lock_id -> last heartbeat
        self._queues: dict[tuple[str, str], list[int]] = {}
        self._beats: dict[int, float] = {}
        self._owners: dict[int, tuple[str, str]] = {}
        self._next_id = 1

    # -- databases -----------------------------------------------------------

    def create_database(self, name: str, properties: dict | None = None) -> None:
        with self._lock:
            if name in self._dbs:
                raise ValueError(f"database {name!r} already exists")
            self._dbs[name] = dict(properties or {})

    def get_database(self, name: str) -> dict:
        with self._lock:
            if name not in self._dbs:
                raise KeyError(f"database {name!r} not found")
            return dict(self._dbs[name])

    def list_databases(self) -> list[str]:
        with self._lock:
            return sorted(self._dbs)

    def drop_database(self, name: str) -> None:
        with self._lock:
            if name not in self._dbs:
                raise KeyError(f"database {name!r} not found")
            if any(db == name for db, _ in self._tables):
                raise ValueError(f"database {name!r} is not empty")
            del self._dbs[name]

    # -- table entries --------------------------------------------------------

    def create_table_entry(
        self, db: str, tbl: str, location: str, parameters: dict | None = None
    ) -> None:
        with self._lock:
            if db not in self._dbs:
                raise KeyError(f"database {db!r} not found")
            if (db, tbl) in self._tables:
                raise ValueError(f"table {db}.{tbl} already exists")
            self._tables[(db, tbl)] = {
                "location": location,
                "parameters": dict(parameters or {}),
            }

    def get_table(self, db: str, tbl: str) -> dict | None:
        with self._lock:
            t = self._tables.get((db, tbl))
            return None if t is None else {
                "location": t["location"],
                "parameters": dict(t["parameters"]),
            }

    def alter_table(self, db: str, tbl: str, parameters: dict) -> None:
        with self._lock:
            t = self._tables.get((db, tbl))
            if t is None:
                raise KeyError(f"table {db}.{tbl} not found")
            t["parameters"] = dict(parameters)

    def rename_table(self, db: str, tbl: str, new_db: str, new_tbl: str) -> None:
        with self._lock:
            if new_db not in self._dbs:
                raise KeyError(f"database {new_db!r} not found")
            if (new_db, new_tbl) in self._tables:
                raise ValueError(f"table {new_db}.{new_tbl} already exists")
            t = self._tables.pop((db, tbl), None)
            if t is None:
                raise KeyError(f"table {db}.{tbl} not found")
            self._tables[(new_db, new_tbl)] = t

    def drop_table_entry(self, db: str, tbl: str) -> None:
        with self._lock:
            if self._tables.pop((db, tbl), None) is None:
                raise KeyError(f"table {db}.{tbl} not found")

    def list_tables(self, db: str) -> list[str]:
        with self._lock:
            return sorted(t for d, t in self._tables if d == db)

    # -- locks (reference MetastoreLock / HMS LockState machine) --------------

    def _evict_expired(self, key: tuple[str, str]) -> None:
        # under self._lock
        now = time.monotonic()
        q = self._queues.get(key, [])
        live = []
        for lid in q:
            if now - self._beats.get(lid, 0.0) > self.txn_timeout:
                self._beats.pop(lid, None)
                self._owners.pop(lid, None)
            else:
                live.append(lid)
        self._queues[key] = live

    def lock(self, db: str, tbl: str) -> tuple[int, str]:
        """EXCLUSIVE table lock request -> (lock_id, 'ACQUIRED'|'WAITING')."""
        with self._lock:
            key = (db, tbl)
            self._evict_expired(key)
            lid = self._next_id
            self._next_id += 1
            self._queues.setdefault(key, []).append(lid)
            self._beats[lid] = time.monotonic()
            self._owners[lid] = key
            state = "ACQUIRED" if self._queues[key][0] == lid else "WAITING"
            return lid, state

    def check_lock(self, lock_id: int) -> str:
        with self._lock:
            key = self._owners.get(lock_id)
            if key is None:
                raise LockException(f"lock {lock_id} not found (expired?)")
            self._evict_expired(key)
            if self._owners.get(lock_id) is None:
                raise LockException(f"lock {lock_id} expired")
            return (
                "ACQUIRED" if self._queues[key][0] == lock_id else "WAITING"
            )

    def heartbeat(self, lock_id: int) -> None:
        with self._lock:
            if lock_id not in self._beats:
                raise LockException(
                    f"lock {lock_id} not found (evicted after missed "
                    f"heartbeats — another committer may hold the table)"
                )
            self._beats[lock_id] = time.monotonic()

    def unlock(self, lock_id: int) -> None:
        with self._lock:
            key = self._owners.pop(lock_id, None)
            self._beats.pop(lock_id, None)
            if key is not None and lock_id in self._queues.get(key, []):
                self._queues[key].remove(lock_id)


class HiveCommitBackend(MD.CommitBackend):
    """CommitBackend arbitrating through the HMS ``metadata_location``
    parameter under the metastore's exclusive table lock (reference
    HiveTableOperations.doCommit).  Readers resolve versions from the
    parameter; a crashed writer's orphan document is invisible."""

    def __init__(self, service: HiveMetastoreService, warehouse: str):
        self.service = service
        self.warehouse = warehouse.rstrip("/")
        # lock acquisition posture (reference MetastoreLock defaults,
        # scaled down for in-process use)
        self.acquire_timeout = 30.0
        self.poll_interval = 0.005

    def _ident_of(self, location: str) -> tuple[str, str]:
        rel = location[len(self.warehouse):].strip("/")
        parts = [p for p in rel.split("/") if p]
        if len(parts) == 1:
            parts = ["default"] + parts
        return parts[0], ".".join(parts[1:])

    def _entry_for_location(self, location: str) -> tuple[tuple[str, str] | None, dict | None]:
        db, tbl = self._ident_of(location)
        t = self.service.get_table(db, tbl)
        if t is not None and t["location"] == location:
            return (db, tbl), t
        # renamed tables keep their location: bounded reverse scan
        with self.service._lock:
            for (d, n), entry in self.service._tables.items():
                if entry["location"] == location:
                    return (d, n), {
                        "location": entry["location"],
                        "parameters": dict(entry["parameters"]),
                    }
        return None, None

    def _pointer(self, location: str) -> str | None:
        _, t = self._entry_for_location(location)
        if t is None:
            return None
        return t["parameters"].get(METADATA_LOCATION_PROP)

    @staticmethod
    def _version_of(ptr: str | None) -> int | None:
        if ptr is None:
            return None
        m = _V_RE.match(os.path.basename(ptr))
        return int(m.group(1)) if m else None

    def _acquire(self, db: str, tbl: str) -> int:
        """Poll lock -> check_lock until ACQUIRED (reference
        MetastoreLock.acquireLock WAITING loop)."""
        lid, state = self.service.lock(db, tbl)
        deadline = time.monotonic() + self.acquire_timeout
        while state == "WAITING":
            if time.monotonic() > deadline:
                self.service.unlock(lid)
                raise LockException(
                    f"timed out acquiring metastore lock on {db}.{tbl}"
                )
            time.sleep(self.poll_interval)
            self.service.heartbeat(lid)
            state = self.service.check_lock(lid)
        return lid

    # -- CommitBackend surface ----------------------------------------------

    def read(self, path: str) -> bytes:
        split = _split_metadata_path(path)
        if split is not None:
            location, leaf = split
            if leaf == "version-hint.text":
                v = self._version_of(self._pointer(location))
                if v is None:
                    raise FileNotFoundError(path)
                return str(v).encode()
            vm = _V_RE.match(leaf)
            if vm:
                v = self._version_of(self._pointer(location))
                if v is None or int(vm.group(1)) > v:
                    raise FileNotFoundError(path)
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        split = _split_metadata_path(path)
        if split is not None:
            location, leaf = split
            if leaf == "version-hint.text":
                return self._pointer(location) is not None
            vm = _V_RE.match(leaf)
            if vm:
                v = self._version_of(self._pointer(location))
                return (
                    v is not None
                    and int(vm.group(1)) <= v
                    and os.path.exists(path)
                )
        return os.path.exists(path)

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        split = _split_metadata_path(path)
        vm = _V_RE.match(split[1]) if split else None
        if vm is None:
            return MD.PosixLinkBackend().put_if_absent(path, payload)
        location, n = split[0], int(vm.group(1))
        ident, entry = self._entry_for_location(location)
        if ident is None:
            raise FileNotFoundError(
                f"no metastore entry for location {location!r}; create "
                f"tables through HiveCatalog.create_table"
            )
        db, tbl = ident
        lid = self._acquire(db, tbl)
        try:
            # re-read UNDER the lock; base-location CAS (reference
            # HiveTableOperations: baseMetadataLocation equality check)
            entry = self.service.get_table(db, tbl)
            ptr = entry["parameters"].get(METADATA_LOCATION_PROP)
            cur_v = self._version_of(ptr)
            expect = -1 if cur_v is None else cur_v
            if n != expect + 1:
                return False  # concurrent commit moved the pointer
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)  # under the table lock: no clobber
            # lock.ensureActive() before persisting (reference): a lock
            # that expired mid-commit must NOT alter the entry — another
            # committer may already hold the table
            self.service.heartbeat(lid)
            params = dict(entry["parameters"])
            params[PREVIOUS_METADATA_LOCATION_PROP] = ptr or ""
            params[METADATA_LOCATION_PROP] = path
            self.service.alter_table(db, tbl, params)
            return True
        except LockException:
            return False  # lost the lock mid-commit: treat as lost race
        finally:
            try:
                self.service.unlock(lid)
            except LockException:
                pass

    def put(self, path: str, payload: bytes) -> None:
        split = _split_metadata_path(path)
        if split is not None and split[1] == "version-hint.text":
            return  # the HMS parameter IS the hint
        MD.PosixLinkBackend().put(path, payload)

    def delete(self, path: str) -> None:
        MD.PosixLinkBackend().delete(path)


class HiveCatalog(Catalog):
    """Catalog over the in-process metastore (reference HiveCatalog):
    databases as namespaces, table entries with the metadata_location
    parameter, rename keeps the location, and the full base Catalog
    surface (DDL, procedures, SQL dispatcher) rides on top."""

    def __init__(
        self,
        warehouse: str,
        spark: SparkSession,
        service: HiveMetastoreService | None = None,
    ):
        super().__init__(warehouse, spark)
        self.service = service or HiveMetastoreService()
        self.backend = HiveCommitBackend(self.service, warehouse)
        MD.register_commit_backend(warehouse.rstrip("/") + "/", self.backend)
        if "default" not in self.service.list_databases():
            self.service.create_database("default")

    @staticmethod
    def _ident(name: str) -> tuple[str, str]:
        if "." in name:
            db, tbl = name.split(".", 1)
            return db, tbl
        return "default", name

    def _table_location(self, name: str) -> str:
        db, tbl = self._ident(name)
        return os.path.join(self.warehouse, db, tbl)

    # -- namespaces = databases ----------------------------------------------

    def create_namespace(
        self,
        namespace: str,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> None:
        try:
            self.service.create_database(namespace, properties)
        except ValueError:
            if not if_not_exists:
                raise

    def list_namespaces(self) -> list[str]:
        return self.service.list_databases()

    def namespace_properties(self, namespace: str) -> dict[str, str]:
        return self.service.get_database(namespace)

    def drop_namespace(self, namespace: str) -> None:
        self.service.drop_database(namespace)

    # -- table registry --------------------------------------------------------

    def create_table(self, name: str, schema_ddl: str, **kwargs) -> Table:
        db, tbl = self._ident(name)
        location = self._table_location(name)
        # entry first with a NULL pointer: the v0 commit CAS-fills it
        # under the table lock (reference: newTable + AlreadyExists when
        # the location parameter is already set)
        self.service.create_table_entry(db, tbl, location)
        try:
            return super().create_table(name, schema_ddl, **kwargs)
        except BaseException:
            self.service.drop_table_entry(db, tbl)
            raise

    def load_table(self, name: str) -> Table:
        db, tbl = self._ident(name)
        t = self.service.get_table(db, tbl)
        if (
            t is None
            or not t["parameters"].get(METADATA_LOCATION_PROP)
            or t["parameters"].get("table_type") == "VIRTUAL_VIEW"
        ):
            raise FileNotFoundError(f"table {name} not found in metastore")
        location = _split_metadata_path(
            t["parameters"][METADATA_LOCATION_PROP]
        )[0]
        return Table(MD.read_metadata(location), self.spark)

    table = load_table

    def table_exists(self, name: str) -> bool:
        db, tbl = self._ident(name)
        t = self.service.get_table(db, tbl)
        return (
            t is not None
            and bool(t["parameters"].get(METADATA_LOCATION_PROP))
            and t["parameters"].get("table_type") != "VIRTUAL_VIEW"
        )

    def list_tables(self, namespace: str = "default") -> list[str]:
        out = []
        for n in self.service.list_tables(namespace):
            t = self.service.get_table(namespace, n)
            if t["parameters"].get("table_type") != "VIRTUAL_VIEW":
                out.append(n)
        return out

    def rename_table(self, old: str, new: str) -> None:
        odb, otbl = self._ident(old)
        ndb, ntbl = self._ident(new)
        self.service.rename_table(odb, otbl, ndb, ntbl)

    def drop_table(self, name: str, purge: bool = False) -> None:
        db, tbl = self._ident(name)
        t = self.service.get_table(db, tbl)
        if t is None:
            raise FileNotFoundError(f"table {name} not found in metastore")
        self.service.drop_table_entry(db, tbl)
        if purge:
            shutil.rmtree(t["location"], ignore_errors=True)
        else:
            # deviation (documented, same as JDBC): clear metadata so
            # the name-derived location is reusable
            shutil.rmtree(
                os.path.join(t["location"], "metadata"), ignore_errors=True
            )

    # HiveCatalog.registerTable: adopt an existing metadata document
    def register_table(self, name: str, metadata_location: str) -> Table:
        import json as _json

        db, tbl = self._ident(name)
        doc = _json.loads(open(metadata_location, "rb").read())
        self.service.create_table_entry(
            db, tbl, doc["location"],
            parameters={METADATA_LOCATION_PROP: metadata_location},
        )
        return self.load_table(name)

    def snapshot_table(self, source: str, dest: str) -> Table:
        """Zero-copy clone under the HMS-pointer protocol (same shape
        as the JDBC/Nessie overrides: the entry must exist, pointing at
        the copied current version, BEFORE the location-rewriting
        commit runs)."""
        sdb, stbl = self._ident(source)
        src = self.service.get_table(sdb, stbl)
        if src is None or not src["parameters"].get(METADATA_LOCATION_PROP):
            raise FileNotFoundError(f"table {source} not found in metastore")
        src_loc = src["location"]
        dest_loc = self._table_location(dest)
        ddb, dtbl = self._ident(dest)
        os.makedirs(dest_loc)
        shutil.copytree(
            MD.metadata_dir(src_loc), MD.metadata_dir(dest_loc),
            dirs_exist_ok=True,
        )
        ptr = os.path.join(
            MD.metadata_dir(dest_loc),
            os.path.basename(src["parameters"][METADATA_LOCATION_PROP]),
        )
        self.service.create_table_entry(
            ddb, dtbl, dest_loc, parameters={METADATA_LOCATION_PROP: ptr}
        )
        meta = MD.read_metadata(dest_loc)
        meta.location = dest_loc
        meta.properties = dict(
            meta.properties,
            **{"snapshot-source": source, "gc.enabled": "false"},
        )
        MD.write_new_metadata(meta, meta.version)
        return self.load_table(dest)

    # -- views (reference HiveViewOperations: a VIRTUAL_VIEW metastore
    # entry whose metadata_location parameter points at the view's
    # version document; commits use the same lock protocol) ---------------

    def _view_entry(self, name: str) -> dict | None:
        db, v = self._ident(name)
        t = self.service.get_table(db, v)
        if t is None or t["parameters"].get("table_type") != "VIRTUAL_VIEW":
            return None
        return t

    def _view_doc(self, name: str) -> dict:
        import json as _json

        t = self._view_entry(name)
        if t is None:
            raise KeyError(f"view {name} not found")
        with open(t["parameters"][METADATA_LOCATION_PROP]) as f:
            return _json.load(f)

    def create_view(self, name: str, sql_text: str, replace: bool = False) -> None:
        import json as _json

        db, vname = self._ident(name)
        entry = self._view_entry(name)
        if entry is not None and not replace:
            raise ValueError(f"view {name} already exists")
        versions: list[dict] = []
        if entry is not None:
            with open(entry["parameters"][METADATA_LOCATION_PROP]) as f:
                versions = _json.load(f)["versions"]
        versions = versions + [{"sql": sql_text, "at": MD.now_ms()}]
        doc_dir = os.path.join(self.warehouse, "_views", db, vname)
        os.makedirs(doc_dir, exist_ok=True)
        path = os.path.join(
            doc_dir, f"v{len(versions)}-{uuid.uuid4().hex[:8]}.metadata.json"
        )
        with open(path, "w") as f:
            _json.dump({"name": name, "versions": versions}, f, indent=1)
        # commit under the SAME exclusive lock protocol table commits
        # use; re-check the base pointer under the lock (replace race:
        # exactly one winner, the loser's document is an orphan)
        lid = self.backend._acquire(db, vname)
        try:
            cur = self._view_entry(name)
            cur_ptr = (
                cur["parameters"][METADATA_LOCATION_PROP] if cur else None
            )
            base_ptr = (
                entry["parameters"][METADATA_LOCATION_PROP] if entry else None
            )
            if cur_ptr != base_ptr:
                raise MD.CommitConflict(
                    f"concurrent view commit won for {name!r}"
                )
            self.service.heartbeat(lid)
            if cur is None:
                self.service.create_table_entry(
                    db, vname, doc_dir,
                    parameters={
                        "table_type": "VIRTUAL_VIEW",
                        METADATA_LOCATION_PROP: path,
                    },
                )
            else:
                self.service.alter_table(
                    db, vname,
                    {
                        "table_type": "VIRTUAL_VIEW",
                        PREVIOUS_METADATA_LOCATION_PROP: cur_ptr or "",
                        METADATA_LOCATION_PROP: path,
                    },
                )
        finally:
            try:
                self.service.unlock(lid)
            except LockException:
                pass

    def list_views(self) -> list[str]:
        out = []
        with self.service._lock:
            items = list(self.service._tables.items())
        for (db, n), entry in items:
            if entry["parameters"].get("table_type") == "VIRTUAL_VIEW":
                out.append(n if db == "default" else f"{db}.{n}")
        return sorted(out)

    def view_sql(self, name: str, version: int | None = None) -> str:
        vs = self._view_doc(name)["versions"]
        return vs[-1 if version is None else version]["sql"]

    def view_versions(self, name: str) -> list[dict]:
        return list(self._view_doc(name)["versions"])

    def load_view(self, name: str, version: int | None = None):
        sql_text = self.view_sql(name, version)
        db, _ = self._ident(name)
        for tname in self.list_tables(db):
            self.load_table(f"{db}.{tname}").to_df().createOrReplaceTempView(
                tname
            )
        return self.spark.sql(sql_text)

    def drop_view(self, name: str) -> None:
        db, vname = self._ident(name)
        if self._view_entry(name) is None:
            raise KeyError(f"view {name} not found")
        self.service.drop_table_entry(db, vname)
        shutil.rmtree(
            os.path.join(self.warehouse, "_views", db, vname),
            ignore_errors=True,
        )
