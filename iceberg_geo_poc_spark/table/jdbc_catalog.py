"""JDBC-backed catalog over a SQL database — the reference's JdbcCatalog.

Python analogue of ``jdbc/JdbcCatalog.java`` + ``JdbcUtil.java`` +
``JdbcTableOperations.java``, using the stdlib ``sqlite3`` as the DB-API
engine (the reference takes any JDBC driver; sqlite is the dependency-
free stand-in with real cross-process file locking).  Layout mirrors
JdbcUtil's V1 schema:

- ``iceberg_tables(catalog_name, table_namespace, table_name,
  metadata_location, previous_metadata_location, iceberg_type)`` — one
  row per table, the ``metadata_location`` pointer is the SOURCE OF
  TRUTH for the table's current metadata document;
- ``iceberg_namespace_properties(catalog_name, namespace,
  property_key, property_value)`` — namespace registry (the reference's
  namespace-exists marker property included).

Commit protocol (JdbcTableOperations.doCommit): a commit writes the new
metadata document, then executes the atomic compare-and-swap

    UPDATE iceberg_tables SET metadata_location = :new,
           previous_metadata_location = :old
    WHERE catalog_name = :c AND table_namespace = :ns
      AND table_name = :t AND metadata_location = :old

— 0 rows updated means a concurrent committer moved the pointer first
(CommitFailedException in the reference; ``CommitConflict`` here), and
the engine's standard retry loop (``Table._commit``) re-reads and
re-applies.  The whole sequence runs inside one ``BEGIN IMMEDIATE``
sqlite transaction, which serializes writers across PROCESSES via the
database file lock — the document write happens under that lock so a
losing writer can never clobber the winner's document.

Integration: ``JdbcCommitBackend`` implements the engine's
``CommitBackend`` seam (exactly how the REST catalog plugs in,
``rest_catalog.ServiceCommitBackend``), so every ``Table`` commit,
refresh, and time-travel read arbitrates through the database row with
zero changes to the table machinery.  Readers resolve the version hint
from the pointer (never from the filesystem), so a crashed writer's
orphan document below a half-finished commit is invisible — the next
committer simply overwrites it under the write lock.

Data files, manifests and the metadata documents themselves stay on the
shared filesystem; the DATABASE holds only pointers — the reference's
split exactly, and the right one at 100 TB (the DB sees one tiny CAS
per commit, never data volume).

Deviation (documented): ``drop_table`` always clears the table's
``metadata/`` directory so the name-derived location is reusable;
``purge=True`` additionally removes data.  The reference leaves files
behind on a plain drop and strands the location.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sqlite3
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.catalog import Catalog
from iceberg_geo_poc_spark.table.table import Table

# the reference's namespace-exists marker (JdbcUtil.NAMESPACE_EXISTS_PROPERTY)
_NS_EXISTS_KEY = "exists"

_V_RE = re.compile(r"^v(\d+)\.metadata\.json$")


def _split_metadata_path(path: str):
    """``<location>/metadata/<leaf>`` -> (location, leaf) or None."""
    head, leaf = os.path.split(path)
    base, meta = os.path.split(head)
    if meta != "metadata":
        return None
    return base, leaf


class JdbcCommitBackend(MD.CommitBackend):
    """CommitBackend arbitrating metadata versions through the
    ``iceberg_tables`` pointer row (CAS UPDATE under BEGIN IMMEDIATE).

    Path routing: ``version-hint.text`` reads resolve the version from
    the DB pointer (writes are no-ops — the row IS the hint);
    ``v{N}.metadata.json`` existence/readability is gated on
    ``N <= pointer version``; every other path (retention floor marker,
    DV sidecars routed through the backend) passes through to the
    filesystem untouched."""

    def __init__(self, db_path: str, catalog_name: str = "default"):
        self.db_path = db_path
        self.catalog_name = catalog_name
        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        with self.db() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS iceberg_tables ("
                " catalog_name TEXT NOT NULL,"
                " table_namespace TEXT NOT NULL,"
                " table_name TEXT NOT NULL,"
                " metadata_location TEXT,"
                " previous_metadata_location TEXT,"
                " iceberg_type TEXT,"
                " location TEXT,"  # engine extension: backend lookup key
                " PRIMARY KEY (catalog_name, table_namespace, table_name))"
            )
            c.execute(
                "CREATE UNIQUE INDEX IF NOT EXISTS iceberg_tables_loc"
                " ON iceberg_tables (catalog_name, location)"
            )
            c.execute(
                "CREATE TABLE IF NOT EXISTS iceberg_namespace_properties ("
                " catalog_name TEXT NOT NULL,"
                " namespace TEXT NOT NULL,"
                " property_key TEXT,"
                " property_value TEXT,"
                " PRIMARY KEY (catalog_name, namespace, property_key))"
            )
            # reference JdbcUtil V1 view schema (JdbcViewOperations): view
            # metadata lives behind a DB pointer row, so a DB-only reader
            # discovers views without touching the filesystem listing
            c.execute(
                "CREATE TABLE IF NOT EXISTS iceberg_views ("
                " catalog_name TEXT NOT NULL,"
                " view_namespace TEXT NOT NULL,"
                " view_name TEXT NOT NULL,"
                " metadata_location TEXT,"
                " previous_metadata_location TEXT,"
                " PRIMARY KEY (catalog_name, view_namespace, view_name))"
            )

    @contextmanager
    def db(self):
        """Short-lived connection per operation (closed on exit; the
        sqlite context manager alone commits but never closes)."""
        c = self._conn()
        try:
            yield c
        finally:
            c.close()

    def _conn(self) -> sqlite3.Connection:
        # one connection per operation: thread-safe by construction, and
        # the 30s busy timeout rides out concurrent committers' write
        # locks (the reference leans on the JDBC pool the same way)
        c = sqlite3.connect(self.db_path, timeout=30.0)
        c.isolation_level = None  # explicit BEGIN/COMMIT
        c.execute("PRAGMA journal_mode=WAL")
        return c

    # -- pointer helpers -----------------------------------------------------

    def _pointer(self, c: sqlite3.Connection, location: str):
        row = c.execute(
            "SELECT metadata_location FROM iceberg_tables"
            " WHERE catalog_name = ? AND location = ?",
            (self.catalog_name, location),
        ).fetchone()
        if row is None:
            return None, False
        return row[0], True

    @staticmethod
    def _version_of(metadata_location: str | None) -> int | None:
        if metadata_location is None:
            return None
        m = _V_RE.match(os.path.basename(metadata_location))
        return int(m.group(1)) if m else None

    # -- CommitBackend surface -------------------------------------------

    def read(self, path: str) -> bytes:
        split = _split_metadata_path(path)
        if split is not None:
            location, leaf = split
            if leaf == "version-hint.text":
                with self.db() as c:
                    ptr, _ = self._pointer(c, location)
                v = self._version_of(ptr)
                if v is None:
                    raise FileNotFoundError(path)
                return str(v).encode()
            vm = _V_RE.match(leaf)
            if vm:
                with self.db() as c:
                    ptr, _ = self._pointer(c, location)
                v = self._version_of(ptr)
                # documents above the pointer are uncommitted (a crashed
                # writer's orphan): invisible to every reader
                if v is None or int(vm.group(1)) > v:
                    raise FileNotFoundError(path)
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        split = _split_metadata_path(path)
        if split is not None:
            location, leaf = split
            if leaf == "version-hint.text":
                with self.db() as c:
                    ptr, _ = self._pointer(c, location)
                return ptr is not None
            vm = _V_RE.match(leaf)
            if vm:
                with self.db() as c:
                    ptr, _ = self._pointer(c, location)
                v = self._version_of(ptr)
                return v is not None and int(vm.group(1)) <= v and os.path.exists(path)
        return os.path.exists(path)

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        split = _split_metadata_path(path)
        vm = _V_RE.match(split[1]) if split else None
        if vm is None:
            # non-versioned artifacts keep plain if-absent semantics
            return MD.PosixLinkBackend().put_if_absent(path, payload)
        location, n = split[0], int(vm.group(1))
        c = self._conn()
        try:
            # BEGIN IMMEDIATE takes the database write lock NOW: the
            # validate -> write-document -> CAS sequence is serialized
            # against every other committer, across processes
            c.execute("BEGIN IMMEDIATE")
            ptr, row_exists = self._pointer(c, location)
            if not row_exists:
                c.execute("ROLLBACK")
                raise FileNotFoundError(
                    f"no iceberg_tables row for location {location!r}; "
                    f"create tables through JdbcCatalog.create_table"
                )
            cur_v = self._version_of(ptr)
            expect = -1 if cur_v is None else cur_v
            if n != expect + 1:
                c.execute("ROLLBACK")
                return False  # lost the race (or replaying an old version)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)  # under the write lock: no clobber race
            if ptr is None:
                got = c.execute(
                    "UPDATE iceberg_tables SET metadata_location = ?,"
                    " previous_metadata_location = NULL"
                    " WHERE catalog_name = ? AND location = ?"
                    " AND metadata_location IS NULL",
                    (path, self.catalog_name, location),
                )
            else:
                # the reference's exact CAS (JdbcTableOperations.doCommit)
                got = c.execute(
                    "UPDATE iceberg_tables SET metadata_location = ?,"
                    " previous_metadata_location = ?"
                    " WHERE catalog_name = ? AND location = ?"
                    " AND metadata_location = ?",
                    (path, ptr, self.catalog_name, location, ptr),
                )
            if got.rowcount != 1:
                c.execute("ROLLBACK")
                return False
            c.execute("COMMIT")
            return True
        finally:
            c.close()

    def put(self, path: str, payload: bytes) -> None:
        split = _split_metadata_path(path)
        if split is not None and split[1] == "version-hint.text":
            return  # the pointer row IS the hint
        MD.PosixLinkBackend().put(path, payload)

    def delete(self, path: str) -> None:
        MD.PosixLinkBackend().delete(path)


class JdbcCatalog(Catalog):
    """Catalog whose table registry and commit arbitration live in a SQL
    database (reference JdbcCatalog).  Inherits the full Catalog surface
    (DDL, procedures, views, branches, SQL dispatcher); adds namespaces,
    rename, and DB-backed listing."""

    def __init__(
        self,
        warehouse: str,
        spark: SparkSession,
        db_path: str | None = None,
        catalog_name: str = "jdbc",
    ):
        super().__init__(warehouse, spark)
        self.catalog_name = catalog_name
        self.backend = JdbcCommitBackend(
            db_path or os.path.join(warehouse, "jdbc_catalog.db"), catalog_name
        )
        MD.register_commit_backend(warehouse.rstrip("/") + "/", self.backend)
        self.create_namespace("default", if_not_exists=True)

    # -- identifier plumbing ---------------------------------------------

    @staticmethod
    def _ident(name: str) -> tuple[str, str]:
        if "." in name:
            ns, tbl = name.rsplit(".", 1)
            return ns, tbl
        return "default", name

    def _table_location(self, name: str) -> str:
        ov = getattr(self, "_loc_override", None)
        if ov and name in ov:
            return ov[name]
        ns, tbl = self._ident(name)
        return os.path.join(self.warehouse, ns, tbl)

    def _fresh_location(self, name: str) -> str:
        """Name-derived location, uniquified when another table already
        holds it — after ``rename_table`` the renamed table KEEPS its
        old location (reference behavior: locations are independent of
        names), so a new table under the vacated name must not share the
        directory (two tables sharing one metadata/ log would corrupt
        each other; code-review r12)."""
        ns, tbl = self._ident(name)
        base = os.path.join(self.warehouse, ns, tbl)
        with self.backend.db() as c:
            taken = c.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name = ?"
                " AND location = ? LIMIT 1",
                (self.catalog_name, base),
            ).fetchone()
        return base if not taken else f"{base}_{uuid.uuid4().hex[:8]}"

    def _row(self, name: str):
        ns, tbl = self._ident(name)
        with self.backend.db() as c:
            return c.execute(
                "SELECT location, metadata_location FROM iceberg_tables"
                " WHERE catalog_name = ? AND table_namespace = ?"
                " AND table_name = ?",
                (self.catalog_name, ns, tbl),
            ).fetchone()

    # -- namespaces (reference JdbcCatalog namespace surface) -------------

    def create_namespace(
        self,
        namespace: str,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> None:
        props = dict(properties or {})
        props.setdefault(_NS_EXISTS_KEY, "true")
        with self.backend.db() as c:
            have = c.execute(
                "SELECT 1 FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? AND namespace = ? LIMIT 1",
                (self.catalog_name, namespace),
            ).fetchone()
            if have:
                if if_not_exists:
                    return
                raise ValueError(f"namespace {namespace!r} already exists")
            c.executemany(
                "INSERT INTO iceberg_namespace_properties VALUES (?, ?, ?, ?)",
                [
                    (self.catalog_name, namespace, k, v)
                    for k, v in sorted(props.items())
                ],
            )

    def list_namespaces(self) -> list[str]:
        with self.backend.db() as c:
            rows = c.execute(
                "SELECT DISTINCT namespace FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? ORDER BY namespace",
                (self.catalog_name,),
            ).fetchall()
        return [r[0] for r in rows]

    def namespace_properties(self, namespace: str) -> dict[str, str]:
        with self.backend.db() as c:
            rows = c.execute(
                "SELECT property_key, property_value"
                " FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? AND namespace = ?",
                (self.catalog_name, namespace),
            ).fetchall()
        if not rows:
            raise KeyError(f"namespace {namespace!r} not found")
        return dict(rows)

    def set_namespace_properties(
        self, namespace: str, updates: dict[str, str]
    ) -> None:
        self.namespace_properties(namespace)  # existence check
        with self.backend.db() as c:
            c.executemany(
                "INSERT OR REPLACE INTO iceberg_namespace_properties"
                " VALUES (?, ?, ?, ?)",
                [
                    (self.catalog_name, namespace, k, v)
                    for k, v in updates.items()
                ],
            )

    def drop_namespace(self, namespace: str) -> None:
        with self.backend.db() as c:
            n = c.execute(
                "SELECT COUNT(*) FROM iceberg_tables"
                " WHERE catalog_name = ? AND table_namespace = ?",
                (self.catalog_name, namespace),
            ).fetchone()[0]
            if n:
                raise ValueError(
                    f"namespace {namespace!r} is not empty ({n} tables)"
                )
            c.execute(
                "DELETE FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? AND namespace = ?",
                (self.catalog_name, namespace),
            )

    # -- table registry ----------------------------------------------------

    def create_table(self, name: str, schema_ddl: str, **kwargs) -> Table:
        ns, tbl = self._ident(name)
        location = self._fresh_location(name)
        self._loc_override = {**getattr(self, "_loc_override", {}), name: location}
        with self.backend.db() as c:
            have_ns = c.execute(
                "SELECT 1 FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? AND namespace = ? LIMIT 1",
                (self.catalog_name, ns),
            ).fetchone()
            if not have_ns:
                raise KeyError(f"namespace {ns!r} not found")
            try:
                # row first, pointer NULL: the v0 commit below CAS-fills it
                c.execute(
                    "INSERT INTO iceberg_tables VALUES"
                    " (?, ?, ?, NULL, NULL, 'TABLE', ?)",
                    (self.catalog_name, ns, tbl, location),
                )
            except sqlite3.IntegrityError:
                raise ValueError(f"table {name} already exists") from None
        # a previous drop leaves the name-derived location reusable only
        # if stale metadata is gone (documented deviation)
        try:
            return super().create_table(name, schema_ddl, **kwargs)
        except BaseException:
            with self.backend.db() as c:  # undo the registration
                c.execute(
                    "DELETE FROM iceberg_tables WHERE catalog_name = ?"
                    " AND table_namespace = ? AND table_name = ?",
                    (self.catalog_name, ns, tbl),
                )
            raise
        finally:
            self._loc_override.pop(name, None)

    def load_table(self, name: str) -> Table:
        row = self._row(name)
        if row is None or row[1] is None:
            raise FileNotFoundError(f"table {name} not found in catalog")
        return Table(MD.read_metadata(row[0]), self.spark)

    table = load_table

    def table_exists(self, name: str) -> bool:
        row = self._row(name)
        return row is not None and row[1] is not None

    def list_tables(self, namespace: str = "default") -> list[str]:
        with self.backend.db() as c:
            rows = c.execute(
                "SELECT table_name FROM iceberg_tables"
                " WHERE catalog_name = ? AND table_namespace = ?"
                " ORDER BY table_name",
                (self.catalog_name, namespace),
            ).fetchall()
        return [r[0] for r in rows]

    def rename_table(self, old: str, new: str) -> None:
        """Reference JdbcCatalog.renameTable: one row UPDATE; the table
        keeps its location and metadata untouched."""
        ons, otbl = self._ident(old)
        nns, ntbl = self._ident(new)
        with self.backend.db() as c:
            have_ns = c.execute(
                "SELECT 1 FROM iceberg_namespace_properties"
                " WHERE catalog_name = ? AND namespace = ? LIMIT 1",
                (self.catalog_name, nns),
            ).fetchone()
            if not have_ns:
                raise KeyError(f"namespace {nns!r} not found")
            try:
                got = c.execute(
                    "UPDATE iceberg_tables SET table_namespace = ?,"
                    " table_name = ? WHERE catalog_name = ?"
                    " AND table_namespace = ? AND table_name = ?",
                    (nns, ntbl, self.catalog_name, ons, otbl),
                )
            except sqlite3.IntegrityError:
                raise ValueError(f"table {new} already exists") from None
            if got.rowcount != 1:
                raise FileNotFoundError(f"table {old} not found in catalog")

    def drop_table(self, name: str, purge: bool = False) -> None:
        row = self._row(name)
        if row is None:
            raise FileNotFoundError(f"table {name} not found in catalog")
        location = row[0]
        ns, tbl = self._ident(name)
        with self.backend.db() as c:
            c.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name = ?"
                " AND table_namespace = ? AND table_name = ?",
                (self.catalog_name, ns, tbl),
            )
        if purge:
            shutil.rmtree(location, ignore_errors=True)
        else:
            # deviation (documented): clear metadata so the name-derived
            # location is reusable; data files stay for external readers
            shutil.rmtree(os.path.join(location, "metadata"), ignore_errors=True)

    # -- views: DB pointer rows (reference JdbcViewOperations,
    # core/.../jdbc/JdbcViewOperations.java:1-206 + JdbcUtil V1
    # ``iceberg_views`` schema).  The base catalog stores views as
    # filesystem JSON, which a DB-only deployment cannot discover; here
    # each view's version log is a metadata DOCUMENT on the filesystem
    # (uniquely named, like table metadata) and the DB row holds the
    # CURRENT pointer, advanced by the same optimistic CAS the table
    # commit uses — two concurrent CREATE OR REPLACE VIEW writers both
    # write documents, the CAS decides, the loser's document is an
    # invisible orphan. ---------------------------------------------------

    def _view_ptr(self, name: str) -> str | None:
        ns, vname = self._ident(name)
        with self.backend.db() as c:
            row = c.execute(
                "SELECT metadata_location FROM iceberg_views"
                " WHERE catalog_name = ? AND view_namespace = ?"
                " AND view_name = ?",
                (self.catalog_name, ns, vname),
            ).fetchone()
        return row[0] if row else None

    def _view_doc(self, name: str) -> dict:
        ptr = self._view_ptr(name)
        if ptr is None:
            raise KeyError(f"view {name} not found")
        with open(ptr) as f:
            return json.load(f)

    def create_view(self, name: str, sql_text: str, replace: bool = False) -> None:
        ns, vname = self._ident(name)
        ptr = self._view_ptr(name)
        if ptr is not None and not replace:
            raise ValueError(f"view {name} already exists")
        versions: list[dict] = []
        if ptr is not None:
            with open(ptr) as f:
                versions = json.load(f)["versions"]
        versions = versions + [{"sql": sql_text, "at": MD.now_ms()}]
        doc_dir = os.path.join(self.warehouse, "_views", ns, vname)
        os.makedirs(doc_dir, exist_ok=True)
        # unique document name: two racing replacers write DIFFERENT
        # files; only the CAS winner's becomes current
        path = os.path.join(
            doc_dir, f"v{len(versions)}-{uuid.uuid4().hex[:8]}.metadata.json"
        )
        with open(path, "w") as f:
            json.dump({"name": name, "versions": versions}, f, indent=1)
        c = self.backend._conn()
        try:
            c.execute("BEGIN IMMEDIATE")
            if ptr is None:
                try:
                    c.execute(
                        "INSERT INTO iceberg_views VALUES (?, ?, ?, ?, NULL)",
                        (self.catalog_name, ns, vname, path),
                    )
                except sqlite3.IntegrityError:
                    c.execute("ROLLBACK")
                    raise MD.CommitConflict(
                        f"concurrent CREATE VIEW won for {name!r}"
                    ) from None
            else:
                got = c.execute(
                    "UPDATE iceberg_views SET metadata_location = ?,"
                    " previous_metadata_location = ?"
                    " WHERE catalog_name = ? AND view_namespace = ?"
                    " AND view_name = ? AND metadata_location = ?",
                    (path, ptr, self.catalog_name, ns, vname, ptr),
                )
                if got.rowcount != 1:
                    c.execute("ROLLBACK")
                    raise MD.CommitConflict(
                        f"concurrent REPLACE VIEW won for {name!r}"
                    )
            c.execute("COMMIT")
        finally:
            c.close()

    def list_views(self) -> list[str]:
        with self.backend.db() as c:
            rows = c.execute(
                "SELECT view_namespace, view_name FROM iceberg_views"
                " WHERE catalog_name = ? ORDER BY view_namespace, view_name",
                (self.catalog_name,),
            ).fetchall()
        return [n if ns == "default" else f"{ns}.{n}" for ns, n in rows]

    def view_sql(self, name: str, version: int | None = None) -> str:
        doc = self._view_doc(name)
        return doc["versions"][-1 if version is None else version]["sql"]

    def view_versions(self, name: str) -> list[dict]:
        return self._view_doc(name)["versions"]

    def load_view(self, name: str, version: int | None = None):
        sql_text = self.view_sql(name, version)
        for tname in self.list_tables():
            self.load_table(tname).to_df().createOrReplaceTempView(tname)
        return self.spark.sql(sql_text)

    def drop_view(self, name: str) -> None:
        ns, vname = self._ident(name)
        with self.backend.db() as c:
            got = c.execute(
                "DELETE FROM iceberg_views WHERE catalog_name = ?"
                " AND view_namespace = ? AND view_name = ?",
                (self.catalog_name, ns, vname),
            )
            if got.rowcount != 1:
                raise KeyError(f"view {name} not found")
        shutil.rmtree(
            os.path.join(self.warehouse, "_views", ns, vname),
            ignore_errors=True,
        )

    def snapshot_table(self, source: str, dest: str) -> Table:
        """Zero-copy clone under the DB-pointer protocol: the base
        implementation copies metadata on the FILESYSTEM and re-reads
        it, but JDBC readers resolve versions from the pointer row — so
        the clone must be registered (row pointing at the copied
        current version) BEFORE the location-rewriting commit runs
        (code-review r12)."""
        src_row = self._row(source)
        if src_row is None or src_row[1] is None:
            raise FileNotFoundError(f"table {source} not found in catalog")
        src_loc = src_row[0]
        ns, tbl = self._ident(dest)
        dest_loc = self._fresh_location(dest)
        cur_v = self.backend._version_of(src_row[1])
        os.makedirs(dest_loc)
        shutil.copytree(
            MD.metadata_dir(src_loc),
            MD.metadata_dir(dest_loc),
            dirs_exist_ok=True,
        )
        ptr = os.path.join(
            MD.metadata_dir(dest_loc), f"v{cur_v}.metadata.json"
        )
        with self.backend.db() as c:
            try:
                c.execute(
                    "INSERT INTO iceberg_tables VALUES"
                    " (?, ?, ?, ?, NULL, 'TABLE', ?)",
                    (self.catalog_name, ns, tbl, ptr, dest_loc),
                )
            except sqlite3.IntegrityError:
                shutil.rmtree(dest_loc, ignore_errors=True)
                raise ValueError(f"table {dest} already exists") from None
        meta = MD.read_metadata(dest_loc)
        meta.location = dest_loc
        meta.properties = dict(
            meta.properties,
            **{"snapshot-source": source, "gc.enabled": "false"},
        )
        MD.write_new_metadata(meta, meta.version)
        return self.load_table(dest)

    # JdbcCatalog.registerTable: adopt an existing metadata document
    def register_table(self, name: str, metadata_location: str) -> Table:
        ns, tbl = self._ident(name)
        doc = json.loads(open(metadata_location, "rb").read())
        location = doc["location"]
        vm = _V_RE.match(os.path.basename(metadata_location))
        if vm is None:
            raise ValueError(
                f"metadata file name must be v{{N}}.metadata.json: "
                f"{metadata_location!r}"
            )
        with self.backend.db() as c:
            try:
                c.execute(
                    "INSERT INTO iceberg_tables VALUES"
                    " (?, ?, ?, ?, NULL, 'TABLE', ?)",
                    (self.catalog_name, ns, tbl, metadata_location, location),
                )
            except sqlite3.IntegrityError:
                raise ValueError(f"table {name} already exists") from None
        return self.load_table(name)
