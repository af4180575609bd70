"""Pluggable file IO for the table-format metadata plane.

Python analogue of the reference's FileIO abstraction
(api/src/main/java/org/apache/iceberg/io/FileIO.java with impls
aws/src/main/java/org/apache/iceberg/aws/s3/S3FileIO.java, gcp/, azure/):
every metadata-plane byte — metadata JSON, version hint, manifests,
statistics sidecars, parquet footers harvested at commit — moves through
a ``FileIO`` resolved from the path, so a table can live on an object
store without touching the commit protocol or the scan planner.

Scale posture (the 100 TB story):
- The METADATA plane (this module's concern) is driver-side and small —
  a few MB of JSON + manifest parquet per table — so buffering whole
  objects through ``read_bytes``/``write_bytes`` is exactly how the
  reference's S3FileIO behaves (single GET/PUT per object).
- The DATA plane stays on Spark-native IO: on a real cluster an
  ``s3a://`` table location is read and written directly by executors
  through the Hadoop connectors, never through the driver.  The
  driver-side Arrow fallback in ``table.py`` exists only for
  filesystems Spark itself cannot reach (the in-memory mock used in
  tests) and raises beyond a small size guard rather than silently
  funnelling a large table through the driver.

Default is direct POSIX (zero overhead for local warehouses — the
hot-path manifest reads keep their mmap'd fast path).  Registering an
``ArrowFSFileIO`` for a prefix also installs the matching commit
backend so optimistic concurrency keeps working (metadata.py).
"""

from __future__ import annotations

import io as _io
import os
import posixpath


class FileIO:
    """Byte-level IO for one path namespace (prefix-routed)."""

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Immediate child names (files and dirs); [] when missing."""
        raise NotImplementedError

    def list_files(self, path: str, suffix: str = "") -> list[str]:
        """Recursive file paths under ``path`` ending with ``suffix``."""
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime_ms(self, path: str) -> int | None:
        """Millis mtime, or None when the store has no usable mtime."""
        raise NotImplementedError

    def open_input(self, path: str):
        """Seekable binary reader (feeds pyarrow's ParquetFile)."""
        return _io.BytesIO(self.read_bytes(path))

    @property
    def is_posix(self) -> bool:
        return False


class PosixFileIO(FileIO):
    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        """Ranged read (seek + read): blob readers — Puffin DV slices —
        fetch only their bytes instead of the whole sidecar."""
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)

    def write_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path) if os.path.isdir(path) else []

    def list_files(self, path: str, suffix: str = "") -> list[str]:
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(
                os.path.join(root, f) for f in files if f.endswith(suffix)
            )
        return sorted(out)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime_ms(self, path: str) -> int | None:
        return int(os.path.getmtime(path) * 1000)

    def open_input(self, path: str):
        return open(path, "rb")

    @property
    def is_posix(self) -> bool:
        return True


class ArrowFSFileIO(FileIO):
    """Adapter over any ``pyarrow.fs.FileSystem`` (S3FileSystem,
    GcsFileSystem, AzureFileSystem, _MockFileSystem for tests).

    Paths carry a URI-style scheme (``s3://bucket/k``); the scheme is
    stripped before hitting the wrapped filesystem, mirroring the
    reference's S3URI handling (aws/.../s3/S3URI.java).
    """

    def __init__(self, fs, scheme: str):
        self.fs = fs
        self.scheme = scheme.rstrip(":/")
        self._prefix = self.scheme + "://"

    def _p(self, path: str) -> str:
        if path.startswith(self._prefix):
            return path[len(self._prefix):]
        return path.lstrip("/")

    def _u(self, fs_path: str) -> str:
        return self._prefix + fs_path.lstrip("/")

    def read_bytes(self, path: str) -> bytes:
        from pyarrow.fs import FileType

        p = self._p(path)
        if self.fs.get_file_info(p).type == FileType.NotFound:
            raise FileNotFoundError(path)
        with self.fs.open_input_stream(p) as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._p(path)
        parent = posixpath.dirname(p)
        if parent:
            self.fs.create_dir(parent, recursive=True)
        with self.fs.open_output_stream(p) as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(self._p(path)).type != FileType.NotFound

    def delete(self, path: str) -> None:
        self.fs.delete_file(self._p(path))

    def listdir(self, path: str) -> list[str]:
        from pyarrow.fs import FileSelector, FileType

        p = self._p(path)
        if self.fs.get_file_info(p).type != FileType.Directory:
            return []
        infos = self.fs.get_file_info(FileSelector(p, recursive=False))
        return sorted(posixpath.basename(i.path) for i in infos)

    def list_files(self, path: str, suffix: str = "") -> list[str]:
        from pyarrow.fs import FileSelector, FileType

        p = self._p(path)
        if self.fs.get_file_info(p).type != FileType.Directory:
            return []
        infos = self.fs.get_file_info(FileSelector(p, recursive=True))
        return sorted(
            self._u(i.path)
            for i in infos
            if i.type == FileType.File and i.path.endswith(suffix)
        )

    def size(self, path: str) -> int:
        return self.fs.get_file_info(self._p(path)).size

    def mtime_ms(self, path: str) -> int | None:
        mt = self.fs.get_file_info(self._p(path)).mtime_ns
        return None if mt is None else mt // 1_000_000

    def open_input(self, path: str):
        return self.fs.open_input_file(self._p(path))


_POSIX = PosixFileIO()
_REGISTRY: list[tuple[str, FileIO]] = []


def register_file_io(prefix: str, fio: FileIO) -> None:
    """Route all metadata-plane IO for paths under ``prefix`` through
    ``fio`` (longest prefix wins; default POSIX).  Also installs the
    matching optimistic-commit backend for the prefix."""
    _REGISTRY.insert(0, (prefix, fio))
    _REGISTRY.sort(key=lambda kv: -len(kv[0]))
    from iceberg_geo_poc_spark.table import metadata as MD

    MD.register_commit_backend(prefix, MD.FileIOBackend(fio))


def io_for(path: str) -> FileIO:
    for prefix, fio in _REGISTRY:
        # a prefix registered as 'scheme://wh/' also claims the bare
        # root 'scheme://wh' (directory probes on the warehouse itself)
        if path.startswith(prefix) or path == prefix.rstrip("/"):
            return fio
    if "://" in path and not path.startswith("file://"):
        # an unregistered object-store scheme must never silently fall
        # through to POSIX IO (which would mkdir the scheme as a literal
        # directory); fail loudly so misconfigured catalogs surface
        raise ValueError(
            f"no FileIO registered for scheme path {path!r}; "
            "call register_file_io(prefix, fio) first"
        )
    return _POSIX
