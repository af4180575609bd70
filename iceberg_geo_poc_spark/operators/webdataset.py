"""WebDataset tar-shard ingestion — the multimodal training layout.

Large image/text/audio training sets (LAION-style) ship as POSIX tar
shards where one SAMPLE is a group of adjacent files sharing a basename
key with different extensions::

    000123.jpg   000123.json   000123.txt
    000124.jpg   000124.json   000124.txt

This module turns those shards into table rows Spark-first:

- ``parse_shard``: tar bytes -> [(key, ext, payload)] via stdlib
  ``tarfile`` over a BytesIO (plain or gzip ``.tar.gz`` — tarfile's
  ``r:*`` sniffing handles both), directories and PAX headers skipped.
- ``extract_samples``: mapInPandas over a binary shard column -> one
  row per member (shard passthrough columns preserved); zero shuffle —
  shards are independent, which is exactly why the format exists.
- ``group_samples``: member rows -> one row per sample key with an
  ext->payload map, the shape a multimodal pipeline consumes
  (decode the ``jpg`` with operators/jpeg.py, parse the ``json``,
  tokenize the ``txt``).  One partial-agg groupBy on (shard, key).
- ``build_shard``: fixture/synthesis writer (deterministic mtime/uid so
  byte-stable fixtures are possible).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_shard(
    members: list[tuple[str, bytes]], gzipped: bool = False
) -> bytes:
    """[(name, payload)] -> tar shard bytes (deterministic headers)."""
    buf = io.BytesIO()
    mode = "w:gz" if gzipped else "w"
    # mtime pinned so fixtures are byte-stable (gzip of tar embeds none)
    with tarfile.open(fileobj=buf, mode=mode, format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _split_key_ext(name: str) -> tuple[str, str]:
    """Split on the first dot of the BASENAME (WebDataset convention),
    so dotted directories (``v1.2/000123.jpg``) keep their path intact:
    key ``v1.2/000123``, ext ``jpg``."""
    head, _, tail = name.rpartition("/")
    base, dot, ext = tail.partition(".")
    key = f"{head}/{base}" if head else base
    return key, ext if dot else ""


def parse_shard(data: bytes) -> list[tuple[str, str, bytes]]:
    """tar / tar.gz / ZIP bytes -> [(sample key, extension, payload)].

    Key/extension split on the FIRST dot of the basename, the
    WebDataset convention (so ``a/b/000123.seg.png`` -> key
    ``a/b/000123``, ext ``seg.png``).  ZIP shards (document dumps often
    ship zipped) are sniffed by the PK magic and walked with stdlib
    ``zipfile``, same member contract."""
    data = bytes(data)
    out: list[tuple[str, str, bytes]] = []
    if data[:2] == b"PK":
        import zipfile

        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                base, ext = _split_key_ext(info.filename)
                out.append((base, ext, zf.read(info)))
        return out
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            base, ext = _split_key_ext(info.name)
            payload = tf.extractfile(info).read()
            out.append((base, ext, payload))
    return out


def build_zip_shard(members: list[tuple[str, bytes]]) -> bytes:
    """[(name, payload)] -> ZIP shard bytes (deterministic timestamps)."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload)
    return buf.getvalue()


MEMBER_DDL = "shard_id LONG, key STRING, ext STRING, payload BINARY, n_bytes LONG"


def extract_samples(
    shards: DataFrame, payload_col: str = "payload", shard_id_col: str = "shard_id"
) -> DataFrame:
    """Binary tar shards -> one row per member file.  Per-partition map
    (Arrow both ways), zero shuffle: at 100 TB each task streams its
    own shard, the exact access pattern WebDataset was designed for."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, keys, exts, payloads, sizes = [], [], [], [], []
            for sid, data in zip(pdf[shard_id_col], pdf[payload_col]):
                for key, ext, payload in parse_shard(data):
                    sids.append(int(sid))
                    keys.append(key)
                    exts.append(ext)
                    payloads.append(payload)
                    sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "shard_id": pd.array(sids, dtype="int64"),
                    "key": keys,
                    "ext": exts,
                    "payload": payloads,
                    "n_bytes": pd.array(sizes, dtype="int64"),
                }
            )

    return shards.mapInPandas(_batches, MEMBER_DDL)


def group_samples(members: DataFrame) -> DataFrame:
    """Member rows -> one row per (shard_id, key) with ``exts`` (sorted
    array) and ``parts`` (ext -> payload map) — the sample shape a
    multimodal loader consumes.  Single partial-agg groupBy."""
    return (
        members.groupBy("shard_id", "key")
        .agg(
            F.array_sort(F.collect_list("ext")).alias("exts"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ext"), F.col("payload")))
                )
            ).alias("parts"),
            F.sum("n_bytes").alias("sample_bytes"),
        )
    )


def write_shards(
    samples: DataFrame,
    samples_per_shard: int = 64,
    key_col: str = "key",
    shard_key_col: str | None = None,
) -> DataFrame:
    """Samples -> tar shard payloads: the EXPORT direction (training
    jobs consume WebDataset; a pipeline must emit it, not just parse
    it).

    ``samples`` rows carry ``key`` plus a ``parts`` map (ext ->
    payload), the exact shape :func:`group_samples` produces — so
    extract -> transform -> write_shards round-trips.  Sharding is
    deterministic: shard id = key-hash bucket when ``shard_key_col`` is
    None (growth-stable, same convention as the sampling operators),
    else the caller's explicit column.  One partial-agg groupBy on the
    shard id is the only shuffle; each task then tars ITS shard's
    members in sorted-key order (deterministic bytes — build_shard pins
    headers), which is exactly how a 1000-executor export job shapes:
    shard construction is embarrassingly parallel after one shuffle.
    """
    if shard_key_col is not None:
        sid = F.col(shard_key_col)
    else:
        # deterministic key-hash bucketing; bucket count from one
        # bounded count() so shards land near the target size
        n = samples.count()
        n_shards = max(1, -(-n // samples_per_shard))
        sid = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    grouped = samples.select(
        sid.cast("long").alias("shard_id"),
        F.col(key_col).alias("key"),
        F.col("parts"),
    )

    def _tar(pdf: pd.DataFrame) -> pd.DataFrame:
        members: list[tuple[str, bytes]] = []
        for key, parts in sorted(
            zip(pdf["key"], pdf["parts"]), key=lambda kv: kv[0]
        ):
            for ext in sorted(parts):
                members.append((f"{key}.{ext}", bytes(parts[ext])))
        payload = build_shard(members)
        return pd.DataFrame(
            {
                "shard_id": pd.array([int(pdf["shard_id"].iloc[0])], dtype="int64"),
                "payload": [payload],
                "n_samples": pd.array([len(pdf)], dtype="int64"),
                "n_bytes": pd.array([len(payload)], dtype="int64"),
            }
        )

    return grouped.groupBy("shard_id").applyInPandas(
        _tar, "shard_id LONG, payload BINARY, n_samples LONG, n_bytes LONG"
    )
