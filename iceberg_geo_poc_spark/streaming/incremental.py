"""Incremental and changelog reads over the snapshot log.

The reference's streaming model is *incremental table consumption*:
a micro-batch source over snapshot deltas with (snapshot, position)
offsets (reference spark/.../source/SparkMicroBatchStream.java:68-117)
and a changelog scan producing row-level insert/delete diffs
(core/.../BaseIncrementalChangelogScan.java, ChangelogRowReader.java).

Spark-first mapping (SURVEY §2.9): snapshot-diff planning yields the
added files between two snapshots; reading them IS the micro-batch.
``IncrementalStream`` is an availableNow-style consumer: each
``next_batch()`` returns the rows appended since the last call, with
admission control via max_files_per_batch — the same offsets-and-
admission shape as SupportsAdmissionControl, minus the JVM.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table.table import Table


def _ancestry(table: Table, to_id: int) -> list[int]:
    """Snapshot ids from root to ``to_id`` along parent links."""
    by_id = {s.snapshot_id: s for s in table.meta.snapshots}
    chain = []
    cur = by_id.get(to_id)
    while cur is not None:
        chain.append(cur.snapshot_id)
        cur = by_id.get(cur.parent_id) if cur.parent_id is not None else None
    return list(reversed(chain))


def added_files_between(
    table: Table, from_snapshot_id: int | None, to_snapshot_id: int | None
) -> list[str]:
    """Data files in ``to`` but not in ``from`` (exclusive/inclusive),
    the planning pre-pass of BaseIncrementalAppendScan."""
    to_id = to_snapshot_id or table.meta.current_snapshot_id
    if to_id is None:
        return []
    to_entries = M.read_snapshot_entries(
        table.location, table.meta.snapshot_by_id(to_id)
    )
    to_files = set(to_entries[to_entries.content == "data"].file_path)
    if from_snapshot_id is None:
        return sorted(to_files)
    from_entries = M.read_snapshot_entries(
        table.location, table.meta.snapshot_by_id(from_snapshot_id)
    )
    from_files = set(from_entries[from_entries.content == "data"].file_path)
    return sorted(to_files - from_files)


def incremental_read(
    table: Table,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended after ``from`` up to ``to`` (append-only diff)."""
    files = added_files_between(table, from_snapshot_id, to_snapshot_id)
    if not files:
        return table._empty_df()
    return table._read_files(files, with_deletes=False)


def _delete_state(entries) -> list[tuple]:
    """Canonical fingerprint of a snapshot's delete layer: the sorted
    (content, file_path, dv-ref) triples of every non-data entry."""
    dels = entries[entries.content != "data"]
    out = []
    for r in dels.itertuples():
        dv = getattr(r, "dv", None)
        out.append((r.content, r.file_path, dv if isinstance(dv, str) else ""))
    return sorted(out)


def _live_rows(table: Table, entries) -> DataFrame | None:
    """All live rows of a historical snapshot keyed by (__file_path,
    __pos) — data files read with that snapshot's OWN delete layer
    (position-delete parquet, deletion vectors, equality deletes)
    applied, so the diff between two snapshots' live sets is exact for
    every delete form."""
    paths = [
        p
        for p in entries[entries.content == "data"].file_path
        if os.path.exists(p)
    ]
    if not paths:
        return None
    return table._read_files(paths, with_deletes=True, with_pos=True, entries=entries)


def changelog(
    table: Table,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level diff with _change_type ('insert' | 'delete') and
    _commit_snapshot_id columns (reference ChangelogRowReader /
    CreateChangelogViewProcedure shape).

    Append/CoW commits diff the DATA FILE sets (cheap — only changed
    files are read).  Commits that change the DELETE layer (merge-on-
    read position deletes, deletion vectors, equality deletes) diff the
    LIVE ROW sets of the two snapshots keyed by (file, position) — the
    same read path that serves queries applies each snapshot's deletes,
    so MoR deletes surface as row-level 'delete' changes instead of
    being invisible to a file-set diff."""
    to_id = to_snapshot_id or table.meta.current_snapshot_id
    chain = _ancestry(table, to_id)
    if from_snapshot_id is not None:
        chain = chain[chain.index(from_snapshot_id) + 1:]
    out: DataFrame | None = None
    prev_entries = None
    prev_files: set[str] | None = None
    by_id = {s.snapshot_id: s for s in table.meta.snapshots}
    for sid in chain:
        entries = M.read_snapshot_entries(table.location, by_id[sid])
        files = set(entries[entries.content == "data"].file_path)
        if prev_files is None and from_snapshot_id is not None:
            prev_entries = M.read_snapshot_entries(
                table.location, by_id[from_snapshot_id]
            )
            prev_files = set(prev_entries[prev_entries.content == "data"].file_path)
        elif prev_files is None:
            prev_entries = entries.iloc[0:0]
            prev_files = set()
        del_changed = _delete_state(entries) != _delete_state(prev_entries)
        if del_changed:
            cur_live = _live_rows(table, entries)
            prev_live = _live_rows(table, prev_entries)
            key = ["__file_path", "__pos"]
            for a, b, kind in (
                (cur_live, prev_live, "insert"),
                (prev_live, cur_live, "delete"),
            ):
                if a is None:
                    continue
                part = a if b is None else a.join(b.select(*key), key, "left_anti")
                part = (
                    part.drop(*key)
                    .withColumn("_change_type", F.lit(kind))
                    .withColumn("_commit_snapshot_id", F.lit(sid))
                )
                out = part if out is None else out.unionByName(part)
            prev_files = files
            prev_entries = entries
            continue
        added = sorted(f for f in files - prev_files if os.path.exists(f))
        removed = sorted(f for f in prev_files - files if os.path.exists(f))
        for paths, kind in ((added, "insert"), (removed, "delete")):
            if not paths:
                continue
            part = table._read_files(paths).withColumn(
                "_change_type", F.lit(kind)
            ).withColumn("_commit_snapshot_id", F.lit(sid))
            out = part if out is None else out.unionByName(part)
        prev_files = files
        prev_entries = entries
    if out is None:
        schema = table._empty_df().withColumn(
            "_change_type", F.lit("insert")
        ).withColumn("_commit_snapshot_id", F.lit(0).cast("long"))
        return schema.limit(0)
    return out


def compute_updates(diff: DataFrame, identifier_columns: list[str]) -> DataFrame:
    """Refine a file-granular changelog into row-level net changes
    (reference CreateChangelogViewProcedure with identifier columns):

    - carryover rows (same values deleted+inserted in one commit, i.e.
      rows merely copied by a CoW rewrite) are removed;
    - delete+insert pairs sharing identifier columns become
      update_preimage / update_postimage;
    - everything else stays insert / delete.

    All set-arithmetic happens as aggregations keyed on row values /
    identifiers — two shuffles, no driver-side state, any scale.
    """
    value_cols = [
        c for c in diff.columns if c not in ("_change_type", "_commit_snapshot_id")
    ]
    # 1. cancel carryovers: net count per (row values, commit)
    net = (
        diff.groupBy(*value_cols, "_commit_snapshot_id")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("__net")
        )
        .filter(F.col("__net") != 0)
        .withColumn(
            "_change_type", F.when(F.col("__net") > 0, "insert").otherwise("delete")
        )
        .withColumn("__n", F.abs(F.col("__net")))
        .withColumn("__dup", F.explode(F.expr("sequence(1, __n)")))
        .drop("__net", "__n", "__dup")
    )
    # 2. pair surviving deletes/inserts on identifiers within a commit
    dels = net.filter("_change_type = 'delete'").drop("_change_type")
    ins = net.filter("_change_type = 'insert'").drop("_change_type")
    join_keys = identifier_columns + ["_commit_snapshot_id"]
    # presence flags: row markers built before the join, not probes of
    # nullable value columns (values may be legitimately null)
    dels_m = dels.withColumn("__d", F.lit(1))
    ins_m = ins.withColumn("__i", F.lit(1))
    paired = dels_m.alias("d").join(ins_m.alias("i"), join_keys, "full_outer")

    both = paired.filter(F.col("__d").isNotNull() & F.col("__i").isNotNull())
    pre = both.select(
        *[F.col(f"d.{c}").alias(c) for c in value_cols],
        F.lit("update_preimage").alias("_change_type"),
        F.col("_commit_snapshot_id"),
    )
    post = both.select(
        *[F.col(f"i.{c}").alias(c) for c in value_cols],
        F.lit("update_postimage").alias("_change_type"),
        F.col("_commit_snapshot_id"),
    )
    only_del = paired.filter(F.col("__i").isNull()).select(
        *[F.col(f"d.{c}").alias(c) for c in value_cols],
        F.lit("delete").alias("_change_type"),
        F.col("_commit_snapshot_id"),
    )
    only_ins = paired.filter(F.col("__d").isNull()).select(
        *[F.col(f"i.{c}").alias(c) for c in value_cols],
        F.lit("insert").alias("_change_type"),
        F.col("_commit_snapshot_id"),
    )
    return pre.unionByName(post).unionByName(only_del).unionByName(only_ins)


def apply_changelog(
    source: Table,
    target: Table,
    identifier_columns: list[str],
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> dict:
    """Apply the source table's net row changes to a downstream mirror —
    incremental materialized-view maintenance driven by the changelog
    (the reference's CreateChangelogViewProcedure consumption pattern).

    Deletes and update preimages become one equality-delete file on the
    target; inserts and update postimages append after it, so the
    sequence-number visibility rule replays the change order exactly
    (an inserted key survives the delete that precedes it).  Cost
    tracks the CHANGE volume, never the size of either table.
    """
    from pyspark.sql import Window

    diff = changelog(source, from_snapshot_id, to_snapshot_id)
    net = compute_updates(diff, identifier_columns)
    # last-writer-wins per key across the window: snapshot ids are not
    # ordered, sequence numbers are — join the (tiny) id->seq map in
    seq_rows = [
        (s.snapshot_id, s.sequence_number) for s in source.meta.snapshots
    ]
    seq_df = source.spark.createDataFrame(
        seq_rows, "_commit_snapshot_id LONG, __seq LONG"
    )
    w = Window.partitionBy(*identifier_columns).orderBy(
        F.desc("__seq"),
        # within one commit a pre/post pair shares the key: post wins
        F.desc(
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"), 1
            ).otherwise(0)
        ),
    )
    last = (
        net.join(F.broadcast(seq_df), "_commit_snapshot_id")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .persist()
    )
    try:
        dels = last.select(*identifier_columns).distinct()
        ins = last.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type", "_commit_snapshot_id", "__seq", "__rn")
        # ONE aggregation job over the persisted change set sizes both
        # sides (previously two separate .count() jobs): every changed
        # key is deleted, and rows whose final state is insert/post-image
        # are re-appended
        sizes = last.agg(
            F.count_distinct(*[F.col(c) for c in identifier_columns]).alias("k"),
            F.count(
                F.when(
                    F.col("_change_type").isin("insert", "update_postimage"), 1
                )
            ).alias("i"),
        ).first()
        n_del, n_ins = int(sizes["k"]), int(sizes["i"])
        # delete every changed key first, then append final states: the
        # equality-delete sequence rule replays the change order correctly
        if n_del:
            target.delete_by_keys(dels, identifier_columns)
        if n_ins:
            target.append(ins)
    finally:
        last.unpersist()
    return {"deleted-keys": n_del, "inserted-rows": n_ins}


class IncrementalStream:
    """availableNow micro-batch consumer with admission control.

    offsets = last consumed snapshot id (checkpointable as a string),
    mirroring StreamingOffset; max_files_per_batch mirrors the
    max-files-per-micro-batch read option (SparkMicroBatchStream)."""

    def __init__(
        self,
        table: Table,
        max_files_per_batch: int | None = None,
        max_records_per_batch: int | None = None,
    ):
        self.table = table
        self.max_files = max_files_per_batch
        self.max_records = max_records_per_batch
        self.last_snapshot_id: int | None = None
        self._pending: list[str] = []

    def _record_counts(self) -> dict[str, int]:
        entries = self.table._entries()
        return {
            r.file_path: int(r.record_count)
            for r in entries[entries.content == "data"].itertuples()
        }

    def next_batch(self) -> DataFrame | None:
        """DataFrame of newly appended rows, or None when caught up."""
        self.table.refresh()
        current = self.table.meta.current_snapshot_id
        if not self._pending:
            if current == self.last_snapshot_id or current is None:
                return None
            self._pending = added_files_between(
                self.table, self.last_snapshot_id, current
            )
            self.last_snapshot_id = current
            if not self._pending:
                return None
        if self.max_files is not None:
            take = self._pending[: self.max_files]
        elif self.max_records is not None:
            # admit whole files until the record budget is spent (always
            # at least one file — the reference's max-records-per-micro-
            # batch admits by file granularity the same way)
            counts = self._record_counts()
            take, total = [], 0
            for p in self._pending:
                if take and total + counts.get(p, 0) > self.max_records:
                    break
                take.append(p)
                total += counts.get(p, 0)
        else:
            take = self._pending
        self._pending = self._pending[len(take):]
        return self.table._read_files(take, with_deletes=False)

    def offset(self) -> str:
        return str(self.last_snapshot_id)


def scd2_history(table: Table, key_cols: list[str]) -> DataFrame:
    """Materialize a TYPE-2 SLOWLY CHANGING DIMENSION from the table's
    changelog: one row per (key, version) with ``valid_from_version`` /
    ``valid_to_version`` commit ordinals (1-based ancestry position)
    and ``is_current`` — the standard warehouse pattern for auditable
    dimension history, built on the same row-level diff that serves CDC
    (reference CreateChangelogViewProcedure + the downstream MERGE
    pattern its docs describe).

    Semantics: every changelog INSERT opens a version at its commit's
    ordinal; the next version of the same key closes it (lead window
    per key — partitions bounded by versions-per-key, never corpus-
    wide).  Rows whose keys are never rewritten stay open.  Upsert
    streams (CoW/MoR UPDATE and MERGE emit delete+insert pairs in one
    commit) are fully covered; a DELETE with no co-committed
    replacement closes the open interval at its own ordinal, including
    delete-then-reinsert gaps.
    """
    from pyspark.sql import Window

    cl = changelog(table)
    chain = _ancestry(table, table.meta.current_snapshot_id)
    ord_entries = []
    for i, sid in enumerate(chain):
        ord_entries += [F.lit(sid), F.lit(i + 1)]
    ord_map = F.create_map(*ord_entries)
    cl = cl.withColumn(
        "__ord", ord_map[F.col("_commit_snapshot_id")].cast("long")
    )
    ins = cl.filter(F.col("_change_type") == "insert").drop(
        "_change_type", "_commit_snapshot_id"
    )
    # per-key delete ordinals as a small sorted array (versions-per-key
    # bounded): a version at ordinal o closes at the EARLIEST of (next
    # insert of the key, first delete with ordinal > o).  Strict '>'
    # keeps an update's co-committed delete+insert pair correct — the
    # delete closes the PREVIOUS version (whose lead() is that ordinal
    # anyway), never the replacement row; a delete-then-reinsert gap
    # closes at the delete, not the reinsert.
    dels = (
        cl.filter(F.col("_change_type") == "delete")
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list("__ord")).alias("__del_ords"))
    )
    w = Window.partitionBy(*key_cols).orderBy("__ord")
    out = (
        ins.withColumn("__next", F.lead("__ord").over(w))
        .join(dels, key_cols, "left")
        .withColumn(
            "__first_del",
            F.expr("array_min(filter(__del_ords, d -> d > __ord))"),
        )
        .withColumn(
            "valid_to_version", F.least("__next", "__first_del")
        )
        .withColumnRenamed("__ord", "valid_from_version")
        .withColumn("is_current", F.col("valid_to_version").isNull())
        .drop("__next", "__del_ords", "__first_del")
    )
    return out
