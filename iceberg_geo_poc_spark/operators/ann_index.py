"""Persistent IVF index over a managed table: build once, search many.

The inline IVF operators (operators/similarity.py) recompute cluster
assignment on every query.  At 100 TB that is the wrong shape — the
index IS the layout.  Here the assignment is PERSISTED as a managed
engine table partitioned by ``cluster`` (identity transform), so:

- each cluster's vectors live in their own files with ``cluster``
  min==max stats → a probe's ``cluster IN (...)`` scan prunes to
  exactly the nprobe partitions it needs (manifest file pruning, no
  data read outside the probed cells);
- centroids (tiny: n_centroids x dim doubles) ride in the table
  properties, versioned with the table metadata — rebuilds are a new
  snapshot, searches time-travel like any other read;
- index maintenance inherits the table machinery: append new vectors
  into their cluster partitions, compact with rewrite_data_files,
  rebuild = overwrite.

This is the vector-search analogue of the reference's hidden
partitioning (bucket :: key, hilbert :: geometry — SURVEY §1.3): the
physical layout encodes the query structure, and planning prunes by it.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iceberg_geo_poc_spark.operators.similarity import (
    dot_expr,
    kmeans_centroids,
    with_norm,
)
from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table import metadata as MD
from iceberg_geo_poc_spark.table.table import Table

INDEX_DDL = (
    "vec_id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE, cluster BIGINT"
)


def build_ivf_index(
    catalog,
    name: str,
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
) -> Table:
    """Cluster the corpus (Lloyd-refined deterministic centroids) and
    persist assignments into a cluster-partitioned managed table."""
    cents = kmeans_centroids(emb, n_centroids, iters)
    base = with_norm(emb)
    assign = (
        base.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos",
            F.expr(dot_expr("embedding", "cemb")) / (F.col("nrm") * F.col("cnrm")),
        )
        .groupBy("vec_id", "embedding", "nrm")
        .agg(F.max(F.struct("ccos", "cid")).alias("m"))
        .select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
            "nrm",
            F.col("m.cid").alias("cluster"),
        )
    )
    t = catalog.create_table(
        name, INDEX_DDL, partition_by=[("cluster", "identity")]
    )
    t.append(assign)
    cent_rows = cents.orderBy("cid").collect()  # bounded: n_centroids rows
    t.meta.properties["ivf.centroids"] = json.dumps(
        [[float(x) for x in r["cemb"]] for r in cent_rows]
    )
    t.meta.properties["ivf.n-centroids"] = str(n_centroids)
    MD.write_new_metadata(t.meta, t.meta.version)
    return t


def _centroids_df(index: Table):
    cents = json.loads(index.meta.properties["ivf.centroids"])
    rows = [
        (cid, vec, float(sum(x * x for x in vec)) ** 0.5)
        for cid, vec in enumerate(cents)
    ]
    return index.spark.createDataFrame(
        rows, "cid BIGINT, cemb ARRAY<DOUBLE>, cnrm DOUBLE"
    )


def ivf_index_search(
    index: Table, probes: DataFrame, k: int = 5, nprobe: int = 2
) -> DataFrame:
    """Top-k cosine search reading ONLY the probed cluster partitions.

    Probe -> nprobe nearest centroids (broadcast, bounded); the distinct
    cluster set (<= n_probes * nprobe values) becomes a ``cluster IN``
    scan predicate, which manifest pruning turns into a partition-pruned
    file list.  Returns (ia, ib, cosine, rank); callers that need the
    pruning ratio use ``plan_probe_scan`` directly.
    """
    scan, probe_clusters = plan_probe_scan(index, probes, nprobe)
    cand = scan.to_df().select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").cast("array<double>").alias("vb"),
        F.col("nrm").alias("nb"),
        "cluster",
    )
    scored = (
        probe_clusters.join(cand, "cluster")
        .filter(F.col("ia") != F.col("ib"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot_expr("va", "vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .select("ia", "ib", "cosine")
        .distinct()  # a pair probed via two clusters counts once
    )
    w = Window.partitionBy("ia").orderBy(F.desc("cosine"), F.asc("ib"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("ia", "rank")
    )


def plan_probe_scan(
    index: Table,
    probes: DataFrame,
    nprobe: int = 2,
    select: list[str] | None = None,
):
    """(TableScan over probed clusters, probe->cluster DataFrame).

    ``select`` projects the scan (parquet column pruning: unselected
    columns — e.g. the full-width embedding during a head-only stage —
    are never read off disk)."""
    cents = F.broadcast(_centroids_df(index))
    p = with_norm(probes)
    pw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.desc("cid"))
    probe_clusters = (
        p.crossJoin(cents)
        .withColumn(
            "ccos",
            F.expr(dot_expr("embedding", "cemb")) / (F.col("nrm") * F.col("cnrm")),
        )
        .withColumn("r", F.row_number().over(pw))
        .filter(F.col("r") <= nprobe)
        .select(
            F.col("vec_id").alias("ia"),
            F.col("embedding").cast("array<double>").alias("va"),
            F.col("nrm").alias("na"),
            F.col("cid").alias("cluster"),
        )
    )
    cluster_ids = sorted(
        r["cluster"] for r in probe_clusters.select("cluster").distinct().collect()
    )  # bounded: <= n_probes * nprobe
    scan = index.scan(where=E.in_("cluster", cluster_ids), select=select)
    return scan, F.broadcast(probe_clusters)


def ivf_index_insert(index: Table, new_emb: DataFrame) -> None:
    """Incremental ingest: assign NEW vectors with the index's FROZEN
    centroids (from table properties) and fast-append them into their
    cluster partitions — the index stays queryable throughout, the
    commit is a delta manifest, and probes keep pruning because each new
    file's ``cluster`` stats stay min==max.  Re-clustering (centroid
    drift) is a rebuild: ``build_ivf_index`` over the union, an
    overwrite snapshot."""
    cents = F.broadcast(_centroids_df(index))
    base = with_norm(new_emb)
    assign = (
        base.crossJoin(cents)
        .withColumn(
            "ccos",
            F.expr(dot_expr("embedding", "cemb")) / (F.col("nrm") * F.col("cnrm")),
        )
        .groupBy("vec_id", "embedding", "nrm")
        .agg(F.max(F.struct("ccos", "cid")).alias("m"))
        .select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
            "nrm",
            F.col("m.cid").alias("cluster"),
        )
    )
    index.append(assign)


MRL_INDEX_DDL = (
    "vec_id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE, "
    "head ARRAY<FLOAT>, hnrm DOUBLE, cluster BIGINT"
)


def build_matryoshka_index(
    catalog,
    name: str,
    emb: DataFrame,
    d_head: int = 8,
    n_centroids: int = 16,
    iters: int = 3,
) -> Table:
    """IVF index with a MATERIALIZED Matryoshka head column.

    The inline ``matryoshka_rerank`` (operators/similarity.py) slices
    the head in-plan from the full vector, so its 8x scan-IO claim is
    only real once the head dims are their own parquet column: here
    ``head`` (first ``d_head`` floats) and its norm are physical
    columns in a cluster-partitioned managed table, so the head stage
    is BOTH partition-pruned (probed cells only, manifest stats) and
    column-pruned (the full-width ``embedding`` column is never read
    off disk).  Kusupati et al. 2022: MRL-trained embeddings front-load
    information, so the prefix is a usable low-dim embedding."""
    cents = kmeans_centroids(emb, n_centroids, iters)
    base = with_norm(emb)
    head = f"slice(embedding, 1, {int(d_head)})"
    assign = (
        base.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos",
            F.expr(dot_expr("embedding", "cemb")) / (F.col("nrm") * F.col("cnrm")),
        )
        .groupBy("vec_id", "embedding", "nrm")
        .agg(F.max(F.struct("ccos", "cid")).alias("m"))
        .select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
            "nrm",
            F.expr(head).cast("array<float>").alias("head"),
            F.expr(f"sqrt({dot_expr(head, head)})").alias("hnrm"),
            F.col("m.cid").alias("cluster"),
        )
    )
    t = catalog.create_table(
        name, MRL_INDEX_DDL, partition_by=[("cluster", "identity")]
    )
    t.append(assign)
    cent_rows = cents.orderBy("cid").collect()  # bounded: n_centroids rows
    t.meta.properties["ivf.centroids"] = json.dumps(
        [[float(x) for x in r["cemb"]] for r in cent_rows]
    )
    t.meta.properties["ivf.n-centroids"] = str(n_centroids)
    t.meta.properties["mrl.d-head"] = str(int(d_head))
    MD.write_new_metadata(t.meta, t.meta.version)
    return t


def matryoshka_index_search(
    index: Table,
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 40,
):
    """Two-stage Matryoshka search over the managed index; returns
    ``(result_df, head_scan, full_scan)`` so callers can assert the
    pruning on both stages.

    Stage 1 reads ONLY (vec_id, head, hnrm, cluster) from the probed
    cells — column pruning keeps the full-width embedding on disk —
    and shortlists per probe with a rank-limit window (map-side
    WindowGroupLimit).  Stage 2 re-reads the same pruned cells'
    full-width column and reranks just |probes| x shortlist rows via
    an equi-join on vec_id.  At 100 TB: stage-1 IO = d_head/dim of the
    probed cells' float data, stage-2 IO = the probed cells' embedding
    column, rerank compute bounded by the shortlist."""
    d_head = int(index.meta.properties["mrl.d-head"])
    head_scan, probe_cells = plan_probe_scan(
        index, probes, nprobe, select=["vec_id", "head", "hnrm", "cluster"]
    )
    pc = (
        probe_cells.withColumn("ha", F.expr(f"slice(va, 1, {d_head})"))
        .withColumn("hna", F.expr(f"sqrt({dot_expr('ha', 'ha')})"))
    )
    cand_h = head_scan.to_df().select(
        F.col("vec_id").alias("ib"),
        F.col("head").cast("array<double>").alias("hb"),
        F.col("hnrm").alias("hnb"),
        "cluster",
    )
    scored_h = (
        pc.join(cand_h, "cluster")
        .filter(F.col("ia") != F.col("ib"))
        .withColumn(
            "hcos",
            F.round(
                F.expr(dot_expr("ha", "hb")) / (F.col("hna") * F.col("hnb")), 6
            ),
        )
        .select("ia", "ib", "hcos")
        .distinct()  # a pair probed via two cells counts once
    )
    w_h = Window.partitionBy("ia").orderBy(F.desc("hcos"), F.asc("ib"))
    short = (
        scored_h.withColumn("hrank", F.row_number().over(w_h))
        .filter(F.col("hrank") <= shortlist)
        .select("ia", "ib")
    )
    # stage 2: full-width vectors for the shortlist only, from the same
    # pruned cells (fresh scan so the head stage's plan stays head-only)
    full_scan = index.scan(
        where=head_scan.where, select=["vec_id", "embedding", "nrm"]
    )
    full_cand = full_scan.to_df().select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").cast("array<double>").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    probe_vecs = F.broadcast(
        probe_cells.select("ia", "va", "na").dropDuplicates(["ia"])
    )
    rer = (
        short.join(full_cand, "ib")
        .join(probe_vecs, "ia")
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot_expr("va", "vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.desc("cosine"), F.asc("ib"))
    out = (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("ia", "ib", "cosine", "rank")
        .orderBy("ia", "rank")
    )
    return out, head_scan, full_scan
