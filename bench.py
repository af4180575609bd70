#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from BASELINE.md §"Bench queries" at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

ARTIFACT SHAPE (VERDICT r11 #1): the driver captures a 2,000-byte tail
of stdout — rounds 10/11 printed one giant line and lost its head
(``parsed: null``).  The final stdout line is now a COMPACT summary
(medians, bracketing probes, probe-normalized ratios, contracts, sf1
scaling ratios) kept under ~1.9 KB by construction; full detail
(spreads, per-lane sf1 medians, planning/append/stats sub-benchmarks)
goes to ``BENCH_DETAIL.json`` next to this file.

HOST-NOISE POSTURE: the fixed-work calibration probe runs BEFORE and
AFTER the suite (r11's single post-suite probe could not show that
contention was severe during the suite and gone by the tail).  Every
query also reports ``median / probe`` against its assigned probe
(scan-bound -> scan probe, pandas-UDF-bound -> pyworker probe,
shuffle/agg-bound -> jvm probe; mapping in NORM_PROBE, documented in
SCALE.md) so round-over-round comparisons are host-independent by
construction.  Never run other Spark work on the box concurrently.

Query set (mirrors the reference's JMH harness shapes, BASELINE.md):
  1. filtered_scan  — selective l_shipdate range (file-skip / pushdown shape)
  2. q1             — full-scan aggregation (TPC-H Q1)
  3. q3             — 3-way join lineitem ⋈ orders ⋈ customer
  4. stats_fastpath — COUNT/MIN/MAX answered from metadata/footers
  5. geo_window     — st_intersects window over the geo-augmented table
  6. dedup_minhash  — MinHash-LSH near-dup candidate pairs over documents
  7. knn_cosine     — brute-force cosine top-k over embeddings
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.registry import all_queries
from iceberg_geo_poc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# registry name -> short bench name; all run directly against sf parquet.
BENCH_QUERIES = [
    ("filtered_scan", "q6_revenue_forecast"),
    ("filtered_scan_managed", "managed_date_pruned_scan"),
    # the SAME scan shape over a Parquet-modular-encrypted table: the
    # encrypted/plain ratio (extra key below) is the standing number for
    # parquet_crypto.py's "overhead is only the AES work" claim
    ("encrypted_scan", "managed_encrypted_pruned_scan"),
    ("q1", "q1_pricing_summary"),
    ("q3", "q3_shipping_priority"),
    ("stats_fastpath", "stats_fastpath_agg"),
    ("geo_window", "geo_points_in_window"),
    ("dedup_minhash", "dedup_minhash_lsh"),
    ("knn_cosine", "sim_knn_cosine_topk"),
    # sign-bit quantized ANN: pack = SQL fold at scan, distance =
    # bit_count(xor) — should land well under knn_cosine (the float
    # kernel) since every comparison is two JVM intrinsics
    ("knn_hamming", "sim_hamming_topk"),
    # MoR read overhead: scan with position-delete anti-join applied
    # (reference IcebergSourceParquetPosDeleteBenchmark shape)
    ("mor_read", "managed_mor_delete"),
    # same MoR scan shape but deletes come from roaring deletion
    # vectors in a Puffin sidecar (Iceberg v3 form).  Bounded-cardinality
    # DVs (the broadcast case) decode DRIVER-side (one FileIO read +
    # numpy roaring decode, deletion_vectors.dv_deletes_local) so no
    # Python-worker stage runs; huge DVs fan out via mapInPandas.
    # CONTRACT (driver-run): dv_read <= mor_read (decoded positions skip
    # the delete-parquet scan mor_read pays).  Driver r7: 0.396 vs 0.467.
    ("dv_read", "managed_dv_delete"),
    # polygon x polygon spatial join: the non-point kernel workload
    ("geo_poly_join", "geo_polygon_join_counts"),
    # NON-axis-aligned polygon x polygon join: exercises the vectorized
    # irregular-polygon kernel (_fast_polypoly_predicate)
    ("geo_diamond_join", "geo_diamond_join_counts"),
    # MIXED-vertex-count polygon join: same geometry as the diamond join
    # but ragged WKB, so the kernel takes _polys_packed_ragged.
    # CONTRACT (driver-run ratio, the only stable measurement): ragged
    # <= 1.8x diamond.  Driver history: 1.63x (r5), 1.71x (r6), 2.01x
    # (r7, VIOLATED) — the drift was genuine extra edge work in the
    # subdivided rows (pair predicates are O(v*e + e*e), so k-fold
    # subdivision costs ~k^2 downstream).  Since r8 the ragged pack
    # drops collinear on-chord vertices before the predicate stages
    # (geo/functions.py::_drop_collinear_vertices), collapsing each
    # subdivided diamond back to 4 edges: the remaining ragged-vs-
    # uniform delta is the cursor-machine pack walk only.
    ("geo_ragged_join", "geo_ragged_poly_join_counts"),
    # CCNet chunk-level dedup: corpus-wide first-occurrence election
    # (chunk-partitioned window) + per-doc reassembly — the shuffle-heavy
    # sub-document dedup shape, complementing banded dedup_minhash.
    # sf1 EXPECTATION (documented r13, VERDICT r12): ~2.4-3.0x at 10x
    # data — the chunk-key exchange grows 10x and the first-occurrence
    # window sort adds the log factor while the 32-core kernel moves
    # from latency- to throughput-bound; >3.2x means the election
    # stopped being one partial-agg pass.
    ("dedup_chunks", "dedup_chunk_level"),
    # ExactSubstr span REMOVAL (Lee et al.): the gram-explode +
    # min-struct first-occurrence election — the classic corpus-dedup
    # cost center (r12 addition; lane added r13 per VERDICT #7).
    # Expectation: explode rows grow linearly in corpus size, election
    # is one partial-agg groupBy -> sf1 ratio should sit with the
    # shuffle-bound family (~1.5-3x), never superlinear.
    ("dedup_span", "dedup_span_removal"),
    # n-gram LM scoring: train (2 groupBys) + score (2 equi-joins + agg)
    ("lm_perplexity", "text_lm_perplexity"),
    # CCNet terciles via distributed_ntile (round 9: the per-language
    # ntile window became a histogram + fine-partition rank — this lane
    # tracks that the skew-safe plan stays cheap)
    ("perplexity_buckets", "text_perplexity_buckets"),
]

# Which calibration probe each query normalizes against (VERDICT r11
# #7): "scan" = parquet-decode/IO-bound, "py" = pandas-UDF/Arrow-bound,
# "jvm" = codegen+shuffle-bound.  median/probe is the host-independent
# number; the rationale per query lives in SCALE.md §bench-normalization.
NORM_PROBE = {
    "filtered_scan": "scan", "filtered_scan_managed": "scan",
    "encrypted_scan": "scan", "q1": "scan", "q3": "scan",
    "mor_read": "scan", "dv_read": "scan",
    "stats_fastpath": "jvm", "dedup_minhash": "jvm", "dedup_chunks": "jvm",
    "dedup_span": "jvm",
    "knn_cosine": "jvm", "knn_hamming": "jvm", "lm_perplexity": "jvm",
    "perplexity_buckets": "jvm",
    "geo_window": "py", "geo_poly_join": "py", "geo_diamond_join": "py",
    "geo_ragged_join": "py",
}


def _calibration_probe(spark) -> dict:
    """Fixed-work host-noise calibration (VERDICT r7 task #3).

    Two constant pure-Spark workloads, independent of SF_DIR and of any
    engine code, timed with the same 1-warm-up + median-of-3 posture as
    the headline queries:

    - ``jvm_sec``: codegen + one shuffle — spark.range(20M) hashed to
      997 keys, groupBy sum/avg/count.  Tracks JVM/CPU/scheduler speed.
    - ``pyworker_sec``: Arrow round-trip + numpy — a pandas UDF summing
      a float column over spark.range(2M).  Tracks Python-worker fork /
      Arrow IPC / numpy speed (half the headline queries are
      pandas-UDF-bound, and JVM and py-worker noise are independent).
    - ``scan_sec``: fixed 4M-row parquet read + filter + agg from a
      one-time synthetic file — tracks disk/page-cache/parquet-decode
      speed, the axis the two CPU probes are blind to (round-10 gap:
      IO-bound queries drifted +20% on a host whose CPU probes were
      flat, and nothing in the artifact could attribute it).

    A round-over-round query delta that matches the probes' delta is
    host noise; a delta the probes don't show is a real regression.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _probe_mul(v: pd.Series) -> pd.Series:
        return v * 1.0000001

    def jvm_work():
        return (
            spark.range(20_000_000)
            .select(
                (F.col("id") % 997).alias("k"),
                ((F.col("id") * 2654435761) % 1000003).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v"), F.avg("v"), F.count(F.lit(1)))
            .collect()
        )

    def py_work():
        return (
            spark.range(2_000_000)
            .select((F.col("id") % 65536).cast("double").alias("x"))
            .select(_probe_mul(F.col("x")).alias("y"))
            .agg(F.sum("y"))
            .collect()
        )

    probe_parquet = os.path.join(_SF1_BASE, "probe_scan.parquet")
    if not os.path.exists(os.path.join(probe_parquet, "_SUCCESS")):
        (
            spark.range(4_000_000)
            .select(
                F.col("id"),
                ((F.col("id") * 2654435761) % 1000003).cast("double").alias("v"),
                F.concat(F.lit("k"), (F.col("id") % 4096).cast("string")).alias("s"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(probe_parquet)
        )

    def scan_work():
        return (
            spark.read.parquet(probe_parquet)
            .filter(F.col("v") > 500_000)
            .groupBy((F.col("id") % 97).alias("k"))
            .agg(F.sum("v"), F.count(F.lit(1)))
            .collect()
        )

    out = {}
    for key, work in (
        ("jvm_sec", jvm_work),
        ("pyworker_sec", py_work),
        ("scan_sec", scan_work),
    ):
        work()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            work()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[key] = round(runs[1], 3)
    return out


def _stats_fastpath_ratio(spark) -> dict:
    """Meta-only aggregation vs forced full scan of the SAME managed
    table (BASELINE.md targets >=100x; measuring the fast path against a
    full query like q1 hides the gap behind fixed session overhead)."""
    from iceberg_geo_poc_spark.queries.table_queries import _TABLES
    from iceberg_geo_poc_spark.table.stats_agg import try_stats_aggregate

    t = _TABLES.get((SF_DIR, "stats"))
    if t is None:
        return {}
    aggs = [
        "count(*)", "min(l_quantity)", "max(l_quantity)",
        "min(l_orderkey)", "max(l_orderkey)",
    ]
    metas = []
    for _ in range(20):
        t0 = time.perf_counter()
        vals = try_stats_aggregate(t, aggs)
        metas.append(time.perf_counter() - t0)
    assert vals is not None
    full_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        full = (
            t.to_df()
            .agg(
                F.count(F.lit(1)),
                F.min("l_quantity"), F.max("l_quantity"),
                F.min("l_orderkey"), F.max("l_orderkey"),
            )
            .collect()[0]
        )
        full_runs.append(time.perf_counter() - t0)
    assert list(full) == [
        vals[0], vals[1], vals[2], vals[3], vals[4]
    ], f"stats fast path diverged from full scan: {vals} vs {list(full)}"
    metas.sort()
    full_runs.sort()
    meta = metas[len(metas) // 2]
    fullscan = full_runs[len(full_runs) // 2]
    return {
        "meta_sec": round(meta, 6),
        "fullscan_sec": round(fullscan, 4),
        "speedup": round(fullscan / meta, 1),
    }


def _append_commit_latency(spark) -> dict:
    """Fast-append commit latency: the early-vs-late medians over 40
    consecutive single-file appends must stay flat (commit cost is
    O(new files), not O(table) — delta manifests + parent reuse)."""
    import statistics
    import tempfile
    import time

    import pyspark.sql.functions as F

    from iceberg_geo_poc_spark.table import Catalog

    cat = Catalog(tempfile.mkdtemp(prefix="igps_ab_"), spark)
    t = cat.create_table("append_bench", "id BIGINT, v DOUBLE")
    df = spark.range(1000).select(F.col("id"), F.rand(1).alias("v")).coalesce(1)
    df.cache(); df.count()
    times = []
    for _ in range(40):
        t0 = time.monotonic()
        t.append(df)
        times.append(time.monotonic() - t0)
    df.unpersist()
    early = statistics.median(times[1:6])
    late = statistics.median(times[-5:])
    return {
        "early_ms": round(early * 1e3, 1),
        "late_ms": round(late * 1e3, 1),
        "flat": late <= early * 2.0,
    }


def _merge_rewrite_amplification(spark) -> dict:
    """Copy-on-write MERGE rewrite amplification (VERDICT r12 #1): lay
    out 8 data files whose key ranges ALL overlap (min/max pruning
    cannot separate them), merge a source whose matched keys live in
    exactly ONE file, and report files-rewritten / files-with-matches.
    The runtime matched-file probe (table.py _touched_file_paths,
    reference SparkCopyOnWriteScan.java:143-171) makes this 1.0; the
    pre-r13 full-candidate rewrite measured 8.0 — i.e. a 100 TB MERGE
    on an unclustered key rewrote the whole table."""
    import tempfile

    from iceberg_geo_poc_spark.table import Catalog

    cat = Catalog(tempfile.mkdtemp(prefix="igps_amp_"), spark)
    t = cat.create_table("amp", "id BIGINT, v STRING")
    n_files = 8
    for i in range(n_files):
        # file i holds {i+1, 1000-i}: every file's [min,max] contains
        # every in-range key, so candidates == all files
        t.append(
            spark.createDataFrame(
                [(i + 1, f"lo{i}"), (1000 - i, f"hi{i}")], "id BIGINT, v STRING"
            ).coalesce(1)
        )
    src = spark.createDataFrame(
        [(993, "UPD"), (500, "NEW")], "id BIGINT, v STRING"
    )  # 993 lives only in file i=7; 500 in no file (insert)
    t0 = time.perf_counter()
    snap = t.merge(src, on=["id"], when_matched_update={"v": "UPD"},
                   when_not_matched_insert=True)
    elapsed = round(time.perf_counter() - t0, 3)
    cand = int(snap.summary.get("candidate-files", -1))
    rewritten = int(snap.summary.get("merged-files", -1))
    return {
        "candidate_files": cand,
        "files_with_matches": 1,
        "files_rewritten": rewritten,
        "amplification": round(rewritten / 1, 2),
        "merge_sec": elapsed,
    }


def _planning_latency(spark) -> dict:
    """Scan-planning latency on a synthetic 100k-entry manifest — the
    reference PlanningBenchmark / DeleteFileIndexBenchmark shape.
    Reports driver-side pandas planning and the distributed Spark
    planning fallback on the SAME manifest + predicate."""
    import tempfile

    import numpy as np
    import pandas as pd

    from iceberg_geo_poc_spark.table import E
    from iceberg_geo_poc_spark.table import manifest as M
    from iceberg_geo_poc_spark.table import spark_planning as SP
    from iceberg_geo_poc_spark.table import vector_eval as V

    n = 100_000
    rng = np.random.default_rng(5)
    lo = rng.integers(0, 2**60, size=n)
    df = pd.DataFrame(
        {
            "content": "data",
            "file_path": [f"/data/f{i}.parquet" for i in range(n)],
            "file_size": 1000,
            "record_count": 10_000,
            "sequence_number": 1,
            "snapshot_id": 1,
            "partition": "{}",
            "lower": "", "upper": "", "nulls": "", "bbox": "", "eq_cols": None,
            "lo__k": pd.array(lo, dtype="Int64"),
            "hi__k": pd.array(lo + 10_000, dtype="Int64"),
            "nu__k": 0.0,
            M._FLAT_MARKER: True,
        }
    )
    mpath = tempfile.mktemp(suffix=".parquet", prefix="igps_planbench_")
    M.write_manifest(df, mpath)
    pred = E.ge("k", 2**59) & E.le("k", 2**59 + 2**55)
    entries = M.read_manifest(mpath)
    data = entries[entries.content == "data"]
    # pandas planning (median of 5)
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        sv = V.StatsView(data)
        keep = V.might_match(pred, sv)
        n_kept = int(keep.sum())
        runs.append(time.perf_counter() - t0)
    runs.sort()
    pandas_ms = runs[2] * 1000
    # distributed planning (median of 3, warm)
    SP.plan_files_spark(spark, mpath, pred, None)
    sruns = []
    for _ in range(3):
        t0 = time.perf_counter()
        got = SP.plan_files_spark(spark, mpath, pred, None)
        sruns.append(time.perf_counter() - t0)
    sruns.sort()
    assert len(got) == n_kept
    return {
        "n_entries": n,
        "files_kept": n_kept,
        "pandas_ms": round(pandas_ms, 2),
        "spark_ms": round(sruns[1] * 1000, 2),
    }


# -- sf1 scaling lane --------------------------------------------------------
#
# Seven rounds of sf0.1 numbers say nothing empirical about the 10x
# story SCALE.md narrates; one decade of measured scaling does.  sf1 is
# DERIVED from the driver's sf0.1 parquet (10 replicas, keys remapped
# into disjoint ranges so per-replica join semantics hold; document
# text perturbed per replica so cross-replica docs are NOT near-dups —
# candidate pairs must scale ~linearly, not quadratically, for the
# measurement to mean anything).  Cached under .sf1/ (gitignored);
# SPARK_GRAFT_SF1=0 disables the lane.

# r10 additions (VERDICT r9 #5): the original 5 measure mostly JVM
# scan/join paths — geo_ragged_join (pandas-UDF geo kernel, fact side
# replicated against a FIXED supplier dimension so candidate pairs grow
# linearly), knn_hamming (JVM bit-intrinsics ANN), and
# perplexity_buckets (the histogram-NTILE skew rewrite) put a measured
# decade under exactly the Arrow-transfer and skew narratives.
# r11 additions (VERDICT r10 #8): dedup_chunks (corpus-wide chunk
# election window — the shuffle-heaviest pipeline shape) and
# encrypted_scan (the JVM-native decrypting read that replaced r10's
# mapInArrow path) — the two cost centers that lacked a measured decade.
# r12 additions (VERDICT r11 #6): retrieval_bitext (the banded miner —
# candidates must scale O((n+m)*S) in data, never pairs) and ivf_search
# (persisted-IVF probe pruning at 10x cells/vectors; the measured time
# includes the query's built-in recall-vs-brute check, which is itself
# linear in corpus size, so <=10x remains the right bound).  These two
# are not in BENCH_QUERIES, so the lane carries its own name mapping.
SF1_QUERIES = [
    ("filtered_scan", "q6_revenue_forecast"),
    ("q1", "q1_pricing_summary"),
    ("q3", "q3_shipping_priority"),
    ("geo_window", "geo_points_in_window"),
    ("dedup_minhash", "dedup_minhash_lsh"),
    ("geo_ragged_join", "geo_ragged_poly_join_counts"),
    ("knn_hamming", "sim_hamming_topk"),
    ("perplexity_buckets", "text_perplexity_buckets"),
    ("dedup_chunks", "dedup_chunk_level"),
    ("dedup_span", "dedup_span_removal"),
    ("encrypted_scan", "managed_encrypted_pruned_scan"),
    ("retrieval_bitext", "retrieval_margin_bitext_bucketed"),
    ("ivf_search", "sim_ivf_index_search"),
]
_SF1_BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sf1")


def _ensure_replicated(spark, src_dir: str, n_reps: int, out_dir: str) -> str:
    """Derive an ``n_reps``-x corpus from the driver's sf parquet in a
    FIXED 32-file layout.  The 1-replica build is the scaling CONTROL:
    the driver's sf0.1 tables are single parquet files (a near-serial
    scan on 32 cores), so timing sf1-in-32-files against sf0.1-in-1-file
    would conflate data growth with parallelism headroom — the honest
    ratio is sf1 / same-layout-sf0.1."""
    # v2: r10 added embeddings + supplier to the layout — stale v1
    # caches rebuild
    marker = os.path.join(out_dir, "_SUCCESS_REPLICA_V2")
    if os.path.exists(marker):
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    k_off = 1 << 24  # beyond any source key
    reps = F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("__rep")

    def replicate(name: str, remap: dict[str, object]) -> None:
        df = spark.read.parquet(f"{src_dir}/{name}.parquet").select(
            "*", reps
        )
        for col, expr in remap.items():
            df = df.withColumn(col, expr)
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    rep = F.col("__rep").cast("long")
    replicate("lineitem", {"l_orderkey": F.col("l_orderkey") + rep * k_off})
    replicate(
        "orders",
        {
            "o_orderkey": F.col("o_orderkey") + rep * k_off,
            "o_custkey": F.col("o_custkey") + rep * k_off,
        },
    )
    replicate("customer", {"c_custkey": F.col("c_custkey") + rep * k_off})
    replicate(
        "documents",
        {
            "doc_id": F.col("doc_id") + rep * k_off,
            # suffix every token with the replica id (replica 0 keeps
            # the original text): every shingle of every replica-i doc
            # differs from replica-j's, so MinHash near-dup pairs stay
            # within replicas and scale linearly with the corpus
            "text": F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.expr(
                    r"regexp_replace(text, '(\\S+)', "
                    "concat('$1r', CAST(__rep AS STRING)))"
                )
            ),
        },
    )
    # embeddings: 10x vectors, disjoint ids (probes stay the replica-0
    # originals; brute/Hamming ANN work scales linearly with the corpus)
    replicate("embeddings", {"vec_id": F.col("vec_id") + rep * k_off})
    # supplier stays 1x in BOTH lanes: it is the dimension side of
    # geo_ragged_join — replicating both sides would grow candidate
    # pairs ~quadratically and the ratio would measure density blowup,
    # not data scaling.  Fact x10 against a fixed dim is the honest 10x.
    for small in ("nation", "region", "supplier"):
        shutil.copy(f"{src_dir}/{small}.parquet", f"{out_dir}/{small}.parquet")
    open(marker, "w").close()
    return out_dir


def main() -> None:
    spark = get_spark("bench")
    queries = all_queries()
    # JVM / reader warm-up so q1 doesn't pay one-time session costs.
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    # Python-worker warm-up (JMH-style): spawn the reusable pandas-UDF
    # workers on every core once, so per-query timings measure the
    # operators rather than one-time fork+import costs.
    from iceberg_geo_poc_spark.geo.functions import st_point

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores * 2, numPartitions=n_cores).select(
        st_point(F.col("id").cast("double"), F.col("id").cast("double"))
    ).count()

    # bracketing probe #1 (VERDICT r11 #1b): contention DURING the suite
    # is attributable only if the probe runs on both sides of it.
    # CONVERGE-THEN-MEASURE (VERDICT r12 #3): JVM tiered JIT and page
    # cache warm up over MINUTES, not one probe — r12/r13 measurements
    # showed a monotone pre>mid>post decline (up to 3.9x) on an
    # otherwise-quiet host, polluting the bracket.  Discarded probes run
    # until two consecutive ones agree within 1.15x per axis (bounded at
    # 6), so probe_pre measures the steady state, not the warm-up curve.
    # Convergence is against the RUNNING MINIMUM per axis, not the
    # previous probe: two consecutive probes "agree" on a contended
    # plateau too (r14 run 4: pre 0.788 vs post 0.256 — the warm-up
    # stopped on an elevated plateau that kept improving later).  A
    # probe within 1.15x of the best seen on EVERY axis is steady
    # state; bounded at 12.
    # converged = cur sits in a TWO-SIDED 1.15x band around the best
    # of the PRIOR probes on every axis: not still improving >15%
    # (warm-up curve flattened) and not a spike (transient load).  The
    # check runs against the prior best BEFORE folding cur in — else
    # an improving probe trivially passes against itself.
    warm_probes = []
    best: dict | None = None
    axes = ("jvm_sec", "pyworker_sec", "scan_sec")
    for _ in range(12):
        cur = _calibration_probe(spark)
        warm_probes.append(cur)
        converged = best is not None and all(
            best[k] / 1.15 <= cur[k] <= best[k] * 1.15 for k in axes
        )
        if best is None:
            best = dict(cur)
        else:
            for k in axes:
                best[k] = min(best[k], cur[k])
        if converged:
            break
    probe_pre = cur

    # JMH-style measurement (the reference's own benchmark posture,
    # BASELINE.md): warm-up iterations absorb per-query one-time costs
    # (whole-stage-codegen compile, managed-table setup), then the
    # median of 3 timed iterations is reported.
    # two warm-ups: the Python-kernel joins (geo_diamond_join) need the
    # 2nd iteration to reach steady state (worker reuse + JIT'd codegen)
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "2"))
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))

    def measure(reg_name: str, d: str) -> list[float]:
        fn = queries[reg_name]
        for _ in range(warmups):
            fn(spark, d).collect()
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, d).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        return runs

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    probe_mid: dict | None = None
    half = len(BENCH_QUERIES) // 2
    for i, (bench_name, reg_name) in enumerate(BENCH_QUERIES):
        if i == half:
            # mid-suite probe (VERDICT r12 #3): pre/mid/post within 1.2x
            # proves the WHOLE suite ran on a quiet host, not just its
            # endpoints
            probe_mid = _calibration_probe(spark)
        if reg_name not in queries:
            continue
        runs = measure(reg_name, SF_DIR)
        timings[bench_name] = round(runs[len(runs) // 2], 3)
        # [min, median, max] of the timed runs: a median that moved
        # round-over-round with a wide spread is a host spike, a moved
        # median with a tight spread is a regression — attributable
        # from the artifact alone (VERDICT r9 "What's wrong #3")
        spreads[bench_name] = [
            round(runs[0], 3), round(runs[len(runs) // 2], 3), round(runs[-1], 3)
        ]

    detail: dict = {"query_spread_min_med_max": spreads}
    contracts: dict = {}
    if "encrypted_scan" in timings and "filtered_scan_managed" in timings:
        ratio = round(
            timings["encrypted_scan"] / timings["filtered_scan_managed"], 2
        )
        # CONTRACT: since r11 encrypted reads decrypt inside the native
        # vectorized reader (parquet_crypto.py JVM fast path) — parity
        # with the plain scan, fixed-cost headroom only.  r10's
        # mapInArrow path measured 3.93x; a ratio drifting past 1.5
        # means the fast path silently stopped engaging.
        contracts["enc_native_ratio"] = ratio
        contracts["enc_ok"] = ratio <= 1.5
        # second tracked ratio (VERDICT r11 #9): the Arrow mapInPandas
        # fallback (object-store FileIO, pre-promotion files) measured
        # explicitly by disabling the JVM path — a fallback regression
        # cannot hide behind the native number
        prior = os.environ.get("SPARK_GRAFT_JVM_CRYPTO")
        os.environ["SPARK_GRAFT_JVM_CRYPTO"] = "0"
        try:
            runs = measure("managed_encrypted_pruned_scan", SF_DIR)
            arrow_med = runs[len(runs) // 2]
            # CO-WINDOW the denominator (VERDICT r13 #1b): the head-of-
            # suite filtered_scan number and this tail-of-suite Arrow
            # number can sit in DIFFERENT host regimes, making the
            # cross-window ratio uninterpretable (r13 measured 3.35 ->
            # 6.65 purely from tail contention).  Re-measure the plain
            # scan ADJACENT to the Arrow scan so both legs share one
            # window; both legs land in detail for the audit trail.
            denom_runs = measure("managed_date_pruned_scan", SF_DIR)
            denom_med = denom_runs[len(denom_runs) // 2]
            contracts["enc_arrow_ratio"] = round(arrow_med / denom_med, 2)
            # r16 ADDITION (VERDICT r15 #5, carried from r14 #7): the
            # ratio above is DENOMINATOR-dominated — its ~0.15 s plain-
            # scan leg moves with host speed, so the ratio drifted
            # 3.35->6.67 across rounds with no code change.  Anchor the
            # Arrow leg ABSOLUTELY: its raw seconds (enc_arrow_sec) and
            # its probe-normalized form (enc_arrow_norm = sec / scan
            # probe, filled in after the probe average below) are the
            # standing numbers; the old ratio is kept unchanged for
            # round-over-round comparability.
            contracts["enc_arrow_sec"] = round(arrow_med, 3)
            detail["enc_arrow_window"] = {
                "arrow_scan_sec": round(arrow_med, 3),
                "plain_scan_sec_same_window": round(denom_med, 3),
                "plain_scan_sec_suite_head": timings["filtered_scan_managed"],
            }
        finally:
            # restore (not delete): a user-set override must keep
            # governing the rest of the run (code-review r12)
            if prior is None:
                del os.environ["SPARK_GRAFT_JVM_CRYPTO"]
            else:
                os.environ["SPARK_GRAFT_JVM_CRYPTO"] = prior
    if "dv_read" in timings and "mor_read" in timings:
        # decoded DV positions skip the delete-parquet scan mor_read
        # pays; 1.15 headroom absorbs timer jitter on sub-second scans
        contracts["dv_le_mor"] = timings["dv_read"] <= timings["mor_read"] * 1.15

    # bracketing probe #2 — IMMEDIATELY after the timed queries, so the
    # bracket covers exactly the measurements it normalizes (the sf1
    # lane has its own same-layout control, and the driver-side
    # sub-benchmarks below are not probe-normalized)
    probe_post = _calibration_probe(spark)

    # sf1 scaling lane: headline queries over a 10x derived corpus vs a
    # same-layout 1x control — linear-ish ratios substantiate SCALE.md
    # with one measured decade.  r12 additions (VERDICT r11 #6): the
    # banded bitext miner and the persisted-IVF search, plus the in-plan
    # candidate-pair count for geo_ragged_join (VERDICT r11 #2).
    sf1_ratio: dict[str, float] = {}
    # r16 ADDITION (VERDICT r15 #1): absolute sf1 seconds for the
    # compute-bound heavy lanes go into the COMPACT line too (not just
    # the detail file) — the driver runs this bench at two core counts,
    # and the pair of tail JSONs is then enough to compute core-scaling
    # on the lanes where compute actually dominates (at sf0.1 every
    # 8-vs-32 ratio is ~1 because fixed costs dominate; sf1 is where
    # parallelism is measurable).  Ratios alone cannot give this: both
    # the 10x lane and its 1x control move with core count.
    sf1_heavy_sec: dict[str, float] = {}
    _SF1_HEAVY = ("geo_ragged_join", "dedup_minhash", "dedup_span",
                  "perplexity_buckets", "retrieval_bitext")
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            # cache keyed by the SOURCE sf dir: a smoke run at sf0.01
            # must not poison the sf0.1 lane's derived corpus
            sftag = os.path.basename(SF_DIR.rstrip("/"))
            sf1_dir = _ensure_replicated(
                spark, SF_DIR, 10, os.path.join(_SF1_BASE, f"{sftag}-x10")
            )
            ctl_dir = _ensure_replicated(
                spark, SF_DIR, 1, os.path.join(_SF1_BASE, f"{sftag}-x1")
            )

            def lane(d: str) -> dict[str, float]:
                # 1 warm-up (codegen compile) + min-of-2: the lane
                # exists for the 10x RATIO, and both lanes share the
                # measurement posture, so the cheaper estimator is fine
                t: dict[str, float] = {}
                for bench_name, reg_name in SF1_QUERIES:
                    if reg_name not in queries:
                        continue
                    fn = queries[reg_name]
                    fn(spark, d).collect()
                    runs = []
                    for _ in range(2):
                        t0 = time.perf_counter()
                        fn(spark, d).collect()
                        runs.append(time.perf_counter() - t0)
                    t[bench_name] = round(min(runs), 3)
                return t

            ctl = lane(ctl_dir)
            sf1 = lane(sf1_dir)
            sf1_ratio = {
                k: round(sf1[k] / ctl[k], 2) for k in sf1 if ctl.get(k)
            }
            detail["sf1"] = {"queries": sf1, "control_same_layout_sf": ctl}
            sf1_heavy_sec = {k: sf1[k] for k in _SF1_HEAVY if k in sf1}
            # candidate pairs the ragged join's Python kernel receives,
            # at 1x and 10x fact data (fixed supplier dim): ~10x growth
            # proves the fixed grid does not densify superlinearly, so
            # any superlinear TIME ratio is host noise by elimination
            from iceberg_geo_poc_spark.queries.geo_queries import (
                ragged_join_candidate_count,
            )

            p1 = ragged_join_candidate_count(spark, ctl_dir)
            p10 = ragged_join_candidate_count(spark, sf1_dir)
            detail["ragged_candidate_pairs"] = {"x1": p1, "x10": p10}
            contracts["ragged_pairs_10x"] = round(p10 / max(p1, 1), 2)
        except Exception as e:  # the lane must never kill the headline JSON
            detail["sf1"] = {"error": f"{type(e).__name__}: {e}"}

    # sub-benchmarks (full numbers in detail; one compact contract each)
    ratio = _stats_fastpath_ratio(spark)
    if ratio:
        detail["stats_fastpath_vs_fullscan"] = ratio
        contracts["stats_speedup"] = ratio["speedup"]
    detail["planning_100k_files"] = _planning_latency(spark)
    contracts["plan_pandas_ms"] = detail["planning_100k_files"]["pandas_ms"]
    detail["append_commit_latency"] = _append_commit_latency(spark)
    contracts["append_flat"] = detail["append_commit_latency"]["flat"]

    # CoW rewrite-amplification contract (VERDICT r12 #1/#8): a MERGE
    # whose matched rows live in ONE of N stats-equivalent candidate
    # files must rewrite exactly that one file.  A regression
    # reintroducing full-candidate rewrites fails a NAMED contract, not
    # a judge read.
    amp = _merge_rewrite_amplification(spark)
    detail["merge_rewrite_amplification"] = amp
    contracts["merge_rewrite_amplification"] = amp["amplification"]
    contracts["merge_narrowing_ok"] = amp["amplification"] == 1.0

    def _short(p: dict) -> dict:
        return {
            "jvm": p["jvm_sec"], "py": p["pyworker_sec"], "scan": p["scan_sec"]
        }

    # probe-normalized medians: host-independent round-over-round signal.
    # ANCHOR ON (pre+mid) ONLY (VERDICT r13 #1a): probe_post sits after
    # the timed window and r13 measured it 2.4-3.8x degraded by tail
    # contention while the timed head was quiet — folding it into the
    # anchor drags every norm band.  probe_post still participates in
    # the BRACKET below, as the diagnostic it is.
    probes = [p for p in (probe_pre, probe_mid, probe_post) if p]
    anchor = [p for p in (probe_pre, probe_mid) if p]
    pavg = {
        "jvm": sum(p["jvm_sec"] for p in anchor) / len(anchor),
        "py": sum(p["pyworker_sec"] for p in anchor) / len(anchor),
        "scan": sum(p["scan_sec"] for p in anchor) / len(anchor),
    }
    # bracket quietness: max/min across the three probes per axis; the
    # r11/r12 done-criterion is <=1.2 on the graded run
    bracket = {
        ax: round(
            max(p[k] for p in probes) / max(min(p[k] for p in probes), 1e-9), 2
        )
        for ax, k in (("jvm", "jvm_sec"), ("py", "pyworker_sec"),
                      ("scan", "scan_sec"))
    }
    contracts["probe_bracket_max_ratio"] = max(bracket.values())
    contracts["probe_quiet"] = max(bracket.values()) <= 1.2
    # r16 ADDITION (VERDICT r15 #5): host-normalized absolute Arrow
    # crypto leg — enc_arrow_sec / scan probe.  Frozen band: 3.0-5.2
    # (r16 quiet-run reading with the usual band headroom; the r15
    # graded run's implied value was ~1.04/0.29 ~ 3.6).  A norm above
    # the band means the Arrow fallback itself regressed, regardless of
    # what the plain-scan denominator did that day.
    if "enc_arrow_sec" in contracts and pavg["scan"] > 0:
        contracts["enc_arrow_norm"] = round(
            contracts["enc_arrow_sec"] / pavg["scan"], 2
        )
    detail["probe_bracket_ratio"] = bracket
    # the discarded warm-up series: how many probes convergence took,
    # and the curve itself (attributes a failed bracket to residual
    # warm-up vs genuine mid-run contention)
    detail["warmup_probe_series"] = [_short(p) for p in warm_probes]
    norm = {
        q: round(v / pavg[NORM_PROBE[q]], 1)
        for q, v in timings.items()
        if q in NORM_PROBE and pavg[NORM_PROBE[q]] > 0
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries": timings,
        "probe_pre": _short(probe_pre),
        "probe_mid": _short(probe_mid) if probe_mid else None,
        "probe_post": _short(probe_post),
        "norm_vs_probe": norm,
        "contracts": contracts,
        "sf1_ratio_10x": sf1_ratio,
        "sf1_sec": sf1_heavy_sec,
        "detail": "BENCH_DETAIL.json",
    }
    detail.update({k: v for k, v in out.items() if k != "detail"})
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(out, separators=(",", ":"))
    # the driver's stdout capture is a 2,000-byte TAIL: degrade by
    # dropping the bulkiest derived blocks (all preserved in the detail
    # file) rather than ever printing a truncatable line
    # sf1_sec (the r16 addition) is dropped FIRST so it can never push a
    # pre-existing block out of the compact line
    for drop in ("sf1_sec", "norm_vs_probe", "sf1_ratio_10x", "queries"):
        if len(line) <= 1900:
            break
        out[drop] = f"see {out['detail']}"
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
