"""Central query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
string.  The driver hash-compares the two at sf0.01 — this registry IS
the correctness surface.

Conventions:
- every computed/aggregate column is aliased identically on both sides;
- float aggregates are rounded (2-4 decimals) on both sides so the
  Spark double-sum and the DuckDB double-sum cannot diverge in the last
  ulp;
- LIMIT/top-k queries carry full deterministic tie-breaking ORDER BYs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query callable with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle is not None}


_LOADED = False

# Names hoisted to the front of the registry (after family reordering) so a
# correctness driver that verifies queries in registration order and caps
# (first 50) reaches the least-verified entries first.  Round-5 rotation:
# rounds 1-4 earned green driver rows for 123 of the 169 queries registered
# at the time; the 46 below are every query WITHOUT a current green row — 4
# whose latest driver row is a stale pre-fix failure (the streaming trio
# fixed by the Spark-4 NTZ cast + ``geo_hilbert_clustering``, which gained a
# real oracle in r4), then the 42 that have never been driver-seen at all
# (most of round 4's new operators).  46 <= 50, so one rotation makes every
# one of them driver-verified; the remaining 4 slots go to new round-5
# queries appended at the end of this tuple.  Round 5 also registered
# further new queries past slot 50 (warc/url/webdataset/gif/flac/log-mel/
# bpe) — locally oracle-green, they are the round-6 rotation candidates.
_PRIORITY_FIRST = (
    # Round-8 rotation.  Rounds 1-7 earned green driver rows for 213 of the
    # 232 queries registered through round 7; the 19 below are the round-7
    # registrations that the round-7 window (which re-ran the round-6 list)
    # never reached — all locally oracle-green.  They go first so one driver
    # pass restores "every registered query has a green CORRECTNESS row".
    "dedup_editdistance_verify",
    "managed_datasource_write_roundtrip",
    "managed_encrypted_dv_stream",
    "managed_encrypted_key_rotation",
    "managed_iceberg_bucket_import",
    "managed_rewrite_table_path",
    "managed_sketch_join_estimate",
    "managed_theta_sketch_ndv",
    "multimodal_resize_box",
    "pipeline_zipdataset_extract",
    "retrieval_bm25",
    "retrieval_hybrid_rrf",
    "sample_temperature_mixture",
    "sample_weighted_aes",
    "sim_hamming_rerank",
    "sim_hamming_topk",
    "sql_ctas_roundtrip",
    "stream_static_enrichment",
    "text_unicode_normalize",
    # -- new round-8 queries (never driver-seen; registered this round;
    #    uncommented as each lands so the strict missing-name check holds) --
    "sql_view_roundtrip",
    "managed_parquet_encrypted_scan",
    "dedup_connected_components",
    "sample_coreset_kcenter",
    "pipeline_span_corruption",
    "retrieval_splade_sparse",
    # -- re-verification picks: long-unseen early-round rows (fill the
    #    driver's 50-slot window after the guaranteed-new entries above) --
    "text_lm_perplexity",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_augment_flips",
    "sim_knn_cosine_topk",
    "sim_ivf_knn",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    "dedup_keep_best_in_cluster",
    "managed_encrypted_mor_scan",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_asof_last_order",
    "join_range_event_bursts",
    "geo_hilbert_clustering",
    "managed_orc_roundtrip",
    "managed_incremental_read",
    "managed_merge",
    "managed_time_travel",
    "managed_partition_stats",
    "managed_gdpr_erasure",
    "retrieval_hard_negatives",
    "text_perplexity_buckets",
)


def _load_all() -> None:
    """Import every module that contributes registered queries.

    Imports are intentionally NOT wrapped in ``except ImportError: pass``:
    a missing dependency in the driver environment must fail loudly rather
    than silently erasing half the correctness surface.
    """
    global _LOADED
    if _LOADED:
        return
    # Import order = registration order = driver verification order.
    # Families with the fewest driver-green rows go first.
    from iceberg_geo_poc_spark.queries import table_queries  # noqa: F401
    from iceberg_geo_poc_spark.queries import geo_queries  # noqa: F401
    from iceberg_geo_poc_spark.queries import streaming_queries  # noqa: F401
    from iceberg_geo_poc_spark.queries import pipeline_queries  # noqa: F401
    from iceberg_geo_poc_spark.queries import relational  # noqa: F401

    hoisted: dict[str, RegisteredQuery] = {}
    for name in _PRIORITY_FIRST:
        rq = _REGISTRY.pop(name, None)
        if rq is None:
            raise RuntimeError(f"priority query {name!r} missing from registry")
        hoisted[name] = rq
    rest = dict(_REGISTRY)
    _REGISTRY.clear()
    _REGISTRY.update(hoisted)
    _REGISTRY.update(rest)
    _LOADED = True
