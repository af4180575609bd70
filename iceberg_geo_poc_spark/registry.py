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
# (first 50) reaches the least-verified entries first.  Standing rotation
# discipline (VERDICT r7/r8): every never-driver-seen registration goes
# FIRST, then the longest-unseen rows re-verify; the list is recomputed
# each round from CORRECTNESS_r01..r{N-1} vs the registry.
_PRIORITY_FIRST = (
    # Round-12 rotation.  Recomputed this session from CORRECTNESS_r01-r11
    # vs the registry: 7 never-driver-seen round-12 registrations first,
    # then the longest-unseen rows oldest-first — all 20 remaining r5
    # rows, then the first 23 r7 rows (alphabetical) fill the 50-slot
    # window.  Staleness floor moves r5 -> r7 when CORRECTNESS_r12 lands.
    # -- round-12 registrations (never driver-seen) --
    "sql_delete_in_subquery",
    "sql_update_in_subquery",
    "managed_merge_schema_evolution",
    "managed_jdbc_catalog_roundtrip",
    "dedup_span_removal",
    "stream_full_outer_join",
    "managed_wap_branch_dml",
    # -- last seen round 5 (all 20) --
    "sim_ivf_kmeans_recall",
    "sim_pq_adc_recall",
    "sim_quantize_int8",
    "sim_random_projection",
    "stats_fastpath_filtered_agg",
    "stream_dedup_within_watermark",
    "stream_hourly_event_counts",
    "stream_partitioned_table_sink",
    "stream_session_windows",
    "stream_stream_join",
    "text_chunk_documents",
    "text_hash_embedding_retrieval",
    "text_length_histogram",
    "text_novelty_scores",
    "text_repetition_filter",
    "text_tfidf_top_terms",
    "text_vocab_top_terms",
    "ts_gapfill_hourly_counts",
    "window_ntile_percentiles",
    "window_trailing_interval_sum",
    # -- last seen round 7 (alphabetical, first 23) --
    "dedup_bloom_decontaminate",
    "dedup_semantic",
    "dedup_semantic_kmeans",
    "geo_collect_aggr",
    "managed_add_files_mapped",
    "managed_changelog_apply",
    "managed_changelog_mor",
    "managed_cow_delete",
    "managed_cow_update",
    "managed_default_columns",
    "managed_dv_delete",
    "managed_encrypted_roundtrip",
    "managed_eq_delete",
    "managed_geo_encodings_scan",
    "managed_metadata_columns",
    "managed_metrics_truncate_scan",
    "managed_mor_delete",
    "managed_mor_merge",
    "managed_mor_update",
    "managed_posdelete_compaction",
    "managed_row_lineage",
    "managed_snapshot_lineage",
    "managed_timestamp_ns_scan",
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
