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
    # Round-10 rotation.  After round 9, all 251 then-registered queries
    # had green driver rows (zero never-seen), so the window is (a) every
    # round-10 REGISTRATION hoisted as it lands, then (b) the
    # longest-unseen rows oldest-first.  Last-seen over
    # CORRECTNESS_r01-r09: r2:5, r3:14, r4:37, r5:48, r7:47, r8:50,
    # r9:50 — the 5 r2 rows, all 14 r3 rows, and the first 19 r4 rows
    # (alphabetical) fill the 50 slots.  All locally oracle-green via
    # tools/driver_sim.py.
    # -- round-10 registrations --
    "rest_paginated_catalog",
    "sim_matryoshka_managed",
    "managed_encrypted_pruned_scan",
    "dedup_chunk_level",
    "text_gopher_rules",
    "pipeline_block_spans",
    "stream_overwrite_sink",
    "retrieval_margin_bitext",
    "stream_outer_join",
    "stream_datasource_write_sink",
    "managed_merge_conditional",
    "pipeline_preference_pairs",
    # -- re-verification picks: last seen round 2 --
    "agg_grouping_sets_events",
    "multimodal_feature_extract",
    "outlier_filter_event_values",
    "profile_event_columns",
    "scalar_json_extract",
    # -- last seen round 3 --
    "dedup_cluster_reps",
    "dedup_ngram_jaccard",
    "geo_covers_quadrant_counts",
    "geo_distance_filter",
    "geo_points_in_window",
    "geo_polygon_join_counts",
    "geo_spatial_join_counts",
    "sim_embedding_neardup",
    "sim_lsh_bucket_knn",
    "stream_datasource_read",
    "stream_stateful_user_counts",
    "stream_table_sink",
    "text_fingerprint",
    "text_redact_pii",
    # -- last seen round 4 (alphabetical; the remaining 18 r4 rows lead
    #    round 11's window) --
    "agg_approx_distinct_users",
    "dedup_contamination_check",
    "dedup_incremental_new_docs",
    "dedup_minhash_signatures",
    "managed_add_files",
    "managed_avro_roundtrip",
    "managed_branch_write",
    "managed_changelog",
    "managed_changelog_updates",
    "managed_compaction_roundtrip",
    "managed_date_pruned_scan",
    "managed_fast_append_pruning",
    "managed_geo_pruned_scan",
    "managed_geometry_promotion",
    "managed_maintenance_cycle",
    "managed_metadata_tables_summary",
    "managed_nan_pruned_scan",
    "managed_overwrite_by_filter",
    "managed_partition_evolution",
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
