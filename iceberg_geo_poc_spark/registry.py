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
    # Round-14 rotation.  Recomputed this session from CORRECTNESS_r01-r13
    # vs the registry: 5 never-driver-seen round-14 registrations first,
    # then the longest-unseen rows oldest-first — all 28 remaining r8
    # rows, then the first 17 r9 rows (alphabetical) fill the 50-slot
    # window.  Staleness floor moves r8 -> r9 when CORRECTNESS_r14 lands
    # (17 of 50 r9 rows re-verify this round; the remaining 33 lead
    # round 15).
    # -- round-14 registrations (never driver-seen) --
    "managed_glue_catalog_roundtrip",
    "managed_dynamodb_catalog_roundtrip",
    "managed_snowflake_readonly_resolve",
    "rest_catalog_sigv4_http",
    "managed_glue_lock_manager_roundtrip",
    # -- last seen round 8 (all 28 remaining) --
    "managed_theta_sketch_ndv",
    "managed_time_travel",
    "multimodal_augment_flips",
    "multimodal_resize_box",
    "pipeline_span_corruption",
    "pipeline_zipdataset_extract",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "retrieval_bm25",
    "retrieval_hard_negatives",
    "retrieval_hybrid_rrf",
    "retrieval_splade_sparse",
    "sample_coreset_kcenter",
    "sample_temperature_mixture",
    "sample_weighted_aes",
    "sim_hamming_rerank",
    "sim_hamming_topk",
    "sim_ivf_knn",
    "sim_knn_cosine_topk",
    "sql_ctas_roundtrip",
    "sql_view_roundtrip",
    "stream_static_enrichment",
    "text_language_id",
    "text_lm_perplexity",
    "text_perplexity_buckets",
    "text_quality_scores",
    "text_token_stats",
    "text_unicode_normalize",
    # -- last seen round 9 (alphabetical, first 17) --
    "agg_collect_stats_per_nation",
    "agg_cube_orders",
    "agg_distinct_customers_per_status",
    "agg_rollup_lineitem_flags",
    "cte_monthly_order_volume",
    "distinct_flag_combinations",
    "join_anti_customers_without_orders",
    "join_cross_region_pairs",
    "join_full_outer_nation_activity",
    "join_left_outer_order_counts",
    "join_semi_customers_with_orders",
    "join_spj_bucketed_revenue",
    "managed_scd2_history",
    "pipeline_fim_transform",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_priority_by_linestatus",
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
