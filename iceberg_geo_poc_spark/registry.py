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
    # Round-11 rotation.  Recomputed this session from CORRECTNESS_r01-r10
    # vs the registry: 4 never-driver-seen round-11 registrations first,
    # then the longest-unseen rows oldest-first — all 18 remaining r4
    # rows, then the first 28 r5 rows (alphabetical) fill the 50-slot
    # window.  Staleness floor moves r4 -> r5 when CORRECTNESS_r11 lands.
    # All 50 locally oracle-green via tools/driver_sim.py.
    # -- round-11 registrations (never driver-seen) --
    "rest_metrics_report",
    "managed_merge_by_source",
    "retrieval_margin_bitext_bucketed",
    "managed_merge_insert_values",
    # -- last seen round 4 (all 18) --
    "managed_runtime_filter_join",
    "managed_scan_report",
    "managed_schema_evolution",
    "managed_stats_broadcast_join",
    "managed_table_stats_ndv",
    "managed_wap_publish",
    "managed_write_ordered",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pack_document_batches",
    "sample_deterministic_docs",
    "sample_stratified_by_lang",
    "sql_dml_roundtrip",
    "sql_select_join_pruned",
    "sql_select_metadata_table",
    "sql_select_pruned_scan",
    "sql_select_time_travel",
    "stats_fastpath_agg",
    # -- last seen round 5 (alphabetical, first 29) --
    "agg_approx_percentile_contract",
    "agg_pivot_event_types",
    "agg_two_phase_skew",
    "dedup_duplicate_passages",
    "geo_annulus_join_counts",
    "geo_covers_join_counts",
    "geo_diamond_join_counts",
    "geo_dwithin_join_counts",
    "geo_envelope_aggr",
    "geo_knn_join",
    "geo_ragged_poly_join_counts",
    "geo_sql_function_surface",
    "join_salted_skew",
    "managed_avro_mor_delete",
    "managed_identifier_eq_delete",
    "managed_manifest_consolidation",
    "managed_object_store_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_phash_dedup",
    "pipeline_curate_corpus",
    "q13_customer_order_distribution",
    "q16_supplier_count_by_part_attrs",
    "q20_excess_shipment_suppliers",
    "q21_waiting_suppliers",
    "q9_profit_by_nation_year",
    "sample_domain_mixture",
    "sample_train_val_test_split",
    "sim_ivf_index_search",
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
