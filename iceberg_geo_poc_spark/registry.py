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
    # Round-9 rotation.  After round 8's pass, 243/244 registered queries
    # had green driver rows; the 8 below are every query WITHOUT one —
    # sample_dsir_importance (registered after round 8's window filled,
    # VERDICT r8 "What's wrong #1") plus the 7 round-9 registrations.
    # All locally oracle-green via tools/driver_sim.py.
    "sample_dsir_importance",
    "sql_view_version_travel",
    "pipeline_fim_transform",
    "sample_top_n_per_domain",
    "sim_matryoshka_rerank",
    "managed_scd2_history",
    "rest_view_lifecycle",
    "stream_upsert_sink",
    # -- re-verification picks: the 42 LONGEST-unseen rows (every
    #    remaining round-1 row, computed over CORRECTNESS_r01-r08)
    #    fill the driver's 50-slot window — text_perplexity_buckets was
    #    re-verified in r8 but its plan changed this round (scale-safe
    #    distributed_ntile), covered by the local oracle parity test. --
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
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_priority_by_linestatus",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_big_quantity_orders",
    "q19_disjunctive_filter",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "scalar_array_word_explode",
    "scalar_conditional_case",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "setop_except",
    "setop_intersect",
    "setop_union_distinct",
    "subquery_in_rich_customers",
    "subquery_scalar_above_avg",
    "top_customers_by_spend",
    "window_lag_order_gap",
    "window_rank_parts_by_price",
    "window_running_revenue",
    "window_topk_orders_per_customer",
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
