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
# correctness driver that verifies queries in registration order and caps or
# times out reaches the least-verified entries first.  Rounds 1+2 earned
# green driver rows for 92 of 101 registered queries; the seven below are the
# only ones that never received a driver row (they sat at positions 95-101),
# so they come first.  ``agg_approx_distinct_users`` gained a real oracle
# this round (bounded-relative-error boolean) and is re-hoisted to convert
# its rows-only row into a full hash-checked row; new round-3 queries follow.
_PRIORITY_FIRST = (
    "dedup_contamination_check",
    "dedup_minhash_signatures",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pack_document_batches",
    "sample_deterministic_docs",
    "sample_stratified_by_lang",
    "agg_approx_distinct_users",
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

    for name in reversed(_PRIORITY_FIRST):
        rq = _REGISTRY.pop(name, None)
        if rq is None:
            raise RuntimeError(f"priority query {name!r} missing from registry")
        rest = dict(_REGISTRY)
        _REGISTRY.clear()
        _REGISTRY[name] = rq
        _REGISTRY.update(rest)
    _LOADED = True
