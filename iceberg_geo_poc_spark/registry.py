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


def _load_all() -> None:
    """Import every module that contributes registered queries."""
    global _LOADED
    if _LOADED:
        return
    from iceberg_geo_poc_spark.queries import relational  # noqa: F401

    try:
        from iceberg_geo_poc_spark.queries import geo_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from iceberg_geo_poc_spark.queries import pipeline_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from iceberg_geo_poc_spark.queries import table_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from iceberg_geo_poc_spark.queries import streaming_queries  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
