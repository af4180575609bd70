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
    # Round-6 rotation: rounds 1-5 earned green driver rows for 173 of the
    # 181 queries registered at the time; the 8 below are the only ones
    # without a driver row (round-5 registrations past driver slot 50),
    # all locally oracle-green.  Verifying them makes every registered
    # query driver-green; the remaining ~42 driver slots go to new
    # round-6 queries appended after them.
    "pipeline_warc_extract",
    "pipeline_url_dedup",
    "pipeline_webdataset_extract",
    "multimodal_gif_frames",
    "multimodal_flac_frames",
    "multimodal_tiff_roundtrip",
    "multimodal_log_mel_contract",
    "text_bpe_roundtrip",
    # -- new round-6 queries --
    "managed_encrypted_roundtrip",
    "rest_catalog_lifecycle",
    "managed_posdelete_compaction",
    "managed_snapshot_lineage",
    "stream_incremental_admission",
    "multimodal_y4m_frames",
    "managed_geo_encodings_scan",
    "pipeline_webdataset_export",
    "pipeline_quality_classifier",
    "sql_show_describe",
    "dedup_semantic",
    "dedup_semantic_kmeans",
    "managed_dv_delete",
    "text_unigram_roundtrip",
    "managed_changelog_mor",
    "managed_row_lineage",
    "pipeline_json_shred",
    "pipeline_json_array_explode",
    "managed_default_columns",
    "pipeline_variant_extract",
    "text_wordpiece_roundtrip",
    "multimodal_mfcc_contract",
    "sample_reservoir_per_group",
    "ts_linear_interpolation",
    "ts_sessionize_events",
    "managed_metrics_truncate_scan",
    "dedup_bloom_decontaminate",
    "geo_collect_aggr",
    "managed_add_files_mapped",
    "managed_metadata_columns",
    "managed_timestamp_ns_scan",
    "stream_changelog_cdc",
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
