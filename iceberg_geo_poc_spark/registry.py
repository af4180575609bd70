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
    # Round-13 rotation.  Recomputed this session from CORRECTNESS_r01-r12
    # vs the registry: 4 never-driver-seen round-13 registrations first,
    # then the longest-unseen rows oldest-first — all 24 remaining r7
    # rows, then the first 22 r8 rows (alphabetical) fill the 50-slot
    # window.  Staleness floor moves r7 -> r8 when CORRECTNESS_r13 lands.
    # -- round-13 registrations (never driver-seen) --
    "managed_delta_snapshot",
    "managed_jdbc_view_lifecycle",
    "managed_nessie_catalog_roundtrip",
    "managed_hive_catalog_roundtrip",
    # -- last seen round 7 (all 24) --
    "multimodal_flac_frames",
    "multimodal_gif_frames",
    "multimodal_log_mel_contract",
    "multimodal_mfcc_contract",
    "multimodal_tiff_roundtrip",
    "multimodal_y4m_frames",
    "pipeline_json_array_explode",
    "pipeline_json_shred",
    "pipeline_quality_classifier",
    "pipeline_url_dedup",
    "pipeline_variant_extract",
    "pipeline_warc_extract",
    "pipeline_webdataset_export",
    "pipeline_webdataset_extract",
    "rest_catalog_lifecycle",
    "sample_reservoir_per_group",
    "sql_show_describe",
    "stream_changelog_cdc",
    "stream_incremental_admission",
    "text_bpe_roundtrip",
    "text_unigram_roundtrip",
    "text_wordpiece_roundtrip",
    "ts_linear_interpolation",
    "ts_sessionize_events",
    # -- last seen round 8 (alphabetical, first 24) --
    "dedup_connected_components",
    "dedup_editdistance_verify",
    "dedup_exact_stats",
    "dedup_keep_best_in_cluster",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "geo_hilbert_clustering",
    "join_asof_last_order",
    "join_range_event_bursts",
    "managed_datasource_write_roundtrip",
    "managed_encrypted_dv_stream",
    "managed_encrypted_key_rotation",
    "managed_encrypted_mor_scan",
    "managed_gdpr_erasure",
    "managed_iceberg_bucket_import",
    "managed_incremental_read",
    "managed_merge",
    "managed_orc_roundtrip",
    "managed_parquet_encrypted_scan",
    "managed_partition_stats",
    "managed_rewrite_table_path",
    "managed_sketch_join_estimate",
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
