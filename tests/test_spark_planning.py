"""Parity: Spark-side manifest planning == pandas/numpy planning.

The distributed planning fallback (table/spark_planning.py) must keep
the exact inclusive-metrics semantics of vector_eval.might_match on a
manifest too large for comfortable driver-side pandas — synthetic 100k
entries here, covering int64 (incl. >2^53 bounds), double, string,
missing stats, null counts, and geometry bboxes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from iceberg_geo_poc_spark.geo import box
from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table import spark_planning as SP
from iceberg_geo_poc_spark.table import vector_eval as V

N = 100_000


@pytest.fixture(scope="module")
def manifest_df():
    rng = np.random.default_rng(77)
    lo_k = rng.integers(0, 2**60, size=N)
    hi_k = lo_k + rng.integers(1, 10_000, size=N)
    lo_v = np.round(rng.uniform(-1000, 1000, size=N), 3)
    hi_v = lo_v + np.round(rng.uniform(0, 50, size=N), 3)
    cities = np.array(["amsterdam", "berlin", "cairo", "dakar", "edinburgh"])
    lo_s = cities[rng.integers(0, 5, size=N)]
    hi_s = np.char.add(lo_s, "~")
    nulls = rng.integers(0, 3, size=N).astype("float64")
    rc = rng.integers(2, 1000, size=N)
    # sprinkle degenerate cases: missing stats, all-null files, >2^53 keys
    miss = rng.random(N) < 0.02
    lo_k_s = pd.array(lo_k, dtype="Int64")
    hi_k_s = pd.array(hi_k, dtype="Int64")
    lo_k_s[miss] = pd.NA
    hi_k_s[miss] = pd.NA
    all_null = rng.random(N) < 0.01
    nulls[all_null] = rc[all_null]
    big = rng.random(N) < 0.05
    lo_k_s[big] = pd.array(
        rng.integers(2**53, 2**62, size=int(big.sum())), dtype="Int64"
    )
    hi_k_s[big] = lo_k_s[big] + 3
    bx0 = rng.uniform(-180, 170, size=N)
    by0 = rng.uniform(-90, 80, size=N)
    df = pd.DataFrame(
        {
            "content": "data",
            "file_path": [f"/data/f{i}.parquet" for i in range(N)],
            "file_size": 1000,
            "record_count": rc,
            "sequence_number": 1,
            "snapshot_id": 1,
            "partition": "{}",
            "lower": "",
            "upper": "",
            "nulls": "",
            "bbox": "",
            "eq_cols": None,
            "lo__k": lo_k_s,
            "hi__k": hi_k_s,
            "lo__v": lo_v,
            "hi__v": hi_v,
            "lo__s": lo_s,
            "hi__s": hi_s,
            "nu__k": nulls,
            "nu__v": np.zeros(N),
            # nan counts for the double column: mostly 0, some partial,
            # some all-NaN, some unknown (legacy manifests)
            "na__v": np.select(
                [rng.random(N) < 0.02, rng.random(N) < 0.03, rng.random(N) < 0.05],
                [np.nan, rc.astype("float64"), np.ones(N)],
                default=0.0,
            ),
            "bb__g__x0": bx0,
            "bb__g__y0": by0,
            "bb__g__x1": bx0 + rng.uniform(0, 5, size=N),
            "bb__g__y1": by0 + rng.uniform(0, 5, size=N),
            M._FLAT_MARKER: True,
        }
    )
    return df


PREDICATES = [
    E.ge("k", 2**59),
    E.ge("k", 2**53 + 1),  # exactness above the float64 mantissa
    E.eq("k", 48831927308626283),
    E.lt("v", -500.0) | E.gt("v", 900.0),
    E.ge("v", 0.0) & E.le("v", 10.0),
    E.eq("s", "berlin"),
    E.in_("s", ["cairo", "dakar"]),
    E.starts_with("s", "ed"),
    E.not_null("k") & E.ge("k", 2**61),
    E.is_null("k"),
    E.ne("v", 3.14),
    E.is_nan("v"),
    E.not_nan("v"),
    E.gt("v", 999.0),  # can_contain_nans keeps NaN files (NaN sorts greatest)
    E.lt("v", -999.0),  # nans_only prunes
    E.is_nan("v") | E.ge("v", 500.0),
    E.not_in("s", ["amsterdam"]),
    E.Predicate("not_starts_with", "s", "ber"),
    E.st_intersects("g", box(0.0, 0.0, 40.0, 40.0)),
    E.st_covers("g", box(10.0, 10.0, 10.5, 10.5)),
    (E.ge("k", 2**58) & E.st_intersects("g", box(-10.0, -10.0, 10.0, 10.0)))
    | E.eq("s", "cairo"),
]


def test_spark_plan_matches_pandas_100k(spark, tmp_path, manifest_df):
    mpath = str(tmp_path / "manifest.parquet")
    M.write_manifest(manifest_df, mpath)
    entries = M.read_manifest(mpath)
    data = entries[entries.content == "data"]
    sv = V.StatsView(data)
    for pred in PREDICATES:
        want = set(data.file_path.to_numpy()[V.might_match(pred, sv)])
        got = SP.plan_files_spark(spark, mpath, pred, renames=None)
        assert got is not None, f"spark planner refused {pred}"
        assert set(got) == want, (
            f"plan mismatch for {pred}: spark={len(got)} pandas={len(want)}, "
            f"diff={set(got) ^ want and sorted(set(got) ^ want)[:5]}"
        )


def test_spark_plan_unsupported_falls_back(spark, tmp_path, manifest_df):
    mpath = str(tmp_path / "manifest2.parquet")
    M.write_manifest(manifest_df.head(100), mpath)
    # a bare NOT node needs the strict dual -> planner must decline, not
    # guess (the expression API usually push-negates, so build it raw)
    assert SP.plan_files_spark(spark, mpath, E.Not(E.eq("k", 5)), None) is None


def test_threshold_triggers_spark_path(spark, tmp_path, manifest_df, monkeypatch):
    """End-to-end: a table whose manifest exceeds the threshold plans via
    Spark and returns the same file set as pandas planning."""
    from iceberg_geo_poc_spark.table import metadata as MD
    from iceberg_geo_poc_spark.table.table import Table, TableScan

    loc = str(tmp_path / "t")
    mrel = os.path.join("metadata", "manifests", "snap-1.parquet")
    M.write_manifest(manifest_df, os.path.join(loc, mrel))
    meta = MD.TableMetadata(
        table_uuid="u",
        location=loc,
        schema_ddl="k BIGINT, v DOUBLE, s STRING",
        partition_spec=[],
        geo_fields={},
        properties={"planning.spark-fallback-threshold": "50000"},
        current_snapshot_id=1,
        snapshots=[
            MD.Snapshot(
                snapshot_id=1, parent_id=None, sequence_number=1,
                timestamp_ms=0, operation="append", manifest=mrel,
            )
        ],
        last_sequence_number=1,
    )
    MD.write_new_metadata(meta, 0)
    t = Table(MD.read_metadata(loc), spark)
    pred = E.ge("k", 2**59)
    scan = TableScan(t, t.current_snapshot(), pred)
    got = set(scan.files())
    sv = V.StatsView(manifest_df)
    want = set(manifest_df.file_path.to_numpy()[V.might_match(pred, sv)])
    assert got == want
    # distributed mode keeps the residual filter on (no strict elision)
    assert scan._residual_noop is False
