"""Vectorized manifest evaluators must agree element-wise with the
scalar evaluators (which mirror the reference's Inclusive/Strict
MetricsEvaluator), and planning must stay sub-second at 50k files."""

from __future__ import annotations

import json
import random
import time

import numpy as np
import pytest

from iceberg_geo_poc_spark.table import expressions as E
from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table import vector_eval as V
from iceberg_geo_poc_spark.table.manifest import file_stats_of


def _random_entries(rng: random.Random, n: int) -> list[dict]:
    out = []
    for i in range(n):
        rc = rng.randint(1, 100)
        lower, upper, nulls = {}, {}, {}
        # int column a
        if rng.random() < 0.9:
            lo = rng.randint(-50, 50)
            lower["a"] = lo
            upper["a"] = lo + rng.randint(0, 40)
        if rng.random() < 0.9:
            nulls["a"] = rng.choice([0, 0, 1, rc])
        # string column s
        if rng.random() < 0.9:
            lo = rng.choice(["apple", "apricot", "banana", "cherry"])
            hi = rng.choice(["cherry", "damson", "fig"])
            if lo > hi:
                lo, hi = hi, lo
            lower["s"] = lo
            upper["s"] = hi
        if rng.random() < 0.9:
            nulls["s"] = rng.choice([0, 0, 2, rc])
        # double column d with NaN counts (sometimes missing = legacy)
        nans = {}
        if rng.random() < 0.85:
            lo = rng.uniform(-50, 50)
            lower["d"] = lo
            upper["d"] = lo + rng.uniform(0, 40)
        if rng.random() < 0.9:
            nulls["d"] = rng.choice([0, 0, 1, rc])
        if rng.random() < 0.8:
            nans["d"] = rng.choice([0, 0, 0, 1, rc])
        bbox = {}
        if rng.random() < 0.8:
            x0, y0 = rng.uniform(-10, 10), rng.uniform(-10, 10)
            bbox["g"] = [x0, y0, x0 + rng.uniform(0, 5), y0 + rng.uniform(0, 5)]
        out.append(
            {
                "content": "data",
                "file_path": f"/data/f{i}.parquet",
                "file_size": 1000,
                "record_count": rc,
                "sequence_number": 1,
                "snapshot_id": 0,
                "partition": "{}",
                "lower": json.dumps(lower),
                "upper": json.dumps(upper),
                "nulls": json.dumps(nulls),
                "nans": json.dumps(nans),
                "bbox": json.dumps(bbox),
            }
        )
    return out


def _random_predicates(rng: random.Random) -> list[E.Expr]:
    from iceberg_geo_poc_spark.geo.wkt import geometry_from_wkt

    vals_a = [rng.randint(-60, 60) for _ in range(6)]
    vals_s = ["apple", "banana", "damson", "zzz", "ap"]
    preds: list[E.Expr] = []
    for v in vals_a[:3]:
        preds += [
            E.eq("a", v), E.ne("a", v), E.lt("a", v), E.le("a", v),
            E.gt("a", v), E.ge("a", v),
        ]
    preds += [
        E.in_("a", vals_a[:3]), E.not_in("a", vals_a[3:]),
        E.is_null("a"), E.not_null("a"),
        E.eq("s", "banana"), E.lt("s", "cherry"), E.ge("s", "ap"),
        E.starts_with("s", "ap"), E.Predicate("not_starts_with", "s", "ba"),
        E.in_("s", vals_s[:2]), E.not_in("s", vals_s[2:]),
        E.is_null("s"), E.not_null("s"),
        # double column with NaN counts
        E.is_nan("d"), E.not_nan("d"),
        E.eq("d", 0.0), E.ne("d", 0.0), E.lt("d", 10.0), E.le("d", -5.0),
        E.gt("d", 0.0), E.ge("d", 25.0),
        E.in_("d", [0.0, 10.0]), E.not_in("d", [1.0, 2.0]),
        E.is_nan("missing_col"), E.not_nan("missing_col"),
        E.eq("missing_col", 5), E.not_null("missing_col"),
        E.st_intersects("g", geometry_from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
        E.st_covers("g", geometry_from_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")),
        E.AlwaysTrue(), E.AlwaysFalse(),
    ]
    # boolean combinations
    combos = []
    for _ in range(30):
        p1, p2 = rng.choice(preds), rng.choice(preds)
        combos.append(rng.choice([E.And(p1, p2), E.Or(p1, p2), E.Not(p1)]))
    return preds + combos


def test_vectorized_matches_scalar_evaluators():
    rng = random.Random(7)
    entries = M.entries_dataframe(_random_entries(rng, 400))
    data = entries[entries.content == "data"]
    sv = V.StatsView(data)
    for expr in _random_predicates(rng):
        vec_might = V.might_match(expr, sv)
        vec_all = V.all_match(expr, sv)
        for i, row in enumerate(data.itertuples()):
            stats = file_stats_of(row)
            assert vec_might[i] == expr.might_match_file(stats), (
                f"might mismatch: {expr} on row {i}: {stats}"
            )
            assert vec_all[i] == expr.all_rows_match_file(stats), (
                f"all mismatch: {expr} on row {i}: {stats}"
            )


def test_vectorized_respects_renames():
    rng = random.Random(3)
    entries = M.entries_dataframe(_random_entries(rng, 50))
    data = entries[entries.content == "data"]
    # logical name 'alpha' maps to physical stats key 'a'
    sv = V.StatsView(data, renames={"a": "alpha"})
    got = V.might_match(E.eq("alpha", 0), sv)
    want = V.might_match(E.eq("a", 0), V.StatsView(data))
    assert (got == want).all()


def test_planning_50k_files_under_one_second(tmp_path):
    rng = random.Random(11)
    n = 50_000
    lower = [json.dumps({"a": i % 1000}) for i in range(n)]
    upper = [json.dumps({"a": i % 1000 + 5}) for i in range(n)]
    entries = M.entries_dataframe(
        [
            {
                "content": "data",
                "file_path": f"/data/f{i}.parquet",
                "file_size": 1000,
                "record_count": 10,
                "sequence_number": 1,
                "snapshot_id": 0,
                "partition": "{}",
                "lower": lower[i],
                "upper": upper[i],
                "nulls": json.dumps({"a": 0}),
                "bbox": "{}",
            }
            for i in range(n)
        ]
    )
    data = entries[entries.content == "data"]
    where = E.And(E.ge("a", 100), E.lt("a", 120))
    t0 = time.perf_counter()
    sv = V.StatsView(data)
    keep = V.might_match(where, sv)
    strict = V.all_match(where, sv)
    elapsed = time.perf_counter() - t0
    # files with a-range overlapping [100, 120): i%1000 in [95, 120)
    assert keep.sum() == 25 * (n // 1000)
    assert not strict.all()
    assert elapsed < 1.0, f"vectorized planning took {elapsed:.2f}s"


def test_manifest_bounds_skip():
    """Snapshot-level bounds (manifest-list summary analogue) rule out a
    whole manifest without touching per-file stats."""
    rng = random.Random(5)
    entries = M.entries_dataframe(_random_entries(rng, 20))
    bounds = M.manifest_bounds(entries)
    if "a" in bounds:
        lo, hi = bounds["a"]
        assert not V.manifest_might_match(E.gt("a", hi), bounds)
        assert not V.manifest_might_match(E.lt("a", lo), bounds)
        assert V.manifest_might_match(E.eq("a", lo), bounds)
    # unknown columns / unsupported shapes are conservatively kept
    assert V.manifest_might_match(E.eq("zzz", 1), bounds)
    assert V.manifest_might_match(E.Not(E.eq("a", 1)), bounds)
