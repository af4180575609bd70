"""Spark-side scan planning: manifest pruning as a DataFrame filter.

Driver-side pandas/numpy planning (vector_eval) is columnar and fast,
but it still materializes the whole manifest in driver memory — at
100 TB (10^6-10^7 files) the plan itself becomes a distributed job.
The reference hits the same wall and plans via its distributed planning
mode (core/.../ManifestGroup.java planning over manifest partitions);
the Spark-native analogue here evaluates the SAME inclusive-metrics
semantics as a Catalyst filter over the manifest parquet, so pruning
runs where the manifest lives, with only the surviving file paths
collected to the driver.

Semantics contract: ``might_match_column(expr, schema, renames)``
returns a Column that is row-for-row equal to
``vector_eval.might_match(expr, StatsView(entries))`` for the supported
expression surface (AND/OR trees over the 13 columnar predicate ops +
spatial bbox ops).  Unsupported nodes (NOT — which needs the strict
dual — and exotic types) return None and the caller falls back to
pandas planning; the parity test (tests/test_spark_planning.py) checks
equality on a synthetic 100k-entry manifest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from iceberg_geo_poc_spark.table import expressions as E

# default manifest size above which Table.scan plans with Spark instead
# of driver pandas (overridable via table property
# "planning.spark-fallback-threshold")
SPARK_PLAN_THRESHOLD = 200_000


def _lit(v) -> Column:
    return F.lit(v)


def might_match_column(
    expr: E.Expr, columns: set[str], renames: dict | None = None
) -> Column | None:
    """Boolean Column: can the file possibly contain matching rows?

    ``columns`` is the manifest frame's column set (stats columns are
    per-table); missing stats must evaluate conservatively (True), the
    same contract as vector_eval.
    """
    phys = {v: k for k, v in (renames or {}).items()}

    def walk(e: E.Expr) -> Column | None:
        if isinstance(e, E.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, E.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, E.And):
            l, r = walk(e.left), walk(e.right)
            return None if l is None or r is None else l & r
        if isinstance(e, E.Or):
            l, r = walk(e.left), walk(e.right)
            return None if l is None or r is None else l | r
        if isinstance(e, E.SpatialPredicate):
            return _spatial(e)
        if isinstance(e, E.Predicate):
            return _pred(e)
        return None  # NOT (needs the strict dual) and unknown nodes

    def _stat(prefix: str, col: str) -> Column | None:
        name = f"{prefix}__{phys.get(col, col)}"
        return F.col(name) if name in columns else None

    def _null_state(col: str):
        nu = _stat("nu", col)
        if nu is None:
            # no null stats: never all-null-prunable
            return F.lit(False), F.lit(False)
        all_null = nu.isNotNull() & (nu >= F.col("record_count"))
        no_nulls = nu.isNotNull() & (nu == 0)
        return all_null, no_nulls

    def _nan_state(col: str):
        """(nans_only, can_nan, no_nan_known) — same NaN-count semantics
        as vector_eval._nan_state (Spark NaN ordering; unknown = none)."""
        na = _stat("na", col)
        if na is None:
            return F.lit(False), F.lit(False), F.lit(False)
        known = na.isNotNull()
        return (
            known & (na >= F.col("record_count")),
            known & (na > 0),
            known & (na == 0),
        )

    def _pred(e: E.Predicate) -> Column | None:
        op, col, v = e.op, e.column, e.value
        all_null, _no_nulls = _null_state(col)
        nans_only, can_nan, no_nan_known = _nan_state(col)
        nu = _stat("nu", col)
        if op == "is_null":
            if nu is None:
                return F.lit(True)
            return nu.isNull() | (nu > 0)
        if op == "not_null":
            return ~all_null
        if op == "is_nan":
            return ~(no_nan_known | all_null)
        if op == "not_nan":
            return ~nans_only
        lo, hi = _stat("lo", col), _stat("hi", col)
        if lo is None or hi is None:
            # no bounds at all: all-null prunes; all-NaN prunes the
            # below/equality family (NaN sorts greatest)
            out = ~all_null
            if op in ("lt", "le", "eq", "in", "starts_with"):
                out = out & ~nans_only
            return out
        unknown = lo.isNull() | hi.isNull()
        if op == "eq":
            res = (lo <= _lit(v)) & (hi >= _lit(v))
        elif op == "ne":
            res = ~((lo == _lit(v)) & (hi == _lit(v)) & ~can_nan & (F.coalesce(nu == 0, F.lit(True)) if nu is not None else F.lit(True)))
        elif op == "lt":
            res = lo < _lit(v)
        elif op == "le":
            res = lo <= _lit(v)
        elif op == "gt":
            res = hi > _lit(v)
        elif op == "ge":
            res = hi >= _lit(v)
        elif op == "in":
            res = F.lit(False)
            for x in v:
                res = res | ((lo <= _lit(x)) & (hi >= _lit(x)))
        elif op == "not_in":
            same_and_in = F.lit(False)
            for x in v:
                same_and_in = same_and_in | ((lo == _lit(x)) & (hi == _lit(x)))
            no_null_term = (
                F.coalesce(nu == 0, F.lit(True)) if nu is not None else F.lit(True)
            )
            res = ~(same_and_in & no_null_term & ~can_nan)
        elif op == "starts_with":
            p = str(v)
            n = len(p)
            res = (F.substring(lo.cast("string"), 1, n) <= _lit(p)) & (
                F.substring(hi.cast("string"), 1, n) >= _lit(p)
            )
        elif op == "not_starts_with":
            p = str(v)
            starts = lo.cast("string").startswith(p) & hi.cast("string").startswith(p)
            no_null_term = (
                F.coalesce(nu == 0, F.lit(True)) if nu is not None else F.lit(True)
            )
            res = ~(starts & no_null_term)
        else:
            return None
        out = F.when(unknown, F.lit(True)).otherwise(F.coalesce(res, F.lit(True)))
        if op in ("gt", "ge"):
            # NaN rows match any gt/ge finite literal
            out = F.when(can_nan, F.lit(True)).otherwise(out)
        elif op in ("lt", "le", "eq", "in", "starts_with"):
            out = F.when(nans_only, F.lit(False)).otherwise(out)
        return F.when(all_null, F.lit(False)).otherwise(out)

    def _spatial(e: E.SpatialPredicate) -> Column | None:
        p = phys.get(e.column, e.column)
        corners = [f"bb__{p}__{c}" for c in ("x0", "y0", "x1", "y1")]
        if not all(c in columns for c in corners):
            return F.lit(True)
        q = e.value.bounds
        if q is None:
            return F.lit(False)
        fx0, fy0, fx1, fy1 = (F.col(c) for c in corners)
        qx0, qy0, qx1, qy1 = (F.lit(x) for x in q)
        has_bbox = (
            fx0.isNotNull() & fy0.isNotNull() & fx1.isNotNull() & fy1.isNotNull()
        )
        if e.op == "st_intersects":
            res = ~((fx1 < qx0) | (qx1 < fx0) | (fy1 < qy0) | (qy1 < fy0))
        elif e.op == "st_covers":
            res = (fx0 <= qx0) & (fy0 <= qy0) & (fx1 >= qx1) & (fy1 >= qy1)
        else:
            return None
        return F.when(has_bbox, res).otherwise(F.lit(True))

    return walk(expr)


def plan_files_spark(
    spark,
    manifest_path: str | list[str],
    where: E.Expr | None,
    renames: dict | None = None,
) -> list[str] | None:
    """Distributed plan: filter the manifest parquet(s) with the pruning
    Column and collect surviving data-file paths.  None = unsupported
    expression (caller falls back to pandas planning)."""
    paths = (
        [manifest_path] if isinstance(manifest_path, str) else list(manifest_path)
    )
    mdf: DataFrame = spark.read.parquet(*paths)
    data = mdf.filter(F.col("content") == "data")
    if where is None:
        return [r.file_path for r in data.select("file_path").collect()]
    cols = set(mdf.columns)
    pred = might_match_column(where, cols, renames)
    if pred is None:
        return None
    return [r.file_path for r in data.filter(pred).select("file_path").collect()]
