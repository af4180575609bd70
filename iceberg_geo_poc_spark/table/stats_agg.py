"""Stats-only aggregate fast path: COUNT/MIN/MAX answered from manifests.

Analogue of the reference's aggregate pushdown (reference
spark/.../source/SparkScanBuilder.java:202-274 pushAggregation +
api/.../expressions/AggregateEvaluator.java): when a query is only
COUNT(*)/COUNT(col)/MIN(col)/MAX(col) over the current snapshot, the
answer comes from manifest stats without touching data files.  Bails
out (returns None) exactly when the reference refuses: position deletes
present (SparkScanBuilder.java:248-251) or required stats missing
(allAggregatorsValid :260); callers then fall back to a real scan.
"""

from __future__ import annotations

import re

from iceberg_geo_poc_spark.table.table import Table

_AGG_RE = re.compile(
    r"^\s*(count|min|max)\s*\(\s*(\*|[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$", re.I
)


def try_stats_aggregate(table: Table, aggs: list[str], where=None) -> list | None:
    """Evaluate e.g. ['count(*)', 'min(l_quantity)', 'max(l_shipdate)']
    from manifest stats.  Returns the value row, or None when the fast
    path must bail (deletes present / stats missing / unsupported agg).

    With ``where``, the fast path answers FILTERED aggregates exactly
    when the filter resolves at file granularity: files the inclusive
    evaluator keeps must ALL strict-match (the reference shape — filter
    pushdown eliminates the residual, then pushAggregation runs over
    the pruned scan).  Any partially-matching file bails to a real scan.
    """
    parsed = []
    for a in aggs:
        m = _AGG_RE.match(a)
        if not m:
            return None
        parsed.append((m.group(1).lower(), m.group(2)))

    entries = table._entries()
    if entries.content.isin(["posdel", "eqdel", "dv"]).any():
        return None  # deleted rows make stats counts wrong -> full scan
    data = entries[entries.content == "data"]
    if where is not None and len(data):
        from iceberg_geo_poc_spark.table import vector_eval as V

        sv = V.StatsView(data, table.meta.renames)
        keep = V.might_match(where, sv)
        strict = V.all_match(where, sv)
        if not bool(strict[keep].all()):
            return None  # some kept file only partially matches: residual needed
        data = data[keep]

    # columnar over the flattened stat columns — no per-file Python loop
    # (SURVEY §4.3; the itertuples form is minutes of driver CPU at 10^6
    # files)
    phys = {v: k for k, v in table.meta.renames.items()}
    out = []
    for fn, col in parsed:
        if fn == "count" and col == "*":
            out.append(int(data.record_count.sum()))
            continue
        pcol = phys.get(col, col)
        if fn == "count":
            nu = data.get(f"nu__{pcol}")
            if nu is None and len(data):
                return None  # null count missing: COUNT(col) unanswerable
            if nu is not None and nu.isna().any():
                return None
            out.append(int(data.record_count.sum() - (0 if nu is None else nu.sum())))
            continue
        if fn in ("min", "max"):
            # truncated string bounds are prefixes / incremented
            # prefixes — valid for PRUNING but not exact values, so
            # MIN/MAX over a string column under a truncate metrics
            # mode must fall back to a real scan (the reference's
            # MinAggregate/MaxAggregate make the same refusal via
            # metrics-mode checks in SparkScanBuilder.pushAggregation)
            from iceberg_geo_poc_spark.table import manifest as M

            mode, _n = M.metrics_mode_for(table.meta.properties, pcol)
            is_string = any(
                name == col and typ.strip().upper().startswith("STRING")
                for name, typ in table._ddl_types()
            )
            if mode == "truncate" and is_string:
                return None
        ser = data.get(f"lo__{pcol}" if fn == "min" else f"hi__{pcol}")
        if ser is None:
            if len(data):
                return None  # files exist but no bounds recorded: bail
            out.append(None)
            continue
        if ser.isna().any():
            return None  # missing bounds: bail like allAggregatorsValid
        if ser.empty:
            out.append(None)
            continue
        v = ser.min() if fn == "min" else ser.max()
        out.append(v.item() if hasattr(v, "item") else v)
    return out
