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

import json
import re

from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table.table import Table

_AGG_RE = re.compile(
    r"^\s*(count|min|max)\s*\(\s*(\*|[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$", re.I
)


def try_stats_aggregate(table: Table, aggs: list[str]) -> list | None:
    """Evaluate e.g. ['count(*)', 'min(l_quantity)', 'max(l_shipdate)']
    from manifest stats.  Returns the value row, or None when the fast
    path must bail (deletes present / stats missing / unsupported agg).
    """
    parsed = []
    for a in aggs:
        m = _AGG_RE.match(a)
        if not m:
            return None
        parsed.append((m.group(1).lower(), m.group(2)))

    entries = table._entries()
    if entries.content.isin(["posdel", "eqdel"]).any():
        return None  # deleted rows make stats counts wrong -> full scan
    data = entries[entries.content == "data"]

    out = []
    for fn, col in parsed:
        if fn == "count" and col == "*":
            out.append(int(data.record_count.sum()))
            continue
        lows, highs, nulls, rows = [], [], 0, 0
        for row in data.itertuples():
            stats = table._file_stats(row)
            rows += stats.record_count
            if col in stats.nulls:
                nulls += stats.nulls[col]
            elif fn == "count":
                return None  # null count missing: COUNT(col) unanswerable
            lo, hi = stats.lower.get(col), stats.upper.get(col)
            if lo is None or hi is None:
                if fn in ("min", "max"):
                    return None  # missing bounds: bail like allAggregatorsValid
            else:
                lows.append(lo)
                highs.append(hi)
        if fn == "count":
            out.append(int(rows - nulls))
        elif fn == "min":
            out.append(min(lows) if lows else None)
        else:
            out.append(max(highs) if highs else None)
    return out
