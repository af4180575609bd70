"""Physical-plan regression checks: the plans we designed for 100 TB
must keep their shape (pushdown reaching the scan, dims broadcast,
whole-stage codegen on the hot path, pruned column reads).

These assert on the optimizer's output rather than results — the
properties that decide whether a query survives a 1000-executor run.
"""

from __future__ import annotations

from iceberg_geo_poc_spark.queries import relational as R


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(R.q6_revenue_forecast(spark, sf_dir))
    # the selective predicates must reach the parquet reader (the plan
    # string truncates long filter lists, so match the prefix)
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan


def test_q6_reads_only_needed_columns(spark, sf_dir):
    plan = _plan(R.q6_revenue_forecast(spark, sf_dir))
    scan_line = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in scan_line  # untouched columns pruned
    assert "l_comment" not in scan_line
    assert "l_extendedprice" in scan_line


def test_q3_broadcasts_dimension_side(spark, sf_dir):
    plan = _plan(R.q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # customer dim side
    assert "PushedFilters" in plan


def test_q1_stays_in_wholestage_codegen(spark, sf_dir):
    df = R.q1_pricing_summary(spark, sf_dir)
    df.collect()  # finalize the adaptive plan so codegen stages appear
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan and "*(2)" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
