"""Storage-partitioned (co-bucketed) join: plan shape + correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_geo_poc_spark.session import load_table
from iceberg_geo_poc_spark.table.bucketing import (
    assert_no_shuffle,
    storage_partitioned_join,
)


def test_spj_plan_has_no_join_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    j = storage_partitioned_join(spark, orders, items, ["o_orderkey"], num_buckets=8)
    # no Exchange on either side: buckets align, merge join is local
    assert_no_shuffle(j)
    # correctness vs the plain (shuffling) join
    expected = orders.join(items, "o_orderkey").count()
    assert j.count() == expected
