"""Declared relational surface (SURVEY.md §2.11) with DuckDB oracles.

The reference (an Iceberg fork) executes no relational operators itself
— joins/aggs/windows are host-engine surface (reference:
spark/v3.5/spark/src/main/java/org/apache/iceberg/spark/source/SparkTable.java
registers the table; Spark SQL runs the query).  Here that surface is
declared as stock DataFrame plans so Catalyst keeps full pushdown /
broadcast / AQE freedom, and each is hash-checked against DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_geo_poc_spark.registry import query
from iceberg_geo_poc_spark.session import load_table


# --------------------------------------------------------------------------
# TPC-H-shaped aggregations and joins
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # customer is tiny relative to lineitem at any SF -> broadcast it;
    # orders⋈lineitem shuffles on orderkey (AQE may still broadcast orders).
    return (
        l.filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # dims (supplier/nation/region/customer) broadcast; fact chain shuffles once.
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_customers_by_spend",
    oracle="""
    SELECT o_custkey AS custkey,
           ROUND(SUM(o_totalprice), 2) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, custkey
    LIMIT 10
    """,
)
def top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), F.asc("custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Join flavors: outer / semi / anti / full / cross
# --------------------------------------------------------------------------

@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer_nation_activity",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("name_b"))
    return (
        a.crossJoin(b).filter(F.col("key_a") < F.col("key_b")).select("name_a", "name_b")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           DATEDIFF('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS gap_days
    FROM orders
    """,
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_rank_parts_by_price",
    oracle="""
    SELECT p_partkey, p_brand,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_dense_rank,
           NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_quartile
    FROM part
    """,
)
def window_rank_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


# --------------------------------------------------------------------------
# Aggregation flavors: distinct, rollup, cube, grouping sets
# --------------------------------------------------------------------------

@query(
    "agg_distinct_customers_per_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_rollup_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "agg_grouping_sets_events",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)))
    """,
)
def agg_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)))
        """
    )


@query(
    "agg_collect_stats_per_nation",
    oracle="""
    SELECT c_nationkey AS nationkey,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 3) AS std_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_stats_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 3).alias("std_bal"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.exceptAll(s.distinct())


@query(
    "distinct_flag_combinations",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_combinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


# --------------------------------------------------------------------------
# Scalar function surface
# --------------------------------------------------------------------------

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                         AS name_upper,
           LENGTH(c_name)                        AS name_len,
           SUBSTRING(c_name, 1, 8)               AS name_prefix,
           CONCAT(c_mktsegment, ':', c_name)     AS seg_name,
           REPLACE(c_name, 'Customer', 'Cust')   AS name_short,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                               AS order_year,
           MONTH(o_orderdate)                              AS order_month,
           DAY(o_orderdate)                                AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)  AS order_month_start,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 50000), 2)   AS price_dev,
           CAST(CEIL(l_quantity) AS BIGINT)          AS qty_ceil,
           CAST(FLOOR(l_quantity / 7) AS BIGINT)     AS qty_div7,
           ROUND(SQRT(l_extendedprice), 4)           AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)         AS price_ln,
           ROUND(POW(1 + l_discount, 2), 6)          AS disc_sq,
           CAST(l_orderkey % 13 AS BIGINT)           AS key_mod
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("price_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 13).cast("bigint").alias("key_mod"),
    )


@query(
    "scalar_conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label
    FROM orders
    """,
)
def scalar_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
    )


@query(
    "scalar_array_word_explode",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS word
      FROM documents
    )
    WHERE LENGTH(word) >= 4
    GROUP BY word
    HAVING COUNT(*) >= 5
    """,
)
def scalar_array_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"))
        .filter(F.length("word") >= 4)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# --------------------------------------------------------------------------
# Subqueries / CTEs
# --------------------------------------------------------------------------

@query(
    "subquery_in_rich_customers",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def subquery_in_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders_sq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq WHERE c_acctbal > 5000)
        """
    )


@query(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq2")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice FROM orders_sq2
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_sq2)
        """
    )


@query(
    "cte_monthly_order_volume",
    oracle="""
    WITH monthly AS (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS volume
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, volume,
           ROUND(AVG(volume) OVER (ORDER BY month
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             AS volume_3mo_avg
    FROM monthly
    """,
)
def cte_monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cte")
    return spark.sql(
        """
        WITH monthly AS (
          SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
                 COUNT(*) AS n_orders,
                 ROUND(SUM(o_totalprice), 2) AS volume
          FROM orders_cte GROUP BY 1
        )
        SELECT month, n_orders, volume,
               ROUND(AVG(volume) OVER (ORDER BY month
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                 AS volume_3mo_avg
        FROM monthly
        """
    )


# --------------------------------------------------------------------------
# Temporal joins: as-of and range (SURVEY.md §2.11 "range/interval joins as
# theta-joins; as-of join via window").  Both are written as the SCALABLE
# plan — one equi-shuffle — rather than the naive theta-join the oracle
# uses, so the hash-match also proves the rewrite is semantics-preserving.
# --------------------------------------------------------------------------

@query(
    "join_asof_last_order",
    oracle="""
    SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_date
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id, e.user_id
    """,
)
def join_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the most recent order date of that user.

    Spark-first plan: tag + union both streams, one shuffle on the key,
    then ``last(value, ignorenulls)`` over an ordered window — the
    classic sort-merge as-of that scales linearly, vs the oracle's
    O(n*m) inequality join.  Orders sort before events at equal
    timestamps (side 0 < 1) to honor the <= bound.
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    o = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.col("o_orderdate").alias("odate"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
    )
    e = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("timestamp").alias("odate"),
        F.col("event_id"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.unionByName(e)
        .withColumn("last_order_date", F.last("odate", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", F.col("k").alias("user_id"), "last_order_date")
    )


@query(
    "join_range_event_bursts",
    oracle="""
    SELECT a.event_id, COUNT(*) AS n_follow
    FROM events a
    JOIN events f ON f.ts > a.ts AND f.ts < a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    """,
)
def join_range_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: events in the hour after each error event.

    Spark-first plan: both sides bucketed to the hour; each 1-hour query
    window spans at most 2 buckets, so the anchor side explodes to
    {b, b+1} and the join is a plain equi-join on the bucket key with
    the exact time predicate as a post-filter.  One hash shuffle instead
    of the oracle's quadratic inequality join; bucket width = window
    width keeps the blow-up factor at exactly 2.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    anchors = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("event_id"), F.col("ts").alias("a_ts"))
        .withColumn("b0", bucket(F.col("a_ts")))
        .withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
        .drop("b0")
    )
    followers = ev.select(F.col("ts").alias("f_ts")).withColumn(
        "bucket", bucket(F.col("f_ts"))
    )
    return (
        anchors.join(followers, "bucket")
        .filter(
            (F.col("f_ts") > F.col("a_ts"))
            & (F.col("f_ts") < F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


# --------------------------------------------------------------------------
# Additional TPC-H-shaped queries (adapted to the testdata's columns)
# --------------------------------------------------------------------------

@query(
    "q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > l.l_tax)
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS correlated subquery -> left-semi join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount") > F.col("l_tax")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: 3-way join + agg + deterministic top-k; the dimension
    (customer) side stays broadcastable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + conditional aggregation."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: broadcast dim join + conditional ratio aggregate."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_big_quantity_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, o.o_orderkey
    HAVING SUM(l.l_quantity) > 120
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q18_big_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: join + group-having + deterministic top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            F.sum("l_quantity").alias("_qty"),
        )
        .filter(F.col("_qty") > 120)
        .select(
            "c_custkey", "o_orderkey", F.round(F.col("_qty"), 2).alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicates spanning both join sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "agg_approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type.

    HLL sketch estimates are engine-specific, so the raw approximation is
    not directly comparable across engines.  Instead of a rows-only check,
    the query emits the *accuracy contract* as data: ``approx_within_5pct``
    asserts ``abs(approx - exact)/exact <= 0.05`` (Spark's default rsd is
    0.05).  The oracle computes the exact distinct count and asserts the
    boolean TRUE — so the driver hash-check verifies BOTH the exact counts
    and that Spark's HLL honors its error bound on this data."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "join_spj_bucketed_revenue",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 6) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_spj_bucketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-partitioned join: orders ⋈ lineitem with both sides
    co-bucketed on the order key, so the join itself is a sort-merge
    over aligned buckets with ZERO shuffle of either fact table
    (reference SparkPartitioningAwareScan.java parity; see
    table/bucketing.py and test_spj_plan_has_no_join_shuffle)."""
    from iceberg_geo_poc_spark.table.bucketing import storage_partitioned_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    j = storage_partitioned_join(
        spark, orders, items, ["o_orderkey"], num_buckets=16, cache_key=sf_dir
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 6).alias("total_qty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p.p_partkey, l.l_suppkey, ROUND(l.l_extendedprice, 2) AS best_price
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 10
      AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p.p_partkey, l.l_suppkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar-min subquery (argmin per group).
    Spark plan: per-part min aggregated once, then an equi-join back —
    the decorrelated form Catalyst produces for the SQL variant."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    li = load_table(spark, sf_dir, "lineitem")
    best = li.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            best,
            (part.p_partkey == F.col("bk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(
            part.p_partkey,
            "l_suppkey",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
        .orderBy("p_partkey", "l_suppkey")
    )


@query(
    "q11_important_parts",
    oracle="""
    SELECT l_partkey, ROUND(SUM(l_extendedprice * l_quantity), 2) AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice * l_quantity) >
           (SELECT SUM(l_extendedprice * l_quantity) * 0.0005 FROM lineitem)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: HAVING against a scalar subquery over the same fact —
    one full-table scalar agg broadcast into the group filter."""
    li = load_table(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * F.col("l_quantity")).alias("v")
    # one-plan scalar subquery: broadcast the 1-row aggregate into the
    # HAVING filter instead of collecting it to the driver (single lazy
    # job; the grouped side and the scalar side share the lineitem scan
    # via exchange reuse)
    threshold = li.agg(
        (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) * 0.0005).alias(
            "__threshold"
        )
    )
    return (
        li.select("l_partkey", val)
        .groupBy("l_partkey")
        .agg(F.sum("v").alias("raw"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("raw") > F.col("__threshold"))
        .select("l_partkey", F.round("raw", 2).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregated CTE reused twice (join input + scalar max)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # the explicit NOT NULL on the join key keeps the two uses of
    # `revenue` (join input + scalar MAX) canonically identical, so
    # Spark's exchange reuse materializes the shuffle once — without it
    # the join branch alone gets isnotnull() pushed down and the two
    # subplans stop matching
    revenue = (
        li.filter(F.col("l_suppkey").isNotNull())
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    # one-plan scalar subquery: no cache(), no second job
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(
            revenue.crossJoin(F.broadcast(mx)).filter(
                F.col("total_revenue") == F.col("__max_rev")
            ),
            sup.s_suppkey == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated AVG subquery -> per-part avg join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avgq, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-avg filter + NOT EXISTS anti join + group."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # one-plan scalar subquery (see q11): broadcast the 1-row average
    avg_pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: 6-way join with a disjunctive nation-pair filter;
    both nation dims broadcast, the OR pair filter applied post-join
    (Catalyst pushes each disjunct to the respective dim scan)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM all_sales GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: 8-way star join + conditional-aggregate ratio."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): 5-way join + expression agg by
    (nation, year).  The schema carries no partsupp, so supply cost is
    the deterministic surrogate ``0.1 * p_retailprice`` — the plan shape
    (two broadcast dims, one fact-fact join, partial agg) is the point."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left-outer join with a join-side filter (customers
    with zero qualifying orders must survive as c_count = 0), then a
    distribution-of-counts re-aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q16_supplier_count_by_part_attrs",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-count of suppliers per part attribute triple
    with a NOT IN anti-join exclusion (lineitem standing in for
    partsupp as the part-supplier bridge; negative account balance
    stands in for the complaints filter)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 9, 14, 23, 36, 45, 49])
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q20_excess_shipment_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey)
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 300.0)
    ORDER BY s.s_name, s.s_suppkey
    """,
)
def q20_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: semi-join of suppliers against an aggregated shipment
    subquery (threshold on summed quantity of a part family in a
    year)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): correlated EXISTS
    + NOT EXISTS against the same fact table, expressed as one
    aggregated self-join — counts of other-supplier lines and
    other-supplier 'R' lines per (order, supplier) computed in a single
    shuffle instead of two correlated probes (returnflag 'R' stands in
    for the receipt-after-commit lateness predicate)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    # line granularity (no distinct): Q21 counts waiting LINES, and the
    # oracle's COUNT(*) over l1 does the same
    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(per_order, "l_orderkey")
        # other suppliers exist on the order, and none of THEM returned
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "ts_gapfill_hourly_counts",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events WHERE event_type = 'purchase'),
    cal AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds),
    actual AS (
      SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT c.hour_start, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events
    FROM cal c LEFT JOIN actual a USING (hour_start)
    ORDER BY c.hour_start
    """,
)
def ts_gapfill_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: hourly purchase counts with ZERO rows
    for silent hours — the resample/densify primitive every monitoring
    pipeline needs.  The dense calendar comes from one ``F.sequence``
    over the min/max bounds (codegen, no driver loop) exploded and
    left-joined against the actual per-hour aggregate; at scale the
    calendar side is tiny (one row per hour) and broadcasts."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cal = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_start")
        )
    )
    return (
        cal.join(actual, "hour_start", "left_outer")
        .select(
            "hour_start",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("hour_start")
    )


@query(
    "agg_approx_percentile_contract",
    oracle="""
    WITH exact AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type)
    SELECT event_type, TRUE AS p50_ok, TRUE AS p95_ok
    FROM exact ORDER BY event_type
    """,
)
def agg_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch — single pass,
    mergeable partial aggregates, the percentile that scales) checked
    as a bounded-error CONTRACT stated in RANK space, which is what the
    sketch actually guarantees: the returned value's empirical rank
    within its group must land within ``p ± (0.005 + 2/n)`` of the
    requested percentile (GK bound is ``1/accuracy``; the ``2/n`` term
    absorbs value discreteness/ties).  A value-distance bound would be
    wrong: in a sparse tail the nearest *data point* to the exact
    continuous quantile can be arbitrarily far in value while being
    rank-exact."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("a50"),
        F.percentile_approx("value", 0.95, 10000).alias("a95"),
    )
    ranked = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("a50")).cast("double")).alias("r50"),
            F.avg((F.col("value") <= F.col("a95")).cast("double")).alias("r95"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    tol = F.lit(0.005) + F.lit(2.0) / F.col("n")
    return ranked.select(
        "event_type",
        (F.abs(F.col("r50") - F.lit(0.5)) <= tol).alias("p50_ok"),
        (F.abs(F.col("r95") - F.lit(0.95)) <= tol).alias("p95_ok"),
    ).orderBy("event_type")


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN (SELECT DISTINCT o_orderpriority FROM orders) d
      ON o.o_orderpriority = d.o_orderpriority
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join correctness: orders join a 5-row dimension on
    o_orderpriority — the classic one-hot-key-per-reducer shape.  The
    salt spreads each hot key over 16 shards (explode on the dim side,
    uniform shard on the fact side) and the result must equal the plain
    join exactly (operators/skew.py::salted_join)."""
    from iceberg_geo_poc_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    dim = o.select("o_orderpriority").distinct()
    j = salted_join(o, dim, on=["o_orderpriority"])
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "window_ntile_percentiles",
    oracle="""
    SELECT c_custkey,
           NTILE(10) OVER w AS decile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
)
def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window-function family — ntile / percent_rank /
    cume_dist over a global ordering (the remaining analytic functions
    of SURVEY §2.11's window row)."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            F.ntile(10).over(w).alias("decile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_custkey")
    )


@query(
    "window_trailing_interval_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)
             AS trail30
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_trailing_interval_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame: trailing-30-day revenue per
    customer.  Spark's rangeBetween needs a numeric ordering key, so the
    timestamp is projected to epoch seconds and the frame is
    [-30*86400, 0] — exactly DuckDB's ``RANGE BETWEEN INTERVAL 30 DAYS
    PRECEDING`` (both frames are boundary- and peer-inclusive, so ties
    in o_orderdate see identical frames and the sums agree exactly)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("trail30"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "agg_pivot_event_types",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           ROUND(AVG(value) FILTER (event_type = 'click'), 6) AS click,
           ROUND(AVG(value) FILTER (event_type = 'error'), 6) AS error,
           ROUND(AVG(value) FILTER (event_type = 'purchase'), 6) AS purchase,
           ROUND(AVG(value) FILTER (event_type = 'signup'), 6) AS signup,
           ROUND(AVG(value) FILTER (event_type = 'view'), 6) AS view,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event type (explicit value list — the
    deterministic form that avoids the extra distinct-scan job Spark
    otherwise runs to discover pivot values; at scale the value list is
    the difference between one shuffle and two).  Count rides along to
    pin the group sizes."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(
            F.round(F.avg("value"), 6).alias("avg"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    n = None
    for t in types:
        c = F.coalesce(F.col(f"{t}_cnt"), F.lit(0))
        n = c if n is None else (n + c)
    return piv.select(
        "user_bucket",
        *[F.col(f"{t}_avg").alias(t) for t in types],
        n.cast("long").alias("n"),
    ).orderBy("user_bucket")


@query(
    "agg_two_phase_skew",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_two_phase_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for hot keys: count per event_type
    via (key, shard) partials then a key-level combine
    (operators/skew.py::two_phase_count) — the hot key's rows never
    converge on one reducer with unbounded input, and the result equals
    the plain GROUP BY exactly."""
    from iceberg_geo_poc_spark.operators.skew import two_phase_count

    ev = load_table(spark, sf_dir, "events")
    return two_phase_count(ev, "event_type").select(
        "event_type", F.col("n").cast("long").alias("n")
    ).orderBy("event_type")


@query(
    "ts_linear_interpolation",
    oracle="""
    WITH purch AS (
      SELECT date_trunc('hour', ts) AS h, ROUND(AVG(value), 6) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM purch),
    cal AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds),
    joined AS (
      SELECT c.hour_start, p.v FROM cal c LEFT JOIN purch p ON c.hour_start = p.h),
    walls AS (
      SELECT hour_start, v,
             last_value(v IGNORE NULLS) OVER (
               ORDER BY hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hour_start END IGNORE NULLS)
               OVER (ORDER BY hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER (
               ORDER BY hour_start
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hour_start END IGNORE NULLS)
               OVER (ORDER BY hour_start
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM joined)
    SELECT hour_start,
           FLOOR((CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv)
                       * (epoch(hour_start) - epoch(pt))
                       / (epoch(nt) - epoch(pt)) END) * 10000 + 0.5)
             / 10000 AS value_filled,
           (v IS NULL) AS interpolated
    FROM walls
    ORDER BY hour_start
    """,
)
def ts_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation: hourly mean purchase value
    with silent hours filled by interpolating between the nearest
    present hours on both sides — the resample+fill primitive of every
    metrics pipeline.  Spark shape: dense calendar (one ``F.sequence``
    explode) left-joined to the hourly aggregate, then TWO ignore-null
    running windows (last non-null behind, first non-null ahead)
    supply the interpolation walls in a single sort — no self-join,
    no driver loop.  Bounds are the min/max PRESENT hours, so the
    walls always exist and the formula is total."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # the hourly mean is rounded to 6 decimals BEFORE interpolating so
    # both engines interpolate over bit-identical walls (summation
    # order differs between engines; unrounded means can straddle the
    # output's 4-decimal rounding boundary)
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    cal = (
        actual.agg(F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1"))
        .select(
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_start"
            )
        )
    )
    joined = cal.join(actual, "hour_start", "left_outer")
    back = (
        Window.orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.orderBy("hour_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = F.when(F.col("v").isNotNull(), F.col("hour_start"))
    walls = joined.select(
        "hour_start",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(marked, ignorenulls=True).over(back).alias("pt"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(marked, ignorenulls=True).over(fwd).alias("nt"),
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.unix_timestamp("hour_start") - F.unix_timestamp("pt"))
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt"))
    )
    # floor(x*1e4 + 0.5)/1e4 on BOTH engines: half-boundary values are
    # endemic here (5-decimal hourly means), and decimal-based rounding
    # (Spark) vs scaled-double rounding (DuckDB) disagree on them; the
    # shared double formulation is bit-identical across engines
    return walls.select(
        "hour_start",
        (F.floor(filled * 10000 + F.lit(0.5)) / 10000).alias("value_filled"),
        F.col("v").isNull().alias("interpolated"),
    ).orderBy("hour_start")


@query(
    "ts_sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts)
                       - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_n
      FROM marked)
    SELECT user_id, CAST(sess_n AS BIGINT) AS session_no,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_s,
           ROUND(SUM(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, sess_n
    ORDER BY user_id, session_no
    """,
)
def ts_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user event streams cut into sessions
    at >30-minute gaps (the batch twin of stream_session_windows) —
    lag + cumulative-sum session numbering, then one per-session
    aggregate.  Two window passes over the SAME (user_id, ts) sort
    order, so Spark plans a single shuffle + sort and reuses it for
    both windows and the final groupBy — the canonical scale shape
    for sessionizing clickstreams."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap test (unix_timestamp would truncate to
    # whole seconds and disagree with the oracle on boundary gaps)
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1_800_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = ev.withColumn("sess_n", F.sum(new_sess).over(run))
    return (
        numbered.groupBy("user_id", "sess_n")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sess_n").cast("long").alias("session_no"),
            "session_start",
            "n_events",
            "duration_s",
            "total_value",
        )
        .orderBy("user_id", "session_no")
    )
