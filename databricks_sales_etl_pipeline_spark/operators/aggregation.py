"""Aggregation operators (SURVEY §2.3, A1–A9 + O2) — the reference's core
competency (`02_business_transformation_gold.py:56,63`).

Scale posture: every groupBy here is a Catalyst HashAggregate pair
(partial map-side combine → shuffle on the group key → final), so the shuffle
carries only one row per (partition, key) — at 100 TB with low-cardinality
keys (returnflag: 3, priority: 5) the shuffle is a few KB regardless of input
size. KPIs are computed in ONE agg pass instead of the reference's per-KPI
collect storm (`02:33-36`, SURVEY §4.3.1).

Money aggregates use exact integer-cents sums (functions/money.py) for
cross-engine float parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.functions.money import (
    cents,
    cents_sql,
    sum_bigint_sql,
)
from databricks_sales_etl_pipeline_spark.registry import query

_ORDER_CENTS = cents_sql("o_totalprice")
_EXT_CENTS = cents_sql("l_extendedprice")


@query("agg_count_star", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — global cardinality (ref `01:109,170`, `03:100`)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "agg_scalar_kpis",
    oracle=f"""
    SELECT COUNT(*) AS total_orders,
           {sum_bigint_sql(_ORDER_CENTS)} AS revenue_cents,
           SUM({_ORDER_CENTS}) / 100.0 AS total_revenue,
           (SUM({_ORDER_CENTS}) / 100.0) / COUNT(*) AS avg_order_value,
           MIN(o_totalprice) AS min_order,
           MAX(o_totalprice) AS max_order
    FROM orders
    """,
)
def agg_scalar_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — all scalar KPIs in ONE aggregation pass (ref computes them as 4
    separate jobs at `02:33-36` / dict-form `01:194-196` — the per-KPI scan
    storm is the anti-pattern we drop, SURVEY §4.3.1)."""
    o = load(spark, sf_dir, "orders")
    rc = F.sum(cents("o_totalprice"))
    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        rc.alias("revenue_cents"),
        (rc / 100.0).alias("total_revenue"),
        ((rc / 100.0) / F.count(F.lit(1))).alias("avg_order_value"),
        F.min("o_totalprice").alias("min_order"),
        F.max("o_totalprice").alias("max_order"),
    )


@query("agg_distinct", oracle="SELECT DISTINCT c_mktsegment AS mktsegment FROM customer")
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — distinct values of one column (ref `01:200`, `02:36`)."""
    c = load(spark, sf_dir, "customer")
    return c.select(F.col("c_mktsegment").alias("mktsegment")).distinct()


@query(
    "agg_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS unique_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — exact count-distinct (ref `02:56,63` countDistinct)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "agg_group_category",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {sum_bigint_sql("CAST(l_quantity AS BIGINT)")} AS sum_qty,
           SUM({_EXT_CENTS}) / 100.0 AS revenue,
           (SUM({_EXT_CENTS}) / 100.0) / COUNT(*) AS avg_revenue,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY revenue DESC
    """,
)
def agg_group_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — the reference's gold_category_analytics shape
    (`02_business_transformation_gold.py:56`: groupBy(category).agg(count,
    round(sum), round(avg), countDistinct).orderBy(desc)), re-targeted at
    lineitem × l_returnflag."""
    li = load(spark, sf_dir, "lineitem")
    rc = F.sum(cents("l_extendedprice"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            (rc / 100.0).alias("revenue"),
            ((rc / 100.0) / F.count(F.lit(1))).alias("avg_revenue"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "agg_group_city",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           SUM({_ORDER_CENTS}) / 100.0 AS revenue,
           (SUM({_ORDER_CENTS}) / 100.0) / COUNT(*) AS avg_order,
           COUNT(DISTINCT o_custkey) AS unique_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY revenue DESC
    """,
)
def agg_group_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — gold_city_analytics shape (`02:63`), re-targeted at orders ×
    o_orderpriority."""
    o = load(spark, sf_dir, "orders")
    rc = F.sum(cents("o_totalprice"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (rc / 100.0).alias("revenue"),
            ((rc / 100.0) / F.count(F.lit(1))).alias("avg_order"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "agg_max_extracted_id",
    oracle="""
    SELECT MAX(CAST(SUBSTRING(c_name, 10) AS INT)) AS max_id,
           MAX(CAST(SUBSTRING(c_name, 10) AS INT)) + 1 AS next_id
    FROM customer
    """,
)
def agg_max_extracted_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — next-surrogate-id: MAX(CAST(SUBSTRING(key, k) AS INT)) + 1
    (ref `03_scheduling_automation.py:31-33` on 'ORD_%04d'; testdata twin is
    customer.c_name = 'Customer#%09d')."""
    c = load(spark, sf_dir, "customer")
    extracted = F.expr("CAST(SUBSTRING(c_name, 10) AS INT)")
    return c.agg(
        F.max(extracted).alias("max_id"),
        (F.max(extracted) + 1).alias("next_id"),
    )


@query(
    "agg_kpi_unpivot",
    oracle=f"""
    WITH k AS (
        SELECT COUNT(*) AS n,
               SUM({_ORDER_CENTS}) AS rc,
               COUNT(DISTINCT o_custkey) AS uc
        FROM orders
    )
    SELECT 'total_revenue' AS metric, rc / 100.0 AS value FROM k
    UNION ALL SELECT 'total_orders', CAST(n AS DOUBLE) FROM k
    UNION ALL SELECT 'avg_order_value', (rc / 100.0) / n FROM k
    UNION ALL SELECT 'unique_customers', CAST(uc AS DOUBLE) FROM k
    """,
)
def agg_kpi_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — the reference's gold_kpi_summary long-format (metric, value)
    table (`02:44-49`, `03:105-115`), produced by ONE agg + stack instead of
    4 collect round-trips."""
    o = load(spark, sf_dir, "orders")
    k = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("rc"),
        F.countDistinct("o_custkey").alias("uc"),
    )
    return k.select(
        # NB: in SQL-string context 100.0 parses as DECIMAL; CAST keeps the
        # arithmetic in doubles so it matches the oracle bit-for-bit
        F.expr(
            "stack(4, "
            "'total_revenue', rc / CAST(100 AS DOUBLE), "
            "'total_orders', CAST(n AS DOUBLE), "
            "'avg_order_value', (rc / CAST(100 AS DOUBLE)) / n, "
            "'unique_customers', CAST(uc AS DOUBLE)"
            ") AS (metric, value)"
        )
    )


@query(
    "topk_recent_days",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           COUNT(*) AS n_orders,
           {sum_bigint_sql(_ORDER_CENTS)} AS revenue_cents
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
    ORDER BY order_day DESC
    LIMIT 7
    """,
)
def topk_recent_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — last-7-days monitor (ref `03:147-153` ORDER BY date DESC LIMIT 7).
    Grouped per-day first so the top-k is deterministic (distinct keys → no
    tie ambiguity); Catalyst plans TakeOrderedAndProject — no global sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .orderBy(F.desc("order_day"))
        .limit(7)
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           {sum_bigint_sql(_ORDER_CENTS)} AS revenue_cents
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — hierarchical rollup with grouping_id (north-star; stock
    Catalyst Expand + HashAggregate, SURVEY §2.6)."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("revenue_cents"),
    )


@query(
    "agg_boolean_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_high_disc,
           bool_and(l_quantity >= 1) AS all_qty_positive,
           bool_or(l_discount = 0) AS any_zero_disc,
           CAST(count_if(l_tax > l_discount) AS BIGINT) AS n_tax_gt_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: count_if, bool_and, bool_or —
    predicate aggregation without CASE scaffolding (and with short-circuit
    semantics at the partial-aggregate level: bool_and/bool_or combine as
    min/max over booleans, so the shuffle carries one bit per group)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_positive"),
        F.bool_or(F.col("l_discount") == 0).alias("any_zero_disc"),
        F.count_if(F.col("l_tax") > F.col("l_discount")).alias("n_tax_gt_disc"),
    )
