"""Scalar-function surface beyond §2.5: date arithmetic, string functions,
arg-extremum aggregates — breadth coverage with exact oracle twins.
All stay inside whole-stage codegen (no HOFs, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query


@query(
    "date_arithmetic",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT)
               AS ship_delay_days,
           CAST(o.o_orderdate + INTERVAL 30 DAY AS DATE) AS due_day,
           CAST(date_part('quarter', o.o_orderdate) AS INT) AS order_quarter,
           CAST(date_part('dow', o.o_orderdate) AS INT) AS order_dow
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey < 100
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function family: datediff / date_add / quarter / day-of-week.
    NB dayofweek: Spark is 1=Sunday..7, DuckDB dow is 0=Sunday..6 — mapped
    here (dayofweek - 1) so both engines emit the same convention."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    o = load(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "ship_delay_days"
        ),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
    )


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           replace(c_mktsegment, 'URE', '*') AS seg_replaced,
           length(c_name) AS name_len,
           substring(c_name, 10) AS name_digits,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           trim('  ' || c_mktsegment || ' ') AS seg_trimmed,
           contains(c_name, '00') AS has_zeros
    FROM customer WHERE c_custkey < 50
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, pad, replace, length, substring,
    concat, trim, contains."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.replace(F.col("c_mktsegment"), F.lit("URE"), F.lit("*")).alias(
            "seg_replaced"
        ),
        F.length("c_name").alias("name_len"),
        F.expr("substring(c_name, 10)").alias("name_digits"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.contains(F.col("c_name"), F.lit("00")).alias("has_zeros"),
    )


@query(
    "agg_max_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS top_orderkey,
           MAX(o_totalprice) AS top_price,
           arg_min(o_orderkey, o_totalprice) AS bottom_orderkey
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremum aggregates (max_by/min_by ≡ DuckDB arg_max/arg_min):
    the key of the extreme row without a self-join or window. Deterministic
    here because o_totalprice values are continuous (no ties at these
    cardinalities); tie-sensitive pipelines use the row_number form
    (window_topn_per_group) instead."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_orderkey"),
    )
