"""Data-quality operators (SURVEY §2.3 A6/A7 + §5.1).

The reference's DQ framework (`README.md:39`) is inline checks printed for a
human: per-column null counts (`01_project_setup_and_ingestion.py:173`), PK
duplicate detection (`01:189`), value-range scan (`01:194-198`), domain
cardinality (`01:200`). Here each is a first-class operator returning a
report DataFrame — composable, testable, and computed in single passes
(no per-check scan storm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query


def null_counts(df: DataFrame) -> DataFrame:
    """One row, one column per input column: count of NULLs — single pass
    (ref `01:173` does this with a list comprehension of count(when(isNull)));
    map-side combine means the shuffle is one row per partition."""
    return df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in df.columns]
    )


def duplicate_keys(df: DataFrame, *keys: str) -> DataFrame:
    """Key groups appearing more than once (ref `01:189`
    groupBy(order_id).count().where('count > 1') — SQL HAVING shape)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows")).where("n_rows > 1")


@query(
    "dq_duplicates",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) > 1
    """,
)
def dq_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/P4 — duplicate detection on lineitem.l_orderkey (multi-line orders
    stand in for the reference's duplicate order_ids)."""
    return duplicate_keys(load(spark, sf_dir, "lineitem"), "l_orderkey")


@query(
    "dq_null_counts",
    oracle="""
    SELECT COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS c_custkey_nulls,
           COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS c_name_nulls,
           COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) AS c_nationkey_nulls,
           COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END) AS c_acctbal_nulls,
           COUNT(CASE WHEN c_mktsegment IS NULL THEN 1 END) AS c_mktsegment_nulls
    FROM customer
    """,
)
def dq_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/P5 — per-column null counts in one pass (ref `01:173`)."""
    return null_counts(load(spark, sf_dir, "customer"))


@query(
    "dq_range",
    oracle="""
    SELECT MIN(o_totalprice) AS min_amount,
           MAX(o_totalprice) AS max_amount,
           COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_nonpositive
    FROM orders
    """,
)
def dq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-as-DQ — value-range scan (ref `01:194-198` min/max/avg of
    total_amount + plausibility check). min/max over doubles are
    order-independent → oracle-safe without cents."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_totalprice").alias("min_amount"),
        F.max("o_totalprice").alias("max_amount"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_nonpositive"),
    )


@query(
    "dq_cardinality",
    oracle="""
    SELECT COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_rows
    FROM orders
    """,
)
def dq_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-as-DQ — domain cardinality check (ref `01:200-201`: exactly 5
    categories expected)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_rows"),
    )
