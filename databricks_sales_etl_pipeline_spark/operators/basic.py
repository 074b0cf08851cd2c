"""Projection / filter / derivation operators (SURVEY §2.2, P1–P6).

Reference parity: column projection (`01_project_setup_and_ingestion.py:200`),
derived money column (`01:164`, `03_scheduling_automation.py:98`), string→date
typing (`01:163`, `03:97`), range filters (`03:147-153`).

All of these are single narrow transformations — no shuffle; Catalyst pushes
the filters and the column pruning into the parquet scan, so at 100 TB each
query reads only the referenced columns and the row groups passing the
predicate (verified via .explain → PushedFilters/ReadSchema in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.functions.money import money2, money2_sql
from databricks_sales_etl_pipeline_spark.registry import query


@query(
    "project_select",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — pure column projection (ref `01:200` select("category"))."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query(
    "derive_total_amount",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {money2_sql('l_extendedprice * (1 - l_discount)')} AS total_amount
    FROM lineitem
    """,
)
def derive_total_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — derived money column, the reference's
    `total_amount = round(quantity*price, 2)` (`01:164`) re-targeted at
    lineitem's discounted extended price."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_amount"),
    )


@query(
    "cast_to_date",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d-%m-%Y') AS order_date_str,
           CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y') AS DATE)
               AS order_date
    FROM orders
    """,
)
def cast_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — the Bronze→Silver typing step: string `dd-MM-yyyy` → DateType
    (ref `01:163` `to_date(col("order_date"), "dd-MM-yyyy")`). Testdata ships
    real timestamps, so we round-trip through the reference's string format
    to exercise both directions."""
    o = load(spark, sf_dir, "orders")
    as_str = F.date_format("o_orderdate", "dd-MM-yyyy").alias("order_date_str")
    return o.select(
        "o_orderkey",
        as_str,
        F.to_date(as_str, "dd-MM-yyyy").alias("order_date"),
    )


@query(
    "filter_range",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_totalprice > 200000.0
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — comparison-predicate filters (ref `03:147-153` date-window
    monitor). Both predicates push down to the parquet scan."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_totalprice") > 200000.0)
    ).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_day"),
        "o_totalprice",
    )


@query(
    "filter_expr_string",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 300000.0
    """,
)
def filter_expr_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — SQL-string predicate front-end (ref `01:189` `where('count > 1')`):
    the engine accepts expression strings interchangeably with Column exprs."""
    o = load(spark, sf_dir, "orders")
    return o.where("o_orderstatus = 'F' AND o_totalprice > 300000.0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "conditional_expr",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders
    """,
)
def conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — when/otherwise conditional projection (ref `01:173` null-check
    CASE shape, generalized to banding)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )
