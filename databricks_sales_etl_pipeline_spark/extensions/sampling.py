"""Sampling operators (100 TB posture: debugging/profiling slices).

Systematic (modulo-key) sampling is deterministic and oracle-checkable;
Bernoulli sampling (df.sample) is seed-stable within Spark but not across
engines, so it's exposed as a library fn + rows-only query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query


@query(
    "ext_sample_systematic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def ext_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-20 systematic sample keyed on the surrogate key — reproducible
    across engines and runs (unlike Bernoulli sampling)."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.pmod(F.col("o_orderkey"), F.lit(20)) == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query("ext_sample_bernoulli")  # rows-only: RNG not reproducible cross-engine
def ext_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (deterministic within Spark — stable row count
    for the driver's rows-only check across runs)."""
    o = load(spark, sf_dir, "orders")
    return o.sample(fraction=0.05, seed=42).select("o_orderkey", "o_totalprice")
