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


@query("ext_sample_bernoulli")  # rows-only: xxhash64 has no DuckDB twin
def ext_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-Bernoulli 5% sample: keep rows whose seeded key-hash falls in
    the acceptance band. Unlike df.sample() — whose RNG is seeded PER
    PARTITION, so results change with the split layout — this is a pure
    function of the key: identical on any cluster, any partitioning, any
    engine with the same hash. That reproducibility is what makes sampled
    pipelines debuggable at 100 TB."""
    o = load(spark, sf_dir, "orders")
    accept = F.pmod(F.xxhash64(F.col("o_orderkey"), F.lit(42)), F.lit(100)) < 5
    return o.where(accept).select("o_orderkey", "o_totalprice")
