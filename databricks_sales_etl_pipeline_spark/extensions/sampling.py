"""Sampling operators (100 TB posture: debugging/profiling slices).

Systematic (modulo-key) sampling is deterministic and oracle-checkable;
Bernoulli sampling (df.sample) is seed-stable within Spark but not across
engines, so it's exposed as a library fn + rows-only query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.extensions.chunking import (
    md5_band,
    md5_band_sql,
)
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


_W_CAP = 500          # chars at/above this → weight 1.0
_W_MOD = 4294967296   # 2^32 — md5_band's full 8-hex-digit range


@query(
    "ext_sample_weighted",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {md5_band_sql("doc_id", _W_MOD, "wsamp:")} * {_W_CAP} <
          CAST(least(n_chars, {_W_CAP}) AS BIGINT) * {_W_MOD}
    """,
)
def ext_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling: accept doc i with probability
    w_i = min(n_chars, cap)/cap — the curriculum / quality-weighted
    selection step of a training-data pipeline. Acceptance is a pure
    integer comparison on a cross-engine md5 band (band·cap < w_int·2³²),
    so the sample is layout-independent, reproducible on any cluster, and
    hash-checked against DuckDB. Zero shuffles: a scan with a pushed-down
    deterministic predicate."""
    d = load(spark, sf_dir, "documents")
    band = md5_band(F.col("doc_id"), _W_MOD, "wsamp:")
    w_int = F.least(F.col("n_chars"), F.lit(_W_CAP)).cast("long")
    return d.where(band * _W_CAP < w_int * F.lit(_W_MOD)).select(
        "doc_id", "source", "n_chars"
    )
