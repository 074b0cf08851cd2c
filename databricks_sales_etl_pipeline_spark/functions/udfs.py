"""UDF surface (SURVEY §2.6 F1): the sanctioned escape hatch.

Policy (SURVEY §4.3.5 / pyspark guide): built-in functions first — they stay
JVM-side inside whole-stage codegen. When Python is unavoidable, Arrow-batched
pandas UDFs only (10–100× over row-at-a-time); row UDFs are banned from hot
paths. The example here is deliberately expressible as built-ins too — the
oracle proves the pandas UDF computes exactly what the SQL does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query


def fee_adjusted():
    """Vectorized per-row math on an Arrow batch (IEEE-deterministic, so the
    DuckDB oracle reproduces it bit-for-bit). Built lazily — pandas_udf
    type-parsing needs an active SparkSession."""

    @pandas_udf(DoubleType())
    def _udf(value: pd.Series) -> pd.Series:
        return value * 0.97 + 1.5

    return _udf


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, value, value * 0.97 + 1.5 AS adjusted
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — scalar pandas UDF over events.value."""
    e = load(spark, sf_dir, "events")
    return e.select("event_id", "value", fee_adjusted()(F.col("value")).alias("adjusted"))
