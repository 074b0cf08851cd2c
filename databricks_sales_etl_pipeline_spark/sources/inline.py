"""In-memory row source (SURVEY §2.1 S1).

The reference builds every table from Python dict lists with inferred
schemas (`01_project_setup_and_ingestion.py:107`, `02:44-49`, `03:89`).
Here: explicit StructType always (SURVEY §1.6 — inference only at Bronze
ingest), and the literal-rows path exists for dimension seeds and tests,
never for bulk data (that's sources/generator.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from databricks_sales_etl_pipeline_spark.registry import query
from databricks_sales_etl_pipeline_spark.functions.localrel import local_df

_PAYMENT_SCHEMA = T.StructType(
    [
        T.StructField("payment_id", T.IntegerType(), False),
        T.StructField("payment_method", T.StringType(), False),
        T.StructField("fee_pct", T.DoubleType(), False),
    ]
)

# The reference's payment-method domain (`01:47,73`) as a seeded dimension.
_PAYMENT_ROWS = [
    (1, "Carta di credito", 1.5),
    (2, "Contanti", 0.0),
    (3, "PayPal", 2.2),
]


def inline_rows(
    spark: SparkSession, rows: list[tuple], schema: T.StructType
) -> DataFrame:
    """S1 — dict/tuple list → DataFrame with an explicit schema."""
    return local_df(spark, rows, schema)


@query(
    "src_inline_rows",
    oracle="""
    SELECT payment_id, payment_method, CAST(fee_pct AS DOUBLE) AS fee_pct
    FROM (VALUES
        (1, 'Carta di credito', 1.5),
        (2, 'Contanti', 0.0),
        (3, 'PayPal', 2.2)
    ) AS t(payment_id, payment_method, fee_pct)
    """,
)
def src_inline_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — seeded payment-method dimension from literal rows."""
    return inline_rows(spark, _PAYMENT_ROWS, _PAYMENT_SCHEMA)
