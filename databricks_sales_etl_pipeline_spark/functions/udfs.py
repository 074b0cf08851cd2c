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
    "udtf_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, len(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')))) AS INT)
               AS pos,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS token
    FROM documents WHERE doc_id < 50
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — Python UDTF (Spark 4 user-defined TABLE function): one input row
    → many output rows, invoked via LATERAL join in SQL. The UDTF is the
    escape hatch for per-row expansion logic too irregular for explode();
    like row UDFs it is the slow path — this one is expressible as explode
    (which is what the oracle does), proving the mechanism correct."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.lower().split()):
                yield i, tok

    spark.udtf.register("tokenize", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize(d.text) t
        WHERE d.doc_id < 50
        """
    )


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


@query(
    "udf_grouped_regression",
    oracle=f"""
    WITH pts AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders
    ), sums AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
               AS slope_cents_per_day
    FROM sums
    """,
)
def udf_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — GROUPED pandas UDF (applyInPandas): per-priority OLS slope of
    order value (cents) against day index, each group handed to Python as
    one pandas DataFrame. Completes the pandas-UDF family (scalar /
    grouped-map / mapInPandas / applyInPandasWithState).

    Exactness: the slope is computed from INTEGER sums (n·Σxy − Σx·Σy) /
    (n·Σxx − Σx²). The raw sums fit int64 (Σxy ≤ n·max(x)·max(y) < 2^62)
    but the PRODUCTS n·Σxy and Σx·Σy reach ~1e19 at sf0.1 — beyond int64 —
    so Python computes them in arbitrary-precision int and the oracle
    widens to HUGEINT before the final double cast (round-2 advisor
    finding: the BIGINT form overflowed DuckDB at sf0.1). The only float
    op is the final division, identical on both sides. numpy
    means/covariances would NOT hash-match.

    Scale: applyInPandas shuffles once on the group key and requires each
    GROUP to fit in one worker's memory — fine for bounded keys like these
    5 priorities; unbounded keys use the two-phase salted form instead."""
    import numpy as np

    o = load(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("y"),
    )

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(dtype="int64")
        y = pdf["y"].to_numpy(dtype="int64")
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [n],
                "slope_cents_per_day": [
                    float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
                ],
            }
        )

    return pts.groupBy("o_orderpriority").applyInPandas(
        slope, "o_orderpriority string, n bigint, slope_cents_per_day double"
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, length(text) AS n_chars,
           len(string_split_regex(text, '\\s+')) AS n_ws_tokens
    FROM documents WHERE doc_id < 100
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — mapInArrow: batch-level Python transform on raw pyarrow
    RecordBatches (no pandas conversion — the zero-copy fast lane under
    every pandas UDF). Computes per-doc char and whitespace-token counts
    with pyarrow.compute kernels; expressible as built-ins (the oracle),
    proving the mechanism exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )

    def counts(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern_regex(text, r"\s+")),
                        pa.int32(),
                    ),
                ],
                ["doc_id", "n_chars", "n_ws_tokens"],
            )

    return d.mapInArrow(counts, "doc_id long, n_chars int, n_ws_tokens int")
