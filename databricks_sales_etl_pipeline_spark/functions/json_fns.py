"""JSON scalar functions (SURVEY §2.6 Js1) over events.props.

Both JSON front-ends: path extraction (get_json_object — no schema needed)
and typed parsing (from_json with an explicit schema — the production path:
one parse, typed struct, prunable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Js1 — get_json_object path extraction + from_json typed parse
    (north-star; events.props is '{"k": <int>}')."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k"),
    )
