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


@query(
    "json_nested_roundtrip",
    oracle="""
    SELECT o_orderkey, CAST(0 AS INT) AS pos, o_orderpriority AS tag
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, CAST(1 AS INT) AS pos, o_orderstatus AS tag
    FROM orders WHERE o_orderkey < 2000
    """,
)
def json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Js2 — NESTED JSON handling end-to-end: serialize a struct with an
    array field to a JSON string (to_json), parse it back with an explicit
    nested schema (from_json with ARRAY<STRING> — the production path for
    semi-structured columns), then posexplode the array. The oracle states
    the identity directly, so a parser that mangles nesting, ordering or
    types cannot match. All JVM-side — JSON never reaches Python."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    j = o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("key"),
                F.array("o_orderpriority", "o_orderstatus").alias("tags"),
            )
        ).alias("payload"),
    )
    parsed = j.select(
        "o_orderkey",
        F.from_json("payload", "key BIGINT, tags ARRAY<STRING>").alias("p"),
    )
    return parsed.select(
        "o_orderkey", F.posexplode("p.tags").alias("pos", "tag")
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CASE WHEN json_extract(props, '$.missing') IS NULL
                THEN NULL
                ELSE json_extract_string(props, '$.missing') END AS missing
    FROM events
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Js3 — the VARIANT path (Spark 4): parse_json once into the binary
    semi-structured encoding, then typed variant_get extractions — the
    scale answer to repeated get_json_object string re-parses (one parse,
    many cheap typed reads; missing paths yield NULL, not errors).

    Scale: parse_json is a one-pass scan expression; downstream extractions
    read the binary encoding without re-parsing — at 100 TB of telemetry
    this is the difference between N regex-ish parses per row and one."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
        F.variant_get(v, "$.missing", "string").alias("missing"),
    )
