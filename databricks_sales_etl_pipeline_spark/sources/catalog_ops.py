"""Catalog introspection (SURVEY §2.1 S7): SHOW TABLES / DESCRIBE — the
reference probes its catalog at `01_project_setup_and_ingestion.py:128,133,
217-218` (spark.sql("SHOW TABLES"), try/except table-existence).

Both front-ends (spark.catalog API and SQL SHOW TABLES) run against the one
temp-view catalog that register_views populates — front-end equivalence over
a shared catalog is part of the capability surface (SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import TABLES, register_views
from databricks_sales_etl_pipeline_spark.registry import query

_TABLES_VALUES = ", ".join(f"('{t}')" for t in sorted(TABLES))


@query(
    "src_catalog_tables",
    oracle=f"SELECT table_name FROM (VALUES {_TABLES_VALUES}) AS t(table_name)",
)
def src_catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — register all tables as views, introspect via SHOW TABLES
    (filtered to the engine's tables — the shared session may hold other
    temp views, e.g. streaming memory sinks)."""
    register_views(spark, sf_dir)
    return (
        spark.sql("SHOW TABLES")
        .where(F.col("tableName").isin(TABLES))
        .select(F.col("tableName").alias("table_name"))
    )


def table_exists(spark: SparkSession, name: str) -> bool:
    """The reference's try/except existence probe (`01:132-136`), done
    properly via the catalog API."""
    return spark.catalog.tableExists(name)


def describe(spark: SparkSession, name: str) -> DataFrame:
    """DESCRIBE TABLE as a DataFrame (ref `01:217-218` %sql DESCRIBE)."""
    return spark.sql(f"DESCRIBE TABLE {name}")
