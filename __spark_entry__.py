"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``databricks_sales_etl_pipeline_spark``; this
module just re-exports the registry (SURVEY §2 is the contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from databricks_sales_etl_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2.6 J5 star join) on /root/testdata/sf0.001."""
    registry.load_all()
    return registry.QUERIES["join_star_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for every SQL-expressible query."""
    registry.load_all()
    return dict(registry.ORACLES)
