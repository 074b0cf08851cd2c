"""Query registry: the executable form of SURVEY.md §2's operator contract.

Every operator module registers its named queries here via the ``@query``
decorator. ``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLES`` to the
driver, and ``tests/test_parity.py`` runs the same comparison locally.

Float-parity discipline (SURVEY §5.3): any aggregate over money is computed
as an exact integer-cents SUM (order-independent — double summation is not
associative and Spark's partition order differs from DuckDB's sequential
scan). Per-row scalar double math is IEEE-deterministic and therefore safe.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "databricks_sales_etl_pipeline_spark.operators.basic",
    "databricks_sales_etl_pipeline_spark.operators.aggregation",
    "databricks_sales_etl_pipeline_spark.operators.dq",
    "databricks_sales_etl_pipeline_spark.operators.joins",
    "databricks_sales_etl_pipeline_spark.operators.setops",
    "databricks_sales_etl_pipeline_spark.operators.windows",
    "databricks_sales_etl_pipeline_spark.operators.olap",
    "databricks_sales_etl_pipeline_spark.operators.tpch",
    "databricks_sales_etl_pipeline_spark.operators.tpch_more",
    "databricks_sales_etl_pipeline_spark.operators.sql_frontend",
    "databricks_sales_etl_pipeline_spark.operators.dates_dims",
    "databricks_sales_etl_pipeline_spark.operators.asof",
    "databricks_sales_etl_pipeline_spark.sources.inline",
    "databricks_sales_etl_pipeline_spark.sources.generator",
    "databricks_sales_etl_pipeline_spark.sources.sinks",
    "databricks_sales_etl_pipeline_spark.sources.catalog_ops",
    "databricks_sales_etl_pipeline_spark.sources.formats",
    "databricks_sales_etl_pipeline_spark.functions.json_fns",
    "databricks_sales_etl_pipeline_spark.functions.udfs",
    "databricks_sales_etl_pipeline_spark.functions.scalar_fns",
    "databricks_sales_etl_pipeline_spark.streaming.tumbling",
    "databricks_sales_etl_pipeline_spark.streaming.sessionize",
    "databricks_sales_etl_pipeline_spark.streaming.stateful",
    "databricks_sales_etl_pipeline_spark.streaming.join",
    "databricks_sales_etl_pipeline_spark.extensions.dedup",
    "databricks_sales_etl_pipeline_spark.extensions.similarity",
    "databricks_sales_etl_pipeline_spark.extensions.textstats",
    "databricks_sales_etl_pipeline_spark.extensions.multimodal",
    "databricks_sales_etl_pipeline_spark.extensions.embedding_math",
    "databricks_sales_etl_pipeline_spark.extensions.sampling",
    "databricks_sales_etl_pipeline_spark.extensions.corpus",
    "databricks_sales_etl_pipeline_spark.plans.medallion",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB ANSI-SQL twin
    (omit for non-SQL-expressible ops → driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_loaded = False


def load_all() -> None:
    """Import every operator module (idempotent) so decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True
