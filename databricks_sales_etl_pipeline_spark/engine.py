"""User-facing facade: one object that gives a reference user everything the
reference project did — catalog access, both query front-ends, the medallion
pipeline, DQ reports — plus the engine's registered operator library.

    from databricks_sales_etl_pipeline_spark.engine import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.table("orders")                     # catalog scan (S3)
    eng.sql("SELECT count(*) FROM orders")  # SQL front-end (§3.2)
    eng.run("agg_group_category")           # any registered operator
    eng.medallion("/tmp/demo").initial(n=1000)   # the reference's pipeline
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_sales_etl_pipeline_spark import registry
from databricks_sales_etl_pipeline_spark.catalog import (
    TABLES,
    ensure_runtime_conf,
    load,
    register_views,
)
from databricks_sales_etl_pipeline_spark.operators.dq import (
    duplicate_keys,
    null_counts,
)
from databricks_sales_etl_pipeline_spark.plans import medallion as _medallion
from databricks_sales_etl_pipeline_spark.session import get_spark


class MedallionHandle:
    """The reference's three notebooks as three methods."""

    def __init__(self, spark: SparkSession, base: str):
        self._spark = spark
        self._m = _medallion.Medallion(base)

    def initial(self, n: int = 1000) -> dict:
        """01: generate → Bronze → Silver(+DQ) → Gold (`01` + `02`)."""
        return _medallion.initial_run(self._spark, self._m, n=n)

    def daily(self, n_orders: int = 15) -> dict:
        """03: incremental daily run (`03_scheduling_automation.py:80-131`)."""
        return _medallion.daily_run(self._spark, self._m, n_orders=n_orders)

    def monitor(self) -> DataFrame:
        """03: pipeline monitoring (`03:138-159`)."""
        return _medallion.monitoring(self._spark, self._m)


class Engine:
    def __init__(self, sf_dir: str | None = None, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        ensure_runtime_conf(self.spark)
        self.sf_dir = sf_dir
        registry.load_all()
        if sf_dir:
            register_views(self.spark, sf_dir)

    # -- catalog -----------------------------------------------------------
    @property
    def tables(self) -> list[str]:
        return list(TABLES)

    def table(self, name: str) -> DataFrame:
        if self.sf_dir is None:
            raise ValueError("Engine was built without sf_dir")
        return load(self.spark, self.sf_dir, name)

    # -- query front-ends --------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """SQL string front-end over the registered views (§3.2 entry B)."""
        return self.spark.sql(query)

    def run(self, operator: str) -> DataFrame:
        """Run a registered operator by its SURVEY §2 query name."""
        if operator not in registry.QUERIES:
            known = ", ".join(sorted(registry.QUERIES))
            raise KeyError(f"unknown operator {operator!r}; known: {known}")
        if self.sf_dir is None:
            raise ValueError("Engine was built without sf_dir")
        return registry.QUERIES[operator](self.spark, self.sf_dir)

    @property
    def operators(self) -> list[str]:
        return sorted(registry.QUERIES)

    # -- DQ ----------------------------------------------------------------
    def dq_nulls(self, df: DataFrame) -> DataFrame:
        return null_counts(df)

    def dq_duplicates(self, df: DataFrame, *keys: str) -> DataFrame:
        return duplicate_keys(df, *keys)

    # -- pipeline ----------------------------------------------------------
    def medallion(self, base_path: str) -> MedallionHandle:
        return MedallionHandle(self.spark, base_path)
