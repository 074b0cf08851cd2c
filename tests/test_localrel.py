"""Round-13 optimization: Arrow-backed local relations (functions/localrel).

Pins the two facts the optimization rests on:
1. local_df plans a LocalTableScan — NO Python-RDD scan, so consuming the
   frame (e.g. as a broadcast side) launches zero Python-worker tasks.
2. Rows, schema, and NULL handling are bit-identical to the
   spark.createDataFrame(list, ddl) form it replaces.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from databricks_sales_etl_pipeline_spark.functions.localrel import local_df


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_local_df_is_local_table_scan(spark):
    df = local_df(spark, [(1, 2), (3, None)], "a long, b long")
    plan = _plan(df)
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


@pytest.mark.parametrize(
    "rows, ddl",
    [
        ([(1, 2), (3, None)], "a long, b long"),
        ([("x", True), ("y", False), (None, None)], "s string, f boolean"),
        ([(1, 0.5), (2, None)], "i int, d double"),
        ([], "a long, b string"),
    ],
)
def test_local_df_matches_list_form(spark, rows, ddl):
    got = local_df(spark, rows, ddl)
    ref = spark.createDataFrame(rows, ddl)
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, ref.collect()), key=repr
    )


def test_local_df_accepts_structtype(spark):
    st = StructType.fromDDL("a long, b string")
    df = local_df(spark, [(7, "z")], st)
    assert df.schema == st
    assert df.collect() == [(7, "z")]


def test_carry_tables_plan_local(spark):
    """The prefix-machinery carries — the hottest local_df consumers — must
    stay LocalTableScan (regression guard for the 32-task Python-RDD shape
    this round removed)."""
    from databricks_sales_etl_pipeline_spark.functions.prefix import (
        exclusive_carries,
        exclusive_carry_max,
    )
    from pyspark.sql import functions as F

    base = spark.range(100).select(
        (F.col("id") % 7).alias("bk"), F.col("id").alias("v")
    )
    c = exclusive_carries(spark, base, "bk", {"cnt": None, "sm": F.col("v")})
    m = exclusive_carry_max(spark, base, "bk", F.col("v"))
    assert "LocalTableScan" in _plan(c) and "ExistingRDD" not in _plan(c)
    assert "LocalTableScan" in _plan(m) and "ExistingRDD" not in _plan(m)
