"""Upsert semantics + bucketed co-located joins (100 TB posture)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from databricks_sales_etl_pipeline_spark.plans.merge import (
    merge_into_path,
    merge_upsert,
)
from tests.conftest import SF_DIR


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double"
    )
    got = {r["k"]: (r["v"], r["x"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_into_path_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double"), path
    )
    merge_into_path(
        spark,
        path,
        spark.createDataFrame([(2, 99.0), (3, 30.0)], "k int, x double"),
        ["k"],
    )
    got = {r["k"]: r["x"] for r in read_table(spark, path).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}
    # idempotent: merging the same updates again changes nothing
    merge_into_path(
        spark, path, spark.createDataFrame([(2, 99.0)], "k int, x double"), ["k"]
    )
    assert {r["k"]: r["x"] for r in read_table(spark, path).collect()} == got


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """Write orders+lineitem bucketed by orderkey into the session catalog —
    the co-location strategy: both sides pre-hashed into the same bucket
    count, so the join needs NO shuffle at read time."""
    # spark.sql.warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored) and are dropped on teardown
    load(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffling
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bl).join(
            spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    bo, _ = bucketed_tables
    agg = spark.table(bo).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
