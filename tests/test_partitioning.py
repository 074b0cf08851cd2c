"""Partition pruning + dynamic partition overwrite (100 TB posture: a
date-partitioned table is the default physical layout for fact data; readers
must scan only matching partitions)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    o = load(spark, SF_DIR, "orders").withColumn("order_year", F.year("o_orderdate"))
    write_table(o, path, partition_by=["order_year"])
    return path


def test_partition_pruning_in_scan(spark, partitioned_orders):
    df = read_table(spark, partitioned_orders).where(F.col("order_year") == 1997)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the year predicate must prune at the directory level, not post-scan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "order_year" in pf and "1997" in pf


def test_pruned_read_matches_filtered_full_read(spark, partitioned_orders):
    pruned = read_table(spark, partitioned_orders).where(F.col("order_year") == 1997)
    full = load(spark, SF_DIR, "orders").where(F.year("o_orderdate") == 1997)
    assert pruned.count() == full.count() > 0


def test_dynamic_partition_overwrite_rewrites_only_matching(
    spark, partitioned_orders
):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        before_total = read_table(spark, partitioned_orders).count()
        n97 = (
            read_table(spark, partitioned_orders)
            .where(F.col("order_year") == 1997)
            .count()
        )
        # overwrite ONLY the 1997 partition with a 1-row replacement
        replacement = (
            read_table(spark, partitioned_orders)
            .where(F.col("order_year") == 1997)
            .limit(1)
        )
        replacement.write.mode("overwrite").partitionBy("order_year").parquet(
            partitioned_orders
        )
        after = read_table(spark, partitioned_orders)
        assert after.where(F.col("order_year") == 1997).count() == 1
        # every other partition untouched
        assert after.count() == before_total - n97 + 1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
