"""Medallion pipeline e2e (SURVEY §5.2.3): run bronze→silver→gold on a temp
dir and assert the reference's own DQ invariants (FIXTURES.md §B)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.io import read_table
from databricks_sales_etl_pipeline_spark.plans.medallion import (
    Medallion,
    daily_run,
    initial_run,
    monitoring,
)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    m = Medallion(str(tmp_path_factory.mktemp("medallion")))
    report = initial_run(spark, m, n=400)
    return m, report


def test_initial_run_quality(pipeline):
    _, report = pipeline
    assert report["n_rows"] == 400
    assert report["duplicate_order_ids"] == 0
    assert all(v == 0 for v in report["null_counts"].values())
    assert report["n_categories"] == 5
    assert report["min_amount"] >= 10.0  # price>=10 × qty>=1


def test_silver_matches_bronze_count(pipeline, spark):
    m, _ = pipeline
    assert read_table(spark, m.bronze).count() == read_table(spark, m.silver).count()


def test_gold_revenue_reconciles_with_kpi(pipeline, spark):
    m, _ = pipeline
    cat = read_table(spark, m.gold("category_analytics"))
    kpi = read_table(spark, m.gold("kpi_summary"))
    cat_sum = cat.agg(F.sum("revenue")).first()[0]
    total = kpi.where(F.col("metric") == "total_revenue").first()["value"]
    assert abs(cat_sum - total) < 1e-6


def test_daily_run_appends_exactly_n(pipeline, spark):
    m, _ = pipeline
    before_b = read_table(spark, m.bronze).count()
    before_s = read_table(spark, m.silver).count()
    daily_run(spark, m, n_orders=15)
    assert read_table(spark, m.bronze).count() == before_b + 15
    assert read_table(spark, m.silver).count() == before_s + 15
    # ids continue from the previous max — still globally unique
    bronze = read_table(spark, m.bronze)
    assert bronze.select("order_id").distinct().count() == before_b + 15


def test_silver_schema_typed(pipeline, spark):
    m, _ = pipeline
    dt = dict(read_table(spark, m.silver).dtypes)
    assert dt["order_date"] == "date"
    assert dt["total_amount"] == "double"


def test_monitoring_last7(pipeline, spark):
    m, _ = pipeline
    rows = monitoring(spark, m).collect()
    assert 0 < len(rows) <= 7
    days = [r["order_date"] for r in rows]
    assert days == sorted(days, reverse=True)


def test_observed_silver_write_zero_extra_scans(spark, tmp_path):
    from databricks_sales_etl_pipeline_spark.plans.medallion import (
        observed_silver_write,
        silver_transform,
        to_bronze_format,
    )
    from databricks_sales_etl_pipeline_spark.sources.generator import gen_orders

    silver = silver_transform(to_bronze_format(gen_orders(spark, n=250)))
    metrics = observed_silver_write(silver, str(tmp_path / "silver_obs"))
    assert metrics["n_rows"] == 250
    assert metrics["null_order_ids"] == 0 and metrics["null_amounts"] == 0
    assert 10.0 <= metrics["min_amount"] <= metrics["max_amount"]
    # and the write really happened with the same rows
    assert read_table(spark, str(tmp_path / "silver_obs")).count() == 250
