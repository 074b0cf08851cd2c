"""Streaming behavior tests: incremental Silver (foreachBatch tail of
Bronze), streaming/batch twin equality for the watermarked tumbling agg,
and the stateful counter's agreement with its batch equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from databricks_sales_etl_pipeline_spark.plans.incremental import (
    run_incremental_silver,
)
from databricks_sales_etl_pipeline_spark.plans.medallion import (
    Medallion,
    to_bronze_format,
)
from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from databricks_sales_etl_pipeline_spark.sources.generator import gen_orders
from tests.conftest import SF_DIR

load_all()


def test_incremental_silver_processes_only_new(spark, tmp_path):
    m = Medallion(str(tmp_path))
    write_table(to_bronze_format(gen_orders(spark, n=100)), m.bronze, mode="overwrite")
    run_incremental_silver(spark, m)
    assert read_table(spark, m.silver).count() == 100

    # append a daily slice; the second run must process exactly that slice
    write_table(
        to_bronze_format(gen_orders(spark, n=15, start_id=101)), m.bronze, mode="append"
    )
    run_incremental_silver(spark, m)
    silver = read_table(spark, m.silver)
    assert silver.count() == 115
    # no duplicates: each order transformed exactly once across the two runs
    assert silver.select("order_id").distinct().count() == 115
    # and a third run with nothing new appends nothing
    run_incremental_silver(spark, m)
    assert read_table(spark, m.silver).count() == 115


def test_watermark_stream_matches_batch_twin(spark):
    stream_rows = QUERIES["stream_watermark_agg"](spark, SF_DIR)
    batch_rows = QUERIES["stream_tumbling_counts"](spark, SF_DIR)
    key = ["hour_start", "event_type", "n_events", "value_cents"]
    assert sorted(map(tuple, stream_rows.select(*key).collect())) == sorted(
        map(tuple, batch_rows.select(*key).collect())
    )


def test_stateful_counter_matches_batch_agg(spark):
    from databricks_sales_etl_pipeline_spark.functions.money import cents

    got = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in QUERIES["stream_stateful_counter"](spark, SF_DIR).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["c"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("c"))
        .collect()
    }
    assert got == expected
