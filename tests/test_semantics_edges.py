"""Hand-computed boundary semantics for the tricky operators: as-of
inclusivity, session-window exact-gap behavior, multi-day incremental
continuity, catalog introspection."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.operators.asof import asof_join
from databricks_sales_etl_pipeline_spark.sources.catalog_ops import describe, table_exists
from tests.conftest import SF_DIR


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_join_is_inclusive_and_picks_latest(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L1"), (1, _ts("2024-01-01T12:00:00"), "L2")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 100.0),
            (1, _ts("2024-01-01T10:00:00"), 200.0),  # EQUAL to L1's ts → matches
            (1, _ts("2024-01-01T11:00:00"), 300.0),
        ],
        "k int, rts timestamp, px double",
    )
    out = {
        r["tag"]: r["_asof"]
        for r in asof_join(left, right, key="k", left_ts="ts", right_ts="rts", payload="px").collect()
    }
    assert out == {"L1": 200.0, "L2": 300.0}


def test_asof_join_no_prior_right_row_gives_null(spark):
    left = spark.createDataFrame(
        [(7, _ts("2024-01-01T08:00:00"), "early")], "k int, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01T09:00:00"), 1.0)], "k int, rts timestamp, px double"
    )
    row = asof_join(left, right, key="k", left_ts="ts", right_ts="rts", payload="px").first()
    assert row["_asof"] is None


def test_session_window_exact_gap_merges_inclusively(spark):
    # empirically pinned: an event at exactly prev_ts + gap MERGES into the
    # running session (inclusive boundary); only a strictly larger gap
    # starts a new one — the oracle in sessionize.py encodes this
    e = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),
            (1, _ts("2024-01-01T00:30:00")),  # exactly 30 min later → merges
            (1, _ts("2024-01-01T01:00:01")),  # 30:01 after the 2nd → new
        ],
        "user_id int, ts timestamp",
    )
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("session_window.start").alias("start"), "n")
        .orderBy("start")
        .collect()
    )
    assert [(r["start"].minute, r["n"]) for r in sessions] == [(0, 2), (0, 1)]


def test_incremental_soak_five_days(spark, tmp_path):
    from databricks_sales_etl_pipeline_spark.io import read_table, write_table
    from databricks_sales_etl_pipeline_spark.plans.incremental import (
        run_incremental_silver,
    )
    from databricks_sales_etl_pipeline_spark.plans.medallion import (
        Medallion,
        to_bronze_format,
    )
    from databricks_sales_etl_pipeline_spark.sources.generator import gen_orders

    m = Medallion(str(tmp_path))
    write_table(to_bronze_format(gen_orders(spark, n=50)), m.bronze, mode="overwrite")
    run_incremental_silver(spark, m)
    next_id = 51
    for day in range(5):
        write_table(
            to_bronze_format(gen_orders(spark, n=10, start_id=next_id)),
            m.bronze,
            mode="append",
        )
        next_id += 10
        run_incremental_silver(spark, m)
    silver = read_table(spark, m.silver)
    assert silver.count() == 100
    assert silver.select("order_id").distinct().count() == 100  # exactly-once


def test_catalog_describe_and_exists(spark):
    from databricks_sales_etl_pipeline_spark.catalog import register_views

    register_views(spark, SF_DIR)
    assert table_exists(spark, "orders")
    assert not table_exists(spark, "no_such_table")
    cols = {r["col_name"] for r in describe(spark, "orders").collect()}
    assert {"o_orderkey", "o_custkey", "o_totalprice"} <= cols


def test_min_label_components_transitive_chain(spark):
    """A~B, B~C, D~E: min-label propagation must collapse the A-B-C chain
    into ONE component labeled A even though A and C share no edge."""
    from databricks_sales_etl_pipeline_spark.extensions.dedup import (
        min_label_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.node, r.label) for r in min_label_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_approx_distinct_within_error_bound(spark):
    """X5 depth: the rows-only HLL query can't be hash-checked, but its
    ACCURACY contract can — approx_count_distinct(rsd=0.02) must land
    within a few standard deviations of the exact count (5×rsd covers
    HLL++'s bias-corrected tail generously while still catching a broken
    sketch merge, which is off by orders of magnitude)."""
    from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
    from tests.conftest import SF_DIR

    load_all()

    row = QUERIES["ext_approx_distinct"](spark, SF_DIR).collect()[0]
    exact, approx = row["exact_orders"], row["approx_orders"]
    assert exact > 0
    assert abs(approx - exact) <= 0.10 * exact
