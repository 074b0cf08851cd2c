"""Round-8 scale-pattern fixes (round-7 verdict asks #2-#5): the five
operators whose fixture-green plans funneled ENTITY-scaled aggregates
(customers / parts / users / orders grow linearly with the data) through
a single-task global window now use the two-phase prefix machinery
(functions/prefix.py) — bucket on a monotone function of the sort key,
window per bucket, broadcast exclusive-carry offsets. Values are pinned
by tests/test_parity.py (the DuckDB oracles still use the single global
window — parity IS the equality proof); these tests pin the plan shape
and the new prefix helpers' contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.functions.prefix import (
    exclusive_carries,
    exclusive_carry,
)
from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR
from tools.audit_single_partition import (
    window_fed_by_single_partition,
    window_feed_verdicts,
)

load_all()


@pytest.mark.parametrize(
    "name",
    [
        "ext_rfm_segmentation",
        "ext_inventory_abc",
        "ext_knee_detection",
        "ext_empirical_copula",
        "ext_sprt_sequential",
        # found by the tightened audit (entity/NDV-keyed aggregates the
        # old aggregate-before-scan heuristic whitelisted)
        "ext_gini_concentration",
        "ext_ks_test",
        "ext_mann_whitney",
        "ext_wasserstein_shift",
        "ext_skyline_2d",
        # the audit's last accepted flag, now also ported (exact NTILE
        # via ntile_from_pos — oracle unchanged)
        "ext_histogram_equiheight",
    ],
)
def test_no_entity_scaled_single_partition_window(spark, name):
    """Round-8 ports: these operators previously ran global ordered
    windows over entity-scaled aggregates (the round-7 verdict's five
    'weak' items). Each now buckets on a monotone function of its sort
    key with broadcast carry offsets; no Window may be fed by an
    Exchange SinglePartition."""
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not window_fed_by_single_partition(plan), name


def test_exclusive_carries_matches_two_single_carries(spark):
    """The multi-weight carry (one bounded collect) must equal two
    independent exclusive_carry calls, ascending and descending."""
    df = spark.createDataFrame(
        [(i % 7, i, 10 + i % 3) for i in range(200)], "bk long, a long, w long"
    )
    for desc in (False, True):
        both = exclusive_carries(
            spark, df, "bk", {"c_cnt": None, "c_sum": F.col("w")},
            descending=desc,
        ).collect()
        cnt = {
            r["bk"]: r["carry_in"]
            for r in exclusive_carry(spark, df, "bk", descending=desc).collect()
        }
        sm = {
            r["bk"]: r["carry_in"]
            for r in exclusive_carry(
                spark, df, "bk", weight=F.col("w"), descending=desc
            ).collect()
        }
        for r in both:
            assert r["c_cnt"] == cnt[r["bk"]]
            assert r["c_sum"] == sm[r["bk"]]


def test_exclusive_carry_rejects_null_bucket(spark):
    """ADVICE fix: a NULL bucket key raises a clear contract error, not
    a sorted() TypeError."""
    df = spark.createDataFrame([(1, 1), (None, 2)], "bk long, w long")
    with pytest.raises(ValueError, match="NULL key"):
        exclusive_carry(spark, df, "bk")


def test_tree_walk_ignores_sibling_branch_exchange(spark):
    """ADVICE fix: an Exchange SinglePartition in a SIBLING branch of a
    join must not be attributed to a Window's input. Build a plan where
    the window's own input is hash-partitioned but the join's other side
    crosses a single-partition exchange (a global limit's shuffle)."""
    from pyspark.sql import Window

    left = (
        spark.range(0, 1000)
        .withColumn("g", F.col("id") % 10)
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("g").orderBy("id")),
        )
    )
    # sibling branch with a genuine Exchange SinglePartition feed
    right = (
        spark.range(0, 1000)
        .withColumn("g", (F.col("id") % 10))
        .orderBy("id")
        .limit(5)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    joined = left.join(right.hint("merge"), "g")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the old downward text scan would flag this when the sibling branch
    # prints below the Window; the tree walk must not
    assert not window_fed_by_single_partition(plan)


def test_tree_walk_still_catches_real_global_window(spark):
    """Sanity: a genuine unpartitioned ordered window over a raw scan is
    flagged as data-proportional."""
    from pyspark.sql import Window

    df = spark.range(0, 1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    verdicts = window_feed_verdicts(plan)
    assert verdicts and any("data-proportional" in v for v in verdicts)
