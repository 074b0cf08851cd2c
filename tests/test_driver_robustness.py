"""Driver-contract robustness (the verify skill's 'worth probing' list):
repeat invocations in one process, sink temp-dir uniqueness, clean errors
on a bad sf_dir — the failure modes a long-lived driver process hits."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from databricks_sales_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_entry_runs_twice_in_one_process(spark):
    r1 = entrymod.entry(spark).collect()
    r2 = entrymod.entry(spark).collect()
    assert len(r1) == len(r2) > 0
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


@pytest.mark.parametrize(
    "name", ["sink_overwrite", "sink_append", "tbl_time_travel", "sink_merge_schema"]
)
def test_sink_queries_rerun_in_one_process(spark, name):
    """Sink queries must not collide with their own leftovers (unique temp
    dirs / DROP-first discipline) when the driver calls them repeatedly."""
    a = QUERIES[name](spark, SF_DIR).count()
    b = QUERIES[name](spark, SF_DIR).count()
    assert a == b > 0


def test_bad_sf_dir_raises_cleanly(spark):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        QUERIES["agg_count_star"](spark, "/root/testdata/does_not_exist").collect()


def test_oracle_keys_are_query_keys():
    assert set(ORACLES) <= set(QUERIES)
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
