"""Schema-drift gating + compaction behavior."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import SCHEMAS, load
from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from databricks_sales_etl_pipeline_spark.plans.maintenance import (
    compact_table,
    ingest_with_drift_check,
    schema_drift,
)
from tests.conftest import SF_DIR


def test_schema_drift_clean(spark):
    n = load(spark, SF_DIR, "nation")
    assert schema_drift(SCHEMAS["nation"], n).clean


def test_schema_drift_detects_all_kinds(spark):
    n = load(spark, SF_DIR, "nation")
    mutated = (
        n.drop("n_regionkey")
        .withColumn("n_extra", F.lit(1))
        .withColumn("n_nationkey", F.col("n_nationkey").cast("long"))
    )
    d = schema_drift(SCHEMAS["nation"], mutated)
    assert d.added == ["n_extra"]
    assert d.missing == ["n_regionkey"]
    assert d.retyped == [("n_nationkey", "int", "bigint")]


def test_schema_drift_report_rows(spark):
    """The report query's core: an added column yields exactly the
    ('n_extra', 'added', NULL, 'int') row; removed/retyped likewise."""
    from pyspark.sql import types as T

    from databricks_sales_etl_pipeline_spark.sources.sinks import schema_drift_report

    before = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ]
    )
    after = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("n_extra", T.IntegerType()),
        ]
    )
    rows = {tuple(r) for r in schema_drift_report(spark, before, after).collect()}
    assert rows == {
        ("n_extra", "added", None, "int"),
        ("b", "removed", "string", None),
        ("a", "type_changed", "int", "bigint"),
    }


def test_ingest_rejects_drift_unless_allowed(spark, tmp_path):
    path = str(tmp_path / "bronze")
    n = load(spark, SF_DIR, "nation")
    ingest_with_drift_check(n, SCHEMAS["nation"], path)  # clean append
    drifted = n.withColumn("n_extra", F.lit(7))
    with pytest.raises(ValueError, match="schema drift rejected"):
        ingest_with_drift_check(drifted, SCHEMAS["nation"], path)
    # explicit evolution: appended with mergeSchema, visible on read
    ingest_with_drift_check(drifted, SCHEMAS["nation"], path, allow_evolution=True)
    merged = read_table(spark, path, merge_schema=True)
    assert "n_extra" in merged.columns
    assert merged.count() == 2 * n.count()


def test_compact_table_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    o = load(spark, SF_DIR, "orders")
    write_table(o.repartition(64), path)  # fragment: 64 tiny files
    before = len(glob.glob(f"{path}/part-*"))
    assert before >= 64
    compact_table(spark, path)
    after = len(glob.glob(f"{path}/part-*"))
    assert after < before
    assert read_table(spark, path).count() == o.count()
