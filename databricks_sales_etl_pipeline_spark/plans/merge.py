"""Upsert (MERGE INTO) for the parquet fallback world.

On Delta the incremental Silver path would be ``MERGE INTO silver USING
updates ON key WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` — Delta is not
installed here (SURVEY risk register), so the engine provides the same
semantics as a composition: full-outer-join-free anti-join + union, which
rewrites only the target (no per-row updates — parquet is immutable):

    merged = target.join(updates, key, "left_anti")   # rows NOT updated
             .unionByName(updates)                    # + new versions

Scale note: the anti join shuffles on the key like any join; with a
partitioned target (partition_by date) and partition-pruned updates, only
affected partitions need rewriting — the dynamic-partition-overwrite path
(``spark.sql.sources.partitionOverwriteMode=dynamic``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_sales_etl_pipeline_spark.io import read_table, write_table


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics as a DataFrame: updates win on key collision,
    unmatched target rows survive, new keys are inserted."""
    return target.join(updates, keys, "left_anti").unionByName(updates)


def merge_into_path(
    spark: SparkSession, path: str, updates: DataFrame, keys: list[str]
) -> None:
    """Upsert into a parquet table path (read → merge → atomic overwrite via
    staging dir; Delta would do this transactionally with file-level skips)."""
    target = read_table(spark, path)
    merged = merge_upsert(target, updates, keys)
    # materialize before overwriting the directory being read
    staged = merged.localCheckpoint(eager=True)
    write_table(staged, path, mode="overwrite")
