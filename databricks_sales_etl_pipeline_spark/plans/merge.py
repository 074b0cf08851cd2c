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


# ---- registered driver query (round 3): oracle-checked MERGE round-trip ----

from databricks_sales_etl_pipeline_spark.catalog import load  # noqa: E402
from databricks_sales_etl_pipeline_spark.registry import query  # noqa: E402


@query(
    "tbl_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey,
               'UPDATED-' || c_name AS c_name,
               c_nationkey,
               CAST(0.0 AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT 900000 + r_regionkey AS c_custkey,
               'NEW-' || r_name AS c_name,
               r_regionkey AS c_nationkey,
               CAST(100.0 AS DOUBLE) AS c_acctbal
        FROM region
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM updates
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = t.c_custkey)
    """,
)
def tbl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics, oracle-checked end-to-end: every 10th customer
    gets an update (renamed, balance zeroed), five brand-new customers are
    inserted, untouched rows survive — the WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT contract (reference writes Delta MERGE-equivalent
    upserts in its incremental path, 03_scheduling_automation.py:89-100).
    The oracle states the same semantics independently as
    updates ∪ (target WHERE NOT EXISTS update) — so the anti-join+union
    composition is hash-verified, not just row-counted."""
    from pyspark.sql import functions as F

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    r = load(spark, sf_dir, "region")
    updates = c.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPDATED-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).cast("double").alias("c_acctbal"),
    ).unionByName(
        r.select(
            (F.col("r_regionkey") + 900000).alias("c_custkey"),
            F.concat(F.lit("NEW-"), F.col("r_name")).alias("c_name"),
            F.col("r_regionkey").alias("c_nationkey"),
            F.lit(100.0).cast("double").alias("c_acctbal"),
        )
    )
    return merge_upsert(c, updates, ["c_custkey"])
