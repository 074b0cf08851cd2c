"""The medallion pipeline (SURVEY §3.3): Bronze → Silver → Gold as pure
DataFrame→DataFrame stages — the reference's whole program
(`01_project_setup_and_ingestion.py`, `02_business_transformation_gold.py`,
`03_scheduling_automation.py`) as a composable library.

Differences from the reference, by design (SURVEY §4.3):
- incremental Silver: the daily run transforms ONLY the appended Bronze
  slice and appends it (the reference re-reads all of Bronze and overwrites
  Silver every day — O(history) daily at `03:96-99`);
- Gold KPIs in ONE aggregation job (the reference runs 4 collect actions,
  `03:105-108`);
- generation is distributed (sources/generator.py), never a driver loop;
- all writes via io.py (parquet here, Delta on a cluster that has it).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.functions.money import cents
from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from databricks_sales_etl_pipeline_spark.operators.dq import duplicate_keys, null_counts
from databricks_sales_etl_pipeline_spark.registry import query
from databricks_sales_etl_pipeline_spark.sources.generator import gen_orders


@dataclass
class Medallion:
    """Path layout for one pipeline instance."""

    base: str

    @property
    def bronze(self) -> str:
        return os.path.join(self.base, "bronze_sales_raw")

    @property
    def silver(self) -> str:
        return os.path.join(self.base, "silver_sales_clean")

    def gold(self, name: str) -> str:
        return os.path.join(self.base, f"gold_{name}")


def to_bronze_format(df: DataFrame) -> DataFrame:
    """Bronze keeps dates as strings — raw, no transforms (ref `01:115-117`)."""
    return df.withColumn("order_date", F.date_format("order_date", "dd-MM-yyyy"))


def silver_transform(bronze: DataFrame) -> DataFrame:
    """Bronze→Silver typing + derivation (ref `01:163-164`): string→date,
    total_amount = round(quantity*price, 2) — via the tie-safe cents path."""
    return bronze.withColumn(
        "order_date", F.to_date("order_date", "dd-MM-yyyy")
    ).withColumn("total_amount", cents(F.col("quantity") * F.col("price")) / 100.0)


def silver_quality_report(silver: DataFrame) -> dict:
    """The reference's DQ checks (`01:170-204`) as one programmatic report;
    two jobs total (nulls+counts batched, duplicates)."""
    nulls = null_counts(silver).collect()[0].asDict()
    dups = duplicate_keys(silver, "order_id").count()
    stats = silver.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("total_amount").alias("min_amount"),
        F.max("total_amount").alias("max_amount"),
        F.countDistinct("category").alias("n_categories"),
    ).collect()[0]
    return {
        "null_counts": nulls,
        "duplicate_order_ids": dups,
        "n_rows": stats["n_rows"],
        "min_amount": stats["min_amount"],
        "max_amount": stats["max_amount"],
        "n_categories": stats["n_categories"],
    }


def observed_silver_write(silver: DataFrame, path: str) -> dict:
    """Silver write with DQ metrics OBSERVED during the write pass itself
    (df.observe + accumulator-backed aggregates): row count, null counts,
    amount range — captured at zero extra scans. At 100 TB this is the only
    affordable DQ: the reference's post-write check suite re-reads the table
    once per metric (`01:170-204`); even our batched report costs two extra
    scans. Observation metrics ride the write job."""
    from pyspark.sql import Observation

    obs = Observation("silver_dq")
    observed = silver.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("order_id").isNull(), 1)).alias("null_order_ids"),
        F.count(F.when(F.col("total_amount").isNull(), 1)).alias("null_amounts"),
        F.min("total_amount").alias("min_amount"),
        F.max("total_amount").alias("max_amount"),
    )
    write_table(observed, path, mode="overwrite")
    return obs.get


def gold_group_analytics(silver: DataFrame, key: str) -> DataFrame:
    """Per-key analytics (ref `02:56,63`): orders, revenue, avg, unique
    customers — English column names (SURVEY do-not-do list drops the
    Italian ones)."""
    rc = F.sum(cents(F.col("quantity") * F.col("price")))
    return (
        silver.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (rc / 100.0).alias("revenue"),
            ((rc / 100.0) / F.count(F.lit(1))).alias("avg_order"),
            F.countDistinct("customer_id").alias("unique_customers"),
        )
        .orderBy(F.desc("revenue"))
    )


def gold_kpi_summary(silver: DataFrame) -> DataFrame:
    """KPI long-format table (ref `02:33-49`) in ONE aggregation job."""
    k = silver.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("quantity") * F.col("price"))).alias("rc"),
        F.countDistinct("customer_id").alias("uc"),
    )
    return k.select(
        F.expr(
            "stack(4, "
            "'total_revenue', rc / CAST(100 AS DOUBLE), "
            "'total_orders', CAST(n AS DOUBLE), "
            "'avg_order_value', (rc / CAST(100 AS DOUBLE)) / n, "
            "'unique_customers', CAST(uc AS DOUBLE)"
            ") AS (metric, value)"
        )
    )


def initial_run(spark: SparkSession, m: Medallion, n: int = 1000) -> dict:
    """Full pipeline: generate → Bronze(overwrite) → Silver → 3 Gold tables
    (ref 01+02 end-to-end)."""
    raw = to_bronze_format(gen_orders(spark, n=n))
    write_table(raw, m.bronze, mode="overwrite")
    bronze = read_table(spark, m.bronze)
    silver = silver_transform(bronze)
    write_table(silver, m.silver, mode="overwrite")
    silver = read_table(spark, m.silver)
    write_table(gold_group_analytics(silver, "category"), m.gold("category_analytics"))
    write_table(gold_group_analytics(silver, "city"), m.gold("city_analytics"))
    write_table(gold_kpi_summary(silver), m.gold("kpi_summary"))
    return silver_quality_report(silver)


def daily_run(spark: SparkSession, m: Medallion, n_orders: int = 15) -> dict:
    """Incremental daily pipeline (ref `03:80-131`), WITHOUT the full-history
    recompute: next ids from Bronze max (A8 shape), new slice appended to
    Bronze AND transformed+appended to Silver; Gold recomputed from Silver
    (aggregates are cheap; at 100 TB Gold becomes a streaming agg)."""
    bronze = read_table(spark, m.bronze)
    max_id = bronze.agg(
        F.max(F.expr("CAST(SUBSTRING(order_id, 5) AS INT)")).alias("m")
    ).collect()[0]["m"]
    new_raw = to_bronze_format(
        gen_orders(spark, n=n_orders, n_customers=300, start_id=max_id + 1)
    )
    write_table(new_raw, m.bronze, mode="append")
    # incremental: transform ONLY the new slice
    write_table(silver_transform(new_raw), m.silver, mode="append")
    silver = read_table(spark, m.silver)
    write_table(
        gold_group_analytics(silver, "category"),
        m.gold("category_analytics"),
        merge_schema=True,
    )
    write_table(gold_group_analytics(silver, "city"), m.gold("city_analytics"))
    write_table(gold_kpi_summary(silver), m.gold("kpi_summary"))
    return {"appended": n_orders, "next_id": max_id + 1}


def monitoring(spark: SparkSession, m: Medallion) -> DataFrame:
    """Pipeline monitoring (ref `03:138-159`): layer row counts + last-7-days
    activity, returned as a DataFrame instead of prints."""
    bronze_n = read_table(spark, m.bronze).count()
    silver = read_table(spark, m.silver)
    recent = (
        silver.groupBy("order_date")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("order_date"))
        .limit(7)
        .withColumn("bronze_rows", F.lit(bronze_n))
        .withColumn("silver_rows", F.lit(silver.count()))
    )
    return recent


_PIPELINE_ORACLE = """
    WITH silver AS (
        SELECT list_extract(['Elettronica', 'Abbigliamento', 'Casa', 'Sport', 'Libri'],
                            CAST((id * 7) % 5 + 1 AS INT)) AS category,
               'CUST_' || lpad(CAST((id * 2654435761) % 200 + 1 AS VARCHAR), 3, '0')
                   AS customer_id,
               (id * 19) % 4 + 1 AS quantity,
               ((id * 23456791) % 49001 + 1000) / 100.0 AS price
        FROM (SELECT range AS id FROM range(1000))
    )
    SELECT category,
           COUNT(*) AS n_orders,
           SUM(CAST(FLOOR((quantity * price) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
           (SUM(CAST(FLOOR((quantity * price) * 100 + 0.5) AS BIGINT)) / 100.0) / COUNT(*)
               AS avg_order,
           COUNT(DISTINCT customer_id) AS unique_customers
    FROM silver
    GROUP BY category
    ORDER BY revenue DESC
"""


@query("pipeline_gold_category", oracle=_PIPELINE_ORACLE)
def pipeline_gold_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2E — the whole medallion dataflow as one lazy plan: deterministic
    generator → bronze string-typing → silver typing/derivation → gold
    category analytics. The oracle recomputes it from the generator's
    closed-form arithmetic."""
    silver = silver_transform(to_bronze_format(gen_orders(spark, n=1000)))
    return gold_group_analytics(silver, "category")
