"""Bucketed tables: shuffle-free co-located joins (SURVEY §4 posture).

The reference joins its fact tables by key on every run (`02_business_
transformation_gold.py:40-56`); on Spark at 100 TB the dominant cost of a
fact⋈fact join is the shuffle of both sides. Bucketing is the Spark-native
answer: pay the hash-partition ONCE at write time (``bucketBy(N, key)`` +
``sortBy``), and every subsequent join or aggregation on that key reads the
bucket files as an already-hash-distributed input — the physical plan has
**no Exchange at all** (asserted in ``tests/test_plans.py``).

Layout discipline for scale:

- ``repartition(N, key)`` before the bucketed write uses the same Murmur3
  hash as the bucket spec, so each task holds exactly one bucket → exactly
  one file per bucket (no small-file explosion, and Spark can trust the
  ``sortBy`` order at read time instead of re-sorting).
- The join is hinted ``merge`` so the demonstration holds at any size class
  (at oracle scale the dims fit a broadcast, which would hide the point;
  at 100 TB sort-merge over co-bucketed inputs IS the right plan).
- The final aggregate groups on the bucket key, so the hash-distribution
  from the scan satisfies the aggregation too: scan → join → agg with zero
  shuffles end-to-end.

The bucketed copies are written once per (session, sf_dir) into the Spark
warehouse under deterministic sf_dir-derived names (mode overwrite, so
repeated runs reuse the same paths) and reused across calls.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.functions.money import cents, cents_sql
from databricks_sales_etl_pipeline_spark.functions.money import sum_bigint_sql
from databricks_sales_etl_pipeline_spark.registry import query

_N_BUCKETS = 8
#: keyed on (Spark application id, sf_dir): a fresh SparkSession in the same
#: process gets a fresh catalog, so cached names from an old session would be
#: stale (round-2 advisor). Table names are DETERMINISTIC per sf_dir and the
#: write is mode("overwrite"), so repeated processes reuse the same warehouse
#: paths instead of leaking uuid-named copies.
_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def bucketize(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders + lineitem as co-bucketed tables (once per session and
    sf_dir) and return their catalog names."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    token = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    t_orders = f"dsep_buck_orders_{token}"
    t_lineitem = f"dsep_buck_lineitem_{token}"
    # a FRESH session's catalog doesn't know these names, but the warehouse
    # directory may survive from a previous process — saveAsTable then fails
    # with LOCATION_ALREADY_EXISTS; drop both the entry and the leftover dir
    import os
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (t_orders, t_lineitem):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        leftover = os.path.join(warehouse, t)
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(_N_BUCKETS, "o_orderkey")
        .write.bucketBy(_N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(_N_BUCKETS, "l_orderkey")
        .write.bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(t_lineitem)
    )
    _CACHE[key] = (t_orders, t_lineitem)
    return _CACHE[key]


@query(
    "tbl_bucketed_join",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sum_bigint_sql(cents_sql("l.l_extendedprice * (1 - l.l_discount)"))}
             AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
)
def tbl_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join over bucketed tables: per-order revenue with
    scan → SortMergeJoin → HashAggregate and NO Exchange anywhere — the
    amortized-shuffle layout for repeated key-joins at 100 TB."""
    t_orders, t_lineitem = bucketize(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    j = o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"])
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        ),
    )
