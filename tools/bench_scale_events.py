#!/usr/bin/env python
"""Event-analytics scale-stress: generate synthetic events DISTRIBUTED
(spark.range + xxhash64 mixing — no driver loop), then time the round-4
event shapes (sessionization, ordered funnel, last-touch attribution,
retention cohorts) at volumes far beyond the 15 k-event fixture.

    PYTHONPATH=. python tools/bench_scale_events.py [n_events ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.functions.money import cents
from databricks_sales_etl_pipeline_spark.session import (
    get_spark,
    tune_shuffle_partitions,
)

TYPES = ["signup", "view", "click", "purchase", "error"]


def gen_events(spark, n: int):
    """n synthetic events over ~90 days; ~n/1000 users; type mix via hash."""
    i = F.col("id")
    user = F.pmod(F.xxhash64(i, F.lit(1)), F.lit(max(n // 1000, 10)))
    etype = F.element_at(
        F.array(*[F.lit(t) for t in TYPES]),
        (F.pmod(F.xxhash64(i, F.lit(2)), F.lit(len(TYPES))) + 1).cast("int"),
    )
    ts = F.timestamp_micros(
        F.lit(1704067200000000)  # 2024-01-01 UTC
        + (F.pmod(F.xxhash64(i, F.lit(3)), F.lit(90 * 86400)) * 1_000_000)
    )
    value = (F.pmod(F.xxhash64(i, F.lit(4)), F.lit(100000)) / 100.0)
    return spark.range(n).select(
        i.alias("event_id"),
        user.alias("user_id"),
        etype.alias("event_type"),
        ts.alias("ts"),
        value.alias("value"),
    )


def shapes(e):
    """The event-analytics operator shapes (same logic as the registry
    queries, inlined against the generated frame)."""

    def sessionize():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
            F.lag(F.col("ts")).over(w)
        )
        flag = F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
        return (
            e.select("user_id", "ts", "event_id", flag.alias("ns"))
            .select("user_id", "ts", F.sum("ns").over(run).alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)))
            .count()
        )

    def funnel():
        s1 = (
            e.where(F.col("event_type") == "signup")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        s2 = (
            e.where(F.col("event_type") == "view")
            .join(s1.withColumnRenamed("t", "pt"), "user_id")
            .where(F.col("ts") >= F.col("pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        s3 = (
            e.where(F.col("event_type") == "purchase")
            .join(s2.withColumnRenamed("t", "pt"), "user_id")
            .where(F.col("ts") >= F.col("pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        return s3.count()

    def attribution():
        tagged = e.where(
            F.col("event_type").isin("purchase", "click", "view")
        ).withColumn("is_p", F.col("event_type") == "purchase")
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        lt = F.last(
            F.when(~F.col("is_p"), F.col("event_type")), ignorenulls=True
        ).over(w)
        return (
            tagged.select("is_p", "value", lt.alias("ch"))
            .where("is_p")
            .groupBy("ch")
            .agg(F.count(F.lit(1)), F.sum(cents("value")))
            .count()
        )

    def cohorts():
        first = e.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cw")
        )
        act = e.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
        ).distinct()
        wk_k = F.expr("CAST(datediff(wk, cw) DIV 7 AS BIGINT)")
        return (
            act.join(first, "user_id")
            .groupBy("cw", wk_k.alias("k"))
            .agg(F.countDistinct("user_id"))
            .count()
        )

    yield "sessionize", sessionize
    yield "funnel", funnel
    yield "attribution", attribution
    yield "cohorts", cohorts


def main() -> None:
    """Env knobs:

    SCALE_EVENTS_PARTITIONS  override shuffle-partition count (the round-5
                             spill experiment: does the 100 M window-sort
                             superlinearity flatten with more, smaller
                             partitions — the cluster mitigation — instead of
                             the ~32 the byte heuristic picks for 4 GB input?)
    SCALE_EVENTS_SHAPES      comma list to run a subset (e.g. "sessionize,attribution")
    """
    import os

    sizes = [int(x) for x in sys.argv[1:]] or [10_000_000, 100_000_000]
    only = os.environ.get("SCALE_EVENTS_SHAPES")
    only = set(only.split(",")) if only else None
    override = os.environ.get("SCALE_EVENTS_PARTITIONS")
    spark = get_spark("bench-scale-events")
    results = []
    for n in sizes:
        if override:
            spark.conf.set("spark.sql.shuffle.partitions", override)
        else:
            tune_shuffle_partitions(spark, n * 40)
        parts = spark.conf.get("spark.sql.shuffle.partitions")
        e = gen_events(spark, n).localCheckpoint()
        row = {"n_events": n, "shuffle_partitions": int(parts)}
        for name, fn in shapes(e):
            if only and name not in only:
                continue
            t0 = time.time()
            out = fn()
            row[f"{name}_s"] = round(time.time() - t0, 2)
            row[f"{name}_rows"] = out
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
