#!/usr/bin/env python
"""Round-6 third-wave scale-stress: measure this wave's new operator
shapes on distributed synthetic data beyond the fixtures.

Shapes under test:
- Lindley queue scan (``ext_queue_wait`` shape): one key shuffle + two
  chained running windows — must stay linear in events at fixed
  keys-per-partition balance.
- next-fit bin packing (``ext_pack_bins_greedy`` shape): applyInPandas
  greedy loop per shard over length metadata — linear, embarrassingly
  parallel across shards; Python loop cost is the thing to watch.
- histogram stump search (``ext_gbm_stump`` shape): one groupBy onto a
  bounded feature grid + windows on the tiny histogram — should track
  scan speed, independent of corpus size beyond the scan.
- secrets regex scan (``ext_secrets_scan`` shape): zero-shuffle codegen
  regexp pass — scan-speed linear.

    PYTHONPATH=. python tools/bench_scale_r6c.py [n ...]

Run with NO concurrent pytest/bench (container contention corrupts the
curves — round-6 lesson).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.session import (
    get_spark,
    tune_shuffle_partitions,
)

N_SERVERS = 1000
PACK_BUCKETS = 256
PACK_CAP = 256


def bench_queue(spark, n: int) -> dict:
    tune_shuffle_partitions(spark, n * 40)
    t0 = time.time()
    jobs = spark.range(n).select(
        (F.col("id") % N_SERVERS).alias("server_id"),
        ((F.col("id") * 7919) % (n // 2)).alias("arr_s"),
        (60 + (F.col("id") * 13) % 300).alias("svc_s"),
        F.col("id").alias("tb"),
    )
    w = (
        Window.partitionBy("server_id")
        .orderBy("arr_s", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = jobs.withColumn("p", F.sum("svc_s").over(w))
    m = F.max(F.col("arr_s") - (F.col("p") - F.col("svc_s"))).over(w)
    per_job = pref.select(
        "server_id",
        "arr_s",
        "svc_s",
        (F.col("p") + m - F.col("svc_s") - F.col("arr_s")).alias("wait_s"),
    )
    out = per_job.groupBy("server_id").agg(
        F.count(F.lit(1)).alias("n_jobs"), F.sum("wait_s").alias("tw")
    )
    # force the window outputs to materialize — a bare count() would let
    # Catalyst prune the whole window stage (it only needs server_id)
    row = out.agg(
        F.count(F.lit(1)).alias("servers"), F.sum("tw").alias("tw")
    ).collect()[0]
    return {
        "n": n,
        "wall_s": round(time.time() - t0, 2),
        "servers": row["servers"],
        "total_wait": int(row["tw"]),
    }


def bench_pack(spark, n: int) -> dict:
    import pandas as pd  # noqa: F401

    tune_shuffle_partitions(spark, n * 24)
    t0 = time.time()
    toks = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % PACK_BUCKETS).alias("bucket"),
        (20 + (F.col("id") * 31) % 120).alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, offs, cur, fill = [], [], 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > PACK_CAP:
                cur += 1
                fill = 0
            bins.append(cur)
            offs.append(fill)
            fill += t
        pdf["bin_idx"] = bins
        pdf["offset_in_bin"] = offs
        return pdf[["doc_id", "bucket", "bin_idx", "offset_in_bin"]]

    out = toks.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket long, bin_idx long, offset_in_bin long"
    )
    row = out.agg(
        F.countDistinct("bucket").alias("buckets"),
        F.sum("bin_idx").alias("chk"),
    ).collect()[0]
    return {
        "n": n,
        "wall_s": round(time.time() - t0, 2),
        "buckets": row["buckets"],
    }


def bench_stump(spark, n: int) -> dict:
    tune_shuffle_partitions(spark, n * 16)
    t0 = time.time()
    fact = spark.range(n).select(
        ((F.col("id") * 17) % 50 + 1).alias("fv"),
        ((F.col("id") * 101) % 1_000_000).alias("y"),
    )
    hist = fact.groupBy("fv").agg(
        F.count(F.lit(1)).alias("nn"), F.sum("y").alias("s")
    )
    w = Window.orderBy("fv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    pref = hist.select(
        "fv",
        F.sum("nn").over(w).alias("n_l"),
        F.sum("s").over(w).alias("sum_l"),
        F.sum("nn").over(wt).alias("n_t"),
        F.sum("s").over(wt).alias("sum_t"),
    )
    best = (
        pref.where(F.col("n_t") > F.col("n_l"))
        .withColumn(
            "score",
            F.expr(
                "CAST(sum_l AS DOUBLE) * sum_l / n_l"
                " + CAST(sum_t - sum_l AS DOUBLE) * (sum_t - sum_l)"
                " / (n_t - n_l)"
            ),
        )
        .orderBy(F.col("score").desc(), "fv")
        .limit(1)
        .collect()
    )
    return {"n": n, "wall_s": round(time.time() - t0, 2), "best_fv": best[0]["fv"]}


def bench_secrets(spark, n: int) -> dict:
    t0 = time.time()
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("payload text body "),
            F.when(
                F.col("id") % 7 == 0,
                F.concat(
                    F.lit("aws_key=AKIA"),
                    F.upper(F.substring(F.md5(F.col("id").cast("string")), 1, 16)),
                ),
            ).otherwise(F.lit("clean")),
        ).alias("body"),
    )
    hits = docs.where(
        F.regexp_extract("body", "AKIA[A-F0-9]{16}", 0) != ""
    ).count()
    return {"n": n, "wall_s": round(time.time() - t0, 2), "hits": hits}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000_000, 50_000_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps({"shape": "queue_scan", **bench_queue(spark, n)}))
        print(json.dumps({"shape": "bin_pack", **bench_pack(spark, min(n, 10_000_000))}))
        print(json.dumps({"shape": "stump_hist", **bench_stump(spark, n)}))
        print(json.dumps({"shape": "secrets_scan", **bench_secrets(spark, min(n, 10_000_000))}))


if __name__ == "__main__":
    main()
