"""Measured scaling for the round-6 late-wave shapes (waves 74-98).

Synthesizes inputs at two sizes on local[32] and times the four shapes
most likely to hide a superlinear term:

- matrix-profile pair sweep (window table self-join, O(w^2) pairs)
- CIDR longest-prefix-match (x3 prefix explode + broadcast block join
  + per-key argmax)
- ordered-subsequence triples (two rn-inequality self-joins INSIDE the
  user partition, distinct-before-count)
- KMV distinct sketch (global distinct + per-stream top-K by hash)

Run: PYTHONPATH=. python tools/bench_scale_r6e.py
Every measurement forces a SUM materialization (round-6 lesson: a bare
count() lets Catalyst prune the stage under test).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def _spark():
    s = (
        SparkSession.builder.master("local[32]")
        .appName("scale-r6e")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def matrix_profile(spark, n_days: int, w: int = 7):
    daily = spark.range(n_days).select(
        F.col("id").alias("d"),
        (F.abs(F.xxhash64("id")) % 1_000_000).alias("v"),
    )
    wo = Window.orderBy("d")
    cols = [F.col("d"), F.row_number().over(wo).alias("i"),
            F.col("v").alias("w0")]
    cols += [F.lead("v", t).over(wo).alias(f"w{t}") for t in range(1, w)]
    win = (
        daily.select(*cols)
        .where(F.col(f"w{w-1}").isNotNull())
        .localCheckpoint()
    )
    a, b = win.alias("a"), win.alias("b")
    dist = " + ".join(
        f"(a.w{t} - b.w{t}) * (a.w{t} - b.w{t})" for t in range(w)
    )
    pairs = a.join(
        F.broadcast(b), F.col("b.i") >= F.col("a.i") + w
    ).select(
        F.col("a.i").alias("i"),
        F.expr(f"CAST({dist} AS BIGINT)").alias("dd"),
    )
    prof = pairs.groupBy("i").agg(F.min("dd").alias("nn"))
    return prof.agg(F.sum("nn")).collect()[0][0]


def cidr_lpm(spark, n_events: int):
    e = spark.range(n_events).select(
        F.col("id").alias("k"),
        (F.abs(F.xxhash64("id")) % (1 << 16)).alias("ip"),
    )
    blk = spark.range(64).select(
        (4 + 4 * (F.col("id") % 3)).alias("plen"),
        (F.abs(F.xxhash64(F.col("id") + 7)) % (1 << 12)).alias("v"),
        F.col("id").alias("label"),
    ).select(
        "plen",
        F.expr("shiftright(v, 12 - CAST(plen AS INT))").alias("net_key"),
        "label",
    ).groupBy("plen", "net_key").agg(F.min("label").alias("label"))
    cand = e.select(
        "k",
        "ip",
        F.explode(F.array(F.lit(4), F.lit(8), F.lit(12))).alias("plen"),
    ).withColumn("net_key", F.expr("shiftright(ip, 16 - CAST(plen AS INT))"))
    matched = (
        cand.join(F.broadcast(blk), ["plen", "net_key"])
        .groupBy("k")
        .agg(F.max("plen").alias("plen"))
    )
    return matched.agg(F.sum("plen"), F.count(F.lit(1))).collect()[0][0]


def subseq_triples(spark, n_events: int, per_user: int = 10):
    e = spark.range(n_events).select(
        (F.col("id") / per_user).cast("bigint").alias("u"),
        (F.col("id") % per_user).alias("rn"),
        (F.abs(F.xxhash64("id")) % 5).alias("t"),
    ).localCheckpoint()
    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(
            b,
            (F.col("b.u") == F.col("a.u"))
            & (F.col("b.rn") > F.col("a.rn")),
        )
        .join(
            c,
            (F.col("c.u") == F.col("a.u"))
            & (F.col("c.rn") > F.col("b.rn")),
        )
        .select(
            F.col("a.u").alias("u"),
            F.col("a.t").alias("t1"),
            F.col("b.t").alias("t2"),
            F.col("c.t").alias("t3"),
        )
        .distinct()
    )
    sup = tri.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("s"))
    return sup.agg(F.sum("s")).collect()[0][0]


def kmv(spark, n_events: int, k: int = 64):
    e = spark.range(n_events).select(
        (F.abs(F.xxhash64("id")) % 5).alias("stream"),
        (F.abs(F.xxhash64(F.col("id") * 31 + 7)) % (1 << 32)).alias("hv"),
    )
    d = e.distinct()
    kth = (
        d.withColumn(
            "r",
            F.row_number().over(Window.partitionBy("stream").orderBy("hv")),
        )
        .where(F.col("r") == k)
    )
    return kth.agg(F.sum("hv")).collect()[0][0]


def main():
    spark = _spark()
    for name, fn, sizes in [
        ("matrix_profile", matrix_profile, (2_000, 8_000)),
        ("cidr_lpm", cidr_lpm, (5_000_000, 50_000_000)),
        ("subseq_triples", subseq_triples, (1_000_000, 10_000_000)),
        ("kmv_sketch", kmv, (5_000_000, 50_000_000)),
    ]:
        for n in sizes:
            t0 = time.time()
            out = fn(spark, n)
            print(f"{name} n={n}: {time.time() - t0:.1f}s (sum={out})",
                  flush=True)


if __name__ == "__main__":
    main()
