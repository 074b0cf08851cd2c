"""Measured scaling for the round-6 fourth-wave shapes (waves 33-51).

Synthesizes inputs at two sizes on local[32] and times the four shapes
most likely to hide a superlinear term:

- item-item CF (basket array pair expansion + per-item top-k window)
- largest-remainder penny allocation (fact-grain window ranking)
- cross-source shingle overlap (distinct-shingle self-join)
- MLM masking (per-token md5 + sort_array(collect_list) rebuild)

Run: PYTHONPATH=. python tools/bench_scale_r6d.py
Lesson applied (round-6 third wave): every measurement forces a SUM
materialization — a bare count() lets Catalyst prune the stage under
test.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def _spark():
    s = (
        SparkSession.builder.master("local[32]")
        .appName("scale-r6d")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def itemcf(spark, n_orders: int):
    li = spark.range(n_orders * 5).select(
        (F.col("id") % n_orders).alias("o"),
        (F.xxhash64("id") % 2000).alias("i"),
    )
    baskets = li.groupBy("o").agg(
        F.sort_array(F.collect_set("i")).alias("items")
    )
    exploded = baskets.select(F.explode("items").alias("ia"), "items")
    pairs = (
        exploded.select(
            "ia",
            F.explode(
                F.filter(F.col("items"), lambda x: x > F.col("ia"))
            ).alias("ib"),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return pairs.agg(F.sum("n_ab"), F.count(F.lit(1))).collect()[0][1]


def penny(spark, n_lines: int):
    li = spark.range(n_lines).select(
        (F.col("id") % (n_lines // 5)).alias("ok"),
        (F.col("id") % 7).alias("ln"),
        (F.abs(F.xxhash64("id")) % 10_000_00 + 100).alias("lc"),
    )
    hdr = li.groupBy("ok").agg(
        F.sum("lc").alias("total_lc"),
        F.expr("CAST(SUM(lc) DIV 20 AS BIGINT)").alias("freight"),
    )
    j = li.join(hdr, "ok")
    base = j.select(
        "ok", "ln", "lc", "freight",
        F.expr("CAST(freight * lc DIV total_lc AS BIGINT)").alias("base_c"),
        F.expr("CAST(freight * lc % total_lc AS BIGINT)").alias("rem"),
    )
    wo = Window.partitionBy("ok").orderBy(F.col("rem").desc(), "lc", "ln")
    ws = Window.partitionBy("ok")
    out = base.withColumn("rk", F.row_number().over(wo)).withColumn(
        "pennies",
        F.min("freight").over(ws) - F.sum("base_c").over(ws),
    )
    alloc = out.select(
        (F.col("base_c") + F.when(F.col("rk") <= F.col("pennies"), 1)
         .otherwise(0)).alias("a")
    )
    return alloc.agg(F.sum("a")).collect()[0][0]


def overlap(spark, n_docs: int):
    d = spark.range(n_docs).select(
        (F.col("id") % 20).cast("string").alias("source"),
        F.col("id").alias("doc_id"),
    )
    # ~60 shingles/doc over a bounded shingle space (vocab-driven)
    sh = d.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.abs(
                    F.xxhash64(F.concat(F.col("doc_id") % 997, i))
                )
                % 120_000,
            )
        ).alias("shingle"),
    ).distinct()
    a = sh.select(F.col("source").alias("sa"), "shingle")
    b = sh.select(F.col("source").alias("sb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return inter.agg(F.sum("n")).collect()[0][0]


def mlm(spark, n_docs: int):
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(80)),
                lambda i: F.concat(F.lit("w"), (F.col("doc_id") + i) % 500),
            )
        ).alias("pos", "tok"),
    )
    key = F.concat_ws(":", F.col("doc_id"), F.col("pos"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit("mlm:"), key)), 1, 8), 16, 10)
    marked = toks.select(
        "doc_id", "pos", "tok", (h.cast("bigint") % 8 == 0).alias("m")
    )
    agg = marked.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.when(F.col("m"), "<MASK>")
                                .otherwise(F.col("tok"))
                                .alias("out"),
                            )
                        )
                    ),
                    lambda s: s["out"],
                ),
            )
        ).alias("h")
    )
    return agg.agg(F.count(F.lit(1)), F.min("h")).collect()[0][0]


def main():
    spark = _spark()
    for name, fn, sizes in [
        ("itemcf", itemcf, [200_000, 2_000_000]),
        ("penny", penny, [1_000_000, 10_000_000]),
        ("overlap", overlap, [100_000, 1_000_000]),
        ("mlm", mlm, [100_000, 1_000_000]),
    ]:
        for n in sizes:
            t0 = time.time()
            out = fn(spark, n)
            print(
                f"{name} n={n}: {time.time() - t0:.1f}s (result={out})",
                flush=True,
            )


if __name__ == "__main__":
    main()
