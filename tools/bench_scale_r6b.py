#!/usr/bin/env python
"""Round-6 second-wave scale-stress: measure the new operator shapes on
distributed synthetic data beyond the fixtures so SCALE.md's claims stay
measured, not asserted.

Shapes under test:
- basket-rules pair expansion (in-row k² blowup: must stay linear in
  orders at fixed basket size)
- rolling-WAU bitmaps (state rows = days × users/63: linear in users,
  window cost independent of events-per-user)
- shingle-containment candidate generation (one-sided prefix filter:
  candidates ∝ true duplication, not corpus²)
- SCD2 build + point-in-time probe (two chained user-key shuffles)

    PYTHONPATH=. python tools/bench_scale_r6b.py [n ...]

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

VOCAB = 5000
WORDS_PER_DOC = 80
BASKET_K = 7
N_DAYS = 30


def gen_documents(spark, n: int):
    """Nonlinear xxhash64 word mix (unrelated docs share no structure);
    every 10th doc is a near-copy of its predecessor — true-dup density
    is constant in n, so candidate counts should scale linearly."""
    i = F.col("id")
    base = F.when(i % 10 == 0, i - 1).otherwise(i)
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.lit(j), base), F.lit(VOCAB)).cast("string"),
    )
    text = F.concat_ws(" ", *[word(j) for j in range(WORDS_PER_DOC)])
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("dsep-scale-r6b", **{"spark.ui.showConsoleProgress": "false"})
    out = []
    for n in sizes:
        tune_shuffle_partitions(spark, input_bytes=n * 200)
        t = {}

        # 1. basket pair expansion: n orders × BASKET_K brands
        orders = spark.range(n).select(
            F.col("id").alias("ok"),
            F.array_sort(
                F.array_distinct(
                    F.array(
                        *[
                            F.concat(
                                F.lit("b"),
                                F.pmod(F.xxhash64(F.lit(j), F.col("id")), F.lit(500)).cast(
                                    "string"
                                ),
                            )
                            for j in range(BASKET_K)
                        ]
                    )
                )
            ).alias("basket"),
        ).localCheckpoint(eager=True)
        pair_structs = F.filter(
            F.flatten(
                F.transform(
                    "basket",
                    lambda x: F.transform(
                        "basket", lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda s: s["a"] < s["b"],
        )
        t0 = time.perf_counter()
        n_pairs = (
            orders.select(F.explode(pair_structs).alias("pr"))
            .groupBy("pr.a", "pr.b")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum("c"))
            .collect()[0][0]
        )
        t["basket_pairs_s"] = round(time.perf_counter() - t0, 2)
        t["basket_pairs_emitted"] = int(n_pairs)
        orders.unpersist()

        # 2. rolling WAU bitmaps: n users active on pseudo-random days
        ev = spark.range(n * 4).select(
            F.pmod(F.xxhash64(F.lit(1), F.col("id")), F.lit(n)).alias("user_id"),
            F.pmod(F.xxhash64(F.lit(2), F.col("id")), F.lit(N_DAYS)).alias("day"),
        )
        t0 = time.perf_counter()
        bm = (
            ev.select(
                "day",
                F.expr("user_id DIV 63").alias("word"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias(
                    "bit"
                ),
            )
            .groupBy("day", "word")
            .agg(F.expr("bit_or(bit)").alias("bits"))
        )
        w7 = Window.partitionBy("word").orderBy("day").rangeBetween(-6, 0)
        wau = (
            bm.withColumn("bits7", F.expr("bit_or(bits)").over(w7))
            .groupBy("day")
            .agg(F.sum(F.bit_count("bits7")).alias("wau"))
        )
        rows = wau.collect()
        t["wau_bitmap_s"] = round(time.perf_counter() - t0, 2)
        t["wau_state_rows"] = int(bm.count())

        # 3. containment candidates: one-sided prefix filter
        d = gen_documents(spark, min(n, 200_000)).localCheckpoint(eager=True)
        from databricks_sales_etl_pipeline_spark.extensions.dedup import shingle_rows

        sh = shingle_rows(d).localCheckpoint(eager=True)
        doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        rare_first = Window.partitionBy("doc_id").orderBy("df", "shingle")
        tthr = 0.6
        prefix = (
            sh.join(doc_freq, "shingle")
            .withColumn("rnk", F.row_number().over(rare_first))
            .where(F.col("rnk") <= F.col("n_sh") - F.ceil(F.col("n_sh") * tthr) + 1)
            .select("doc_id", "shingle")
        )
        full = sh.select(F.col("doc_id").alias("doc_dst"), "shingle")
        t0 = time.perf_counter()
        n_cand = (
            prefix.withColumnRenamed("doc_id", "doc_src")
            .join(full, "shingle")
            .where(F.col("doc_src") != F.col("doc_dst"))
            .select("doc_src", "doc_dst")
            .distinct()
            .count()
        )
        t["containment_s"] = round(time.perf_counter() - t0, 2)
        t["containment_docs"] = int(min(n, 200_000))
        t["containment_candidates"] = int(n_cand)
        d.unpersist()
        sh.unpersist()

        # 4. SCD2 build + PIT probe over n*4 events
        e = spark.range(n * 4).select(
            F.pmod(F.xxhash64(F.lit(3), F.col("id")), F.lit(n // 10 + 1)).alias(
                "user_id"
            ),
            F.col("id").alias("event_id"),
            (F.col("id") * 1000).alias("us"),
            F.pmod(F.xxhash64(F.lit(4), F.col("id")), F.lit(4)).cast("string").alias(
                "state_in"
            ),
        )
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        t0 = time.perf_counter()
        ver = (
            e.withColumn("prev", F.lag("state_in").over(w))
            .where(F.col("prev").isNull() | (F.col("prev") != F.col("state_in")))
            .select(
                "user_id",
                F.col("state_in").alias("state"),
                F.col("us").alias("valid_from_us"),
                F.lead("us").over(w).alias("valid_to_us"),
            )
        )
        probes = e.where(F.col("event_id") % 17 == 0).select(
            F.col("user_id").alias("p_user"), F.col("us").alias("p_us")
        )
        n_pit = (
            probes.join(
                ver,
                (F.col("user_id") == F.col("p_user"))
                & (F.col("valid_from_us") <= F.col("p_us"))
                & (
                    F.col("valid_to_us").isNull()
                    | (F.col("p_us") < F.col("valid_to_us"))
                ),
                "left",
            )
            .count()
        )
        t["scd2_pit_s"] = round(time.perf_counter() - t0, 2)
        t["scd2_pit_probe_rows"] = int(n_pit)

        out.append({"n": n, **t})
        print(json.dumps(out[-1]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
