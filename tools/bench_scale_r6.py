#!/usr/bin/env python
"""Round-6 operator scale-stress: time the new shapes (bigram-LM train +
score, paragraph-block dedup, count-min sketch build, bitmap cohort
algebra) on DISTRIBUTED synthetic data far beyond the fixtures, so
SCALE.md's round-6 claims are measured, not asserted.

    PYTHONPATH=. python tools/bench_scale_r6.py [n_docs ...]
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


def gen_documents(spark, n: int):
    """Same nonlinear generator as bench_scale_docs (xxhash64 word mix so
    unrelated docs share no structure); every 10th doc is a near-copy."""
    i = F.col("id")
    base = F.when(i % 10 == 0, i - 1).otherwise(i)
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.lit(j), base), F.lit(VOCAB)).cast("string"),
    )
    text = F.concat_ws(" ", *[word(j) for j in range(WORDS_PER_DOC)])
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    spark = get_spark(
        "dsep-scale-r6", **{"spark.ui.showConsoleProgress": "false"}
    )
    out = []
    for n in sizes:
        tune_shuffle_partitions(spark, input_bytes=n * 500)
        d = gen_documents(spark, n).localCheckpoint(eager=True)
        t = {}

        # bigram LM: train conditional counts, score every doc (integer ppm)
        t0 = time.perf_counter()
        words = d.select(
            "doc_id",
            F.posexplode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
            ).alias("pos", "w"),
        )
        win = Window.partitionBy("doc_id").orderBy("pos")
        bg = words.select(
            "doc_id",
            F.col("w").alias("w1"),
            F.lead("w", 1).over(win).alias("w2"),
        ).where(F.col("w2").isNotNull())
        c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
        model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
        n_scored = (
            bg.join(model, ["w1", "w2"])
            .join(c1, "w1")
            .select("doc_id", F.expr("(1000000 * n2) DIV n1").alias("p"))
            .groupBy("doc_id")
            .agg(F.sum("p"))
            .count()
        )
        t["ngram_lm_train_score"] = round(time.perf_counter() - t0, 2)

        # paragraph-block dedup: slice, keeper window, per-doc reassembly
        t0 = time.perf_counter()
        toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        lt = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
        blocks = lt.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / 12).cast("bigint") - 1,
                )
            ).alias("b"),
            "toks",
        ).select(
            "doc_id",
            "b",
            F.md5(
                F.array_join(
                    F.slice(F.col("toks"), (F.col("b") * 12 + 1).cast("int"), 12),
                    " ",
                )
            ).alias("h"),
        )
        rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "b"))
        blocks.withColumn("rn", rn).groupBy("doc_id").agg(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("k")
        ).count()
        t["paragraph_dedup"] = round(time.perf_counter() - t0, 2)

        # count-min sketch build (4x1024, fixed-size mergeable summary)
        t0 = time.perf_counter()
        tok = d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
        ).where(F.col("token") != "")
        harr = F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"cms{r}"), F.col("token"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 1024
                for r in range(4)
            ]
        )
        tok.select(F.posexplode(harr).alias("r", "bucket")).groupBy(
            "r", "bucket"
        ).count().count()
        t["countmin_build"] = round(time.perf_counter() - t0, 2)

        # bitmap cohorts on synthetic events (5 cohorts, n users)
        t0 = time.perf_counter()
        ev = spark.range(n * 4).select(
            (F.pmod(F.xxhash64("id"), F.lit(n))).alias("user_id"),
            F.concat(
                F.lit("et"), (F.col("id") % 5).cast("string")
            ).alias("event_type"),
        )
        bm = (
            ev.select(
                "event_type",
                F.expr("user_id DIV 63").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
                ).alias("bit"),
            )
            .groupBy("event_type", "word")
            .agg(F.expr("bit_or(bit)").alias("bits"))
            .localCheckpoint()
        )
        a, b = bm.alias("a"), bm.alias("b")
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        ).groupBy("a.event_type", "b.event_type").agg(
            F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits"))))
        ).count()
        t["bitmap_cohorts"] = round(time.perf_counter() - t0, 2)

        rec = {"n_docs": n, "scored_docs": n_scored, **t}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"runs": out}))


def gen_events(spark, n: int):
    """n synthetic events over n/100 users, microsecond timestamps with
    realistic gaps (xxhash64 jitter so sessions have varied shapes)."""
    i = F.col("id")
    user = F.pmod(F.xxhash64(i), F.lit(max(n // 100, 1)))
    # each user's events spread over ~30 days with 0..120-minute gaps
    jitter = F.pmod(F.xxhash64(i, F.lit(1)), F.lit(7200))
    ts = F.timestamp_micros(
        (F.lit(1700000000_000000) + i * 60_000_000 + jitter * 1_000_000).cast(
            "long"
        )
    )
    return spark.range(n).select(user.alias("user_id"), ts.alias("ts"))


def bench_sessions(sizes):
    """Native session_window vs manual gaps-and-islands at scale: same
    30-minute gap, both reduced to (n_sessions, n_events) checks."""
    from pyspark.sql import Window

    spark = get_spark(
        "dsep-scale-sessions", **{"spark.ui.showConsoleProgress": "false"}
    )
    out = []
    for n in sizes:
        tune_shuffle_partitions(spark, input_bytes=n * 24)
        e = gen_events(spark, n).localCheckpoint(eager=True)
        t = {}

        t0 = time.perf_counter()
        native = e.groupBy(
            F.session_window("ts", "30 minutes"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n"))
        n_native = native.count()
        t["native_session_window"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        w = Window.partitionBy("user_id").orderBy("us")
        us = e.select("user_id", F.unix_micros("ts").alias("us"))
        # STRICT > : an event at exactly last+gap MERGES in Spark's native
        # session_window (probed; a >= cut disagrees by the exact-tie count)
        flagged = us.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > 30 * 60_000_000),
                1,
            ).otherwise(0),
        )
        islands = (
            flagged.withColumn(
                "sid",
                F.sum("new_s").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        n_islands = islands.count()
        t["manual_islands"] = round(time.perf_counter() - t0, 2)

        rec = {
            "n_events": n,
            "n_sessions_native": n_native,
            "n_sessions_islands": n_islands,
            "agree": n_native == n_islands,
            **t,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"session_runs": out}))


if __name__ == "__main__":
    if "--sessions" in sys.argv:
        sizes = [
            int(float(a)) for a in sys.argv[1:] if not a.startswith("-")
        ]
        bench_sessions(sizes or [1_000_000, 10_000_000, 50_000_000])
    else:
        main()
