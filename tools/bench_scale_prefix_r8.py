#!/usr/bin/env python
"""Round-8 scaling evidence: the shapes the round-8 ports introduced —
the DUAL-carry Lorenz curve (rank + running revenue sum, the
ext_inventory_abc / ext_knee_detection / ext_gini_concentration shape)
and the two-phase NTILE (the ext_rfm_segmentation / ext_empirical_copula
shape) — vs the global ordered windows they replaced, on synthetic data
far beyond the fixtures (distributed generation, no driver loops).

Each comparison asserts a full-result checksum equality before printing,
so the timing is evidence for a BIT-IDENTICAL rewrite, not an
approximation.

Usage: PYTHONPATH=. python tools/bench_scale_prefix_r8.py [sizes_csv]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from databricks_sales_etl_pipeline_spark.functions.prefix import (
    div_width,
    exclusive_carries,
    ntile_from_pos,
)
from databricks_sales_etl_pipeline_spark.session import get_spark


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["1000000", "10000000", "50000000"])]
    spark = get_spark("bench-prefix-r8",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # value domain small enough that the GLOBAL running sum stays in
    # int64 at every tested size (2^28 * 5e7 ≈ 1.3e16)
    vmax = (1 << 28) - 1
    for n in sizes:
        df = (
            spark.range(n)
            .select(
                F.col("id"),
                F.xxhash64(F.col("id").cast("string"))
                .bitwiseAND(F.lit(vmax))
                .alias("v"),
            )
            .localCheckpoint()
        )

        # ---- Lorenz: rank + running sum (global vs dual-carry) ----
        t0 = time.perf_counter()
        wo = Window.orderBy("v", "id")
        g = df.select(
            F.row_number().over(wo).alias("i"),
            F.sum("v").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
        )
        g_chk = g.agg(
            F.sum(F.col("i") * F.lit(7) % F.lit(1_000_003)),
            F.sum(F.col("cum") % F.lit(1_000_003)),
        ).collect()[0]
        t_global = time.perf_counter() - t0

        t0 = time.perf_counter()
        width = div_width(vmax, fanout=1024)
        b = df.withColumn("vb", F.expr(f"v DIV {width}"))
        carry = exclusive_carries(
            spark, b, "vb", {"c_cnt": None, "c_sum": F.col("v")}
        )
        wb = Window.partitionBy("vb").orderBy("v", "id")
        tp = b.join(broadcast(carry), "vb").select(
            (F.col("c_cnt") + F.row_number().over(wb)).alias("i"),
            (
                F.col("c_sum")
                + F.sum("v").over(wb.rowsBetween(Window.unboundedPreceding, 0))
            ).alias("cum"),
        )
        tp_chk = tp.agg(
            F.sum(F.col("i") * F.lit(7) % F.lit(1_000_003)),
            F.sum(F.col("cum") % F.lit(1_000_003)),
        ).collect()[0]
        t_two = time.perf_counter() - t0
        assert tuple(g_chk) == tuple(tp_chk), (g_chk, tp_chk)
        print(
            f"lorenz rows={n:>9d}  global={t_global:7.2f}s  "
            f"twophase={t_two:7.2f}s  speedup={t_global / t_two:5.2f}x",
            flush=True,
        )

        # ---- NTILE(5) (global vs two-phase ntile_from_pos) ----
        t0 = time.perf_counter()
        g = df.select(
            F.ntile(5).over(Window.orderBy("v", "id")).cast("long").alias("q")
        )
        g_chk = g.groupBy("q").count().orderBy("q").collect()
        t_global = time.perf_counter() - t0

        t0 = time.perf_counter()
        carry = exclusive_carries(spark, b, "vb", {"c_cnt": None})
        pos = F.col("c_cnt") + F.row_number().over(
            Window.partitionBy("vb").orderBy("v", "id")
        )
        tp = b.join(broadcast(carry), "vb").select(
            ntile_from_pos(pos, n, 5).alias("q")
        )
        tp_chk = tp.groupBy("q").count().orderBy("q").collect()
        t_two = time.perf_counter() - t0
        assert [tuple(r) for r in g_chk] == [tuple(r) for r in tp_chk]
        print(
            f"ntile  rows={n:>9d}  global={t_global:7.2f}s  "
            f"twophase={t_two:7.2f}s  speedup={t_global / t_two:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
