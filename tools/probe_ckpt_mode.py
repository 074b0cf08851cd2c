#!/usr/bin/env python
"""A/B probe (round-14): time one query with every DataFrame.localCheckpoint
forced EAGER vs forced LAZY vs AS-WRITTEN, in this one fresh process.

    SPARK_GRAFT_SF_DIR=... PYTHONPATH=. python tools/probe_ckpt_mode.py <query> <mode> [reps]

mode: eager | lazy | asis. Prints one JSON line with per-rep wall seconds.
Used to settle the round-14 question whether a lazy checkpoint consumed by
CONCURRENT AQE branches (broadcast futures / independent query stages) gets
recomputed per branch (no cross-job materialization barrier) where the eager
form computes it exactly once.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql.classic.dataframe import DataFrame

from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from databricks_sales_etl_pipeline_spark.session import get_spark


def main() -> None:
    name, mode = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if mode in ("eager", "lazy"):
        orig = DataFrame.localCheckpoint
        forced = mode == "eager"

        def patched(self, eager: bool = True, storageLevel=None):
            return orig(self, eager=forced)

        DataFrame.localCheckpoint = patched
    elif mode != "asis":
        raise SystemExit(f"unknown mode {mode!r}")

    load_all()
    spark = get_spark("dsep-ckpt-probe")
    spark.range(1).count()
    QUERIES["agg_count_star"](spark, sf_dir).count()

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "mode": mode, "rows": n,
                      "walls": walls, "min": min(walls)}))


if __name__ == "__main__":
    main()
