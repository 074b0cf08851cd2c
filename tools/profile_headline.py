#!/usr/bin/env python
"""Per-query job/stage profile of headline queries (round-14, guide §1/§7):
for each query, run it once in THIS session and report how many Spark jobs
it launched, how many stages ran, summed task time, and wall time — the
action-count evidence the optimization rounds work from (at sf0.1 every
headline query is fixed-overhead/driver-action bound, so jobs × plan/codegen
overhead is the lever, not data-parallel work).

    SPARK_GRAFT_SF_DIR=... PYTHONPATH=. python tools/profile_headline.py [names...]

Uses the UI REST API (statusTracker has no task-time rollup). One JSON line
per query on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from databricks_sales_etl_pipeline_spark.session import get_spark


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark(
        "dsep-profile", **{"spark.ui.enabled": "true", "spark.ui.port": "4099"}
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    names = sys.argv[1:] or [
        "ext_dedup_minhash_native", "ext_dedup_substring", "ext_basket_rules",
        "ext_empirical_copula", "tpch_q3", "ext_nn_matching", "mm_decode_real",
        "ext_similarity_kmeans", "ext_rfm_segmentation", "ext_text_tokens",
        "ext_pq_search", "ext_event_funnel", "ext_peak_concurrency",
        "ext_semdedup", "ext_ks_test", "tpch_q1",
    ]
    # warm
    spark.range(1).count()
    QUERIES["agg_count_star"](spark, sf_dir).count()
    for name in names:
        jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _rest(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        out = {
            "query": name,
            "wall_sec": round(wall, 3),
            "rows": n,
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "task_time_sec": round(
                sum(s.get("executorRunTime", 0) for s in stages) / 1000, 3
            ),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
            ),
            "input_mb": round(
                sum(s.get("inputBytes", 0) for s in stages) / 1e6, 2
            ),
            "stages": [
                {
                    "id": s["stageId"],
                    "name": s.get("name", "")[:60],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                }
                for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:8]
            ],
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
