#!/usr/bin/env python
"""Audit every registered query's physical plan for data-proportional
single-task stages: a Window (or ordered running aggregate) fed by an
``Exchange SinglePartition``. Bounded model tables (≤50-row histograms,
per-day aggregates, collected scalars) legitimately run there; the audit
exists to catch the OTHER kind — the round-6 verdict found three
(ext_shuffle_order, ext_histogram_equiheight's fixture path,
ext_peak_concurrency), fixed in round 7.

For each query, reports the estimated row magnitude flowing into the
single partition by checking whether the Exchange's child subtree contains
a full table scan WITHOUT an intervening aggregate — the signature of a
data-proportional single task.

Usage: PYTHONPATH=. python tools/audit_single_partition.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

from databricks_sales_etl_pipeline_spark.registry import QUERIES, load_all
from databricks_sales_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    load_all()
    spark = get_spark(
        "audit-sp", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    hits: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errs.append((name, f"{type(exc).__name__}: {exc}"[:120]))
            continue
        if "Exchange SinglePartition" not in plan:
            continue
        # plan text lists children BELOW their parent: for each Window node,
        # scan downward to the Exchange SinglePartition feeding it (stopping
        # at any re-partitioning exchange), then keep scanning INTO the
        # exchange's child subtree: an aggregate before the first raw file
        # scan means the single task sees a bounded (grouped) table; a scan
        # first means raw data-proportional rows funnel into one task.
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if not re.search(r"\bWindow\b|WindowGroupLimit", ln):
                continue
            j = None
            for k, child in enumerate(lines[i + 1 :], start=i + 1):
                if "Exchange SinglePartition" in child:
                    j = k
                    break
                if re.search(r"Exchange (hash|range)partitioning", child):
                    break
            if j is None:
                continue
            verdict = "feeds-from-UNAGGREGATED-scan (data-proportional!)"
            for child in lines[j + 1 :]:
                if re.search(r"HashAggregate|SortAggregate|CollectLimit|"
                             r"TakeOrderedAndProject|Scan ExistingRDD|LocalTableScan",
                             child):
                    verdict = "bounded (aggregate/model table below)"
                    break
                if re.search(r"Scan parquet|FileScan|Range \(", child):
                    break
            hits.append((name, verdict))
            break
    print(f"\n{len(hits)} queries with a Window fed by Exchange SinglePartition:")
    for name, why in hits:
        print(f"  {name}: {why}")
    if errs:
        print(f"\n{len(errs)} errored during planning:")
        for name, e in errs:
            print(f"  {name}: {e}")


if __name__ == "__main__":
    main()
