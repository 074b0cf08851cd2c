"""End-to-end LLM training-corpus preparation (north star showcase): the
quality-gate → dedup → tokenize → per-language accounting pipeline as ONE
lazy Spark plan, oracle-checked end to end.

This is the composition the individual extension operators exist for:

    documents
      → quality gate   (length + stopword-ratio, ext_quality_score rules)
      → exact dedup    (min-doc_id keeper per identical text)
      → token counting (whitespace tokens, ext_text_tokens rules)
      → corpus stats   (per language: docs, tokens, mean tokens/doc)

Scale shape: two shuffles total — the dedup groupBy(text-fingerprint) and
the final tiny groupBy(lang); everything else is scan-local. At 100 TB the
dedup key becomes the md5 fingerprint (16 bytes) rather than the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.extensions.textstats import STOPWORDS, _SW_SQL
from databricks_sales_etl_pipeline_spark.registry import query

_PIPELINE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
                   AS toks
        FROM documents
    ), gated AS (
        SELECT doc_id, lang, text, len(toks) AS n_tokens
        FROM toks
        WHERE len(toks) >= 20
          AND CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
              / len(toks) >= 0.05
    ), deduped AS (
        SELECT lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM gated
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens_per_doc
    FROM deduped WHERE rn = 1
    GROUP BY lang
    ORDER BY lang
"""


@query("pipeline_llm_corpus", oracle=_PIPELINE_ORACLE)
def pipeline_llm_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate → dedup → tokenize → per-language corpus accounting as
    one declarative plan."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    base = d.select("doc_id", "lang", "text", toks.alias("toks"))
    sw_ratio = (
        F.size(F.filter(F.col("toks"), lambda x: F.array_contains(sw, x))).cast("double")
        / F.size("toks")
    )
    gated = base.where(F.size("toks") > 0).where(
        (F.size("toks") >= 20) & (sw_ratio >= 0.05)
    ).select("doc_id", "lang", "text", F.size("toks").alias("n_tokens"))
    keeper = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    deduped = gated.withColumn("rn", keeper).where(F.col("rn") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "mean_tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )
