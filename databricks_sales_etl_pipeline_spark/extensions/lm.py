"""Statistical language-model scoring over the corpus (north-star item:
the KenLM-style perplexity filter every LLM data pipeline runs — CCNet,
RedPajama, FineWeb all gate documents on an n-gram LM score).

Floating log-probabilities are not bit-portable (libm ln differs across
engines — CLAUDE.md), so the score is kept in EXACT integer space: each
bigram contributes its conditional probability in ppm,
``(1_000_000 · c(w1,w2)) DIV c(w1·)``, truncating integer division being
identical in Spark (``DIV``) and DuckDB (``//``). Monotonicity matches the
log-space score closely enough for gating, and the report hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query

_WS = r"\s+"


@query(
    "ext_ngram_lm_score",
    oracle="""
    WITH lt AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
               unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
        FROM lt
    ),
    c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM bg GROUP BY w1
    ),
    model AS (
        SELECT b.w1, b.w2, CAST(COUNT(*) AS BIGINT) AS n2
        FROM bg b GROUP BY b.w1, b.w2
    ),
    scored AS (
        SELECT bg.doc_id,
               (1000000 * m.n2) // c1.n1 AS p_ppm
        FROM bg
        JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2
        JOIN c1 ON c1.w1 = bg.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_ppm) AS BIGINT) AS score_ppm_sum,
           CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm
    FROM scored GROUP BY doc_id
    """,
)
def ext_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lm1 — bigram LM fluency scoring: train conditional bigram counts on
    the corpus (one pass), then score every document by its mean bigram
    probability in exact ppm — the integer-space stand-in for KenLM
    perplexity gating (low mean probability = disfluent/garbled text).

    Scale shape: bigrams come from the long-format posexplode + lead
    window (whole-stage codegen, the repo's documented HOF mitigation);
    the model is bounded by DISTINCT bigrams (vocabulary-sized, not
    corpus-sized) and both probability joins ride the same w1/bigram hash
    shuffles. Self-scoring here; scoring a held-out corpus is the same
    plan with the model table persisted and re-joined."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), _WS), lambda x: x != "")
        ).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        words.select(
            "doc_id",
            F.col("w").alias("w1"),
            F.lead("w", 1).over(win).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    model = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n2")
    )
    scored = (
        bg.join(model, ["w1", "w2"])
        .join(c1, "w1")
        .select("doc_id", F.expr("(1000000 * n2) DIV n1").alias("p_ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_ppm").cast("bigint").alias("score_ppm_sum"),
        F.expr("CAST(SUM(p_ppm) DIV COUNT(*) AS BIGINT)").alias("mean_p_ppm"),
    )
