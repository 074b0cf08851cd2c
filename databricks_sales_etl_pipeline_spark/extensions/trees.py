"""Histogram-based tree-split training (north-star §2.7 widening: the
gradient-boosting primitive — reference scope per REFERENCE_MAP.md; the
reference has no ML surface at all).

``ext_gbm_stump`` trains one regression decision stump the way every
distributed GBDT implementation (XGBoost/LightGBM histogram mode) does:
aggregate the corpus ONCE into a bounded per-feature-value histogram of
(count, Σtarget), then score every candidate split from prefix sums of
that tiny table. The fact table is never rescanned per split — the whole
search costs one groupBy on the feature grid plus windows over ≤ NDV
rows. That is exactly the dataflow that holds at 100 TB (the histogram
is KB-sized regardless of corpus size; split search is driver-free).

Parity: histogram counts and target sums are exact integer cents; the
variance-reduction score ``sum²/n`` needs squares of corpus-scale sums,
so it is evaluated in DOUBLE through ONE shared expression string
(`_STUMP_SCORE`) — both engines run the identical IEEE tree on identical
integers, so the doubles are bit-equal (the ext_rank_wilson discipline).
Best-split choice orders by that shared score with a split-value
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.functions.money import cents, cents_sql
from databricks_sales_etl_pipeline_spark.registry import query

#: variance-reduction score of a split (left/right sums in cents, counts
#: as BIGINT) — ONE string evaluated verbatim by Spark and DuckDB so the
#: double result is bit-identical.  sum²/n per side, summed.
_STUMP_SCORE = (
    "(CAST(sum_l AS DOUBLE) * CAST(sum_l AS DOUBLE) / CAST(n_l AS DOUBLE)"
    " + CAST(sum_r AS DOUBLE) * CAST(sum_r AS DOUBLE) / CAST(n_r AS DOUBLE))"
)
_STUMP_BASE = (
    "(CAST(sum_t AS DOUBLE) * CAST(sum_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
)


@query(
    "ext_gbm_stump",
    oracle=f"""
    WITH fact AS (
        SELECT CAST(l_quantity AS BIGINT) AS fv,
               {cents_sql('l_extendedprice * (1 - l_discount)')} AS y
        FROM lineitem
    ), hist AS (
        SELECT fv, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM fact GROUP BY fv
    ), pref AS (
        SELECT fv,
               CAST(SUM(n) OVER w AS BIGINT) AS n_l,
               CAST(SUM(s) OVER w AS BIGINT) AS sum_l,
               CAST(SUM(n) OVER () AS BIGINT) AS n_t,
               CAST(SUM(s) OVER () AS BIGINT) AS sum_t
        FROM hist
        WINDOW w AS (ORDER BY fv ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), cand AS (
        SELECT fv AS split_at, n_l, sum_l,
               n_t - n_l AS n_r, sum_t - sum_l AS sum_r, n_t, sum_t
        FROM pref WHERE n_t - n_l > 0
    ), scored AS (
        SELECT split_at, n_l, n_r, sum_l, sum_r,
               {_STUMP_SCORE} AS score,
               {_STUMP_SCORE} - {_STUMP_BASE} AS gain
        FROM cand
    )
    SELECT split_at, n_l, n_r, sum_l, sum_r, score, gain,
           CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY score DESC, split_at)
                          = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM scored
    """,
)
def ext_gbm_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tr1 — histogram-mode regression-stump training: find the split
    ``l_quantity <= s`` that best predicts per-line revenue (exact
    cents). One corpus scan builds the per-feature-value histogram
    (count, Σy); prefix sums over the ≤50-row histogram give every
    candidate's left/right statistics; the split maximizing
    ``Σ_l²/n_l + Σ_r²/n_r`` (equivalently minimizing SSE) wins. Output:
    every candidate split with exact integer partition statistics, the
    shared-expression double score, gain over the no-split baseline, and
    the best-split flag — the one boosting round whose repetition IS
    gradient boosting, in the dataflow that never rescans the fact
    table."""
    li = load(spark, sf_dir, "lineitem")
    fact = li.select(
        F.col("l_quantity").cast("bigint").alias("fv"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("bigint")
        .alias("y"),
    )
    hist = fact.groupBy("fv").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    w = Window.orderBy("fv").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    pref = hist.select(
        "fv",
        F.sum("n").over(w).alias("n_l"),
        F.sum("s").over(w).alias("sum_l"),
        F.sum("n").over(wt).alias("n_t"),
        F.sum("s").over(wt).alias("sum_t"),
    )
    cand = pref.where(F.col("n_t") - F.col("n_l") > 0).select(
        F.col("fv").alias("split_at"),
        "n_l",
        "sum_l",
        (F.col("n_t") - F.col("n_l")).alias("n_r"),
        (F.col("sum_t") - F.col("sum_l")).alias("sum_r"),
        "n_t",
        "sum_t",
    )
    scored = cand.select(
        "split_at",
        "n_l",
        "n_r",
        "sum_l",
        "sum_r",
        F.expr(_STUMP_SCORE).alias("score"),
        F.expr(f"{_STUMP_SCORE} - {_STUMP_BASE}").alias("gain"),
    )
    wb = Window.orderBy(F.col("score").desc(), "split_at")
    return scored.withColumn(
        "is_best",
        F.when(F.row_number().over(wb) == 1, 1).otherwise(0).cast("bigint"),
    )


GAIN_LABEL_CENTS = 15_000_000  # binary label: order total > 150k units


@query(
    "ext_feature_gini_gain",
    oracle=f"""
    WITH base AS (
        SELECT CASE WHEN {cents_sql('o_totalprice')} > {GAIN_LABEL_CENTS}
                    THEN 1 ELSE 0 END AS y,
               o_orderpriority, o_orderstatus,
               CAST(month(CAST(o_orderdate AS DATE)) AS VARCHAR) AS om
        FROM orders
    ), longf AS (
        SELECT 'priority' AS feature, o_orderpriority AS fv, y FROM base
        UNION ALL
        SELECT 'status', o_orderstatus, y FROM base
        UNION ALL
        SELECT 'month', om, y FROM base
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS c1
        FROM base
    ), per_v AS (
        SELECT feature, fv,
               CAST(COUNT(*) AS BIGINT) AS nv,
               CAST(SUM(y) AS BIGINT) AS cv1
        FROM longf GROUP BY feature, fv
    ), child AS (
        SELECT feature,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM((nv * nv - cv1 * cv1 - (nv - cv1) * (nv - cv1))
                        * 1000000 // (nv * t.n)) AS BIGINT)
                   AS child_gini_ppm
        FROM per_v, tot t GROUP BY feature
    ), parent AS (
        SELECT CAST((n * n - c1 * c1 - (n - c1) * (n - c1)) * 1000000
                    // (n * n) AS BIGINT) AS parent_gini_ppm
        FROM tot
    ), gains AS (
        SELECT c.feature, c.n_values, p.parent_gini_ppm, c.child_gini_ppm,
               p.parent_gini_ppm - c.child_gini_ppm AS gain_ppm
        FROM child c CROSS JOIN parent p
    )
    SELECT feature, n_values, parent_gini_ppm, child_gini_ppm,
           CAST(gain_ppm AS BIGINT) AS gain_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY gain_ppm DESC, feature)
                AS BIGINT) AS rk
    FROM gains
    """,
)
def ext_feature_gini_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tr2 — feature ranking by GINI GAIN (the CART split criterion, the
    classification sibling of ``ext_gbm_stump``'s variance reduction):
    for each candidate categorical feature, the impurity drop from
    splitting on it against a binary high-value label. Impurities are
    exact rationals ``(n² − Σc²)/n²`` cross-multiplied into ppm with one
    truncating division per feature value (identical quantization both
    engines) — the information-gain alternative would need libm logs;
    Gini needs none, which is exactly why CART chose it.

    Shape: ONE scan explodes 3 (feature, value, label) rows per order;
    per-feature stats are a bounded groupBy; nothing else moves."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.when(cents(F.col("o_totalprice")) > GAIN_LABEL_CENTS, 1)
        .otherwise(0)
        .alias("y"),
        "o_orderpriority",
        "o_orderstatus",
        F.month(F.col("o_orderdate").cast("date")).cast("string").alias("om"),
    )
    longf = (
        base.select(F.lit("priority").alias("feature"), F.col("o_orderpriority").alias("fv"), "y")
        .unionAll(base.select(F.lit("status"), F.col("o_orderstatus"), "y"))
        .unionAll(base.select(F.lit("month"), F.col("om"), "y"))
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("c1"),
    )
    per_v = longf.groupBy("feature", "fv").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv"),
        F.sum("y").cast("bigint").alias("cv1"),
    )
    child = per_v.crossJoin(broadcast(tot)).groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.expr(
            "CAST(SUM((nv * nv - cv1 * cv1 - (nv - cv1) * (nv - cv1))"
            " * 1000000 DIV (nv * n)) AS BIGINT)"
        ).alias("child_gini_ppm"),
    )
    parent = tot.select(
        F.expr(
            "CAST((n * n - c1 * c1 - (n - c1) * (n - c1)) * 1000000"
            " DIV (n * n) AS BIGINT)"
        ).alias("parent_gini_ppm")
    )
    gains = child.crossJoin(broadcast(parent)).select(
        "feature",
        "n_values",
        "parent_gini_ppm",
        "child_gini_ppm",
        (F.col("parent_gini_ppm") - F.col("child_gini_ppm")).alias("gain_ppm"),
    )
    wr = Window.orderBy(F.col("gain_ppm").desc(), "feature")
    return gains.select(
        "feature",
        "n_values",
        "parent_gini_ppm",
        "child_gini_ppm",
        F.col("gain_ppm").cast("bigint").alias("gain_ppm"),
        F.row_number().over(wr).cast("bigint").alias("rk"),
    )
