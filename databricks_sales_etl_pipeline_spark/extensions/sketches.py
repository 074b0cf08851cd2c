"""Frequency-sketch family (north-star LLM-pipeline items; the reference's
notebooks have no sketch surface — REFERENCE_MAP.md).

``ext_heavy_hitters`` is the classic two-pass exact heavy-hitters at scale:
pass 1 finds per-partition locally-frequent candidates WITHOUT a shuffle
(pigeonhole: an item with global share > 1/k must have local share > 1/k in
at least one partition, so the candidate union is a superset of every true
heavy hitter); pass 2 recounts ONLY the candidates exactly and applies the
global threshold. The final output is therefore exact and layout-independent
— the partition-dependent candidate set is an internal superset that the
strict global filter reduces to the same answer under any partitioning —
which is what makes a partition-local sketch hash-checkable against a plain
GROUP BY/HAVING oracle.

At 100 TB the point is the shuffle bound: the full token stream never
shuffles — only candidate tokens (≤ k per partition) reach the exact
recount, whose probe side is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load
from ..registry import query

_WS = r"\s+"

HH_K = 200  # heavy hitter = token with > 1/k of all token occurrences


def _local_candidates_fn():
    """Per-partition candidate pass as Arrow-batched mapInPandas: accumulate
    exact local counts vectorized (value_counts per batch), emit tokens whose
    local count × k exceeds the partition's token count."""
    import pandas as pd

    def cands(batches):
        counts: dict[str, int] = {}
        n_local = 0
        for pdf in batches:
            n_local += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
        keep = [t for t, c in counts.items() if c * HH_K > n_local]
        yield pd.DataFrame({"token": pd.Series(keep, dtype="object")})

    return cands


@query(
    "ext_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(*) * 10000 // (SELECT n_tok FROM tot) AS BIGINT)
               AS share_bp
    FROM toks
    GROUP BY token
    HAVING COUNT(*) * {HH_K} > (SELECT n_tok FROM tot)
    """,
)
def ext_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sk1 — exact heavy hitters over the corpus token stream with a
    bounded shuffle: per-partition locally-frequent candidates (no
    shuffle), broadcast-semi-join the stream against them, exact recount,
    strict global > n/k filter. Output: token, exact count, share in basis
    points (integer DIV — parity-safe)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), _WS)).alias("token")
    ).where(F.col("token") != "")

    cands = (
        toks.mapInPandas(_local_candidates_fn(), "token string")
        .distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    exact = (
        toks.join(broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(broadcast(total))
        .where(F.col("cnt") * HH_K > F.col("n_tok"))
        .select(
            "token",
            "cnt",
            F.expr("CAST(cnt * 10000 DIV n_tok AS BIGINT)").alias("share_bp"),
        )
    )


# --- corpus bigram novelty --------------------------------------------------

NOVELTY_TOP_N = 500  # "boilerplate" = the N most frequent corpus bigrams


@query(
    "ext_ngram_novelty",
    oracle=f"""
    WITH lt AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM lt
    ),
    top AS (
        SELECT bigram FROM (
            SELECT bigram,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram ASC) AS rn
            FROM bg GROUP BY bigram
        ) WHERE rn <= {NOVELTY_TOP_N}
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) FILTER (WHERE t.bigram IS NULL) AS BIGINT) AS n_novel,
           CAST(COUNT(*) FILTER (WHERE t.bigram IS NULL) * 10000 // COUNT(*)
                AS BIGINT) AS novel_bp
    FROM bg b LEFT JOIN top t ON t.bigram = b.bigram
    GROUP BY b.doc_id
    """,
)
def ext_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sk2 — per-document novelty against the corpus's top-N bigram table:
    the share (basis points, integer DIV) of a doc's bigram OCCURRENCES
    that fall outside the N globally most frequent bigrams. Low novelty =
    boilerplate; a real curation signal next to the Gopher gates.

    Scale: bigrams via the long-format posexplode + lead-window pipeline
    (whole-stage codegen — the documented HOF mitigation); the corpus top-N
    is a TakeOrdered partial top-k (NO single-partition global window) and
    broadcasts to the per-doc scoring join. Two shuffles total (doc window,
    bigram groupBy)."""
    from pyspark.sql import Window

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
            F.concat_ws(" ", F.col("w"), F.lead("w", 1).over(win)).alias(
                "bigram"
            ),
            F.lead("w", 1).over(win).isNotNull().alias("_full"),
        )
        .where("_full")
        .drop("_full")
    )
    top = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("bigram"))
        .limit(NOVELTY_TOP_N)
        .select("bigram", F.lit(True).alias("is_top"))
    )
    return (
        bg.join(broadcast(top), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count_if(F.col("is_top").isNull()).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_novel",
            F.expr("CAST(n_novel * 10000 DIV n_bigrams AS BIGINT)").alias(
                "novel_bp"
            ),
        )
    )


# --- approximate quantiles --------------------------------------------------


@query("ext_quantile_approx")  # rows-only: GK-sketch estimates have no SQL twin
def ext_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sk3 — approx_percentile (Greenwald–Khanna sketch) beside the exact
    interpolated percentile, per order priority, on integer cents. The
    sketch is the 100 TB posture (mergeable, bounded memory, one pass);
    the exact twin rides the same shuffle so the row carries its own
    ground truth. accuracy = 10000 → rank error ≤ n/10000; the unit test
    asserts the bound. Rows-only driver check (sketch internals are
    engine-specific); the exact columns are the oracle-of-record."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice").cast("double") * 100 + 0.5).cast(
        "long"
    )
    return (
        o.select("o_orderpriority", cents.alias("c"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(approx_percentile(c, 0.5, 10000) AS BIGINT)"
            ).alias("p50_approx"),
            F.expr(
                "CAST(approx_percentile(c, 0.99, 10000) AS BIGINT)"
            ).alias("p99_approx"),
            F.expr("percentile(c, 0.5)").alias("p50_exact"),
            F.expr("percentile(c, 0.99)").alias("p99_exact"),
        )
    )


# --- mergeable HLL sketches -------------------------------------------------


@query("ext_hll_union")  # rows-only: sketch binaries are engine-specific
def ext_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sk4 — MERGEABLE cardinality sketches (Datasketches HLL, Spark 3.5+):
    build one sketch per order month, then union the monthly sketches per
    year with hll_union_agg — the re-aggregation pattern exact distinct
    counts cannot do (you cannot add December's count-distinct to
    November's). At 100 TB this is how daily uniques roll into
    monthly/yearly without rescanning history: persist the day sketches
    (a few KB each), union on demand. The exact yearly distinct rides
    along as the oracle-of-record; the unit test bounds the estimate's
    relative error. Rows-only driver check (sketch layout is
    engine-specific)."""
    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        "o_custkey",
    )
    monthly = o.groupBy("yr", "mo").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_month"),
    )
    return (
        monthly.groupBy("yr")
        .agg(
            F.expr(
                "CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)"
            ).alias("uniques_est"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .join(
            o.groupBy("yr").agg(
                F.countDistinct("o_custkey").alias("uniques_exact")
            ),
            "yr",
        )
        .select("yr", "n_months", "uniques_est", "uniques_exact")
    )
