"""Round-9 verdict ask #5: the MAX_GRAM_DF skew guard's effect on the
substring-dedup gram self-join is MEASURED (tools/bench_scale_gramdf.py →
SCALE.md), and its fan-out contract is pinned here.

Corpus under test: 40 documents share an identical 20-token boilerplate
header (df = 40 > MAX_GRAM_DF = 32 — the shared-banner hazard), 5 exact
duplicate pairs carry the TRUE duplication, and the rest are fully unique.
The guard must drop every boilerplate gram while keeping every true-dup
gram, bounding per-gram join fan-out at C(cap, 2) instead of C(|docs|, 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.extensions.dedup_substring import (
    MAX_GRAM_DF,
    SUB_K,
    eligible_grams,
    gram_hits,
    gram_table,
    materialize_grams,
)

N_BP_DOCS = 40      # boilerplate carriers; df = 40 > MAX_GRAM_DF
BP_TOKENS = 20      # pure-boilerplate grams per doc = BP_TOKENS - SUB_K + 1
N_DUP_PAIRS = 5
DUP_TOKENS = 20     # grams per dup doc = DUP_TOKENS - SUB_K + 1, each df = 2


def _corpus(spark):
    bp = " ".join(f"bp{j}" for j in range(BP_TOKENS))
    rows = []
    for i in range(N_BP_DOCS):
        tail = " ".join(f"u{i}w{j}" for j in range(10))
        rows.append((i, f"{bp} {tail}"))
    for i in range(40, 100):  # unique filler docs
        rows.append((i, " ".join(f"q{i}w{j}" for j in range(DUP_TOKENS))))
    for p in range(N_DUP_PAIRS):  # true duplication: exact pairs
        text = " ".join(f"d{p}w{j}" for j in range(DUP_TOKENS))
        rows.append((100 + 2 * p, text))
        rows.append((101 + 2 * p, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_materialize_grams_size_keyed_switch(spark):
    """Under the row budget the gram table is localCheckpoint'd (plan
    collapses to an RDD scan); over it the lazy plan is returned so the
    three consumers recompute + ReusedExchange instead of exhausting
    single-box scratch (the round-9 10 M-doc lesson, now a code path)."""
    d = _corpus(spark)
    # the checkpointed plan collapses past the lead Window; the lazy one
    # keeps it (the corpus itself scans an ExistingRDD, so Window is the
    # discriminating operator, not the scan node)
    small = materialize_grams(d)  # default budget: far above this corpus
    assert "Window" not in small._jdf.queryExecution().executedPlan().toString()
    big = materialize_grams(d, max_rows=0)  # force the over-budget branch
    assert "Window" in big._jdf.queryExecution().executedPlan().toString()
    assert small.count() == big.count()


def test_materialize_grams_count_is_exact(spark):
    """The size switch counts EXACT gram rows — Σ_docs max(0, tokens−k+1) —
    not raw tokens (round-10 advisor: the token total overstates grams by
    (k−1)·docs and flips the switch early). Pinned by thresholding at the
    true gram count ± 1: at max_rows == n_grams it must checkpoint, at
    n_grams − 1 it must not. A sub-k doc (0 grams, would drive a naive
    per-doc difference negative) is included, and the explicit ``n_grams``
    bypass must honor the caller's number without rescanning."""
    d = _corpus(spark).unionAll(
        spark.createDataFrame([(999, "only three tokens")], "doc_id long, text string")
    )
    n = gram_table(d).count()
    at = materialize_grams(d, max_rows=n)
    below = materialize_grams(d, max_rows=n - 1)
    assert "Window" not in at._jdf.queryExecution().executedPlan().toString()
    assert "Window" in below._jdf.queryExecution().executedPlan().toString()
    forced = materialize_grams(d, max_rows=n, n_grams=n + 1)  # caller claims bigger
    assert "Window" in forced._jdf.queryExecution().executedPlan().toString()


def test_gram_table_rejects_k_below_2(spark):
    """k=1 has no lead window — a contract error, not an IndexError."""
    import pytest

    with pytest.raises(ValueError, match="k >= 2"):
        gram_table(_corpus(spark), k=1)


def test_cap_drops_boilerplate_keeps_true_duplication(spark):
    grams = gram_table(_corpus(spark)).localCheckpoint()
    elig = eligible_grams(grams, MAX_GRAM_DF)

    n_bp_grams = BP_TOKENS - SUB_K + 1
    n_dup_grams = DUP_TOKENS - SUB_K + 1

    # every boilerplate gram (df = 40) is dropped; every true-dup gram
    # (df = 2) survives — the guard removes the hazard, not the signal
    assert elig.count() == N_DUP_PAIRS * n_dup_grams

    capped = gram_hits(grams, elig)
    uncapped = gram_hits(grams, eligible_grams(grams, max_df=10**9))

    capped_n = capped.count()
    assert capped_n == N_DUP_PAIRS * n_dup_grams  # one hit per gid per pair

    # uncapped, each boilerplate gram alone contributes C(40, 2) hit rows —
    # the |docs|-quadratic blowup the cap exists to prevent
    bp_pairs = N_BP_DOCS * (N_BP_DOCS - 1) // 2
    assert uncapped.count() == capped_n + n_bp_grams * bp_pairs

    # per-gram fan-out bound under the cap: no gid may contribute more than
    # C(MAX_GRAM_DF, 2) doc pairs (single-occurrence grams)
    max_per_gid = (
        capped.groupBy("gid").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_per_gid <= MAX_GRAM_DF * (MAX_GRAM_DF - 1) // 2


def test_analytic_fanout_formula_matches_join(spark):
    """The bench tool's analytic projection — pairs per gid =
    (S^2 - sum(occ^2)) / 2 over per-doc occurrence counts — must equal the
    actual self-join row count (it gates which configs get materialized).

    The base corpus has occ == 1 for every (gid, doc_id), which degenerates
    the sum(occ^2) term (q == s == df) — so add a doc carrying the same
    13-gram TWICE (the tokens repeated back-to-back: positions 0 and 13)
    plus a second doc with it once: that gid has df=2, s=3, q=5, and both
    the formula ((9-5)/2 = 2) and gram_hits' positional fan-out (2 cross-doc
    position pairs) must take the occ>1 path."""
    rep = " ".join(f"r{j}" for j in range(SUB_K))
    extra = spark.createDataFrame(
        [(200, f"{rep} {rep}"), (201, rep)], "doc_id long, text string"
    )
    grams = gram_table(_corpus(spark).unionByName(extra)).localCheckpoint()
    occ = grams.groupBy("gid", "doc_id").count()
    stats = occ.groupBy("gid").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("count").cast("bigint").alias("s"),
        F.sum(F.col("count") * F.col("count")).cast("bigint").alias("q"),
    )
    # the planted repeat must actually produce an eligible occ>1 gid
    # (guards against a future corpus edit re-degenerating this test)
    assert (
        stats.where((F.col("q") > F.col("s")) & (F.col("df") >= 2)).count() == 1
    )
    for cap in (MAX_GRAM_DF, 10**9):
        # integral form, mirroring tools/bench_scale_gramdf.py: sum the even
        # quantity (s^2 - q) as int64 and halve after — never via a double
        analytic2 = (
            stats.where(F.col("df").between(2, cap))
            .agg(F.sum(F.col("s") * F.col("s") - F.col("q")).cast("bigint"))
            .collect()[0][0]
        )
        measured = gram_hits(grams, eligible_grams(grams, cap)).count()
        assert int(analytic2) // 2 == measured


def test_shared_gram_hits_single_exchange(spark):
    """Round-12 single-exchange contract (the 20 M-doc disk-bound fix):
    after execution, shared_gram_hits' final AQE plan materializes exactly
    TWO real hash exchanges — documents by doc_id, the gram table by gid —
    and every other consumer branch (df histogram, both self-join sides)
    is a ReusedExchange of the gid stage. This is what cut the measured
    shuffle volume 2.9x; if a future edit de-canonicalizes the branches
    (per-branch pruning, a new inferred filter, a localCheckpoint leaf),
    the repeats come back as REAL exchanges and this pins the regression.

    Semantics twin: results must equal the legacy materialize_grams +
    gram_hits path exactly (unordered)."""
    from conftest import SF_DIR

    from databricks_sales_etl_pipeline_spark.catalog import load
    from databricks_sales_etl_pipeline_spark.extensions.dedup_substring import (
        shared_gram_hits,
    )

    d = load(spark, SF_DIR, "documents")
    hits = shared_gram_hits(d)
    rows_new = sorted(map(tuple, hits.collect()))

    final = (
        hits._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # a ReusedExchange line CITES its target ("ReusedExchange [...],
    # Exchange hashpartitioning(...)"), so subtract the citations
    reused = final.count("ReusedExchange")
    real = final.count("Exchange hashpartitioning") - reused
    assert real == 2, f"expected 2 materialized exchanges, saw {real}"
    assert reused >= 3, f"expected >=3 ReusedExchange branches, saw {reused}"

    grams = materialize_grams(d)
    legacy = gram_hits(grams, eligible_grams(grams)).select(
        "doc_a", "doc_b", "pa", "pb"
    )
    assert rows_new == sorted(map(tuple, legacy.collect()))


def test_dp_packing_guard_raises(spark):
    """Round-12 advice item: the (doc_id, pos) packing dp = doc_id*2^24+pos
    must fail LOUDLY when doc_id >= 2^39 (or pos >= 2^24) instead of
    silently bleeding pos bits into doc_id and emitting wrong pairs."""
    import pytest

    from databricks_sales_etl_pipeline_spark.extensions.dedup_substring import (
        shared_gram_hits,
    )

    text = " ".join(f"t{j}" for j in range(SUB_K))
    d = spark.createDataFrame(
        [(1 << 40, text), ((1 << 40) + 1, text)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="dp packing overflow"):
        shared_gram_hits(d).collect()
