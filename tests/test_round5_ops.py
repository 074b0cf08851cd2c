"""Round-5 operator tests: ADVICE regression pins + new operators.

Each new §2.7 operator added this round gets (a) its parity entry exercised
automatically by test_parity.py and (b) a semantic unit test here on an
engineered corpus where the expected answer is computable by hand.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.registry import (
    ORACLES,
    QUERIES,
    load_all,
)

load_all()


def _mini_docs_dir(tmp_path, spark, rows):
    """Write a minimal documents.parquet testdata dir for corpus-shaped tests."""
    d = tmp_path / "sf_mini"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _duck_for(sf_dir):
    conn = duckdb.connect()
    conn.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return conn


class TestAdviceRegressions:
    def test_cluster_topics_keeps_zero_token_docs(self, spark, tmp_path):
        """Round-4 ADVICE (medium): NULL/empty/whitespace-only docs must get
        a zero vector and a topic, matching the oracle's doc_id grid."""
        rows = [
            (i, f"alpha beta gamma doc{i} " * 3, "en", "c") for i in range(8)
        ] + [(8, "", "en", "c"), (9, "   ", "en", "c"), (10, None, "en", "c")]
        sf = _mini_docs_dir(tmp_path, spark, rows)
        out = QUERIES["ext_cluster_topics"](spark, sf).toPandas()
        assert sorted(out["doc_id"]) == list(range(11))
        conn = _duck_for(sf)
        oracle = conn.execute(ORACLES["ext_cluster_topics"]).df()
        conn.close()
        s = sorted(map(tuple, out[["doc_id", "topic"]].values.tolist()))
        d = sorted(map(tuple, oracle[["doc_id", "topic"]].values.tolist()))
        assert s == d

    def test_train_kmeans_raises_without_low_ids(self, spark):
        from databricks_sales_etl_pipeline_spark.extensions.similarity import (
            train_kmeans,
        )

        vecs = spark.createDataFrame(
            [(100 + i, [i, i]) for i in range(4)], "vec_id bigint, v array<bigint>"
        )
        with pytest.raises(ValueError, match="seed"):
            train_kmeans(vecs, k=4, iters=1)

class TestSubstringDedup:
    def test_planted_verbatim_span(self, spark, tmp_path):
        """Two otherwise-distinct docs share a 20-token verbatim paragraph;
        the operator must report exactly one maximal span of 20 tokens at
        the right positions (and nothing for the unrelated doc)."""
        span = " ".join(f"boiler{i}" for i in range(20))
        rows = [
            (0, "aa bb cc " + span + " dd ee", "en", "s"),
            (1, "xx yy " + span + " zz qq rr", "en", "s"),
            (2, "totally unrelated words only here " * 5, "en", "s"),
        ]
        sf = _mini_docs_dir(tmp_path, spark, rows)
        out = QUERIES["ext_dedup_substring"](spark, sf).toPandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r.doc_a, r.doc_b) == (0, 1)
        assert r.len_tokens == 20
        assert (r.start_a, r.start_b) == (3, 2)

    def test_hot_gram_capped(self, spark, tmp_path):
        """A 13-gram shared by MORE than MAX_GRAM_DF docs is boilerplate —
        dropped, producing no quadratic hit volume."""
        from databricks_sales_etl_pipeline_spark.extensions.dedup_substring import (
            MAX_GRAM_DF,
        )

        span = " ".join(f"hot{i}" for i in range(13))
        rows = [
            (i, f"unique{i} " + span + f" tail{i}", "en", "s")
            for i in range(MAX_GRAM_DF + 5)
        ]
        sf = _mini_docs_dir(tmp_path, spark, rows)
        out = QUERIES["ext_dedup_substring"](spark, sf).toPandas()
        assert len(out) == 0  # 37 docs share it -> above cap -> dropped


class TestGuardedMinhash:
    def test_boilerplate_corpus_bounded(self, spark, tmp_path):
        """Engineered boilerplate corpus: 60 docs whose minimum band hash
        comes from a shared header. The unguarded join would produce
        ~60²/2 candidate pairs; the guard drops the hot buckets, reports
        them, and keeps candidates bounded by cap² per bucket."""
        from databricks_sales_etl_pipeline_spark.extensions.dedup_substring import (
            HOT_BAND_CAP,
        )

        header = "shared corporate header line for every page"
        rows = [
            (i, header + f" unique body {i} content {i * 7} end", "en", "s")
            for i in range(60)
        ]
        sf = _mini_docs_dir(tmp_path, spark, rows)
        out = QUERIES["ext_dedup_minhash_guarded"](spark, sf).toPandas()
        report = out[out.kind == "hot_band"]
        pairs = out[out.kind == "pair"]
        assert len(report) > 0, "hot buckets must be reported, not silent"
        assert (report.bucket_pop > HOT_BAND_CAP).all()
        # no bucket survives with population > cap -> candidate volume from
        # any single bucket is <= cap*(cap-1)/2
        assert len(pairs) <= 8 * HOT_BAND_CAP * (HOT_BAND_CAP - 1) / 2

    def test_matches_unguarded_when_no_hot_buckets(self, spark):
        """On the real (non-boilerplate) testdata the guard is a no-op:
        pair rows == ext_dedup_minhash_verified's rows."""
        from tests.conftest import SF_DIR

        guarded = QUERIES["ext_dedup_minhash_guarded"](spark, SF_DIR).toPandas()
        base = QUERIES["ext_dedup_minhash_verified"](spark, SF_DIR).toPandas()
        g = sorted(
            map(
                tuple,
                guarded[guarded.kind == "pair"][["doc_a", "doc_b"]]
                .astype(int)
                .values.tolist(),
            )
        )
        b = sorted(map(tuple, base[["doc_a", "doc_b"]].astype(int).values.tolist()))
        assert g == b
        assert len(guarded[guarded.kind == "hot_band"]) == 0


class TestBloomDecontaminate:
    def test_no_false_negatives_and_bounded_fpr(self, spark, tmp_path):
        """Every corpus doc whose text equals a held-out doc's text MUST be
        flagged (Bloom has no false negatives); unrelated docs are flagged
        at a rate bounded by the filter geometry."""
        n = 400
        held_texts = {i: f"held document number {i} payload" for i in range(n)}
        rows = []
        for i in range(n):
            # doc_id % 10 == 3 -> held set
            rows.append((i * 10 + 3, held_texts[i], "en", "s"))
            # a true contamination copy and a clean doc
            if i < 50:
                rows.append((i * 10 + 4, held_texts[i], "en", "s"))
            rows.append((i * 10 + 5, f"clean totally different text {i}", "en", "s"))
        sf = _mini_docs_dir(tmp_path, spark, rows)
        flagged = set(
            QUERIES["ext_bloom_decontaminate"](spark, sf).toPandas()["doc_id"]
        )
        true_hits = {i * 10 + 4 for i in range(50)}
        assert true_hits <= flagged, "bloom filter produced a false negative"
        clean = {i * 10 + 5 for i in range(n)}
        fpr = len(flagged & clean) / len(clean)
        # geometry: k=5, n=400, m=4096 -> theoretical FPR ~3.7%; allow 3x
        assert fpr < 0.12, f"false positive rate {fpr:.3f} out of bounds"


class TestRound5Plans:
    def test_dpp_prunes_fact_partitions(self, spark):
        """join_dpp_prune must carry a dynamic-partition-pruning subquery on
        the fact scan — without it the partitioned fact is read in full."""
        from tests.conftest import SF_DIR

        df = QUERIES["join_dpp_prune"](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "dynamicpruning" in plan.lower(), plan[:2000]

    def test_shallow_clone_copies_no_data(self, spark, tmp_path):
        """clone_to writes only a commit log — zero data files in the clone
        directory; reads still serve the pinned source version."""
        from databricks_sales_etl_pipeline_spark.plans.versioned import (
            VersionedTable,
        )

        n = spark.range(100).withColumnRenamed("id", "k")
        src = VersionedTable(spark, str(tmp_path / "src"))
        src.write(n, mode="overwrite")
        clone = src.clone_to(str(tmp_path / "clone"))
        data_files = [
            f
            for f in (tmp_path / "clone").rglob("*")
            if f.is_file() and f.suffix == ".parquet"
        ]
        assert data_files == [], "shallow clone must not copy data files"
        # source moves on; clone still reads the pinned snapshot
        src.write(n.where("k < 10"), mode="overwrite")
        assert clone.read().count() == 100
        assert src.read().count() == 10


class TestRound5Semantics:
    def test_attribution_credits_sum_to_10000_per_user(self, spark):
        """Every user journey's position-based credits must total exactly
        10000 bp — the integer remainder allocation may not leak credit."""
        from tests.conftest import SF_DIR
        from databricks_sales_etl_pipeline_spark.catalog import load
        import pyspark.sql.functions as F

        total_bp = (
            QUERIES["ext_attribution_position"](spark, SF_DIR)
            .agg(F.sum("credit_bp"))
            .collect()[0][0]
        )
        n_users = (
            load(spark, SF_DIR, "events").select("user_id").distinct().count()
        )
        assert total_bp == 10000 * n_users

    def test_interval_overlap_matches_theta_join(self, spark):
        """The bucketed equi-join must produce exactly the rows of the
        naive theta join (the buckets are an optimization, not a filter)."""
        from tests.conftest import SF_DIR
        from databricks_sales_etl_pipeline_spark.catalog import load
        import pyspark.sql.functions as F

        got = sorted(
            map(
                tuple,
                QUERIES["join_interval_overlap"](spark, SF_DIR)
                .toPandas()
                .values.tolist(),
            )
        )
        o = load(spark, SF_DIR, "orders")
        li = load(spark, SF_DIR, "lineitem")
        a = o.where(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.col("o_orderdate").alias("a_start"),
            F.date_add("o_orderdate", 14).alias("a_end"),
        )
        b = li.where(
            (F.col("l_orderkey") % 89 == 0) & (F.col("l_linenumber") == 1)
        ).select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("b_start"),
            F.date_add("l_shipdate", 7).alias("b_end"),
        )
        theta = a.crossJoin(b).where(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        want = sorted(
            map(
                tuple,
                theta.select(
                    "o_orderkey",
                    "l_orderkey",
                    "l_linenumber",
                    (
                        F.datediff(
                            F.least("a_end", "b_end"),
                            F.greatest("a_start", "b_start"),
                        )
                        + 1
                    ).cast("bigint").alias("overlap_days"),
                )
                .toPandas()
                .values.tolist(),
            )
        )
        assert got == want
