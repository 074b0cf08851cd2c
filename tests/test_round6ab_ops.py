"""Round-6 twenty-eighth wave: Shapley data-driven attribution."""

from __future__ import annotations

import os
from itertools import combinations

from databricks_sales_etl_pipeline_spark import registry
from databricks_sales_etl_pipeline_spark.extensions.analytics import (
    SHAP_CHANNELS,
    SHAP_CONV,
)

registry.load_all()
QUERIES = registry.QUERIES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


class TestAttributionShapley:
    def test_matches_python_shapley(self, spark):
        import duckdb
        from collections import defaultdict
        from math import factorial

        rows = duckdb.sql(
            f"""SELECT user_id, event_type FROM '{SF_DIR}/events.parquet'"""
        ).fetchall()
        users = defaultdict(set)
        for u, t in rows:
            users[u].add(t)
        by_set = defaultdict(lambda: [0, 0])
        for u, types in users.items():
            bmp = sum(
                (1 << i) for i, ch in enumerate(SHAP_CHANNELS) if ch in types
            )
            by_set[bmp][0] += 1
            by_set[bmp][1] += 1 if SHAP_CONV in types else 0

        def rate(s):
            n, c = by_set.get(s, (0, 0))
            return c * 1_000_000 // n if n else 0

        k = len(SHAP_CHANNELS)
        want = {}
        for ci, ch in enumerate(SHAP_CHANNELS):
            phi24 = 0
            for s in range(16):
                if (s >> ci) & 1:
                    continue
                bits = bin(s).count("1")
                w24 = factorial(bits) * factorial(k - bits - 1)
                phi24 += w24 * (rate(s + (1 << ci)) - rate(s))
            want[ch] = phi24
        out = {r["channel"]: r for r in QUERIES["ext_attribution_shapley"](spark, SF_DIR).collect()}
        assert set(out) == set(SHAP_CHANNELS)
        for ch in SHAP_CHANNELS:
            assert out[ch]["phi24_ppm"] == want[ch], ch
        # efficiency (when every subset is populated): Σφ = v(full) − v(∅)
        if all(s in by_set for s in range(16)):
            total = sum(want.values())
            assert total == 24 * (rate(15) - rate(0))


class TestVocabGrowth:
    def test_matches_python_cumulative_distinct(self, spark):
        docs = sorted(
            (r["doc_id"], r["text"])
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        )
        from databricks_sales_etl_pipeline_spark.extensions.textstats import (
            VOCAB_GRID_STEPS,
        )

        n_docs = docs[-1][0] + 1
        out = sorted(
            QUERIES["ext_vocab_growth"](spark, SF_DIR).collect(),
            key=lambda r: r["docs_seen"],
        )
        assert len(out) == VOCAB_GRID_STEPS
        prev = 0
        for r in out:
            seen = set()
            for doc_id, text in docs:
                if doc_id < r["docs_seen"]:
                    seen.update(t for t in text.lower().split() if t)
            assert r["vocab"] == len(seen), r["docs_seen"]
            assert r["new_tokens"] == len(seen) - prev
            prev = len(seen)
        assert out[-1]["docs_seen"] == n_docs
        # growth is monotone and decelerating on a natural-ish corpus
        vocabs = [r["vocab"] for r in out]
        assert vocabs == sorted(vocabs)
