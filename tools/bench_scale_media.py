#!/usr/bin/env python
"""Multimodal scale-stress: synthesize real 8×8 P6 payloads DISTRIBUTED,
run the perceptual-hash dedup pipeline (byte parse → aHash → 4×16-bit
banding → band self-join → exact Hamming verify) at image counts far
beyond the 1500-image fixture, so SCALE.md's multimodal claims are
measured.

Generator note: the fixture's affine pixel formula depends on base mod 200
only — at 10⁵+ images that collapses to ~200 distinct patterns and the
band join degenerates quadratically (the SCALE.md affine-generator trap).
Here pixels come from a multiplicative-mix of (base, i) so distinct bases
give unrelated images; clusters are size ~10 regardless of n, keeping true
pairs linear in n.

    PYTHONPATH=. python tools/bench_scale_media.py [n_images ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.extensions.multimodal import (
    PHASH_T,
    _phash_bands,
)
from databricks_sales_etl_pipeline_spark.session import (
    get_spark,
    tune_shuffle_partitions,
)

CLUSTER_SIZE = 10  # docs per planted near-dup cluster


def gen_and_hash(ids_df):
    """Distributed stage: synthesize the P6 bytes and hash them in ONE
    mapInPandas pass (payloads never leave the task)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                base = did // CLUSTER_SIZE

                def mix(b, i):
                    # xorshift-multiply avalanche: unrelated pixel patterns
                    # per base (any affine-in-i form collapses to ~few aHash
                    # shapes and the band join degenerates - measured)
                    v = (b * 2654435761 ^ (i * 40503 + 0x9E3779B9)) & 0xFFFFFFFF
                    v = ((v ^ (v >> 13)) * 1274126177) & 0xFFFFFFFF
                    return (v >> 8) % 200

                px = [mix(base, i) + (did * 7 + i) % 2 for i in range(64)]
                payload = b"P6\n8 8\n255\n" + bytes(
                    b for p in px for b in (p, p, p)
                )
                b0, b1, b2, b3 = _phash_bands(payload)
                rows.append(
                    {"doc_id": did, "b0": b0, "b1": b1, "b2": b2, "b3": b3}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "b0", "b1", "b2", "b3"])

    return ids_df.mapInPandas(
        run, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = get_spark("dsep-scale-media")
    out = []
    for n in sizes:
        tune_shuffle_partitions(spark, n * 40)
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        t0 = time.perf_counter()
        sig = gen_and_hash(ids).localCheckpoint()
        t_hash = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("bigint").alias("j"),
                            F.col(f"b{j}").alias("b"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("jb"),
        ).select("doc_id", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        a = bands.select(F.col("doc_id").alias("da"), "j", "b")
        bb = bands.select(F.col("doc_id").alias("db"), "j", "b")
        cand = (
            a.join(bb, ["j", "b"])
            .where(F.col("da") < F.col("db"))
            .select("da", "db")
            .distinct()
        )
        sa = sig.select(
            F.col("doc_id").alias("da"),
            *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
        )
        sb = sig.select(
            F.col("doc_id").alias("db"),
            *[F.col(f"b{j}").alias(f"x{j}") for j in range(4)],
        )
        ham = sum(
            F.bit_count(F.expr(f"a{j} ^ x{j}")) for j in range(4)
        ).cast("long")
        n_pairs = (
            cand.join(sa, "da")
            .join(sb, "db")
            .where(ham.alias("h") <= PHASH_T)
            .count()
        )
        t_join = round(time.perf_counter() - t0, 2)
        rec = {
            "images": n,
            "near_dup_pairs": n_pairs,
            "hash_s": t_hash,
            "band_join_verify_s": t_join,
        }
        out.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"media_scale_results": out}))


if __name__ == "__main__":
    main()
