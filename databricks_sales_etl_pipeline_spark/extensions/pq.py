"""Product quantization (PQ) — the ANN compression component (north-star
LLM-pipeline item; no reference twin — the reference's notebooks do plain
sales ETL, see REFERENCE_MAP.md).

PQ is how a 100 TB embedding corpus actually fits an ANN index: split each
D-dim vector into S subspaces, k-means each subspace independently, and
store S small codes (here 4 × 3 bits) instead of D floats — a 64-dim
float32 vector (256 B) compresses to 4 codes (≤ 4 B), with search done via
per-subspace lookup tables. The index-build dataflow reuses
``similarity.train_kmeans`` (one groupBy shuffle of K·subdim longs per
Lloyd iteration, bounded driver artifact) once per subspace; the final
encode is a single zero-shuffle Arrow pandas UDF over the corpus.

Everything is integer-exact (milli-unit quantized vectors, floor-mean
centroids, int64 squared distances), so the WHOLE pipeline — all four
per-subspace Lloyd trainings AND the final codes + reconstruction error —
is hash-checked against a DuckDB twin that unrolls the same iterations as
namespaced CTE chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .similarity import LLOYD_ITERS, quantize

PQ_SUB = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (embeddings are 64-dim)
PQ_K = 8  # codes per subspace
PQ_QUERIES = 10  # ADC search: first N vectors double as the query set
PQ_TOPK = 5
#: refine stage: exact re-rank shortlist = PQ_REFINE_MULT x PQ_TOPK rows
#: per query (round-13 measured curve, SCALE.md: at 1 M vectors ADC-only
#: recall@10 saturates ~0.16 regardless of code count, while exact re-rank
#: recovers 0.39 at a 100-row shortlist and 0.75 at 1000 — the shortlist,
#: not the code count, is the serving-quality lever)
PQ_REFINE_MULT = 3


def _assign_all_fn(cent_sets):
    """Nearest codebook centroid for ALL subspaces in one Arrow pass —
    returns [cid_0..cid_{S-1}] per row. Same exact int-in-float64 distance
    math and first-minimum (= dist ASC, cid ASC) tiebreak as the encoder."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mats = [
        (
            np.array([c for c, _ in cents], dtype=np.int64),
            np.array([cv for _, cv in cents], dtype=np.float64),
        )
        for cents in cent_sets
    ]

    @pandas_udf("array<long>")
    def assign_all(v):
        if v.empty:
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        n = len(V)
        out = np.empty((n, PQ_SUB), dtype=np.int64)
        for si, (cids, C) in enumerate(mats):
            Vs = V[:, si * PQ_SUBDIM : (si + 1) * PQ_SUBDIM]
            vn = (Vs * Vs).sum(axis=1)
            cn = (C * C).sum(axis=1)
            d = vn[:, None] - 2.0 * (Vs @ C.T) + cn[None, :]
            out[:, si] = cids[d.argmin(axis=1)]
        return pd.Series([list(row) for row in out])

    return assign_all


def _train_codebooks(vecs, k: int = PQ_K):
    """All S codebooks trained JOINTLY: the subspace Lloyd problems are
    independent, so one corpus scan per iteration serves every subspace —
    assign all S cids in one Arrow pass, posexplode to (si, cid) rows
    (in-memory only: map-side partial aggregation collapses them before the
    shuffle, which carries S·K groups of D sums), floor-mean on the driver.
    3 actions total instead of S×(ITERS+1) separate trainings — the same
    bit-exact centroids as ``similarity.train_kmeans`` per 16-dim slice
    (the per-subspace oracle chains pin this)."""
    seed_rows = (
        vecs.where(F.col("vec_id") < k).select("vec_id", "v").collect()
    )
    if not seed_rows:
        raise ValueError(
            f"_train_codebooks: no seed vectors with vec_id < {k}; the "
            "seeding contract requires ids starting at 0"
        )
    dim = len(seed_rows[0]["v"])
    cent_sets = [
        sorted(
            (
                int(r["vec_id"]),
                [int(x) for x in r["v"]][
                    si * PQ_SUBDIM : (si + 1) * PQ_SUBDIM
                ],
            )
            for r in seed_rows
        )
        for si in range(PQ_SUB)
    ]
    for _ in range(LLOYD_ITERS):
        assign_all = _assign_all_fn(cent_sets)
        # long-format update (round-13, same rationale as
        # similarity.train_kmeans): the wide form built D getItem SUMs per
        # iteration — heavy driver-side expression chatter — and computed
        # all D sums for every (si, cid) group although each subspace only
        # uses its own subdim slice. posexplode v to (d, val), recover the
        # subspace as d DIV subdim and its cid from the assignment array:
        # 3 Column objects, K·D groups after partial aggregation, and only
        # the sums that are actually used. Identical exact integers.
        stats = (
            vecs.select(assign_all("v").alias("cids"), "v")
            .select("cids", F.posexplode("v").alias("d", "val"))
            .select(
                "d",
                "val",
                F.element_at(
                    "cids", F.expr(f"CAST(d DIV {PQ_SUBDIM} AS INT) + 1")
                ).alias("cid"),
            )
            .groupBy("d", "cid")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in stats:
            d = int(r["d"])
            acc.setdefault((d // PQ_SUBDIM, int(r["cid"])), {})[
                d % PQ_SUBDIM
            ] = (int(r["s"]), int(r["n"]))
        new_sets: list[list] = [[] for _ in range(PQ_SUB)]
        for (si, cid), dims in acc.items():
            new_sets[si].append(
                (cid, [dims[dl][0] // dims[dl][1] for dl in range(PQ_SUBDIM)])
            )
        cent_sets = [sorted(s) for s in new_sets]
    return cent_sets


def _pq_encode_fn(cent_sets):
    """One Arrow batch pass: per subspace, exact int-in-float64 squared
    distances to that subspace's centroids (same matmul form and exactness
    argument as ``similarity._sqdists`` — every product/partial sum is an
    integer ≪ 2^53), argmin code (first-minimum on cid-sorted rows = the
    oracle's dist ASC, cid ASC tiebreak), plus the summed reconstruction
    error. Returns [code_0..code_{S-1}, recon_err] per row."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mats = [
        (
            np.array([c for c, _ in cents], dtype=np.int64),
            np.array([cv for _, cv in cents], dtype=np.float64),
        )
        for cents in cent_sets
    ]

    @pandas_udf("array<long>")
    def encode(v):
        if v.empty:
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        n = len(V)
        codes = np.empty((n, PQ_SUB), dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        for si, (cids, C) in enumerate(mats):
            Vs = V[:, si * PQ_SUBDIM : (si + 1) * PQ_SUBDIM]
            vn = (Vs * Vs).sum(axis=1)
            cn = (C * C).sum(axis=1)
            d = (vn[:, None] - 2.0 * (Vs @ C.T) + cn[None, :]).astype(np.int64)
            idx = d.argmin(axis=1)
            codes[:, si] = cids[idx]
            err += d[np.arange(n), idx]
        return pd.Series(
            [list(codes[i]) + [int(err[i])] for i in range(n)]
        )

    return encode


_SQD_NS = (
    "list_sum(list_transform(range(1, len(v.v) + 1),"
    " i -> (v.v[i] - c.cv[i]) * (v.v[i] - c.cv[i])))"
)


def _pq_chain(si: int) -> str:
    """Namespaced DuckDB Lloyd chain for subspace ``si``: slice → seed →
    unrolled iterations (same floor-mean and tiebreak shapes as
    ``similarity._kmeans_cte_prefix``) → final (vec_id, cid, d)."""
    ns = f"p{si}"
    lo, hi = si * PQ_SUBDIM + 1, (si + 1) * PQ_SUBDIM

    def assign(src_c: str, out: str, keep_d: bool = False) -> str:
        d_col = f", CAST({_SQD_NS} AS BIGINT) AS d" if keep_d else ""
        d_keep = ", d" if keep_d else ""
        return f"""{out} AS (
        SELECT vec_id, v, cid{d_keep} FROM (
            SELECT v.vec_id, v.v, c.cid{d_col},
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_SQD_NS} ASC, c.cid ASC) AS rn
            FROM {ns}v v CROSS JOIN {src_c} c
        ) WHERE rn = 1
    )"""

    def update(src_a: str, out: str) -> str:
        return f"""{out} AS (
        SELECT cid, list(m ORDER BY dim) AS cv FROM (
            SELECT cid, dim, (s - ((s % n) + n) % n) // n AS m
            FROM (
                SELECT cid, dim, SUM(val) AS s, COUNT(*) AS n
                FROM (
                    SELECT cid, unnest(range(1, len(v) + 1)) AS dim,
                           unnest(v) AS val
                    FROM {src_a}
                ) exploded
                GROUP BY cid, dim
            ) sums
        ) means
        GROUP BY cid
    )"""

    ctes = [
        f"{ns}v AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM qvecs)",
        f"{ns}c0 AS (SELECT vec_id AS cid, v AS cv FROM {ns}v WHERE vec_id < {PQ_K})",
    ]
    src = f"{ns}c0"
    for it in range(1, LLOYD_ITERS + 1):
        ctes.append(assign(src, f"{ns}a{it}"))
        ctes.append(update(f"{ns}a{it}", f"{ns}c{it}"))
        src = f"{ns}c{it}"
    ctes.append(assign(src, f"{ns}fin", keep_d=True))
    return ",\n    ".join(ctes)


def _pq_oracle() -> str:
    qv = (
        "list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
    )
    chains = ",\n    ".join(_pq_chain(si) for si in range(PQ_SUB))
    code_cols = ", ".join(f"p{si}fin.cid AS code_{si}" for si in range(PQ_SUB))
    err = " + ".join(f"p{si}fin.d" for si in range(PQ_SUB))
    joins = " ".join(
        f"JOIN p{si}fin ON p{si}fin.vec_id = p0fin.vec_id"
        for si in range(1, PQ_SUB)
    )
    return f"""WITH qvecs AS (SELECT vec_id, {qv} AS v FROM embeddings),
    {chains}
    SELECT p0fin.vec_id AS vec_id, {code_cols},
           CAST({err} AS BIGINT) AS recon_err
    FROM p0fin {joins}
    ORDER BY vec_id"""


@query("ext_pq_encode", oracle=_pq_oracle())
def ext_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3f — product-quantize the embedding corpus: 4 independent 16-dim
    k-means codebooks (K=8, 2 Lloyd iterations each, seeded by the first K
    vectors — same contract as ``ext_similarity_kmeans``), then one
    zero-shuffle Arrow encode pass emitting the 4 codes + integer
    reconstruction error per vector.

    Scale: codebook training is S × ITERS bounded-artifact shuffles
    (K·subdim longs each); the encode scan is embarrassingly parallel and
    the output is ~60× smaller than the input vectors — this is the write
    path of a disk-backed IVF-PQ index at 100 TB."""
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", quantize(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=False)  # the seed collect is a full pass anyway
    cent_sets = _train_codebooks(vecs)
    enc = _pq_encode_fn(cent_sets)
    out = vecs.select("vec_id", enc("v").alias("ce"))
    cols = [
        F.element_at("ce", si + 1).alias(f"code_{si}") for si in range(PQ_SUB)
    ]
    return out.select(
        "vec_id",
        *cols,
        F.element_at("ce", PQ_SUB + 1).alias("recon_err"),
    ).orderBy("vec_id")


# --- ADC search over the compressed codes -----------------------------------


def _adc_scan_fn(cent_sets, queries):
    """The FAISS-style ADC kernel: per query, precompute the S×K lookup
    table of exact int64 squared distances from the query's subvectors to
    every codebook centroid; scanning the corpus then costs S table
    gathers + adds per (query, vector) pair — the compressed codes never
    decompress. All integers, so the scan is hash-exact.

    ``queries`` is the bounded collected query set [(qid, vec)] — the
    sanctioned small-artifact driver collect (MLlib pattern)."""
    import numpy as np
    import pandas as pd

    # LUT[q, s, cid] — dense over cid (codes only reference live cids)
    n_q = len(queries)
    lut = np.zeros((n_q, PQ_SUB, PQ_K), dtype=np.int64)
    qids = np.array([q for q, _ in queries], dtype=np.int64)
    for qi, (_, qv) in enumerate(queries):
        qarr = np.array(qv, dtype=np.int64)
        for si, cents in enumerate(cent_sets):
            qs = qarr[si * PQ_SUBDIM : (si + 1) * PQ_SUBDIM]
            for cid, cv in cents:
                d = qs - np.array(cv, dtype=np.int64)
                lut[qi, si, cid] = int((d * d).sum())

    def scan(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vec_ids = pdf["vec_id"].to_numpy()
            codes = np.stack(
                [pdf[f"code_{si}"].to_numpy() for si in range(PQ_SUB)], axis=1
            )
            n = len(pdf)
            # dists[q, row] = sum_s LUT[q, s, codes[row, s]]
            dists = np.zeros((n_q, n), dtype=np.int64)
            for si in range(PQ_SUB):
                dists += lut[:, si, codes[:, si]]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(vec_ids, n_q),
                    "adc_dist": dists.reshape(-1),
                }
            )

    return scan


def _pq_search_oracle() -> str:
    qv = (
        "list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
    )
    chains = ",\n    ".join(_pq_chain(si) for si in range(PQ_SUB))
    # per-subspace ADC term: squared distance from the query's subvector to
    # the centroid the neighbor's code points at
    joins, terms = [], []
    for si in range(PQ_SUB):
        lo = si * PQ_SUBDIM
        joins.append(
            f"JOIN p{si}fin f{si} ON f{si}.vec_id = n.vec_id "
            f"JOIN p{si}c{LLOYD_ITERS} cb{si} ON cb{si}.cid = f{si}.cid"
        )
        terms.append(
            f"list_sum(list_transform(range(1, {PQ_SUBDIM} + 1),"
            f" i -> (q.v[{lo} + i] - cb{si}.cv[i])"
            f" * (q.v[{lo} + i] - cb{si}.cv[i])))"
        )
    return f"""WITH qvecs AS (SELECT vec_id, {qv} AS v FROM embeddings),
    {chains},
    adc AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               CAST({" + ".join(terms)} AS BIGINT) AS adc_dist
        FROM qvecs q
        JOIN qvecs n ON n.vec_id <> q.vec_id
        {" ".join(joins)}
        WHERE q.vec_id < {PQ_QUERIES}
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
        SELECT query_id, neighbor_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist ASC, neighbor_id ASC)
                   AS rank
        FROM adc
    ) WHERE rank <= {PQ_TOPK}"""


@query("ext_pq_search", oracle=_pq_search_oracle())
def ext_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3h — ANN search over the PQ-compressed corpus via asymmetric
    distance computation: train the 4 codebooks, encode the corpus once,
    collect the bounded query set (first {Q} vectors), precompute each
    query's S×K distance lookup table, and scan the CODES (4 small ints
    per vector — the raw vectors never reload) with table gathers. Top-k
    per query by (adc_dist ASC, neighbor_id ASC).

    Scale: the serving read path of an IVF-PQ index — the scan touches
    ~60× less data than the raw vectors, is embarrassingly parallel, and
    the only shuffle is the per-query top-k window."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", quantize(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=False)  # the seed collect is a full pass anyway
    cent_sets = _train_codebooks(vecs)
    enc = _pq_encode_fn(cent_sets)
    codes = vecs.select("vec_id", enc("v").alias("ce")).select(
        "vec_id",
        *[
            F.element_at("ce", si + 1).alias(f"code_{si}")
            for si in range(PQ_SUB)
        ],
    )
    queries = [
        (int(r["vec_id"]), [int(x) for x in r["v"]])
        for r in vecs.where(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "v")
        .collect()
    ]
    scanned = codes.mapInPandas(
        _adc_scan_fn(cent_sets, queries),
        "query_id long, neighbor_id long, adc_dist long",
    ).where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return scanned.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= PQ_TOPK
    )


# --- IVF-PQ search (coarse probe + ADC over codes) --------------------------


def _adc_pair_fn(cent_sets, queries):
    """ADC distance for (query_id, code_0..code_{S-1}) pairs — the
    cell-restricted variant of the full scan: same per-query S×K integer
    lookup tables, but distances are computed only for the rows the coarse
    probe admitted."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qpos = {q: idx for idx, (q, _) in enumerate(queries)}
    # table width = the codebook's actual code range (cid labels are seed
    # ids 0..k-1), so the fn serves any PQ_K the caller trained with
    kmax = 1 + max(cid for cents in cent_sets for cid, _ in cents)
    lut = np.zeros((len(queries), PQ_SUB, kmax), dtype=np.int64)
    for qi, (_, qv) in enumerate(queries):
        qarr = np.array(qv, dtype=np.int64)
        for si, cents in enumerate(cent_sets):
            qs = qarr[si * PQ_SUBDIM : (si + 1) * PQ_SUBDIM]
            for cid, cv in cents:
                d = qs - np.array(cv, dtype=np.int64)
                lut[qi, si, cid] = int((d * d).sum())

    @pandas_udf("long")
    def adc(qid, c0, c1, c2, c3):
        if qid.empty:
            return pd.Series([], dtype="int64")
        qidx = qid.map(qpos).to_numpy(dtype="int64")
        total = np.zeros(len(qid), dtype=np.int64)
        for si, cs in enumerate((c0, c1, c2, c3)):
            total += lut[qidx, si, cs.to_numpy(dtype="int64")]
        return pd.Series(total)

    return adc


def _pq_search_ctes() -> str:
    """The WITH-prefix shared by the plain ADC search oracle and the
    refined one: quantized vectors → coarse Lloyd chain → per-subspace PQ
    chains → probes → the `adc` candidate CTE (query_id, neighbor_id,
    adc_dist). Callers append their final SELECT (and extra CTEs)."""
    from .similarity import _kmeans_cte_prefix, NPROBE, _SQD

    pq_chains = ",\n    ".join(_pq_chain(si) for si in range(PQ_SUB))
    joins, terms = [], []
    for si in range(PQ_SUB):
        lo = si * PQ_SUBDIM
        joins.append(
            f"JOIN p{si}fin f{si} ON f{si}.vec_id = fa.vec_id "
            f"JOIN p{si}c{LLOYD_ITERS} cb{si} ON cb{si}.cid = f{si}.cid"
        )
        terms.append(
            f"list_sum(list_transform(range(1, {PQ_SUBDIM} + 1),"
            f" i -> (q.v[{lo} + i] - cb{si}.cv[i])"
            f" * (q.v[{lo} + i] - cb{si}.cv[i])))"
        )
    final_c = f"c{LLOYD_ITERS}"
    return f"""WITH {_kmeans_cte_prefix()},
    qvecs AS (SELECT vec_id, v FROM vecs),
    {pq_chains},
    probes AS (
        SELECT query_id, qcid FROM (
            SELECT v.vec_id AS query_id, c.cid AS qcid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_SQD} ASC, c.cid ASC) AS rn
            FROM vecs v CROSS JOIN {final_c} c
            WHERE v.vec_id < {PQ_QUERIES}
        ) WHERE rn <= {NPROBE}
    ),
    adc AS (
        SELECT p.query_id, fa.vec_id AS neighbor_id,
               CAST({" + ".join(terms)} AS BIGINT) AS adc_dist
        FROM probes p
        JOIN final_assign fa ON fa.cid = p.qcid
        JOIN qvecs q ON q.vec_id = p.query_id
        {" ".join(joins)}
        WHERE fa.vec_id <> p.query_id
    )"""


def _pq_ivf_oracle() -> str:
    return f"""{_pq_search_ctes()}
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
        SELECT query_id, neighbor_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist ASC, neighbor_id ASC)
                   AS rank
        FROM adc
    ) WHERE rank <= {PQ_TOPK}"""


def _pq_refine_oracle() -> str:
    return f"""{_pq_search_ctes()},
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_dist ASC, neighbor_id ASC)
                       AS rn
            FROM adc
        ) WHERE rn <= {PQ_REFINE_MULT * PQ_TOPK}
    ),
    refined AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(list_sum(list_transform(range(1, len(nv.v) + 1),
                    i -> (nv.v[i] - q.v[i]) * (nv.v[i] - q.v[i])))
                    AS BIGINT) AS d2
        FROM shortlist s
        JOIN qvecs nv ON nv.vec_id = s.neighbor_id
        JOIN qvecs q ON q.vec_id = s.query_id
    )
    SELECT query_id, neighbor_id, d2, rank FROM (
        SELECT query_id, neighbor_id, d2,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d2 ASC, neighbor_id ASC) AS rank
        FROM refined
    ) WHERE rank <= {PQ_TOPK}"""


def _ivf_scored(spark: SparkSession, sf_dir: str):
    """Shared IVF-PQ read-path prefix: build the index (coarse quantizer,
    cells, codebooks, codes), probe the first PQ_QUERIES vectors, ADC-score
    every code in the probed cells. Returns (vecs, scored, w) — the plain
    ADC search and the refined search both finish from here."""
    from pyspark.sql import Window

    from .similarity import _assign_cells, _probe_cells, train_kmeans

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", quantize(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=False)  # the seed collect is a full pass anyway
    coarse = train_kmeans(vecs)
    cells = _assign_cells(vecs, coarse).select("vec_id", "cid")
    cent_sets = _train_codebooks(vecs)
    enc = _pq_encode_fn(cent_sets)
    codes = vecs.select("vec_id", enc("v").alias("ce")).select(
        "vec_id",
        *[
            F.element_at("ce", si + 1).alias(f"code_{si}")
            for si in range(PQ_SUB)
        ],
    )
    index = codes.join(cells, "vec_id")  # the stored IVF-PQ posting lists

    queries = [
        (int(r["vec_id"]), [int(x) for x in r["v"]])
        for r in vecs.where(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "v")
        .collect()
    ]
    probes = _probe_cells(
        vecs.where(F.col("vec_id") < PQ_QUERIES), coarse
    ).select(
        F.col("vec_id").alias("query_id"),
        F.explode("probe_cids").alias("cid"),
    )
    adc = _adc_pair_fn(cent_sets, queries)
    scored = (
        index.join(F.broadcast(probes), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc("query_id", "code_0", "code_1", "code_2", "code_3").alias(
                "adc_dist"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return vecs, scored, w


@query("ext_pq_ivf_search", oracle=_pq_ivf_oracle())
def ext_pq_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3i — the full IVF-PQ read path (the FAISS IndexIVFPQ shape): a
    coarse K=8 Lloyd quantizer routes each query to its nprobe=2 nearest
    cells, and ADC lookup tables score ONLY the codes stored in those
    cells — compressed storage (PQ) and pruned scan (IVF) composed, which
    is how a 100 TB ANN index actually serves queries. Coarse training,
    cell assignment, codebooks, codes, probes, ADC distances and the final
    top-k are ALL integer-exact and hash-checked in one oracle.

    Scale: the scan touches nprobe/K of the corpus at 4 ints/vector —
    ~120× less I/O than brute force over raw vectors; the only shuffle is
    the per-query top-k window."""
    from pyspark.sql import Window  # noqa: F401  (kept for parity of shape)

    vecs, scored, w = _ivf_scored(spark, sf_dir)
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= PQ_TOPK
    )


@query("ext_pq_refine_search", oracle=_pq_refine_oracle())
def ext_pq_refine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3j — IVF-PQ + exact re-rank (the FAISS ``IndexRefineFlat`` shape),
    round-13's answer to the measured ADC ranking floor: the ADC scan
    ranks a shortlist of PQ_REFINE_MULT × PQ_TOPK candidates per query,
    then EXACT integer squared-L2 distances on just those rows pick the
    final top-k. The 100 TB economics are unchanged — the corpus-wide scan
    still touches only nprobe/K of the index at 4 ints/vector; the refine
    join touches shortlist-sized rows of the raw vectors (tens per query).
    Measured at 1 M vectors (tools/bench_ann_pqk.py, SCALE.md round-13):
    ADC-only recall@10 saturates at 0.105→0.155 across PQ_K=8→256 on
    structure-free synthetic neighbors, while this refine shape recovers
    0.15→0.39 (100-row shortlist) and 0.75 (1000-row) — the shortlist is
    the quality lever, so it is a first-class operator.

    The exact distance runs through zip_with/aggregate (CodegenFallback is
    fine here: the input is shortlist-sized — bounded rows per query — not
    corpus-sized; the corpus-proportional work all happened in the ADC
    stage). Both broadcast sides are bounded (shortlist, query vectors)."""
    from pyspark.sql import Window

    vecs, scored, w = _ivf_scored(spark, sf_dir)
    short = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= PQ_REFINE_MULT * PQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    qv = vecs.where(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    nv = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    )
    refined = (
        nv.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("nv", "qv", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    return refined.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= PQ_TOPK
    )
