"""Z-order (Morton-curve) data layout — the multi-dimensional clustering
behind Delta's ``OPTIMIZE ... ZORDER BY`` (reference writes Delta tables
throughout, 01_project_setup_and_ingestion.py:122), rebuilt Spark-first:

1. interleave the bits of the clustering columns into a single Morton
   value — pure JVM integer ops (``shiftright`` + ``bitwiseAND``),
   whole-stage-codegen'd, zero shuffle;
2. ``repartitionByRange`` on that value (one range-exchange — the same
   shuffle a plain sort-write would cost) and sort within partitions;
3. every written file then covers a TIGHT rectangle in (x, y) space, so
   file-level min/max statistics prune scans on EITHER column — the
   data-skipping property linear sorting only gives you on the leading
   column.

``ext_zorder_layout`` quantifies exactly that property as an
oracle-checked report: per contiguous z-range bucket, the x/y bounding
box. A z-range of length 4^b is an aligned 2^b × 2^b tile, so with 12-bit
keys and 64 buckets every bucket spans ≤ 1/8 of each key domain — the
measurable reason z-ordered files skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query

BITS = 12                     # per-key bits → zval < 4^12 = 2^24
_MASK = (1 << BITS) - 1       # 4095
_BUCKETS = 64                 # report granularity: zval >> 18 → 64 tiles


def zorder_value(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave two non-negative integer columns (``bits`` low
    bits each) into one BIGINT: x's bit k lands at position 2k, y's at
    2k+1. Pure shift/and/add — stays in whole-stage codegen."""
    x = x.cast("bigint")
    y = y.cast("bigint")
    z: Column = F.lit(0).cast("bigint")
    for k in range(bits):
        z = (
            z
            + F.shiftright(x, k).bitwiseAND(F.lit(1)) * F.lit(4**k)
            + F.shiftright(y, k).bitwiseAND(F.lit(1)) * F.lit(2 * 4**k)
        )
    return z


def zorder_value_sql(x: str, y: str, bits: int = BITS) -> str:
    """DuckDB twin of :func:`zorder_value` via floor-div/mod bit
    extraction — exact BIGINT arithmetic, no engine-specific bit ops."""
    terms = " + ".join(
        f"(({x} // {1 << k}) % 2) * {4**k} + (({y} // {1 << k}) % 2) * {2 * 4**k}"
        for k in range(bits)
    )
    return f"({terms})"


def zorder_layout(
    df: DataFrame, xcol: str, ycol: str, n_partitions: int = _BUCKETS
) -> DataFrame:
    """Re-layout ``df`` along the Morton curve of (xcol, ycol): range-
    partition + sort by z-value, so a partitioned write produces files
    with tight per-file min/max on BOTH columns. One range exchange —
    the same cost as any global sort-write."""
    z = df.withColumn(
        "_zval", zorder_value(F.col(xcol).bitwiseAND(_MASK), F.col(ycol).bitwiseAND(_MASK))
    )
    return z.repartitionByRange(n_partitions, "_zval").sortWithinPartitions("_zval")


@query(
    "ext_zorder_layout",
    oracle=f"""
    WITH t AS (
        SELECT l_partkey % {_MASK + 1} AS x, l_suppkey % {_MASK + 1} AS y
        FROM lineitem
    ),
    z AS (
        SELECT x, y, {zorder_value_sql("x", "y")} AS zval FROM t
    )
    SELECT zval // {4**BITS // _BUCKETS} AS zbucket,
           COUNT(*) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM z
    GROUP BY 1
    ORDER BY 1
    """,
)
def ext_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering report over lineitem (l_partkey × l_suppkey):
    Morton value per row, then per contiguous z-range bucket the row
    count and the (x, y) bounding box — the file-statistics view a
    z-ordered write would publish for data skipping.

    The oracle recomputes the interleave with floor-div/mod arithmetic,
    pinning every bit of the curve; tests assert the locality guarantee
    (bucket spans ≤ 2^(BITS - log4 BUCKETS) per axis).

    Scale posture: the z-value is a per-row integer expression (no
    shuffle); the report is one groupBy on a 64-value key with map-side
    combine. The production write path (:func:`zorder_layout`) costs
    exactly one range exchange. At 100 TB this replaces a multi-pass
    clustering job with a single sort-shuffle whose output files prune
    on both join/filter dimensions.
    """
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (_MASK + 1)).alias("x"),
        (F.col("l_suppkey") % (_MASK + 1)).alias("y"),
    )
    z = li.withColumn("zval", zorder_value(F.col("x"), F.col("y")))
    return (
        z.groupBy(F.shiftright("zval", 18).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("zbucket")
    )


from databricks_sales_etl_pipeline_spark.registry import query as _query  # noqa: E402

_RLE_COLS = ["o_orderstatus", "o_orderpriority"]


def _rle_oracle() -> str:
    layouts = {
        "natural": "o_orderkey",
        "clustered": "o_orderstatus, o_orderpriority, o_orderdate, o_orderkey",
    }
    parts = []
    for layout, order in layouts.items():
        for col in _RLE_COLS:
            parts.append(
                f"""
    SELECT '{layout}' AS layout, '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 + SUM(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
           CAST((1000000 * (1 + SUM(CASE WHEN chg THEN 1 ELSE 0 END)))
                // COUNT(*) AS BIGINT) AS runs_ppm
    FROM (
        SELECT {col} <> lag({col}) OVER (ORDER BY {order}) AS chg
        FROM orders
    )"""
            )
    return " UNION ALL ".join(parts)


@_query("ext_rle_runs_report", oracle=_rle_oracle())
def ext_rle_runs_report(spark, sf_dir):
    """L3 — run-length layout report: for each candidate physical sort
    order (natural PK order vs clustering by the low-cardinality
    columns), the number of equal-value RUNS each column would store
    under run-length encoding — the measured argument for clustered
    writes (`tbl_zorder`'s 1-D cousin): Parquet RLE/dictionary pages
    compress ∝ runs, so runs_ppm (runs per million rows) IS the
    compression/skipping forecast a layout decision needs.

    Round-7 scale fix — the docstring's promised decomposition is now
    the implementation: runs = 1 + per-BUCKET change counts (lag windows
    partitioned by a monotone bucket of each sort order: orderkey range
    for natural, the 15-value (status, priority) prefix for clustered)
    + boundary changes between adjacent buckets, read off a bounded
    per-bucket first/last artifact (functions/prefix.py discipline).
    Bit-identical to the global window
    (tests/test_round7_scale.py); no single-partition task."""
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    from databricks_sales_etl_pipeline_spark.catalog import load as _load
    from databricks_sales_etl_pipeline_spark.functions.prefix import div_width

    o = _load(spark, sf_dir, "orders")
    max_ok = o.agg(F.max("o_orderkey")).first()[0]
    wid = div_width(max_ok)
    layouts = {
        # bucket expr monotone in the leading sort key; within-bucket order
        "natural": (F.expr(f"o_orderkey DIV {wid}"), [F.col("o_orderkey")]),
        "clustered": (
            F.expr(
                "ascii(o_orderstatus) * 10"
                " + CAST(substring(o_orderpriority, 1, 1) AS INT)"
            ),
            [F.col("o_orderdate"), F.col("o_orderkey")],
        ),
    }
    out = None
    for layout, (bucket, within) in layouts.items():
        b = o.withColumn("kb", bucket.cast("long"))
        w = _W.partitionBy("kb").orderBy(*within)
        okey = F.struct(*within)
        # bounded artifact: each bucket's first/last value per RLE column
        edge_rows = (
            b.groupBy("kb")
            .agg(
                *[
                    a
                    for col in _RLE_COLS
                    for a in (
                        F.min_by(col, okey).alias(f"first_{col}"),
                        F.max_by(col, okey).alias(f"last_{col}"),
                    )
                ]
            )
            .collect()
        )
        edges = sorted(edge_rows, key=lambda r: r["kb"])
        for col in _RLE_COLS:
            # SQL null-comparison semantics (ADVICE fix): the in-bucket
            # path `col != lag(col)` yields NULL (uncounted) when either
            # side is NULL, so a NULL edge value must not count as a run
            # change here either. _RLE_COLS are non-null TPC-H columns
            # today; this keeps the two paths equivalent if a nullable
            # column is ever added.
            boundary = sum(
                1
                for prev, cur in zip(edges, edges[1:])
                if prev[f"last_{col}"] is not None
                and cur[f"first_{col}"] is not None
                and prev[f"last_{col}"] != cur[f"first_{col}"]
            )
            chg = (F.col(col) != F.lag(col).over(w)).cast("bigint")
            rep = (
                b.select(chg.alias("chg"))
                .agg(
                    F.lit(layout).alias("layout"),
                    F.lit(col).alias("col_name"),
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    (1 + F.lit(boundary) + F.sum("chg"))
                    .cast("bigint")
                    .alias("n_runs"),
                )
                .select(
                    "layout",
                    "col_name",
                    "n_rows",
                    "n_runs",
                    F.expr("(1000000 * n_runs) DIV n_rows")
                    .cast("bigint")
                    .alias("runs_ppm"),
                )
            )
            out = rep if out is None else out.unionByName(rep)
    return out
