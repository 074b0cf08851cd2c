"""Date-part analytics + the remaining dimension tables (part, supplier).

year()/month() are imported-but-unused in the reference
(`01_project_setup_and_ingestion.py:26`) — SURVEY §2.5 says implement the
period-rollup intent anyway. The part/supplier joins complete coverage of
every testdata table; both dims are broadcast (bounded relative to the
fact side; AQE confirms via size estimate at plan time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.functions.money import cents, cents_sql
from databricks_sales_etl_pipeline_spark.registry import query

_ORDER_CENTS = cents_sql("o_totalprice")
_REV_CENTS = cents_sql("l_extendedprice * (1 - l_discount)")


@query(
    "agg_monthly_revenue",
    oracle=f"""
    SELECT date_part('year', o_orderdate) AS order_year,
           date_part('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM({_ORDER_CENTS}) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_year, order_month
    """,
)
def agg_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period rollup via year()/month() — the monitoring-by-period intent of
    the reference's unused imports. Low-cardinality keys → tiny shuffle."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "agg_brand_revenue",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           CAST(SUM({_REV_CENTS}) AS BIGINT) AS revenue_cents,
           COUNT(DISTINCT l.l_partkey) AS n_parts
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue_cents DESC, p_brand
    """,
)
def agg_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand: fact ⋈ broadcast part dim → hash agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("p_brand"))
    )


@query(
    "agg_supplier_revenue",
    oracle=f"""
    SELECT s.s_name, n.n_name AS nation,
           COUNT(*) AS n_items,
           CAST(SUM({_REV_CENTS}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_name, n.n_name
    ORDER BY revenue_cents DESC, s_name
    """,
)
def agg_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier with nation attribution — double broadcast dim
    chain onto the fact scan."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("s_name"))
    )


@query(
    "window_rank_suite",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile,
           CUME_DIST()   OVER w AS cdist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1b — the full ranking-function family over one window (unique
    (price, partkey) ordering → deterministic)."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "dq_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled,
           CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END AS was_zero
    FROM lineitem
    """,
)
def dq_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-surface operators: nullif / coalesce / flag — the na.fill
    family expressed declaratively (na.fill compiles to the same coalesce)."""
    li = load(spark, sf_dir, "lineitem")
    disc_or_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_or_null.alias("disc_or_null"),
        F.coalesce(disc_or_null, F.lit(-1.0)).alias("disc_filled"),
        F.when(F.col("l_discount") == 0.0, 1).otherwise(0).alias("was_zero"),
    )


@query(
    "ext_scd2_intervals",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(o_orderdate AS DATE) AS valid_from,
           LEAD(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey
           ) AS valid_to,
           CASE WHEN LEAD(o_orderkey) OVER (
                    PARTITION BY o_custkey
                    ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                ) IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    WHERE o_custkey < 500
    """,
)
def ext_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval construction (the dimension-history shape every
    warehouse needs): each customer's orders become validity intervals
    [valid_from, valid_to) via one LEAD window; the open-ended latest row
    is flagged current. Fully-pinned ordering (date, orderkey tiebreak) —
    CLAUDE.md's tie rule — makes the intervals engine-deterministic.

    Scale: one window shuffle on the dimension key; interval assignment is
    a single pass, no self-join (the naive SCD2 build joins each row to
    its successor — O(n²) on hot keys)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    d = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(d, "o_orderkey")
    nxt_key = F.lead("o_orderkey").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        d.alias("valid_from"),
        F.lead(d).over(w).alias("valid_to"),
        F.when(nxt_key.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "ext_gapfill_locf",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               CAST(SUM({cents_sql('value')}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
    ), spine AS (
        SELECT t.event_type, CAST(g.day AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM daily) t,
             (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM bounds) g
    ), joined AS (
        SELECT s.event_type, s.day, d.v
        FROM spine s LEFT JOIN daily d
          ON d.event_type = s.event_type AND d.day = s.day
    ), grp AS (
        SELECT event_type, day, v,
               SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM joined
    )
    SELECT event_type, day,
           MAX(v) OVER (PARTITION BY event_type, g) AS value_cents,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
    FROM grp
    """,
)
def ext_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward (the
    resampling shape every metrics/feature pipeline needs): per event type,
    a complete daily date spine (sequence + explode), left-joined daily
    sums, gaps filled by LOCF. The fill uses the group-counter trick —
    running count of non-null observations partitions each gap with its
    preceding observation, then MAX within the group — identical window
    algebra in both engines, avoiding IGNORE NULLS portability.

    Scale: the spine is |types| × |days| (tiny) built with sequence() —
    no driver loop; one join shuffle + one window shuffle on the same
    (type) key; LOCF never materializes per-gap copies."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.sum(cents("value")).alias("v"))
    )
    # 1-row bounds fan-out: crossJoin(broadcast(1 row)) plans as a
    # BroadcastNestedLoopJoin with a single-row build side — the correct
    # plan here (a constant-key equi-join gets folded back to the same NLJ
    # by Catalyst); allow-listed in tests/test_plans.py with this rationale
    lo_hi = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(broadcast(lo_hi))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    seq = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grp = joined.withColumn(
        "g", F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0)).over(seq)
    )
    fill = Window.partitionBy("event_type", "g")
    return grp.select(
        "event_type",
        "day",
        F.max("v").over(fill).alias("value_cents"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_gap"),
    )
