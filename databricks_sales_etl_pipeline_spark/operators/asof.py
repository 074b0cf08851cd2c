"""As-of and range joins — operators Spark lacks natively (SURVEY brief:
implement as compositions of existing DataFrame ops).

As-of join (the time-series staple: for each left row, the latest right row
with right_ts <= left_ts per key) via the union+ordered-window technique:

    tag both sides → unionByName → window per key ordered by (ts, side) →
    last_value(right payload, ignorenulls) → filter back to left rows.

One shuffle on the key, one per-partition sort — same cost shape as a
window; no range explosion, no per-row probe. This is how you as-of join
two 100 TB streams. DuckDB's native ASOF JOIN is the oracle.

Range join (non-equi, value BETWEEN lo AND hi against a bounded band dim)
broadcasts the tiny dim → BroadcastNestedLoopJoin, O(n·bands) with bands
constant. For non-broadcastable range dims, band-bucketing turns it into an
equi-join (see docstring of join_range_bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query
from databricks_sales_etl_pipeline_spark.sources.inline import inline_rows
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
) -> DataFrame:
    """Generic as-of join: attach ``payload`` of the latest right row with
    right_ts <= left_ts, per key. Inclusive on equal timestamps (right rows
    order before left rows at the same instant)."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    ).withColumn("_payload", F.lit(None).cast(right.schema[payload].dataType))
    r_tag = (
        right.select(
            F.col(key), F.col(right_ts).alias("_ts"), F.col(payload).alias("_payload")
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .drop("_side", "_payload", "_ts")
    )


@query(
    "ext_asof_join",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM p ASOF LEFT JOIN s
        ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join purchases → latest prior-or-equal signup per user,
    checked against DuckDB's native ASOF LEFT JOIN."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    return asof_join(
        purchases, signups, key="user_id", left_ts="ts",
        right_ts="signup_ts", payload="signup_ts",
    ).select("event_id", "user_id", "ts", F.col("_asof").alias("signup_ts"))


_BANDS = [
    (1, "low", 0.0, 100_000.0),
    (2, "mid", 100_000.0, 300_000.0),
    (3, "high", 300_000.0, 10_000_000.0),
]

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("band_id", T.IntegerType(), False),
        T.StructField("band", T.StringType(), False),
        T.StructField("lo", T.DoubleType(), False),
        T.StructField("hi", T.DoubleType(), False),
    ]
)

_BANDS_SQL = """(VALUES
        (1, 'low', 0.0, 100000.0),
        (2, 'mid', 100000.0, 300000.0),
        (3, 'high', 300000.0, 10000000.0)
    ) AS b(band_id, band, lo, hi)"""


@query(
    "join_range_bands",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_orders
    FROM orders o JOIN {_BANDS_SQL}
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: orders × price bands on lo <= price < hi.
    The band dim is bounded → broadcast nested-loop, O(n·bands) one pass.
    (If the range side were large: bucket both sides by range-overlapping
    band keys and equi-join on the bucket — not needed for a bounded dim.)"""
    o = load(spark, sf_dir, "orders")
    bands = inline_rows(spark, _BANDS, _BANDS_SCHEMA)
    return (
        o.join(
            broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_NEAREST_TOL_US = 30 * 60 * 1000000


@query(
    "ext_asof_nearest",
    oracle=f"""
    WITH u AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS is_ref
        FROM events WHERE event_type IN ('purchase', 'click')
    ), scan AS (
        SELECT *,
               MAX(CASE WHEN is_ref = 1 THEN us END) OVER
                   (PARTITION BY user_id ORDER BY us, is_ref, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_us,
               MIN(CASE WHEN is_ref = 1 THEN us END) OVER
                   (PARTITION BY user_id ORDER BY us, is_ref, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_us
        FROM u
    )
    SELECT event_id, user_id, CAST(us AS BIGINT) AS us,
           CASE
             WHEN prev_us IS NOT NULL AND us - prev_us <= {_NEAREST_TOL_US}
                  AND (next_us IS NULL OR us - prev_us <= next_us - us
                       OR next_us - us > {_NEAREST_TOL_US})
               THEN 'prev'
             WHEN next_us IS NOT NULL AND next_us - us <= {_NEAREST_TOL_US}
               THEN 'next'
             ELSE 'none'
           END AS nearest_dir,
           CAST(CASE
             WHEN prev_us IS NOT NULL AND us - prev_us <= {_NEAREST_TOL_US}
                  AND (next_us IS NULL OR us - prev_us <= next_us - us
                       OR next_us - us > {_NEAREST_TOL_US})
               THEN us - prev_us
             WHEN next_us IS NOT NULL AND next_us - us <= {_NEAREST_TOL_US}
               THEN next_us - us
           END AS BIGINT) AS nearest_dist_us
    FROM scan WHERE is_ref = 0 AND user_id % 3 = 0
    """,
)
def ext_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — NEAREST as-of join with tolerance (backward-preferred ties):
    each purchase finds the closest click within ±30 min — the sensor-
    fusion/backfill semantics `ext_asof_join`'s backward-only form can't
    express. Implemented as the MERGE-SCAN, not a join: probes and
    references union into ONE per-user ordered pass where running
    MAX-over-preceding / MIN-over-following recover the flanking
    reference timestamps — no probe×ref join blowup, one user_id
    shuffle, and the same plan shape at any reference density (pandas
    merge_asof's distributed form). Ties at equal distance resolve
    backward (`<=`), matching the oracle's identical expression."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    u = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias(
            "is_ref"
        ),
    )
    from pyspark.sql import Window as _W

    order = [F.col("us"), F.col("is_ref"), F.col("event_id")]
    wp = _W.partitionBy("user_id").orderBy(*order).rowsBetween(_W.unboundedPreceding, -1)
    wn = _W.partitionBy("user_id").orderBy(*order).rowsBetween(1, _W.unboundedFollowing)
    ref_us = F.when(F.col("is_ref") == 1, F.col("us"))
    scan = u.withColumn("prev_us", F.max(ref_us).over(wp)).withColumn(
        "next_us", F.min(ref_us).over(wn)
    )
    tol = F.lit(_NEAREST_TOL_US)
    prev_ok = F.col("prev_us").isNotNull() & (F.col("us") - F.col("prev_us") <= tol)
    next_ok = F.col("next_us").isNotNull() & (F.col("next_us") - F.col("us") <= tol)
    prefer_prev = prev_ok & (
        F.col("next_us").isNull()
        | (F.col("us") - F.col("prev_us") <= F.col("next_us") - F.col("us"))
        | (F.col("next_us") - F.col("us") > tol)
    )
    return scan.where((F.col("is_ref") == 0) & (F.col("user_id") % 3 == 0)).select(
        "event_id",
        "user_id",
        F.col("us").cast("bigint"),
        F.when(prefer_prev, F.lit("prev"))
        .when(next_ok, F.lit("next"))
        .otherwise(F.lit("none"))
        .alias("nearest_dir"),
        F.when(prefer_prev, F.col("us") - F.col("prev_us"))
        .when(next_ok, F.col("next_us") - F.col("us"))
        .cast("bigint")
        .alias("nearest_dist_us"),
    )
