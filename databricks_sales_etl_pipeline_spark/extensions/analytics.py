"""Event-analytics operators over the events stream (north-star widening of
the §2.6 event-time family): ordered-stage conversion funnel and weekly
retention cohorts — the two queries every product-analytics workload runs
against exactly this kind of event table.

Scale posture: both shapes shuffle on user_id once (the same key the
sessionizers use), then aggregate down to tiny result sets (stages / cohort
weeks); no joins carry event payloads, only (user, timestamp) pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query

FUNNEL_STAGES = ["signup", "view", "purchase"]


@query(
    "ext_event_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), s1 AS (
        SELECT user_id, MIN(ts) AS t FROM e
        WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'view' AND e.ts >= s1.t
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t
        GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS stage_name,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view',
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase',
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
)
def ext_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-stage funnel signup → view → purchase: a user reaches stage
    k only via an event at-or-after their first qualifying stage-(k-1)
    event. Three per-user MIN aggregations chained by user_id joins — all
    three shuffle on the SAME key, so a co-partitioned cluster run does the
    whole funnel in one exchange; stage outputs are single rows."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = e.where(F.col("event_type") == FUNNEL_STAGES[0]).groupBy("user_id").agg(
        F.min("ts").alias("t")
    )
    stages = [s]
    for stage in FUNNEL_STAGES[1:]:
        prev = stages[-1].select("user_id", F.col("t").alias("prev_t"))
        stages.append(
            e.where(F.col("event_type") == stage)
            .join(prev, "user_id")
            .where(F.col("ts") >= F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col("n_users"),
        )
        for i, (name, df) in enumerate(zip(FUNNEL_STAGES, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@query(
    "ext_retention_cohorts",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), cohorts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM e GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM e
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS BIGINT) AS week_k,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c ON c.user_id = a.user_id
    GROUP BY c.cohort_week, CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS BIGINT)
    """,
)
def ext_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: cohort = Monday-truncated week of a user's
    FIRST event; n_active = distinct cohort users active k weeks later.
    Week truncation is Monday-start in both engines; the week index is an
    exact integer (day difference of two week-truncated timestamps DIV 7).
    One shuffle on user_id (first-event + distinct-activity share it), then
    a tiny (cohort, k) aggregation."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    week_k = F.expr("CAST(datediff(wk, cohort_week) DIV 7 AS BIGINT)")
    return (
        activity.join(cohorts, "user_id")
        .select("cohort_week", week_k.alias("week_k"), "user_id")
        .groupBy("cohort_week", "week_k")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


ATTRIB_WINDOW_H = 24


@query(
    "ext_attribution_last_touch",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ), attributed AS (
        SELECT p.value,
               (SELECT t.event_type FROM t
                WHERE t.user_id = p.user_id
                  AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
                  AND t.ts >= p.ts - INTERVAL {ATTRIB_WINDOW_H} HOUR
                ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
        FROM p
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM attributed GROUP BY COALESCE(channel, 'direct')
    """,
)
def ext_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent click/view within the preceding 24 h (total order pinned by
    (ts, event_id) so equal timestamps are deterministic); purchases with
    no qualifying touch are 'direct'. The oracle's correlated top-1
    subquery is re-expressed as ONE window pass over the unioned event
    stream — last_value(ignore nulls) over rows preceding — i.e. the as-of
    join shape: one shuffle on user_id, no per-purchase probe."""
    from pyspark.sql import Window

    from databricks_sales_etl_pipeline_spark.functions.money import cents

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    tagged = e.where(
        F.col("event_type").isin("purchase", "click", "view")
    ).withColumn("is_purchase", F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_ts = F.when(~F.col("is_purchase"), F.col("ts"))
    touch_type = F.when(~F.col("is_purchase"), F.col("event_type"))
    enriched = tagged.select(
        "*",
        F.last(touch_ts, ignorenulls=True).over(w).alias("lt_ts"),
        F.last(touch_type, ignorenulls=True).over(w).alias("lt_type"),
    )
    channel = F.when(
        F.col("lt_ts") >= F.col("ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_H} HOURS"),
        F.col("lt_type"),
    ).otherwise(F.lit("direct"))
    return (
        enriched.where("is_purchase")
        .select(F.coalesce(channel, F.lit("direct")).alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(cents("value")).alias("value_cents"),
        )
    )
