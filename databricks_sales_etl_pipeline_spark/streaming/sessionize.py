"""Sessionization (SURVEY §2.6 T3): two implementations of 30-minute-gap
sessions over the events stream.

1. ``stream_sessionize`` — the classic gaps-and-islands composition
   (lag → gap flag → running sum = session id), pure window functions,
   fully SQL-expressible → hash-checked against the DuckDB oracle.
2. ``stream_session_window`` — Spark's native ``session_window`` operator
   (the one a readStream would use for stateful session aggregation);
   semantically identical for batch input, checked against the same kind of
   oracle (session start = first event, merge while gap <= 30 min).

Scale posture: both shuffle once on user_id; the islands variant adds a
per-user sort (window), session_window uses Spark's dedicated session-merge
exec. State in true streaming mode is bounded by watermark + gap timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.registry import query

GAP = "30 minutes"

_ISLANDS_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) AS events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS last_event, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("stream_sessionize", oracle=_ISLANDS_ORACLE)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3a — gaps-and-islands sessionization (lag + cumsum)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # μs precision: cast-to-long truncates to seconds and would diverge from
    # the oracle's INTERVAL comparison on sub-second gaps
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    gap_flag = F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
    return (
        e.select("user_id", "ts", "event_id", gap_flag.alias("new_session"))
        .select("user_id", "ts", F.sum("new_session").over(run).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_SESSION_WINDOW_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               -- session_window merge is INCLUSIVE at the boundary (verified
               -- empirically, tests/test_semantics_edges.py): an event at
               -- exactly prev_ts + gap still merges, so a new session starts
               -- only when the gap is STRICTLY greater — same as the islands
               -- operator above.
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) AS events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("stream_session_window", oracle=_SESSION_WINDOW_ORACLE)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3b — native session_window operator (30-min gap). A session's start
    is its first event's timestamp, so the islands oracle reproduces it."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", GAP), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


_DYN_GAP_ORACLE = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN event_type = 'purchase'
                    THEN 30 * 60 * 1000000
                    ELSE 10 * 60 * 1000000 END AS gap_us
        FROM events
    ), flagged AS (
        SELECT user_id, us,
               CASE WHEN MAX(us + gap_us) OVER (
                        PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR us > MAX(us + gap_us) OVER (
                        PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session,
               event_id
        FROM e
    ), numbered AS (
        SELECT user_id, us,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("stream_session_dynamic_gap", oracle=_DYN_GAP_ORACLE)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3c — session_window with a DYNAMIC per-event gap (Spark 3.2+):
    the inactivity timeout is an EXPRESSION — purchases hold the
    session open 30 minutes, everything else 10 — modeling intent
    decay instead of one-size-fits-all (a buyer mid-checkout deserves
    a longer leash than a passive scroller). Each event proposes the
    interval [ts, ts + gap(event)); overlapping intervals merge, so
    the oracle is the interval-merge islands form: a new session
    starts exactly when ts exceeds the RUNNING MAX of previous
    proposed ends (1-PRECEDING frame — a session can be extended by an
    EARLIER event's long gap even when the adjacent gap is short,
    which the plain lag-based islands operator gets wrong). Output in
    integer micros (unix_micros ↔ epoch_us).

    The same groupBy(session_window(...)) compiles to the streaming
    session operator under readStream — the batch form here IS the
    semantics contract (the stream_session_window precedent)."""
    e = load(spark, sf_dir, "events")
    # session_window's dynamic gap must be CalendarIntervalType — the
    # string-column form casts correctly (DayTimeInterval literals do not)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        e.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start"))
            .cast("bigint")
            .alias("session_start_us"),
            "n_events",
        )
    )
