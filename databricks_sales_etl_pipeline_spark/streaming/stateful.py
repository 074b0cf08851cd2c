"""Custom stateful streaming operator (SURVEY §2 T3 family / north star):
``applyInPandasWithState`` — the sanctioned escape hatch when built-in
windows/watermarks can't express the state machine.

The demo operator keeps one state cell per user (event count, value-cents
sum) and emits a summary row when the group is invoked — under
Trigger.AvailableNow that is once per user. In production the same shape
implements CDC dedup, per-entity rate limiting, online feature rollups.
State is partitioned by key across executors; a watermark + timeout bounds
it on unbounded streams.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from databricks_sales_etl_pipeline_spark.catalog import events_readstream
from databricks_sales_etl_pipeline_spark.functions.money import cents_sql
from databricks_sales_etl_pipeline_spark.registry import query
from databricks_sales_etl_pipeline_spark.streaming.util import (
    await_finished,
    scratch_checkpoint,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _per_user_counter(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents_sum = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-row cents (floor(x*100+0.5)) — same money discipline as SQL side
        cents_sum += int((pdf["value"] * 100 + 0.5).apply(int).sum())
    state.update((n, cents_sum))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents_sum]}
    )


# Oracle-able despite streaming-native execution: one AvailableNow batch over
# one immutable file means dropDuplicatesWithinWatermark sees every row before
# any state eviction, so the output IS the batch distinct (asserted by
# tests/test_streaming.py::test_stream_dedup_matches_batch_distinct).
@query(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicatesWithinWatermark on
    (user_id, event_type) — the CDC/at-least-once-ingest cleanup operator.
    The watermark bounds dedup state (without it, state grows with every
    distinct key forever). AvailableNow single batch → deterministic row
    count = distinct (user_id, event_type) pairs."""
    stream = events_readstream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = stream.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    sink = f"dedup_{uuid.uuid4().hex[:12]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation",
            scratch_checkpoint(sink.split("_")[0]),
        )
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q, 120)
    return spark.table(sink)


# Oracle-able: single-batch AvailableNow -> update mode emits exactly one
# summary row per user equal to the batch aggregate (asserted by
# tests/test_streaming.py::test_stateful_counter_matches_batch_agg).
@query(
    "stream_stateful_counter",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful aggregation over the event stream via
    applyInPandasWithState (update mode, AvailableNow → one summary row per
    user; deterministic row count = n_users)."""
    stream = events_readstream(spark, sf_dir)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        _per_user_counter,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"state_{uuid.uuid4().hex[:12]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option(
            "checkpointLocation",
            scratch_checkpoint(sink.split("_")[0]),
        )
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q, 120)
    return spark.table(sink)
