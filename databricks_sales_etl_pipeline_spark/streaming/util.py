"""Shared helpers for Trigger.AvailableNow streaming queries."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def await_finished(q: StreamingQuery, timeout_s: int) -> None:
    """Block until the AvailableNow batch finishes; FAIL if the timeout
    elapses first. ``awaitTermination(t)`` returns False on timeout with the
    query still running — silently proceeding would hand back a partially
    filled memory sink (nondeterministic row counts). Stop the straggler and
    raise instead."""
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish its "
            f"AvailableNow batch within {timeout_s}s"
        )
