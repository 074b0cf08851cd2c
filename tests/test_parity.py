"""Local replica of the driver's t2 correctness gate (SURVEY §5.2.1):
run every registered query on Spark AND its DuckDB oracle twin, compare
row count, column names, and the full order-insensitive value multiset.

DRIVER-FAITHFUL since round 2: the real driver canonicalizes BOTH result
sets through pandas (DuckDB via ``.df()``, Spark via ``toPandas()``), so
type coercion is part of the contract:

- DuckDB integer ``SUM`` returns HUGEINT -> pandas float64, while Spark's
  ``SUM(BIGINT)`` stays int64.  Round 1 shipped 17 hash-fails because the
  old gate compared ``fetchall()`` Python ints (6 == 6.0).  This gate keeps
  int64 and float64 DISTINCT, so any oracle missing a ``CAST(... AS
  BIGINT)`` goes red locally.
- A nullable integer column coerces to float64 on BOTH sides (pandas has
  no nullable int64 here) -> compares equal; NaN is normalized to None.
- List/array and Decimal cells CRASH or mis-hash the driver's
  canonicalizer -> the gate fails fast with a type-hazard error, so no
  oracle-checked query may emit them (join arrays to strings instead).
- Dates are lenient: Spark yields ``datetime.date`` objects, DuckDB
  ``datetime64`` Timestamps; the driver demonstrably matches them
  (``cast_to_date`` passed r01), so midnight timestamps equal dates here.

Floats must still match bit-for-bit (integer-cents aggregation, shared
IEEE expression trees — functions/money.py).
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import pytest

from databricks_sales_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


class TypeHazard(AssertionError):
    """Cell type that the driver's pandas canonicalizer crashes or
    silently mis-hashes on (lists -> TypeError unhashable; Decimal ->
    object-dtype repr drift)."""


def _norm_cell(v, col: str):
    # NULL / NaN / NaT all collapse to None: pandas coerces NULL-bearing
    # numeric columns to float64(NaN) on both engines identically.
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeHazard(
            f"column {col!r}: array cell {type(v).__name__} — driver "
            "canonicalizer crashes on unhashable cells; emit a joined "
            "string (array_join / array_to_string) instead"
        )
    if not isinstance(v, (str, bytes, bytearray)) and pd.isna(v):
        return None  # NaT / pandas NA
    if isinstance(v, decimal.Decimal):
        raise TypeHazard(
            f"column {col!r}: Decimal cell — DuckDB/Spark decimal repr "
            "drift; CAST to DOUBLE or BIGINT in both engines"
        )
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return None
        return ("f", repr(f + 0.0))  # -0.0 -> 0.0; int64 vs float64 DISTINCT
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and v.time() == datetime.time(0, 0):
            return ("d", v.date().isoformat())  # midnight ts == date
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("x", bytes(v).hex())
    if isinstance(v, str):
        return ("s", v)
    raise TypeHazard(f"column {col!r}: unhandled cell type {type(v).__name__}")


def _canon(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c], c) for c in cols)
        for row in pdf.to_dict("records")
    ]
    return cols, sorted(rows, key=repr)


#: Parity cases individually >= 2 s at sf0.001 (streaming AvailableNow runs,
#: unrolled recursive-CTE oracles, dedup verify joins — measured round 14,
#: 224 s of the suite's 27 min). They run in the `slow` tier; the default
#: run still value-checks the other ~530 oracles, and round_close runs all.
_SLOW_PARITY = {
    "ext_activity_selection",
    "ext_audit_hash_chain",
    "ext_contamination_score",
    "ext_dbscan_cells",
    "ext_decontaminate_ngram",
    "ext_dedup_agreement",
    "ext_dedup_canonical",
    "ext_dedup_embedding",
    "ext_dedup_minhash_guarded",
    "ext_dedup_minhash_verified",
    "ext_dedup_ngram",
    "ext_dtw_distance",
    "ext_dup_clusters_verified",
    "ext_elo_ratings",
    "ext_embedding_project",
    "ext_minhash_calibration",
    "ext_pagerank_step",
    "ext_pq_ivf_search",
    "ext_pq_refine_search",
    "ext_shingle_containment",
    "join_dpp_prune",
    "sink_partitioned_prune",
    "sql_recursive_cte",
    "sql_scalar_subquery",
    "src_python_datasource",
    "src_python_datasource_stream",
    "stream_chained_windows",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "stream_left_outer_join",
    "stream_state_inspect",
    "stream_static_join",
    "stream_stream_join",
    "stream_transform_state",
    "stream_trending_topk",
    "stream_watermark_agg",
    "tbl_analyze_stats",
    "udf_cogrouped_reconcile",
    "udtf_analyze_dynamic",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(ORACLES)
    ],
)
def test_oracle_parity(name, spark, duck):
    s_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    d_pdf = duck.execute(ORACLES[name]).df()

    s_named, s_norm = _canon(s_pdf)
    d_named, d_norm = _canon(d_pdf)

    assert s_named == d_named, f"{name}: column names differ"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} (spark) != {len(d_norm)} (duckdb)"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Non-SQL-expressible ops: assert they run and return a stable schema."""
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0
