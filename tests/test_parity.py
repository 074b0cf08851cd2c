"""Local replica of the driver's t2 correctness gate (SURVEY §5.2.1):
run every registered query on Spark AND its DuckDB oracle twin, compare
row count, column names, and the full order-insensitive value multiset.

Comparison is STRICT (exact equality, floats included): queries are designed
so both engines compute bit-identical doubles (integer-cents aggregation,
shared IEEE expression trees — functions/money.py). If a future query truly
cannot be bit-exact, relax HERE deliberately, per query, with a comment.
"""

from __future__ import annotations

import datetime
import math

import pytest

from databricks_sales_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _norm_cell(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        # exact: map -0.0 to 0.0, NaN to a sentinel so equality works
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row: tuple):
    # rows may mix types / contain None — order by (is-null, type, repr),
    # deterministic and identical for identical value multisets
    return tuple((v is None, type(v).__name__, repr(v)) for v in row)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    named = sorted(cols)
    out = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=_sort_key
    )
    return named, out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    s_named, s_norm = _normalize(s_cols, s_rows)
    d_named, d_norm = _normalize(d_cols, d_rows)

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
