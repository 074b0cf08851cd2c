"""bench.py best-of-N combination rules (round-10 verdict ask #3), pinned
without spawning JVMs: per-query MIN across runs, fastest probes, the
probe-normalized total, failed-run tolerance, and error merging."""

from __future__ import annotations

import bench


def _run(queries, all_core, one_core=0.4, errors=None):
    r = {
        "metric": "headline_total_runtime",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "fixture": {"size_digest": "abc"},
        "host_probe_sec": {"all_core": all_core, "one_core": one_core},
        "_rc": 0,
    }
    if errors:
        r["errors"] = errors
    return r


def test_per_query_min_and_total():
    runs = [
        _run({"q1": 2.0, "q2": 1.0}, all_core=0.6),
        _run({"q1": 1.5, "q2": 1.2}, all_core=0.55),
    ]
    out = bench.combine_runs(runs, 2)
    assert out["queries"] == {"q1": 1.5, "q2": 1.0}
    assert out["value"] == 2.5
    assert out["run_totals"] == [3.0, 2.7]
    assert out["best_of"] == 2


def test_normalization_uses_fastest_probe_against_anchor():
    runs = [_run({"q1": 10.0}, all_core=2 * bench.PROBE_ANCHOR_ALL_CORE)]
    out = bench.combine_runs(runs, 1)
    # host measured 2x slower than the anchor -> normalized total halves
    assert out["value_normalized"] == 5.0
    assert out["host_probe_sec"]["anchor_all_core"] == (
        bench.PROBE_ANCHOR_ALL_CORE
    )


def test_failed_runs_are_tolerated_and_errors_merge():
    runs = [
        {"_rc": 1},  # child crashed before timing anything
        _run({"q1": 1.0}, all_core=0.6, errors={"q9": "Boom"}),
    ]
    out = bench.combine_runs(runs, 2)
    assert out["queries"] == {"q1": 1.0}
    assert out["run_totals"] == [None, 1.0]
    assert out["errors"] == {"q9": "Boom"}


def test_all_failed_returns_none():
    assert bench.combine_runs([{"_rc": 1}, {}], 2) is None


def test_corrupt_child_stdout_degrades_to_skipped_run():
    # A child killed mid-print leaves a partial final JSON line; the parent
    # must degrade it to {"_rc": 1}, not die on JSONDecodeError.
    assert bench.parse_child_payload('{"queries": {"q1": 1.0, "q2', 0) == {
        "_rc": 1
    }
    assert bench.parse_child_payload("", 0) == {"_rc": 1}
    assert bench.parse_child_payload("[1,2]", 0) == {"_rc": 1}
    good = bench.parse_child_payload('{"queries": {"q1": 1.0}}', 0)
    assert good == {"queries": {"q1": 1.0}, "_rc": 0}
    # OOM-killed child: nonzero rc propagates even when the line parsed
    assert bench.parse_child_payload('{"queries": {"q1": 1.0}}', 137)[
        "_rc"
    ] == 137
    # corrupt payload + failed run still combine to a usable best-of result
    out = bench.combine_runs(
        [bench.parse_child_payload('{"queries": {"q', 0),
         _run({"q1": 1.0}, all_core=0.6)], 2)
    assert out["queries"] == {"q1": 1.0}


def test_query_present_in_only_one_run_still_counts():
    runs = [
        _run({"q1": 1.0}, all_core=0.6),
        _run({"q1": 0.9, "q2": 4.0}, all_core=0.7),
    ]
    out = bench.combine_runs(runs, 2)
    assert out["queries"] == {"q1": 0.9, "q2": 4.0}
