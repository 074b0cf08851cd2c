"""The next-rotation selector (round-12: the ad-hoc sample scripting
promoted to tools/make_next_rotation.py) — priority order pinned:
never-checked first (registration order), then stale rows (oracled but
not hash-green), then the oldest-round re-check queue; names in the
current sample excluded throughout."""

from __future__ import annotations

import json

from tools.make_next_rotation import next_rotation


def _files(tmp_path, rounds):
    out = []
    for rnd, rows in rounds.items():
        f = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
        f.write_text(json.dumps(rows))
        out.append(f)
    return sorted(out)


GREEN = {"hash_match": True}
ROWS_ONLY = {"hash_match": None, "err": "no_oracle"}


def test_priority_order_and_exclusions(tmp_path):
    queries = ["q_new2", "a", "b", "c", "q_new1", "cur"]
    oracles = {"a", "b", "c", "cur"}
    files = _files(
        tmp_path,
        {
            1: {"b": GREEN, "c": ROWS_ONLY},
            3: {"a": GREEN, "cur": GREEN},
        },
    )
    got = next_rotation(queries, oracles, ["cur"], files=files, slots=50)
    # never-checked in REGISTRATION order, then stale (c: oracled but its
    # only row is rows-only), then re-checks oldest-round-first (b r01
    # before a r03); cur excluded
    assert got == ["q_new2", "q_new1", "c", "b", "a"]


def test_latest_row_wins_across_rounds(tmp_path):
    # c was rows-only in r01 but hash-green in r02 -> NOT stale, plain
    # re-check ordered by its latest round
    files = _files(
        tmp_path,
        {1: {"c": ROWS_ONLY, "b": GREEN}, 2: {"c": GREEN}},
    )
    got = next_rotation(["b", "c"], {"b", "c"}, [], files=files, slots=50)
    assert got == ["b", "c"]  # b r01 older than c r02


def test_slot_cap(tmp_path):
    files = _files(tmp_path, {1: {f"q{i:03d}": GREEN for i in range(80)}})
    qs = [f"q{i:03d}" for i in range(80)]
    got = next_rotation(qs, set(qs), [], files=files, slots=50)
    assert len(got) == 50
    assert got == sorted(qs)[:50]


def test_matches_committed_next_candidates():
    """The committed next-round file must be exactly what the tool derives
    from the repo's real state (guards against the file rotting if
    CORRECTNESS artifacts or the registry change before the round opens).
    Path is REPO-anchored, not cwd-relative (round-12 advice)."""
    from pathlib import Path

    from databricks_sales_etl_pipeline_spark import registry

    registry.load_all()
    expect = next_rotation(
        list(registry.QUERIES),
        set(registry.ORACLES),
        registry._DRIVER_PRIORITY,
    )
    repo = Path(__file__).resolve().parent.parent
    committed = json.loads(
        (repo / "tools" / "r15_rotation_candidates.json").read_text()
    )
    assert committed == expect
