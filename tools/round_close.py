#!/usr/bin/env python
"""Round-end checklist in one command (round-3 lesson: a green round must
not end with stale bookkeeping). Runs, in order:

1. rotation check — every ``_DRIVER_PRIORITY`` slot is spent on a query
   without a prior driver row (mirrors tests/test_contract.py);
2. the two-process concurrency check over every scratch-dir query
   (tools/concurrency_check.py — the round-10 shared-tempdir bug class
   recurs exactly when a new scratch path forgets the PID key);
3. PLANS.md regeneration (tools/dump_plans.py);
4. the FULL test suite including the `slow` tier (round-14: the default
   ``pytest tests/ -q`` gates out slow tests so the driver's verification
   window fits — round close must still prove the whole suite green);
5. the full bench (bench.py) and rc check.

Usage:  PYTHONPATH=. python tools/round_close.py [--skip-bench] [--skip-slow]
Exit code 0 = everything green and regenerated.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: the 11 queries that are rows-only BY DESIGN (SURVEY §2.7's floor table:
#: engine-specific hash bits / sketch binaries / iterative argmax training,
#: each verified by an oracled twin or a python-reference unit test).
ROWS_ONLY_FLOOR = {
    "ext_dedup_minhash",
    "ext_dedup_minhash_native",
    "ext_fingerprint_winnow",
    "ext_dedup_simhash",
    "ext_dup_clusters",
    "ext_approx_distinct",
    "ext_hll_union",
    "ext_compression_ratio",
    "ext_bpe_train",
    "ext_bpe_encode",
    "ext_wordpiece_train",
}


def _correctness_files() -> list[Path]:
    """CORRECTNESS_r*.json oldest-round-first BY PARSED ROUND NUMBER —
    lexicographic glob order only works while filenames stay zero-padded
    (r01..r99); an r100 would silently let older rows overwrite newer ones
    in the 'latest row per name' merge (round-10 advisor finding)."""
    return sorted(
        REPO.glob("CORRECTNESS_r[0-9]*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
    )


def check_rotation() -> int:
    from databricks_sales_etl_pipeline_spark import registry

    registry.load_all()
    checked: set[str] = set()
    for f in _correctness_files():
        checked |= set(json.loads(f.read_text()))
    never = [n for n in registry.QUERIES if n not in checked]
    wasted = [n for n in registry._DRIVER_PRIORITY if n in checked]
    # a re-check slot is only STALE when it DISPLACES a never-checked name
    # (mirrors tests/test_contract.py): once the backlog fits inside the 50
    # slots, spare ones legally go to the re-check queue.
    displaced = [n for n in never if n not in registry._DRIVER_PRIORITY]
    if displaced and wasted:
        print(f"ROTATION STALE: {len(displaced)} queries lack a driver row "
              f"and are not sampled, but the sample re-checks green ones: "
              f"{wasted[:10]}")
        return 1
    print(f"rotation ok: {len(never)} never-checked, {len(wasted)} re-checked "
          f"(sample slots: {len(registry._DRIVER_PRIORITY)})")
    # make the NEXT rotation mechanical (round-4 verdict ask #8): the names
    # that still lack a driver row and are NOT in the current sample are
    # exactly what next round's _DRIVER_PRIORITY should start with
    overflow = [n for n in never if n not in registry._DRIVER_PRIORITY]
    if overflow:
        print(f"next-round rotation candidates ({len(overflow)}, beyond the "
              f"current sample): {overflow}")
    # stale-row report (round-9 verdict ask #5): a name whose registry
    # status is STRONGER than its latest driver row — it has an oracle now
    # but its only driver check predates it ('no_oracle') or wasn't a hash
    # pass. Once `never` is empty these are the re-check queue.
    latest: dict[str, dict] = {}
    for f in _correctness_files():
        latest.update(json.loads(f.read_text()))
    stale = sorted(
        n for n, row in latest.items()
        if n in registry.ORACLES and row.get("hash_match") is not True
    )
    if stale:
        print(f"stale driver rows (oracled in registry, never hash-green "
              f"with the driver; queue for re-check once the never-checked "
              f"backlog empties): {stale}")
    # rows-only floor guard (round-13, SURVEY §2.7 table): exactly these 11
    # are structurally un-oracle-able BY DESIGN; any growth is a regression
    # (a new rows-only query must gain a twin or amend the SURVEY table).
    rows_only = sorted(n for n in registry.QUERIES if n not in registry.ORACLES)
    print(f"rows-only queries: {len(rows_only)} "
          f"(documented floor: {len(ROWS_ONLY_FLOOR)})")
    if set(rows_only) != ROWS_ONLY_FLOOR:
        grew = set(rows_only) - ROWS_ONLY_FLOOR
        shrank = ROWS_ONLY_FLOOR - set(rows_only)
        print(f"ROWS-ONLY FLOOR CHANGED: new={sorted(grew)} "
              f"twinned={sorted(shrank)} — update SURVEY §2.7's floor table "
              f"and ROWS_ONLY_FLOOR here in the same commit")
        return 1
    return 0


def run_concurrency_check() -> int:
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "concurrency_check.py")],
        cwd=REPO, env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    print(f"concurrency check rc={r.returncode}")
    return r.returncode


def regen_plans() -> int:
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "dump_plans.py")],
        cwd=REPO, env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    print(f"PLANS.md regen rc={r.returncode}")
    return r.returncode


def run_bench() -> int:
    r = subprocess.run([sys.executable, str(REPO / "bench.py")], cwd=REPO)
    print(f"bench rc={r.returncode}")
    return r.returncode


def run_full_suite() -> int:
    """The whole suite, slow tier included — the CLI -m overrides
    pytest.ini's default `-m "not slow"` (last -m wins)."""
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-m", "slow or not slow"],
        cwd=REPO, env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    print(f"full suite (incl. slow) rc={r.returncode}")
    return r.returncode


def main() -> None:
    rc = check_rotation()
    rc |= run_concurrency_check()
    rc |= regen_plans()
    if "--skip-slow" not in sys.argv:
        rc |= run_full_suite()
    if "--skip-bench" not in sys.argv:
        rc |= run_bench()
    sys.exit(rc)


if __name__ == "__main__":
    main()
