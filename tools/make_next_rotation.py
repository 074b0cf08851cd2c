#!/usr/bin/env python
"""Generate the next round's 50-slot driver-rotation sample (round-12:
the ad-hoc selection scripting from rounds 10-12, promoted to a tool so
every future rotation is mechanical and identically prioritized).

Priority order (matches the displacement semantics in
tests/test_contract.py and tools/round_close.py):
  1. never-checked names (no row in any CORRECTNESS_r[0-9]*.json),
     in registration order — these MUST fill slots first;
  2. stale rows (oracled in the registry but the latest driver row is
     not hash-green — e.g. a rows-only row that predates a new oracle),
     ordered ALPHABETICALLY (explicit tiebreak: stale rows are rare and
     round-less, so name order is the stable deterministic choice —
     round-12 advice asked this be stated);
  3. the re-check queue: oldest latest-round first, name as tiebreak.

Names assumed freshly checked this round (the CURRENT _DRIVER_PRIORITY)
are excluded — the driver's next CORRECTNESS drop covers them.

    PYTHONPATH=. python tools/make_next_rotation.py [out.json]

Prints the sample and writes it to out.json (default
tools/rNEXT_rotation_candidates.json). Pre-verify the sample at sf0.01
AND sf0.1 (tools/quick_parity.py) before installing it — the standing
round-open discipline.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SLOTS = 50


def correctness_files(repo: Path = REPO) -> list[Path]:
    return sorted(
        repo.glob("CORRECTNESS_r[0-9]*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
    )


def next_rotation(queries, oracles, current_sample, files=None, slots=SLOTS):
    """Pure selection: (registry view, current sample, correctness files)
    -> ordered candidate list. Testable without Spark."""
    latest_round: dict[str, int] = {}
    latest_row: dict[str, dict] = {}
    for f in files if files is not None else correctness_files():
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for n, row in json.loads(f.read_text()).items():
            latest_round[n] = rnd
            latest_row[n] = row
    current = set(current_sample)
    never = [
        n for n in queries if n not in latest_round and n not in current
    ]
    stale = sorted(
        n
        for n, row in latest_row.items()
        if n in oracles
        and row.get("hash_match") is not True
        and n not in current
    )
    recheck = sorted(
        (
            n
            for n in queries
            if n in latest_round and n not in current and n not in stale
        ),
        key=lambda n: (latest_round[n], n),
    )
    out: list[str] = []
    for group in (never, stale, recheck):
        for n in group:
            if n not in out:
                out.append(n)
    return out[:slots]


def main() -> None:
    from databricks_sales_etl_pipeline_spark import registry

    registry.load_all()
    sample = next_rotation(
        list(registry.QUERIES),
        set(registry.ORACLES),
        registry._DRIVER_PRIORITY,
    )
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "tools" / "rNEXT_rotation_candidates.json"
    )
    out.write_text(json.dumps(sample, indent=0) + "\n")
    print(f"wrote {len(sample)} names to {out}")
    for n in sample:
        print(" ", n)


if __name__ == "__main__":
    main()
