"""Round-10 hardening evidence.

1. scratch_checkpoint is per-(process, tag): the round-10 determinism sweep
   ran two engine processes concurrently and their identical streaming
   queries rmtree'd each other's LIVE checkpoint dirs (STREAM_FAILED /
   'Directory not empty'). The dir must embed the PID so concurrent
   instances never share scratch, while the same tag still reuses its dir
   within one process (bounded leak).
2. materialize_grams' switch behavior is pinned in test_gram_fanout.py.
"""

from __future__ import annotations

import os

from databricks_sales_etl_pipeline_spark.streaming.util import (
    scratch_checkpoint,
)


def test_scratch_checkpoint_is_pid_keyed():
    p = scratch_checkpoint("unittag")
    assert str(os.getpid()) in os.path.basename(p)
    # same tag, same process -> same path (bounded, wiped before reuse)
    assert scratch_checkpoint("unittag") == p
    # distinct tags stay distinct
    assert scratch_checkpoint("othertag") != p


def test_scratch_checkpoint_wipes_before_reuse(tmp_path):
    p = scratch_checkpoint("wipetag")
    os.makedirs(os.path.join(p, "state"), exist_ok=True)
    assert os.path.exists(p)
    p2 = scratch_checkpoint("wipetag")
    assert p2 == p and not os.path.exists(p2)


def test_sweep_dead_scratch_removes_only_dead_owners():
    """Round-10 advisor follow-up: PID-keying stopped the live-dir race but
    left dead processes' scratch dirs to the OS reaper. The sweep must
    remove a dir whose embedded PID no longer exists and must NOT touch a
    live owner's dir (our own PID stands in for 'live')."""
    import shutil
    import subprocess
    import sys
    import tempfile

    from databricks_sales_etl_pipeline_spark.streaming.util import (
        sweep_dead_scratch,
    )

    tmp = tempfile.gettempdir()
    # a genuinely dead PID: spawn a process and let it exit
    proc = subprocess.run([sys.executable, "-c", "import os; print(os.getpid())"],
                          stdout=subprocess.PIPE, text=True)
    dead_pid = int(proc.stdout.strip())
    dead = os.path.join(tmp, f"dsep_ckpt_{dead_pid}_sweeptest")
    live = os.path.join(tmp, f"dsep_ckpt_{os.getpid()}_sweeptest")
    other = os.path.join(tmp, f"dsep_vtbl_{dead_pid}_sweeptest")  # other prefix
    for d in (dead, live, other):
        os.makedirs(d, exist_ok=True)
    try:
        sweep_dead_scratch("dsep_ckpt_")
        assert not os.path.exists(dead), "dead owner's dir must be swept"
        assert os.path.exists(live), "live owner's dir must survive"
        assert os.path.exists(other), "other prefixes are out of scope"
    finally:
        for d in (live, other):
            shutil.rmtree(d, ignore_errors=True)
