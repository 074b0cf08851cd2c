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
