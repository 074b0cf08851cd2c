"""Round-11 provenance model for MinHash scale-curve candidates, pinned at
a fast corpus size: every candidate is either a planted duplicate or a
pair sharing a REAL shingle — pure 64-bit band-value collisions must be
zero (if one ever appears, the documented model is falsified and the probe
tool exits nonzero for the same reason). Bucket populations stay DIFFUSE
(the planted exact-dup pairs make pop-2 buckets; no concentrated
boilerplate bucket exists in this generator), which is why the hot-band
cap is the guard for a different hazard than the one this curve measures.
"""

from __future__ import annotations

from tools.probe_minhash_extras import classify


def test_candidates_classify_with_zero_hash_collisions(spark):
    out = classify(spark, 20_000)
    assert out["planted"] == 1_999  # docs 10,20,...,19990 copy their predecessor
    assert out["pure_hash_collisions"] == 0
    assert (
        out["planted"] + out["extras_sharing_real_shingle"] == out["candidates"]
    )
    # diffuse, not concentrated: nothing beyond the exact-dup pop-2 buckets
    # plus vocab-density noise far below any sensible hot-band cap
    assert max(out["bucket_pop_distribution"]) <= 4
