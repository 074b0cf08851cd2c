"""Property tests (hypothesis, no Spark) for the scan-conversion
identities behind extensions/scanops.py — the algebra that lets
sequential recurrences run as distributed window scans:

- Lindley queue:   end_i = max(arr_i, end_{i-1}) + svc_i
                == P_i + max_{k<=i}(arr_k - P_{k-1})      (prefix reflection)
- clamped walk:    S_i = max(0, S_{i-1} + d_i)
                == P_i - min(0, min_{k<=i} P_k)           (Skorokhod)
- staged division: floor(s*1e6/d) == 3-level x100 long division
- S-curve chain:   fixed-point 1-(1-s^r)^b is monotone and bounded

The Spark operators are separately verified against these same
recurrences on fixture data; these properties pin the IDENTITIES
themselves on adversarial inputs (hypothesis shrinks counterexamples).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # arrival
            st.integers(min_value=1, max_value=500),  # service
        ),
        min_size=1,
        max_size=60,
    )
)
def test_lindley_prefix_reflection(jobs):
    jobs.sort()  # FIFO by arrival
    # literal recursion
    end = None
    lit = []
    for arr, svc in jobs:
        start = arr if end is None else max(arr, end)
        end = start + svc
        lit.append(end)
    # prefix reflection
    p = 0
    m = None
    ref = []
    for arr, svc in jobs:
        prev_p = p
        p += svc
        cand = arr - prev_p
        m = cand if m is None else max(m, cand)
        ref.append(p + m)
    assert lit == ref


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=80),
    st.integers(min_value=0, max_value=500),
)
def test_skorokhod_clamped_walk(deltas, opening):
    # literal recursion
    s = opening
    lit = []
    for d in deltas:
        s = max(0, s + d)
        lit.append(s)
    # reflection: S_i = P_i - min(0, min_{k<=i} P_k), P includes opening
    p = opening
    floor_p = 0
    ref = []
    for d in deltas:
        p += d
        floor_p = min(floor_p, p)
        ref.append(p - min(0, floor_p))
    assert lit == ref


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**15),
    st.integers(min_value=1, max_value=10**15),
)
def test_staged_long_division_exact(s, d):
    staged = (
        (s * 100 // d) * 10000
        + ((s * 100 % d) * 100 // d) * 100
        + (((s * 100 % d) * 100 % d) * 100 // d)
    )
    assert staged == s * 1_000_000 // d
    # every intermediate stays below 100*d + small quotients (int64-safe
    # whenever 100*d < 2^63)
    assert (s * 100 % d) < d and ((s * 100 % d) * 100 % d) < d


@settings(max_examples=200, deadline=None)
@given(st.sampled_from([(2, 4), (4, 8), (8, 16)]))
def test_scurve_fixed_point_shape(cfg):
    r, b = cfg

    def curve(s_ppm):
        p = s_ppm
        for _ in range(r - 1):
            p = p * s_ppm // 1_000_000
        q = 1_000_000 - p
        k = b
        while k > 1:
            q = q * q // 1_000_000
            k //= 2
        return 1_000_000 - q

    pts = [curve(k * 50_000) for k in range(21)]
    assert pts[0] == 0 and pts[-1] == 1_000_000
    assert all(0 <= p <= 1_000_000 for p in pts)
    assert pts == sorted(pts)  # monotone S-curve
