"""Property pin for the r11 suffix-bound filter's THEOREM
(operators/dedup.py, q_prefix_jaccard_join): for ANY two finite sets
of distinct order keys and ANY array cap, the bound

    |arr_s ∩ arr_l| + min(n_s − le_s, n_l − le_l)   with
    arr_X = the |cap| smallest keys of X,
    θ     = min(max(arr_s), max(arr_l)),
    le_X  = |{x ∈ X : x ≤ θ}|  (computable from arr_X alone)

is an UPPER bound on |A ∩ B| — the losslessness of the pruning is a
statement about sets, not about Spark, so hypothesis can hammer it
with thousands of adversarial examples far beyond the three fixed
corpora the end-to-end tests use.  Also pins the one-sided le
shortcut (the side owning the smaller max counts its whole array)
against the direct definition.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

KEYS = st.sets(st.integers(min_value=0, max_value=400), min_size=1,
               max_size=120)


def _bound(a: set, b: set, cap: int):
    n_s, n_l = len(a), len(b)
    arr_s = sorted(a)[:cap]
    arr_l = sorted(b)[:cap]
    max_s, max_l = arr_s[-1], arr_l[-1]
    theta = min(max_s, max_l)
    # one-sided shortcut exactly as the Spark plan writes it
    le_s = len(arr_s) if max_s <= max_l else sum(
        1 for x in arr_s if x <= theta
    )
    le_l = len(arr_l) if max_l <= max_s else sum(
        1 for x in arr_l if x <= theta
    )
    # the direct definition the theorem speaks about
    le_s_direct = sum(1 for x in a if x <= theta)
    le_l_direct = sum(1 for x in b if x <= theta)
    assert le_s == le_s_direct
    assert le_l == le_l_direct
    i_pref = len(set(arr_s) & set(arr_l))
    return i_pref + min(n_s - le_s, n_l - le_l)


@settings(max_examples=2000, deadline=None)
@given(a=KEYS, b=KEYS, cap=st.integers(min_value=1, max_value=48))
def test_suffix_bound_never_undercounts(a, b, cap):
    assert _bound(a, b, cap) >= len(a & b)


@settings(max_examples=500, deadline=None)
@given(a=KEYS, cap=st.integers(min_value=1, max_value=48))
def test_suffix_bound_exact_on_identical_sets(a, cap):
    # identical sets: the bound must ADMIT the pair (J = 1 ≥ any t):
    # intersect = |arr|, remainders equal n − |arr| — bound == n
    assert _bound(a, a, cap) == len(a)


@settings(max_examples=1000, deadline=None)
@given(a=KEYS, b=KEYS)
def test_suffix_bound_tight_when_uncapped(a, b):
    # cap ≥ both sizes → arrays ARE the sets, θ = min of maxima, and
    # the bound degrades to |A∩B ≤ θ| + min overshoot — still ≥ truth
    bd = _bound(a, b, cap=200)
    assert bd >= len(a & b)
