"""Property pin for the WHOLE candidate-generation theorem of
q_prefix_jaccard_join (operators/dedup.py) as pure set math: for any
corpus of token sets, any global df-major total order, and any
threshold t, the composition

    asymmetric prefixes (probe n−⌈2t/(1+t)·n⌉+1, index n−⌈t·n⌉+1)
    ∘ size-ordered pairing ∘ LENGTH ∘ POSITIONAL ∘ SUFFIX-BOUND

must forward EVERY pair with Jaccard ≥ t to the verify stage.  The
four committed corpora exercise fixed shapes; hypothesis fuzzes
thousands — including thresholds other than the production 0.5, which
only this test pins (the code claims its 1e-9 slacks keep the bounds
safe "under any future threshold").

The model below mirrors the Spark expressions exactly: same ceil
placement, same 1e-9 slacks, same one-sided le shortcut, same CAP
slice.  A divergence between model and plan would be caught by the
end-to-end brute-force tests; a divergence between model and THEOREM
is caught here.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

T_VALUES = (0.5, 0.6, 0.7, 0.8, 0.9)

# small vocab → dense overlaps; docs as frozensets of token ids
CORPUS = st.lists(
    st.frozensets(st.integers(min_value=0, max_value=60), min_size=1,
                  max_size=40),
    min_size=2,
    max_size=14,
)


def _candidates(corpus, t, cap):
    """Pure-python mirror of the candidate stage.  Returns the set of
    (i, j) index pairs forwarded to the verify."""
    # global df-major order with a deterministic tie-break — okeys are
    # just ranks in that order (any bijective monotone packing works)
    df = {}
    for s in corpus:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    order = sorted(df, key=lambda tok: (df[tok], tok))
    okey = {tok: r for r, tok in enumerate(order)}

    docs = []
    for s in corpus:
        toks = sorted(s, key=lambda x: okey[x])
        n = len(toks)
        index_len = n - math.ceil(t * n) + 1
        probe_len = n - math.ceil(2.0 * t / (1.0 + t) * n - 1e-9) + 1
        arr = sorted(okey[x] for x in toks)[:cap]
        docs.append(
            {
                "n": n,
                "index": {okey[x] for x in toks[:index_len]},
                "index_pos": {okey[x]: p + 1
                              for p, x in enumerate(toks[:index_len])},
                "probe": {okey[x] for x in toks[:max(probe_len, 0)]},
                "probe_pos": {okey[x]: p + 1
                              for p, x in enumerate(toks[:max(probe_len, 0)])},
                "set": {okey[x] for x in s},
                "arr": arr,
            }
        )

    out = set()
    for i, a in enumerate(docs):
        for j, b in enumerate(docs):
            if i == j:
                continue
            # size-ordered pairing: small side probes, large indexes
            small_first = (a["n"] < b["n"]) or (a["n"] == b["n"] and i < j)
            if not small_first:
                continue
            shared = a["probe"] & b["index"]
            if not shared:
                continue
            n_s, n_l = a["n"], b["n"]
            # LENGTH filter
            if not (n_s >= t * n_l - 1e-9):
                continue
            alpha = t / (1.0 + t) * (n_s + n_l)
            # POSITIONAL filter: a pair survives if ANY shared
            # occurrence passes (the join emits one row per shared
            # token; the distinct keeps the pair if one row survives)
            def pos_ok(tok):
                ps, pl = a["probe_pos"][tok], b["index_pos"][tok]
                bound = (
                    min(ps - 1, pl - 1)
                    + 1
                    + min(n_s - ps, n_l - pl)
                )
                return bound >= alpha - 1e-9
            if not any(pos_ok(tok) for tok in shared):
                continue
            # SUFFIX-BOUND filter (same row-level semantics)
            arr_s, arr_l = a["arr"], b["arr"]
            max_s, max_l = arr_s[-1], arr_l[-1]
            theta = min(max_s, max_l)
            le_s = len(arr_s) if max_s <= max_l else sum(
                1 for x in arr_s if x <= theta
            )
            le_l = len(arr_l) if max_l <= max_s else sum(
                1 for x in arr_l if x <= theta
            )
            sb = len(set(arr_s) & set(arr_l)) + min(n_s - le_s, n_l - le_l)
            if not (sb >= alpha - 1e-9):
                continue
            out.add((min(i, j), max(i, j)))
    return out


@settings(max_examples=400, deadline=None)
@given(
    corpus=CORPUS,
    t_idx=st.integers(min_value=0, max_value=len(T_VALUES) - 1),
    cap=st.integers(min_value=4, max_value=48),
)
def test_candidate_stage_never_loses_a_true_pair(corpus, t_idx, cap):
    t = T_VALUES[t_idx]
    cands = _candidates(corpus, t, cap)
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            a, b = set(corpus[i]), set(corpus[j])
            inter = len(a & b)
            if not inter:
                continue
            jac = inter / (len(a) + len(b) - inter)
            if jac >= t:
                assert (i, j) in cands, (
                    f"lost true pair ({i},{j}) J={jac:.4f} t={t} cap={cap}"
                )


@settings(max_examples=100, deadline=None)
@given(corpus=CORPUS)
def test_exact_duplicates_always_survive(corpus):
    # duplicate every doc; every (original, copy) pair has J=1 and
    # must be forwarded at every threshold
    doubled = list(corpus) + list(corpus)
    n = len(corpus)
    for t in T_VALUES:
        cands = _candidates(doubled, t, cap=32)
        for i in range(n):
            lo, hi = min(i, i + n), max(i, i + n)
            assert (lo, hi) in cands
