"""The okarr attachment strategies (r12 A/B) and the prefix-frame
persist toggle are pure PLAN choices — every combination must produce
the identical exact pair table.  The A/B twin ("slice_join") and the
non-persisted plan stay live behind module flags precisely so this
equivalence is executable, not a comment."""

from __future__ import annotations

import pytest

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import dedup
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.common import (
    clear_caches,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def reset_flags():
    yield
    dedup._OKARR_STRATEGY = "window"
    dedup._PREFIX_PERSIST = True
    dedup._COUNT_CANDIDATES = False
    clear_caches()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "strategy,persist",
    [("window", False), ("slice_join", True), ("slice_join", False)],
)
def test_strategy_and_persist_equivalent(spark, reset_flags, strategy, persist):
    clear_caches()
    baseline = _rows(dedup.q_prefix_jaccard_join(spark, SF))
    dedup._OKARR_STRATEGY = strategy
    dedup._PREFIX_PERSIST = persist
    clear_caches()
    alt = _rows(dedup.q_prefix_jaccard_join(spark, SF))
    assert alt == baseline
    assert baseline  # non-vacuous: corpus contains near-dup pairs


def test_slice_join_prunes_as_hard_as_window(spark, reset_flags):
    """The slice_join okarr must be built BEFORE the prefix cut: a
    truncated array (min(prefix_len, CAP) instead of min(n, CAP) okeys)
    stays lossless in the OUTPUT but weakens the suffix-bound prune —
    invisible to the equivalence test above, visible in the candidate
    cardinality.  Pin: both strategies generate the IDENTICAL candidate
    count (the filters are deterministic functions of the same per-doc
    state, so equality is exact, not approximate)."""
    dedup._COUNT_CANDIDATES = True
    counts = {}
    for strat in ("window", "slice_join"):
        dedup._OKARR_STRATEGY = strat
        clear_caches()
        dedup.q_prefix_jaccard_join(spark, SF).count()
        counts[strat] = dedup._LAST_CAND_COUNT
    assert counts["window"] == counts["slice_join"]
    assert counts["window"] and counts["window"] > 0
