"""Driver-contract registration guards.

The driver's correctness gate checks only the FIRST 50 ``queries()``
entries, so registration order is a managed rotation (see the comment
in ``__spark_entry__.py``).  These tests pin the late-r5 window
exactly: a mid-round addition that lands inside the window (instead
of past it, via a late namespace) silently evicts a query the
rotation promised a driver row — that failure mode becomes a red test
here, not a discovery in next round's CORRECTNESS file.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_window_is_exactly_the_promoted_fifty():
    """The whole 50-slot window is the _PROMOTED list: fifty
    never-driver-checked queries (the r4 verdict's 15 at the head,
    order preserved, then the next 35 in registration order per
    tools/rotation.py)."""
    q = list(entrymod.queries())
    assert len(entrymod._PROMOTED) == 50
    assert q[:50] == list(entrymod._PROMOTED)


def test_promoted_head_keeps_the_r4_verdict_fifteen():
    """The r4 verdict named these 15 explicitly; they must stay at the
    very head in this order."""
    assert entrymod._PROMOTED[:15] == (
        "rel_min_price_supplier",
        "rel_part_value_share",
        "rel_top_supplier",
        "rel_dominant_suppliers",
        "rel_market_share",
        "rel_profit_by_nation_year",
        "rel_supplier_part_counts",
        "text_lm_score",
        "pipe_mixture",
        "pipe_training_corpus",
        "mm_pixel_stats",
        "events_sliding_volume",
        "sim_embedding_quantize",
        "text_top_tokens_approx",
        "text_chunk_windows",
    )


def test_promoted_names_all_exist():
    q = set(entrymod.queries())
    missing = [n for n in entrymod._PROMOTED if n not in q]
    assert not missing, missing


def test_every_query_has_oracle_or_manifest_entry():
    """No silent third state: a declared query either has an oracle or
    is in the rows_only() manifest."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == set(entrymod.rows_only())
    assert not (set(entrymod.rows_only()) - q)


def test_oracles_reference_declared_queries_only():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
