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
    never-driver-checked queries in registration order per
    tools/rotation.py."""
    q = list(entrymod.queries())
    assert len(entrymod._PROMOTED) == 50
    assert q[:50] == list(entrymod._PROMOTED)


def test_promoted_matches_mechanical_rotation():
    """Since r7 the window is derived at import time from the
    CORRECTNESS_r*.json union; it must agree with tools/rotation.py's
    independent derivation (same green rule, registration order) so
    neither can silently drift."""
    import tools.rotation as rotation

    green = rotation.driver_green(entrymod.rows_only())
    names = list(entrymod.queries())
    expected = rotation.next_window(
        names, green, reverify=entrymod._REVERIFY_FIRST
    )
    assert list(entrymod._PROMOTED) == expected[:50]


def test_promoted_leads_with_every_never_checked_name():
    """Window slots are scarce: every never-driver-checked name must
    come BEFORE any already-green padding name (padding appears only
    once the backlog no longer fills the window; it then re-proves
    oldest green rows first per the r8-verdict policy)."""
    import tools.rotation as rotation

    green = rotation.driver_green(entrymod.rows_only())
    flags = [n in green for n in entrymod._PROMOTED]
    # monotone: once padding (green) starts, no never-checked follows
    assert flags == sorted(flags), list(
        zip(entrymod._PROMOTED, flags)
    )
    n_never_total = sum(
        1 for n in entrymod.queries() if n not in green
    )
    assert flags.count(False) == min(50, n_never_total)


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


def test_no_orphan_oracles():
    """The inverse guard: an ORACLES entry whose QUERIES twin was
    renamed or forgotten would silently never be driver-checked —
    every oracle must belong to a declared query."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert not (o - q), sorted(o - q)


def test_oracles_reference_declared_queries_only():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_no_cross_module_name_shadowing():
    """A query name registered by TWO modules is a silent bug: the
    later module wins in queries()/oracle_sql(), the earlier variant
    becomes dead-but-executed weight in bench.py, and its oracle can
    pair with the wrong implementation.  Found live in r8
    (events_gap_fill in both streaming/windowed.py and
    operators/timeseries.py) — this pins the invariant mechanically."""
    from collections import Counter

    counts = Counter(
        name for mod in entrymod._MODULE_ORDER for name in mod.QUERIES
    )
    dupes = sorted(n for n, c in counts.items() if c > 1)
    assert not dupes, dupes
    o_counts = Counter(
        name
        for mod in entrymod._MODULE_ORDER
        for name in getattr(mod, "ORACLES", {})
    )
    o_dupes = sorted(n for n, c in o_counts.items() if c > 1)
    assert not o_dupes, o_dupes
