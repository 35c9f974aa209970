"""The round-over-round accounting tools the r7 verdict asked for:
tools/bench_diff.py (per-query regression diffing on the
load-insensitive signal) and tools/rotation.py --status (the committed
backlog manifest).  These are judge-facing artifacts — a silent bug
here corrupts the round's bookkeeping, so they get the same test
treatment as operators."""

from __future__ import annotations

import json
import subprocess
import sys

import __spark_entry__ as entrymod
import tools.bench_diff as bd
import tools.rotation as rotation


def _rec(queries, min_of_k=None):
    return {"queries": queries, "min_of_k": min_of_k or {}}


def test_bench_diff_min_of_k_only_when_both_sides_measured():
    """Cross-round comparability (r8 review): min_of_k is used only
    when BOTH rounds recorded it — a one-sided minimum against the
    other round's load-drifted first run prints spurious deltas."""
    with_mk = _rec({"q1": 10.0}, {"q1": 4.0})
    without_mk = _rec({"q1": 9.0})
    assert bd._best(with_mk, with_mk, "q1") == 4.0
    assert bd._best(with_mk, without_mk, "q1") == 10.0
    assert bd._best(without_mk, with_mk, "q1") == 9.0


def test_bench_diff_reports_added_removed_and_deltas(tmp_path, capsys):
    old = _rec({"a": 1.0, "b": 5.0, "gone": 2.0, "failed": -1.0}, {"b": 4.8})
    new = _rec({"a": 1.0, "b": 9.0, "fresh": 3.0}, {"b": 7.5})
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    assert bd.main(["bench_diff.py", str(po), str(pn)]) == 0
    out = capsys.readouterr().out
    # failed (-1) entries are excluded; added/removed named; the b
    # regression reported min-of-k vs min-of-k (both rounds have it)
    assert "fresh" in out and "gone" in out and "failed" not in out
    assert "4.80s ->    7.50s" in out


def test_rotation_status_manifest_is_consistent():
    st = rotation.status(entrymod)
    names = list(entrymod.queries())
    assert st["declared"] == len(names)
    assert (
        st["oracle_declared"] + st["rows_only_declared"] == st["declared"]
    )
    assert st["driver_green"] + st["never_checked"] == st["declared"]
    assert len(st["never_checked_names"]) == st["never_checked"]
    # window = never-checked head; padded oldest-green-first once the
    # backlog no longer fills it (r8 verdict #5)
    k = min(st["never_checked"], rotation.WINDOW)
    assert st["next_window"][:k] == st["never_checked_names"][:k]
    assert len(st["next_window"]) == min(rotation.WINDOW, st["declared"])
    assert (
        sum(st["never_checked_by_family"].values()) == st["never_checked"]
    )
    # the manifest's window must BE the driver's derived window —
    # which is the head of registration order while the backlog still
    # fills it (the _PROMOTED hoist and rotation.status read the same
    # CORRECTNESS artifacts with the same rule, so they stay coupled);
    # once the backlog drops below WINDOW the _PROMOTED head pads with
    # already-green names, so only the never-checked PREFIX must match
    # (r8 review: the unconditional form would break on no code
    # change the round the backlog drains)
    if st["never_checked"] >= rotation.WINDOW:
        assert st["next_window"] == names[: len(st["next_window"])]
    else:
        assert st["next_window"] == names[: len(st["next_window"])] or (
            names[: st["never_checked"]] == st["next_window"]
        )
    # every name is a declared query, in registration order
    pos = {n: i for i, n in enumerate(names)}
    order = [pos[n] for n in st["never_checked_names"]]
    assert order == sorted(order)


def test_bench_diff_comparable_pct():
    """The number bench.py stamps into the artifact at close (r8
    verdict #6): signed percent on common entries, min-of-k only when
    both rounds measured it, None when nothing is comparable."""
    old = _rec({"a": 1.0, "b": 5.0, "gone": 2.0}, {"b": 4.0})
    new = _rec({"a": 2.0, "b": 9.0, "fresh": 3.0}, {"b": 6.0})
    # comparable: a first-run 1.0→2.0, b min-of-k 4.0→6.0 → 5.0→8.0
    assert bd.comparable_pct(old, new) == 60.0
    assert bd.comparable_pct(_rec({"x": 1.0}), _rec({"y": 1.0})) is None
    # failed entries (-1) never count as comparable
    assert (
        bd.comparable_pct(_rec({"a": -1.0}), _rec({"a": 5.0})) is None
    )


def test_rotation_padding_is_oldest_green_first():
    """Once the backlog no longer fills the window, padding re-proves
    the OLDEST green rows first (ties by registration order) — pinned
    on a synthetic green map so the policy can't silently regress
    before the real backlog drains."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    green = {
        "q2": "CORRECTNESS_r05.json",
        "q4": "CORRECTNESS_r03.json",
        "q5": "CORRECTNESS_r03.json",
    }
    # backlog q1,q3 fills first; then r03 greens (q4,q5 in
    # registration order), then the r05 green
    assert rotation.next_window(names, green, window=5) == [
        "q1", "q3", "q4", "q5", "q2",
    ]
    # window smaller than backlog: plain never-checked head
    assert rotation.next_window(names, green, window=2) == ["q1", "q3"]


def test_driver_green_tracks_latest_row(tmp_path, monkeypatch):
    """A name green in TWO rounds keys on the LATEST row (r9 advice):
    re-verification must advance the padding sort key, or the
    oldest-green-first rotation re-selects the same names forever
    once the backlog drains.  A later FAILED row must NOT erase an
    earlier green."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "qa": {"rows_match": True, "schema_match": True, "hash_match": True},
        "qb": {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "qa": {"rows_match": True, "schema_match": True, "hash_match": True},
        "qb": {"rows_match": False, "schema_match": True, "hash_match": False},
    }))
    monkeypatch.setattr(rotation, "REPO", str(tmp_path))
    green = rotation.driver_green()
    assert green["qa"] == "CORRECTNESS_r02.json"  # latest green wins
    assert green["qb"] == "CORRECTNESS_r01.json"  # failure doesn't erase
    # and the padding order now re-proves qb (stalest proof) before qa
    assert rotation.next_window(["qa", "qb"], green, window=2) == ["qb", "qa"]


def test_rotation_status_cli_writes_artifact(tmp_path):
    out = tmp_path / "ROTATION_test.json"
    res = subprocess.run(
        [sys.executable, "tools/rotation.py", "--status", str(out)],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    on_disk = json.loads(out.read_text())
    assert on_disk == json.loads(res.stdout)
