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


def test_bench_diff_prefers_min_of_k():
    old = _rec({"q1": 10.0}, {"q1": 4.0})
    assert bd._best(old, "q1") == 4.0
    assert bd._best(_rec({"q1": 10.0}), "q1") == 10.0


def test_bench_diff_reports_added_removed_and_deltas(tmp_path, capsys):
    old = _rec({"a": 1.0, "b": 5.0, "gone": 2.0, "failed": -1.0})
    new = _rec({"a": 1.0, "b": 9.0, "fresh": 3.0}, {"b": 7.5})
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    assert bd.main(["bench_diff.py", str(po), str(pn)]) == 0
    out = capsys.readouterr().out
    # failed (-1) entries are excluded; added/removed named; the b
    # regression reported on the min-of-k value (7.5, not 9.0)
    assert "fresh" in out and "gone" in out and "failed" not in out
    assert "5.00s ->    7.50s" in out


def test_rotation_status_manifest_is_consistent():
    st = rotation.status(entrymod)
    names = list(entrymod.queries())
    assert st["declared"] == len(names)
    assert (
        st["oracle_declared"] + st["rows_only_declared"] == st["declared"]
    )
    assert st["driver_green"] + st["never_checked"] == st["declared"]
    assert len(st["never_checked_names"]) == st["never_checked"]
    assert st["next_window"] == st["never_checked_names"][:rotation.WINDOW]
    assert (
        sum(st["never_checked_by_family"].values()) == st["never_checked"]
    )
    # the manifest's window must BE the driver's derived window
    assert st["next_window"] == names[: len(st["next_window"])]
    # every name is a declared query, in registration order
    pos = {n: i for i, n in enumerate(names)}
    order = [pos[n] for n in st["never_checked_names"]]
    assert order == sorted(order)


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
