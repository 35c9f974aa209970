"""Rotation planner: which declared queries have never had a
driver-green CORRECTNESS row?

The driver's correctness pass checks only the FIRST 50 ``queries()``
entries per round, so each round hoists never-checked queries into
that window (see the policy comment in ``__spark_entry__.py``).  This
tool derives the promotion list mechanically instead of by hand:

    python tools/rotation.py            # summary + next-window plan
    python tools/rotation.py --all      # every never-checked name

A name counts as "driver-green" if ANY CORRECTNESS_r*.json row for it
has rows_match (and hash_match when an oracle was declared).  Names
are emitted in REGISTRATION order (oldest modules first), which is
the promotion order the policy prescribes.

Padding policy (r8 verdict #5): once the never-checked backlog drops
below the 50-slot window, remaining slots are filled with
already-green names OLDEST FIRST GREEN ROW first (ties break by
registration order) — a standing re-verification rotation that
re-proves the stalest evidence against the moving Spark/DuckDB stack
before re-proving anything fresh.  ``__spark_entry__._derive_promoted``
implements the identical rule; ``tests/test_registration.py`` pins
the two derivations together.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def driver_green(rows_only: frozenset[str] = frozenset()) -> dict[str, str]:
    """name → round-file of its LATEST green row.

    Latest, not first (r9 advice): the padding sort key is this
    round-file, so a re-verified query's key must ADVANCE or the
    standing rotation would deterministically re-select the same ~50
    stalest names forever once the backlog drains — staleness means
    "latest proof", not "first proof".

    A rows-only name (no oracle BY DESIGN — see ``rows_only()`` in
    ``__spark_entry__``) can never earn ``rows_match``: the driver
    records ``err: no_oracle`` with just ``spark_rows``.  That
    recorded run IS its strongest possible driver row, so it counts
    as checked — otherwise every rows-only query would be re-promoted
    forever, wasting ~10 window slots a round on queries whose check
    cannot get stronger."""
    green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if name in rows_only:
                ok = row.get("spark_rows") is not None
            else:
                ok = row.get("rows_match") and row.get("schema_match", True)
                if "hash_match" in row and row["hash_match"] is not None:
                    ok = ok and row["hash_match"]
            if ok:
                green[name] = os.path.basename(path)
    return green


def next_window(names: list[str], green: dict[str, str],
                window: int = WINDOW,
                reverify: tuple[str, ...] = ()) -> list[str]:
    """Never-checked head (registration order), then the round's
    explicit REVERIFY tier (VERDICT r12 #8: queries whose plan was
    rewritten must get a post-change driver row before the standing
    staleness rotation hands them one by luck), padded oldest-green-
    first when the backlog still leaves slots — shared by status()
    and main(), pinned to ``__spark_entry__._derive_promoted`` by
    tests/test_registration.py."""
    never = [n for n in names if n not in green]
    head = never[:window]
    if len(head) < window:
        pos = {n: i for i, n in enumerate(names)}
        taken = set(head)
        head.extend(
            sorted(
                (
                    n
                    for n in reverify
                    if n in pos and n in green and n not in taken
                ),
                key=lambda n: pos[n],
            )
        )
        taken = set(head)
        head.extend(
            sorted(
                (n for n in names if n in green and n not in taken),
                key=lambda n: (green[n], pos[n]),
            )
        )
    return head[:window]


def status(entry) -> dict:
    """Machine-readable backlog manifest (r7 verdict item 7) — the
    judge-facing accounting that was previously re-derived by hand."""
    names = list(entry.queries())
    rows_only = entry.rows_only()
    green = driver_green(rows_only)
    never = [n for n in names if n not in green]
    fam_never: dict[str, int] = {}
    for n in never:
        fam = n.split("_", 1)[0]
        fam_never[fam] = fam_never.get(fam, 0) + 1
    return {
        "declared": len(names),
        "oracle_declared": len(names) - len(rows_only),
        "rows_only_declared": len(rows_only),
        "driver_green": len(names) - len(never),
        "never_checked": len(never),
        "windows_needed": (len(never) + WINDOW - 1) // WINDOW,
        "never_checked_by_family": dict(
            sorted(fam_never.items(), key=lambda kv: -kv[1])
        ),
        "next_window": next_window(
            names, green, reverify=getattr(entry, "_REVERIFY_FIRST", ())
        ),
        "never_checked_names": never,
        "green_rounds": {
            os.path.basename(f): sum(1 for r in green.values() if r == f)
            for f in sorted(set(green.values()))
        },
    }


def main() -> int:
    import __spark_entry__ as entry

    if "--status" in sys.argv:
        st = status(entry)
        out = json.dumps(st, indent=1)
        print(out)
        idx = sys.argv.index("--status")
        if idx + 1 < len(sys.argv) and not sys.argv[idx + 1].startswith("-"):
            with open(sys.argv[idx + 1], "w") as fh:
                fh.write(out + "\n")
        return 0

    names = list(entry.queries())
    green = driver_green(entry.rows_only())
    never = [n for n in names if n not in green]
    print(f"declared: {len(names)}  driver-green somewhere: "
          f"{len([n for n in names if n in green])}  never-checked: {len(never)}")
    rounds_needed = (len(never) + WINDOW - 1) // WINDOW
    print(f"windows needed at {WINDOW}/round: {rounds_needed}")
    print()
    show = (
        never
        if "--all" in sys.argv
        else next_window(
            names, green, reverify=getattr(entry, "_REVERIFY_FIRST", ())
        )
    )
    label = "all never-checked" if "--all" in sys.argv else f"next window ({len(show)})"
    print(f"{label}, in registration order:")
    for n in show:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
