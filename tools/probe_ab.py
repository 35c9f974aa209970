"""Warm min-of-k probe for named queries — the r12 A/B harness.

Usage: python tools/probe_ab.py [sf_dir] name [name ...]

Runs each query once (cold, warms the family memos in declaration
order), then k=3 more times recording the minimum — the steady-state,
load-insensitive signal BENCH_NOTES argues for.  Prints one JSON line
{"cold": {...}, "warm_min": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 3


def main() -> int:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.session import (
        get_spark,
    )

    spark = get_spark("probe_ab")
    spark.range(1000).count()
    qs = entrymod.queries()

    def force(name):
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    cold, warm = {}, {}
    for name in names:
        t0 = time.perf_counter()
        force(name)
        cold[name] = round(time.perf_counter() - t0, 3)
    for name in names:
        best = None
        for _ in range(K):
            t0 = time.perf_counter()
            force(name)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        warm[name] = round(best, 3)
        print(f"  {name}: cold {cold[name]:.2f}s warm_min {best:.2f}s",
              file=sys.stderr)
    print(json.dumps({"cold": cold, "warm_min": warm}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
