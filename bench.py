"""Benchmark driver — times the engine's headline queries.

Runs every ``queries()`` entry from ``__spark_entry__`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output contract (r3 verdict item 3: BENCH_r03 was ``parsed: null``
because the 74-query JSON line outgrew the driver's tail capture):

- stdout, second-to-last line: the FULL record
  ``{"metric": "total_wall_sec", "value": N, "unit": "sec",
  "queries": {...}, "failed": 0, "sf": 0.1}``
- stdout, LAST line: a compact summary WITHOUT the per-query map —
  small enough that any tail capture parses it —
  ``{"metric": "total_wall_sec", "value": N, "unit": "sec",
  "failed": 0, "sf": 0.1, "queries_file": "bench_queries.json"}``
- ``bench_queries.json`` next to this script: the per-query map.

Each query is forced end-to-end with the ``noop`` write format —
full computation, no driver-side collect of the result set (row
counts would hide sink cost; collect would bottleneck on the
driver).  Progress goes to stderr so the stdout JSON stays clean.

Between module families the memoized ``.cache()`` DataFrames are
evicted via ``common.clear_caches()`` (r3 verdict item 2/6): a
74-query run otherwise accumulates every family's cached artifacts
(cleaned docs, shingles, banded signatures, embeddings+norms, IVF
assignments, fitted-model predictions) in executor storage, which
squeezed LinearSVC's treeAggregate rounds and regressed
``ml_modified_svm_metrics`` 3.8× in r3.  The family's shared prefix
(e.g. cleaned docs) is recomputed once per family — that cost is
billed to the family's first query, same as r1 behavior.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _force(df) -> None:
    """Run the full plan without materializing rows on the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import common
    from text_sentiment_analysis_in_hadoop_and_spark_spark.session import get_spark

    spark = get_spark("tsa_bench")
    # warm up the JVM paths every query shares so they aren't billed to
    # whichever query happens to run first: codegen (range), the
    # parquet reader stack (1-row scan), the noop sink, and the
    # HashAggregate/Exchange/BroadcastHashJoin operator pipeline that
    # nearly every query compiles (measured ~1.5-2s of first-plan
    # codegen + AQE spin-up on a cold JVM, previously billed to the
    # first family's lead query)
    from pyspark.sql import functions as F

    spark.range(1000).count()
    li1k = spark.read.parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    ).limit(1000)
    _force(li1k.limit(1))
    agg = li1k.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    _force(agg.join(F.broadcast(agg.select("l_returnflag")), "l_returnflag"))

    # eviction groups: caches clear between groups, not inside one.
    # dedup + similarity + pipeline_late share artifacts (the
    # multimodal keep-list composes the text-side jaccard/CC caches
    # with the embedding clusters, and the pretraining capstone
    # composes the keep-list + contamination + mixture), so they bill
    # as one group — splitting them forces the whole shingle→
    # signature→jaccard→CC chain to recompute (measured 7.8s for
    # dedup_corpus_keep_mm and 7.0s for pipe_training_corpus vs ~2s
    # warm at sf0.1)
    mods = {m.__name__.rsplit(".", 1)[-1]: m for m in entrymod._MODULE_ORDER}
    shared = [
        mods[n] for n in ("similarity", "pipeline_late") if n in mods
    ]
    shared_names = {m.__name__.rsplit(".", 1)[-1] for m in shared}
    groups = []
    for m in entrymod._MODULE_ORDER:
        name = m.__name__.rsplit(".", 1)[-1]
        if name in shared_names:
            continue  # appended to the dedup group below
        groups.append([m, *shared] if name == "dedup" else [m])

    timings: dict[str, float] = {}
    for group in groups:
        for mod in group:
            family = mod.__name__.rsplit(".", 1)[-1]
            print(f"-- family {family}", file=sys.stderr)
            for name, fn in mod.QUERIES.items():
                t0 = time.perf_counter()
                try:
                    _force(fn(spark, sf_dir))
                    dt = time.perf_counter() - t0
                    timings[name] = round(dt, 3)
                    print(f"  {name}: {dt:.2f}s", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    print(f"  {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
                    timings[name] = -1.0
        # retire this group's cached artifacts before the next group
        common.clear_caches()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    failed = sum(1 for t in timings.values() if t < 0)
    # failures are surfaced in the JSON ("failed" count + the -1.0
    # sentinel per query) rather than a nonzero exit, so the harness
    # still parses the line; CI should assert failed == 0 (ADVICE r2)
    record = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "sf": sf,
    }
    queries_file = os.path.join(REPO, "bench_queries.json")
    with open(queries_file, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    summary = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "failed": failed,
        "sf": sf,
        "queries_file": "bench_queries.json",
    }
    sys.stderr.flush()
    print(json.dumps(record), flush=True)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
