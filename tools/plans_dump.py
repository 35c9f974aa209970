"""Generate PLANS.md — a physical-plan dossier for headline queries.

One formatted `EXPLAIN` per representative query family, captured from
the same entry points the driver runs, so a reviewer can check the
100 TB posture claims (predicate pushdown, column pruning, broadcast
vs shuffle joins, partitioned windows, Arrow stages) without starting
a session.  Re-run after planner-relevant changes:

    python tools/plans_dump.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (query name, what the plan is evidence of)
SHOWCASE: list[tuple[str, str]] = [
    (
        "rel_pricing_summary",
        "Scan-level predicate pushdown (`PushedFilters`), column pruning "
        "(`ReadSchema` carries only consumed columns), and two-phase "
        "partial→final HashAggregate around one exchange.",
    ),
    (
        "rel_top_supplier",
        "Decorrelated subquery shape: dimension sides broadcast, the "
        "fact side pre-aggregates before any join.",
    ),
    (
        "nb_confusion",
        "The flagship NB pipeline as ONE Catalyst DAG: regex cleaning "
        "chain inside whole-stage codegen, model applied via broadcast "
        "hash join, no Python in the hot path.",
    ),
    (
        "tfidf_scores",
        "The reference's 6-job TF-IDF chain re-keyed as one DAG: "
        "re-used hash partitioning across the word/doc joins.",
    ),
    (
        "dedup_prefix_jaccard_join",
        "Exact threshold join, r11 shape: ASYMMETRIC prefix postings "
        "(probe 2t/(1+t) vs index t) joined on an int64 okey, with "
        "length + positional + SUFFIX-BOUND filters INSIDE the join "
        "before the candidate-distinct (the suffix bound intersects "
        "capped per-doc prefix-okey arrays carried on the posting "
        "rows -- sf10 candidates 59.1M -> 1.78M), verify via "
        "array_intersect over per-doc sorted int64 sets -- no "
        "posting-expansion shuffle.",
    ),
    (
        "er_fuzzy_pairs",
        "Hierarchical blocking, r10: over-cap blocks refine by a "
        "prefix sub-key (broadcast size tables), banded-threshold "
        "levenshtein verify inside co-partitioned self-joins only.",
    ),
    (
        "dedup_minhash_pairs",
        "LSH banding as a single `stack()` unpivot + band-key equi-join "
        "with the hot-bucket cap applied BEFORE the join — no all-pairs "
        "anywhere.",
    ),
    (
        "sim_topk_brute",
        "O(N·Q) floor done right: the 8-query side broadcast, vector "
        "math in JVM higher-order functions, per-query top-k via "
        "partitioned window.",
    ),
    (
        "events_asof",
        "As-of join as a union + partitioned last-value window — "
        "single shuffle family, no range explosion.",
    ),
    (
        "events_windowed",
        "Tumbling-window aggregation: integer-epoch bucketing keeps the "
        "grouping inside codegen; partial agg before the exchange.",
    ),
    (
        "pipe_epoch_shuffle",
        "Distributed global ranking WITHOUT a global window: "
        "per-(epoch, bucket) row_number + broadcast prefix-sum offsets.",
    ),
    (
        "events_watermark_audit",
        "Sequential running max decomposed the same two-phase way — the "
        "only partition-less window runs on the bucket-max rollup "
        "(N/1024 rows), then broadcasts.",
    ),
    (
        "pipe_training_corpus",
        "Capstone gate composition: three doc_id-keyed LEFT SEMI joins "
        "over memoized gate outputs.",
    ),
    (
        "graph_link_prediction",
        "Wedge enumeration as equi-joins on the middle node; known "
        "edges removed by LEFT ANTI join; no cartesian products.",
    ),
    (
        "mm_decode_meta",
        "Multimodal decode confined to Arrow `MapInPandas` stages over "
        "a pruned scan — no row-at-a-time Python.",
    ),
    (
        "events_merge_upsert",
        "MERGE as one full-outer join of two max_by pre-aggregated "
        "sides — no window over raw events.",
    ),
    (
        "events_interval_overlap",
        "Interval×interval overlap join rewritten as bucket "
        "decomposition: covered-hour explode → shuffled EQUI-join on "
        "the bucket key with the exact-overlap residual — no "
        "BroadcastNestedLoopJoin on data-sized sides (the one 1-row "
        "nested-loop is the scalar surge threshold).",
    ),
    (
        "text_lang_overlap_theta",
        "Mergeable-sketch shape: one corpus scan feeding a partial→"
        "final `theta_sketch_agg`, then set algebra on the ~5-row "
        "sketch table — re-pairings never re-touch documents.",
    ),
    (
        "sim_topk_ivfpq",
        "IVFADC serving (r8): the probe table broadcasts into the "
        "assignments equi-join (only nprobe inverted lists scanned), "
        "ADC sums 4-bit code lookups against the broadcast distance "
        "table, and the exact refine touches pool-sized floats; the "
        "one shuffle join (assignments×codes on vec_id) is the pair "
        "a production layout co-buckets.",
    ),
    (
        "text_quality_ols",
        "Closed-form model training (r8): the entire fit is narrow "
        "maps + ONE partial→final HashAggregate producing 10 exact "
        "decimal moments; the Cramer solve runs on the 1-row result. "
        "No iteration, no Python, no feature-matrix materialization.",
    ),
    (
        "dedup_embedding_pairs",
        "Embedding near-dup candidates after the r9 hot-bucket cap: a "
        "broadcast LEFT ANTI join (≤1024-row hot list) excludes "
        "over-cap buckets BEFORE the bucket self-join, so a degenerate "
        "cluster cannot go quadratic; exact cosine verifies only "
        "candidates.",
    ),
    (
        "graph_bipartite_projection",
        "Bipartite projection onto the SMALL side (r9): one "
        "groupBy(user_id) collects type sets, sentinel rows let the "
        "pair rollup and the marginals groupBy the SAME key, so the "
        "marginal branches come back as ReusedExchange at runtime — "
        "one corpus scan, one wide shuffle.",
    ),
    (
        "sim_bucket_occupancy_audit",
        "LSH index-health telemetry (r9): two bounded aggregates "
        "(≤1024 bucket groups, then 4 table groups) — integer-exact "
        "pair bounds, nothing corpus-quadratic, no join.",
    ),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.session import get_spark

    spark = get_spark("plans_dump")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    queries = entrymod.queries()
    out = [
        "# PLANS — physical-plan dossier",
        "",
        "Generated by `python tools/plans_dump.py` at "
        f"`{sf_dir}`; formatted `EXPLAIN` for one representative query "
        "per family.  What to check: `PushedFilters`/`ReadSchema` on "
        "every scan, `BroadcastHashJoin` for dimension-sized sides, "
        "partition keys on every `Window`, `MapInPandas` only where "
        "Python is unavoidable, and no `CartesianProduct` on "
        "data-sized inputs.  (`AdaptiveSparkPlan` shown pre-execution; "
        "AQE may further coalesce partitions at runtime.)",
        "",
    ]
    for name, why in SHOWCASE:
        fn = queries.get(name)
        if fn is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}")
        out.append("")
        out.append(why)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
        print(f"dumped {name}", file=sys.stderr)
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
