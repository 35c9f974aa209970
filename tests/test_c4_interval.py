"""Pins for the C4 filter battery (quality.c4_flags) and the
interval-overlap join's bucket-decomposition rewrite
(asof.q_events_interval_overlap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import asof, quality
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.sessions import sessions_batch
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events

from conftest import SF_DIR

_FIXTURE = [
    # (doc_id, text, expected flag name that fires, expected keep)
    (1, "a clean well formed sentence ends properly.", None, 1),
    (2, "function f() { return 1; }", "has_brace", 0),
    (3, "Lorem Ipsum dolor sit amet filler text here.", "has_lorem", 0),
    (4, "please enable JavaScript to view this site.", "has_js", 0),
    (5, "too short.", "too_short", 0),
    (6, "this sentence never terminates with punctuation", "no_terminal_punct", 0),
    (7, 'he said "stop right there!" and then "fine."', None, 1),
]


def test_c4_flags_fixture(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _, _ in _FIXTURE], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in quality.c4_flags(docs).collect()
    }
    rule_cols = [
        "has_brace",
        "has_lorem",
        "has_js",
        "too_short",
        "no_terminal_punct",
    ]
    for doc_id, _, rule, keep in _FIXTURE:
        r = out[doc_id]
        assert r["keep"] == keep, r
        if rule is not None:
            assert r[rule] == 1, r
        fired = [c for c in rule_cols if r[c] == 1]
        if keep:
            assert fired == []


def test_c4_keep_is_conjunction(spark):
    out = quality.q_c4_filters(spark, SF_DIR)
    bad = out.filter(
        (
            F.col("keep")
            == F.greatest(
                "has_brace",
                "has_lorem",
                "has_js",
                "too_short",
                "no_terminal_punct",
            )
        )
    ).count()
    assert bad == 0  # keep == 1 iff every flag is 0


def test_interval_overlap_matches_naive_theta_join(spark):
    """The bucket-decomposition rewrite must emit the IDENTICAL pair
    set as the naive inequality join (computed directly here, not via
    DuckDB) — including overlap seconds."""
    fast = {
        (r["user_id"], r["session_id"], r["hour_epoch"]): r["overlap_sec"]
        for r in asof.q_events_interval_overlap(spark, SF_DIR).collect()
    }
    sess = sessions_batch(spark, SF_DIR).collect()
    ev = load_events(spark, SF_DIR).select("epoch_sec").collect()
    from collections import Counter

    hours = Counter(
        (r["epoch_sec"] // 3600) * 3600 for r in ev
    )
    t = sum(hours.values())
    h = len(hours)
    busy = [hr for hr, n in hours.items() if 2 * n * h > 3 * t]
    assert busy, "threshold must select at least one busy hour"
    naive = {}
    for s in sess:
        for hr in busy:
            if s["start_epoch"] <= hr + 3599 and s["end_epoch"] >= hr:
                naive[(s["user_id"], s["session_id"], hr)] = min(
                    s["end_epoch"], hr + 3599
                ) - max(s["start_epoch"], hr) + 1
    assert fast == naive


def test_interval_overlap_plan_is_equi_join(spark):
    """The rewrite's point: no nested-loop / cartesian node anywhere —
    the overlap join must execute as shuffled/broadcast EQUI-joins."""
    import re

    plan = asof.q_events_interval_overlap(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the ONLY nested-loop node allowed is the 1-row scalar threshold
    # broadcast (the S5 counters-to-conf pattern); the session×busy
    # join itself must be a hash EQUI-join keyed on the bucket
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[bucket",
        plan,
    ), plan
