"""As-of join semantics on a hand-built timeline: latest
at-or-before match per key, inclusive at equal timestamps, unmatched
left rows dropped."""

from __future__ import annotations

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
    asof_join_events,
)

US = 1000  # ns per µs


def test_asof_matches_latest_prior_view(spark):
    rows = [
        # (event_id, ts_ns, user_id, event_type)
        (1, 100 * US, 7, "view"),
        (2, 200 * US, 7, "view"),
        (3, 250 * US, 7, "purchase"),   # → view@200
        (4, 300 * US, 7, "view"),
        (5, 300 * US, 7, "purchase"),   # equal ts → inclusive, view@300
        (6, 50 * US, 9, "purchase"),    # no prior view → dropped
        (7, 80 * US, 9, "view"),
        (8, 90 * US, 9, "purchase"),    # → view@80
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING"
    )
    out = {
        r["event_id"]: (r["left_ts_us"], r["right_ts_us"])
        for r in asof_join_events(ev).collect()
    }
    assert out == {
        3: (250, 200),
        5: (300, 300),
        8: (90, 80),
    }


def test_range_join_finds_all_in_window(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
        RANGE_US,
        range_join_events,
    )

    H = RANGE_US * 1000  # window width in ns
    rows = [
        (1, 0, 7, "view"),
        (2, H // 2, 7, "view"),          # in window of 4
        (3, H, 7, "view"),               # boundary: exactly l_ts - 1h
        (4, 2 * H, 7, "purchase"),       # window [H, 2H] → views 3 only? 2 is at H/2 < H → out
        (5, 2 * H, 9, "purchase"),       # other user: no views
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING"
    )
    pairs = {
        (r["left_id"], r["right_id"], r["delta_us"])
        for r in range_join_events(ev).collect()
    }
    assert pairs == {(4, 3, RANGE_US)}  # inclusive lower boundary


def test_asof_is_single_shuffle(spark):
    """The as-of composition must cost exactly ONE exchange (the
    user_id hash partition feeding the running window) — the whole
    point of the union+window rewrite over a per-row probe."""
    import __spark_entry__ as entrymod
    from conftest import SF_DIR

    plan = (
        entrymod.queries()["events_asof"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "user_id" in [l for l in plan.splitlines() if "Exchange" in l][0]


def test_range_join_is_equi_not_nested_loop(spark):
    """The bucketed rewrite must plan as a hash/sort-merge EQUI-join —
    never a nested-loop or cartesian product."""
    import __spark_entry__ as entrymod
    from conftest import SF_DIR

    plan = (
        entrymod.queries()["events_range_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_nearest_picks_closer_side_tie_earlier(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
        asof_nearest_events,
    )

    rows = [
        (1, 100 * US, 7, "view"),
        (2, 130 * US, 7, "purchase"),   # prev@100 (d=30) vs next@140 (d=10) → 140
        (3, 140 * US, 7, "view"),
        (4, 120 * US, 8, "view"),
        (5, 130 * US, 8, "purchase"),   # prev@120 vs next@140 equidistant → earlier 120
        (6, 140 * US, 8, "view"),
        (7, 50 * US, 9, "purchase"),    # only a later view → forward match
        (8, 90 * US, 9, "view"),
        (9, 10 * US, 10, "purchase"),   # no views at all → dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING"
    )
    out = {
        r["event_id"]: (r["right_ts_us"], r["delta_us"])
        for r in asof_nearest_events(ev).collect()
    }
    assert out == {
        2: (140, -10),
        5: (120, 10),
        7: (90, -40),
    }


def test_asof_nearest_is_single_shuffle(spark):
    import __spark_entry__ as entrymod
    from conftest import SF_DIR

    df = entrymod.queries()["events_asof_nearest"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- events_variant_extract (r5) -------------------------------------

def test_variant_and_schemad_extraction_agree(spark):
    """The schema-less variant path and the declared-struct path must
    produce the identical rollup — drift between them means one side
    is misparsing the payload."""
    from conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
        q_events_json_extract,
        q_events_variant_extract,
    )

    a = q_events_json_extract(spark, SF_DIR)
    b = q_events_variant_extract(spark, SF_DIR)
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_variant_path_handles_missing_keys_as_null(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"other": 1}',), ('{"k": 3}',), ("not json",)], "props string"
    )
    out = df.select(
        F.variant_get(
            F.try_parse_json(F.col("props")), "$.k", "int"
        ).alias("k")
    ).collect()
    assert [r["k"] for r in out] == [None, 3, None]


def test_cogroup_asof_twin_matches_jvm_plan(spark):
    """The pandas merge_asof cogroup and the JVM window composition
    must produce the identical match set; the cogroup plan must be a
    FlatMapCoGroupsInPandas over one exchange per side."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
        q_events_asof,
        q_events_asof_cogroup,
    )

    from conftest import SF_DIR

    jvm = {tuple(r) for r in q_events_asof(spark, SF_DIR).collect()}
    cg_df = q_events_asof_cogroup(spark, SF_DIR)
    cg = {tuple(r) for r in cg_df.collect()}
    assert cg == jvm and jvm

    plan = cg_df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_pit_features_never_leak_label_time_information(spark):
    """Point-in-time correctness: every feature must be recomputable
    from events STRICTLY BEFORE the label's epoch second (ties at the
    label second excluded), within the 7-day window."""
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.asof import (
        PIT_WINDOW_SEC,
        q_pit_features,
    )

    rows = q_pit_features(spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    from pyspark.sql import functions as F  # noqa: F401

    import collections, datetime

    def es(e):
        return int(e["ts"].replace(tzinfo=datetime.timezone.utc).timestamp())

    by_user = collections.defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    checked = 0
    for r in rows[:200]:
        prior = [
            e
            for e in by_user[r["user_id"]]
            if r["label_epoch"] - PIT_WINDOW_SEC <= es(e) <= r["label_epoch"] - 1
        ]
        assert r["f_events_7d"] == len(prior)
        assert r["f_clicks_7d"] == sum(
            1 for e in prior if e["event_type"] == "click"
        )
        want_spend = sum(
            round(e["value"] * 100)
            for e in prior
            if e["event_type"] == "purchase"
        )
        assert abs(r["f_spend_7d"] - round(want_spend / 100.0, 6)) <= 1e-9
        if prior:
            assert r["recency_sec"] == r["label_epoch"] - max(es(e) for e in prior)
            assert r["recency_sec"] >= 1  # strictly before: never 0
        else:
            assert r["recency_sec"] == -1
        checked += 1
    assert checked >= 50
