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
