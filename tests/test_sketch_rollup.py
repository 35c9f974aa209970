"""Mergeable HLL sketch rollup (events_uniques_sketch_rollup):
estimates must track the exact counts and the union must actually
dedup across days."""

from __future__ import annotations

import pyspark.sql.functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    DAY_SEC,
    load_events,
    q_events_uniques_sketch_rollup,
)

from conftest import SF_DIR

REL_ERR = 0.05  # lgConfigK=14 → rsd ~0.8%; 5% is a safe determinism band


def test_sketch_estimates_track_exact_and_union_dedups(spark):
    rows = q_events_uniques_sketch_rollup(spark, SF_DIR).collect()
    est = {r["day_epoch"]: r["n_users_sketch"] for r in rows}
    assert -1 in est and len(est) > 1

    ev = load_events(spark, SF_DIR)
    day = (
        (F.expr(f"epoch_sec DIV {DAY_SEC}") * DAY_SEC)
        .cast("long")
        .alias("day_epoch")
    )
    exact = {
        r["day_epoch"]: r["n"]
        for r in ev.groupBy(day)
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact[-1] = ev.select("user_id").distinct().count()

    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, REL_ERR * e), (k, est[k], e)

    # the merged total must dedup users active on multiple days:
    # well below the sum of daily estimates whenever overlap exists
    daily_sum = sum(v for k, v in est.items() if k != -1)
    if exact[-1] < sum(v for k, v in exact.items() if k != -1):
        assert est[-1] < daily_sum
