"""Streaming SCD2 builder: intervals must close across micro-batches
with the open interval carried in state, late arrivals dropped
(streaming/scd2.py)."""

from __future__ import annotations

import time


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts LONG, event_id LONG"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_batches(spark, land, writes):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.scd2 import (
        scd2_stream,
    )

    batches: list[list] = []
    _write(spark, land, writes[0])
    q = (
        scd2_stream(spark, land)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        for w in writes[1:]:
            seen = len([b for b in batches if b])
            _write(spark, land, w)
            deadline = time.time() + 60
            while (
                len([b for b in batches if b]) <= seen
                and time.time() < deadline
            ):
                q.processAllAvailable()
                time.sleep(0.2)
    finally:
        q.stop()
    return [r for b in batches for r in b]


def test_intervals_close_across_batches(spark, tmp_path):
    land = str(tmp_path / "land")
    rows = _run_batches(
        spark,
        land,
        [
            # batch 1: u1 view@10 then click@20 → closes (view,10,20)
            [(1, "view", 10, 100), (1, "click", 20, 101)],
            # batch 2: u1 buy@30 → closes (click,20,30): the open
            # interval from batch 1's state
            [(1, "buy", 30, 102)],
        ],
    )
    got = sorted((r["state"], r["valid_from"], r["valid_to"]) for r in rows)
    assert got == [("click", 20, 30), ("view", 10, 20)]


def test_late_arrival_never_reopens_history(spark, tmp_path):
    land = str(tmp_path / "land")
    rows = _run_batches(
        spark,
        land,
        [
            [(7, "view", 50, 200)],
            # ts 40 < open interval start 50 → dropped, no emission
            [(7, "stale", 40, 201)],
            [(7, "click", 60, 202)],
        ],
    )
    got = sorted((r["state"], r["valid_from"], r["valid_to"]) for r in rows)
    assert got == [("view", 50, 60)]


def test_within_batch_out_of_order_is_sorted(spark, tmp_path):
    land = str(tmp_path / "land")
    rows = _run_batches(
        spark,
        land,
        [[(3, "b", 20, 301), (3, "a", 10, 300), (3, "c", 30, 302)]],
    )
    got = sorted((r["state"], r["valid_from"], r["valid_to"]) for r in rows)
    assert got == [("a", 10, 20), ("b", 20, 30)]
