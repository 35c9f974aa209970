"""Custom stateful operator (applyInPandasWithState): running per-key
totals must ACCUMULATE across micro-batches — the property none of the
built-in-operator streaming tests prove."""

from __future__ import annotations

import time


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_type STRING, value DOUBLE, ts LONG"
    ).coalesce(1).write.mode("append").parquet(path)


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.stateful import (
        running_totals_stream,
    )

    land = str(tmp_path / "events_land")
    _write_events(
        spark,
        land,
        [("click", 1.0, 0), ("click", 2.0, 0), ("view", 10.0, 0)],
    )

    batches: list[list] = []
    q = (
        running_totals_stream(spark, land)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: batches.append(df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        # second file: the state from batch 1 must carry forward
        _write_events(
            spark, land, [("click", 4.0, 0), ("signup", 7.0, 0)]
        )
        # the file source needs to discover the new file
        deadline = time.time() + 60
        while len([b for b in batches if b]) < 2 and time.time() < deadline:
            q.processAllAvailable()
            time.sleep(0.2)
    finally:
        q.stop()

    emitted = [b for b in batches if b]
    assert len(emitted) >= 2, emitted
    first = {r["event_type"]: r for r in emitted[0]}
    assert first["click"]["n_events"] == 2
    assert first["click"]["sum_value"] == 3.0
    assert first["view"]["n_events"] == 1

    last = {r["event_type"]: r for r in emitted[-1]}
    # click totals include batch 1 AND batch 2 → state persisted
    assert last["click"]["n_events"] == 3
    assert last["click"]["sum_value"] == 7.0
    # signup first seen in batch 2
    assert last["signup"]["n_events"] == 1
    # view untouched in batch 2 → not re-emitted in update mode
    assert "view" not in last
