"""Offline state-store inspection (streaming/stateinspect.py): the
checkpoint written by the stateful totals query must be readable as
DataFrames and must contain exactly the state the operator claims to
have persisted."""

from __future__ import annotations


def _run_totals_to_checkpoint(spark, land: str, ckpt: str) -> None:
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.stateful import (
        running_totals_stream,
    )

    q = (
        running_totals_stream(spark, land)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        # the batch must be fully consumed or state stores never
        # commit (Spark validates commit counts per partition)
        .foreachBatch(lambda df, _id: df.count())
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_state_snapshot_equals_batch_aggregate(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.stateinspect import (
        state_metadata,
        state_skew_report,
        totals_state_snapshot,
    )

    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("click", 1.0, 0),
        ("click", 2.5, 0),
        ("view", 10.0, 0),
        ("signup", 7.0, 0),
        ("view", 0.5, 0),
    ]
    spark.createDataFrame(
        rows, "event_type STRING, value DOUBLE, ts LONG"
    ).coalesce(1).write.mode("append").parquet(land)
    _run_totals_to_checkpoint(spark, land, ckpt)

    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert meta[0]["operatorName"] == "applyInPandasWithState"

    snap = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in totals_state_snapshot(spark, ckpt).collect()
    }
    expected: dict[str, tuple[int, float]] = {}
    for et, v, _ in rows:
        n, s = expected.get(et, (0, 0.0))
        expected[et] = (n + 1, round(s + v, 6))
    assert snap == expected

    skew = state_skew_report(spark, ckpt).collect()
    assert sum(r["n_keys"] for r in skew) == len(expected)
