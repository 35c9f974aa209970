"""Streaming extension: the streamed windowed agg must equal its
batch twin on the same files (one logical declaration, two runners)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR


def test_events_windowed_oracle(spark, duck):
    df = entrymod.queries()["events_windowed"](spark, SF_DIR)
    res = duck.execute(entrymod.oracle_sql()["events_windowed"])
    errs = compare(
        "events_windowed", df, res.fetchall(), [d[0] for d in res.description]
    )
    assert not errs, errs


def test_stream_equals_batch(spark, tmp_path):
    import os

    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        windowed_batch,
        windowed_stream,
    )

    # stage a landing-zone directory (the file stream source's contract)
    land = tmp_path / "events_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")

    batch = {
        (r["window_start_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_batch(spark, SF_DIR).collect()
    }
    q = (
        windowed_stream(spark, str(land))
        .writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["window_start_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM win_test").collect()
        }
    finally:
        q.stop()
    assert streamed == batch
