"""Stream-stream interval join (streaming/joins.py): the watermarked
two-stream attribution join must equal its batch twin on the same
files, and the physical streaming plan must carry the state-bounding
watermarks on BOTH sides."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.joins import (
    attribution_batch,
    attribution_stream,
)


def test_attribution_oracle(spark, duck):
    df = entrymod.queries()["events_attribution"](spark, SF_DIR)
    res = duck.execute(entrymod.oracle_sql()["events_attribution"])
    errs = compare(
        "events_attribution",
        df,
        res.fetchall(),
        [d[0] for d in res.description],
    )
    assert not errs, errs


def test_stream_join_equals_batch(spark, tmp_path):
    land = tmp_path / "events_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")

    batch = {
        (r["user_id"], r["view_id"], r["purchase_id"], r["lag_sec"])
        for r in attribution_batch(spark, SF_DIR).collect()
    }
    assert batch, "premise: the attribution window matches some pairs"

    q = (
        attribution_stream(spark, str(land))
        .writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_id"], r["view_id"], r["purchase_id"], r["lag_sec"])
            for r in spark.sql("SELECT * FROM attrib_test").collect()
        }
    finally:
        q.stop()
    assert streamed == batch


def test_stream_join_is_watermarked_both_sides(spark, tmp_path):
    """State-boundedness regression: the analyzed streaming plan must
    contain an EventTimeWatermark on each input (drop either and the
    join state grows with the stream)."""
    land = tmp_path / "events_land_wm"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")
    plan = attribution_stream(spark, str(land))._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
