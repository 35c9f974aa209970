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


def test_outer_stream_join_flushes_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream: unmatched views must be withheld
    while a match is still possible and emitted exactly once after the
    watermark proves none can come — final output == the batch feed."""
    import datetime as dt

    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.joins import (
        ATTRIB_SEC,
        unconverted_batch,
        unconverted_stream,
    )

    land = tmp_path / "events_land_outer"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")

    batch = {
        (r["user_id"], r["view_id"], r["view_sec"])
        for r in unconverted_batch(spark, SF_DIR).collect()
    }
    assert batch, "premise: some views are unconverted"

    q = (
        unconverted_stream(spark, str(land))
        .writeStream.format("memory")
        .queryName("unconv_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # after the first file the watermark sits at max_ts - delay:
        # views already past expiry flush (the no-data micro-batch
        # evicts them), but views near the end of the window CANNOT
        # have flushed yet — the early output must be a strict,
        # correct subset of the batch feed
        early = {
            (r["user_id"], r["view_id"], r["view_sec"])
            for r in spark.sql("SELECT * FROM unconv_test").collect()
        }
        assert early < batch

        # sentinel events far past every expiry: the GLOBAL watermark
        # is the min over both sides and each side's watermark node
        # sits after its event_type filter, so BOTH a view and a
        # purchase sentinel are needed to advance it past
        # max_ts + ATTRIB_SEC + delay and flush all null rows.  The
        # sentinels use distinct users so they match nothing; the
        # sentinel view's own expiry is beyond the final watermark,
        # so it never surfaces.
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        import pyspark.sql.functions as F

        max_ts = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
        sentinel_ts = max_ts + dt.timedelta(seconds=ATTRIB_SEC + 3 * 3600 + 60)
        spark.createDataFrame(
            [
                (10**9, sentinel_ts, -999, "view", 0.0, "{}"),
                (10**9 + 1, sentinel_ts, -998, "purchase", 0.0, "{}"),
            ],
            ev.schema,
        ).coalesce(1).write.mode("append").parquet(str(land))

        import time

        deadline = time.time() + 90
        streamed: set = set()
        while time.time() < deadline:
            q.processAllAvailable()
            streamed = {
                (r["user_id"], r["view_id"], r["view_sec"])
                for r in spark.sql("SELECT * FROM unconv_test").collect()
            }
            if streamed >= batch:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    assert streamed == batch


def test_outer_stream_join_is_watermarked_both_sides(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.joins import (
        unconverted_stream,
    )

    land = tmp_path / "events_land_outer_wm"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")
    plan = (
        unconverted_stream(spark, str(land))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert plan.count("EventTimeWatermark") == 2, plan
    assert "LeftOuter" in plan
