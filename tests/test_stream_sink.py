"""Exactly-once sink (streaming/sink.py): replaying a batch must not
duplicate output, and a checkpointed restart must reprocess nothing."""

from __future__ import annotations

import os

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.enrich import (
    enrich_batch,
    enrich_stream,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.sink import (
    start_idempotent_parquet_sink,
    write_batch_idempotent,
)


def test_idempotent_sink_exactly_once(spark, tmp_path):
    land = tmp_path / "events_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    expected = enrich_batch(spark, SF_DIR).count()
    assert expected > 0

    q = start_idempotent_parquet_sink(
        enrich_stream(spark, str(land), SF_DIR), out, ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected

    # simulate the crash-replay: foreachBatch fires AGAIN for an
    # already-written batch_id — the overwrite must not duplicate
    replay = enrich_batch(spark, SF_DIR)
    write_batch_idempotent(replay, 0, out)
    assert spark.read.parquet(out).count() == expected

    # checkpointed restart with no new files: nothing reprocessed,
    # output unchanged
    q2 = start_idempotent_parquet_sink(
        enrich_stream(spark, str(land), SF_DIR), out, ckpt
    )
    q2.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == expected
    # the layout is a partitioned table: batch_id is a readable column
    assert "batch_id" in df.columns
