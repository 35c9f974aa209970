"""Streaming exact dedup: first-seen docs survive, duplicates within
the watermark horizon are dropped, state stays bounded."""

from __future__ import annotations


def test_stream_dedup_keeps_first_per_fingerprint(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.dedup import (
        dedup_stream,
    )

    land = tmp_path / "land"
    rows = [
        (1, "the quick brown fox"),
        (2, "a completely different document"),
        (3, "the quick brown fox"),      # dup of 1
        (4, "yet another unique text"),
        (5, "a completely different document"),  # dup of 2
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(land))

    q = (
        dedup_stream(spark, str(land))
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_test").collect()
        progress = q.lastProgress
    finally:
        q.stop()

    # one survivor per distinct text; all in one micro-batch, so the
    # first-seen row (lowest doc_id in file order) wins per fingerprint
    by_fp = {}
    for r in out:
        assert r["fingerprint"] not in by_fp, "duplicate emitted"
        by_fp[r["fingerprint"]] = r["doc_id"]
    assert len(by_fp) == 3
    assert set(by_fp.values()) <= {1, 2, 3, 4, 5}
    # dedup operator carries state, but bounded: one entry per distinct
    # fingerprint in the watermark horizon (3 here), not per input row
    ops = (progress or {}).get("stateOperators") or []
    assert ops and ops[0]["numRowsTotal"] <= 3, progress
