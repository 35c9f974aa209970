"""Streaming NB scoring: stream predictions must equal the batch
predictions for every doc the stream emits."""

from __future__ import annotations

import os

from conftest import SF_DIR


def test_stream_scoring_matches_batch(spark, tmp_path):
    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.scoring import (
        score_stream,
    )

    land = tmp_path / "docs_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/documents.parquet", land / "documents.parquet")

    batch = {
        r["doc_id"]: r["prediction"]
        for r in entrymod.queries()["nb_predictions"](spark, SF_DIR).collect()
    }
    q = (
        score_stream(spark, str(land), SF_DIR)
        .writeStream.format("memory")
        .queryName("score_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["doc_id"]: r["prediction"]
            for r in spark.sql("SELECT * FROM score_test").collect()
        }
    finally:
        q.stop()

    assert streamed, "stream produced no predictions"
    # the stream scores ALL docs (train+test residues) with >=1 known
    # token; batch predictions cover the test split — every overlap
    # must agree exactly
    overlap = set(streamed) & set(batch)
    assert overlap, "no overlap between stream and batch predictions"
    for doc_id in overlap:
        assert streamed[doc_id] == batch[doc_id], doc_id
