"""Streaming NB scoring: stream predictions must equal the batch
predictions for every doc the stream emits, under the bounded-state
contract (foreachBatch, append-only, no cross-batch state)."""

from __future__ import annotations

import os

from conftest import SF_DIR


def test_stream_scoring_matches_batch(spark, tmp_path):
    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.scoring import (
        start_score_stream,
    )

    land = tmp_path / "docs_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/documents.parquet", land / "documents.parquet")

    batch = {
        r["doc_id"]: r["prediction"]
        for r in entrymod.queries()["nb_predictions"](spark, SF_DIR).collect()
    }

    streamed: dict[int, int] = {}
    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(batch_id)
        for r in df.collect():
            assert r["doc_id"] not in streamed, "doc scored twice (append!)"
            streamed[r["doc_id"]] = r["prediction"]

    q = start_score_stream(spark, str(land), SF_DIR, sink)
    try:
        q.processAllAvailable()
        # bounded-state contract: the query holds NO stateful operators
        progress = q.lastProgress
        assert not progress or not progress.get("stateOperators"), progress
    finally:
        q.stop()

    assert streamed, "stream produced no predictions"
    assert batches, "foreachBatch never fired"
    # the stream scores ALL docs (train+test residues) with >=1 known
    # token; batch predictions cover the test split — every overlap
    # must agree exactly
    overlap = set(streamed) & set(batch)
    assert overlap, "no overlap between stream and batch predictions"
    for doc_id in overlap:
        assert streamed[doc_id] == batch[doc_id], doc_id
