"""Winnowing fingerprint property: any two documents sharing a long
enough substring are GUARANTEED to share a selected fingerprint —
the local-similarity guarantee windows+min provide (and simple random
sampling would not)."""

from __future__ import annotations

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_W,
    q_winnow_fingerprints,
)


def test_shared_substring_shares_fingerprint(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"unique prefix one {shared} tail a"),
        (2, f"completely different opening words {shared} other ending"),
        (3, "no overlap with those documents at all whatsoever here"),
    ]
    d = tmp_path / "w"
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))

    fps: dict[int, set[int]] = {}
    for r in q_winnow_fingerprints(spark, str(d)).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])

    # shared run of 10 tokens ≫ guarantee threshold (W + K - 1 = 6)
    assert fps[1] & fps[2], (fps[1], fps[2])
    assert not (fps[1] & fps[3])
