"""kNN LOO / path-mining / fertility semantics on crafted data
(operators/similarity.py late, streaming/windowed.py late,
operators/textstats.py late)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.similarity import (
    q_knn_loo_accuracy,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
    q_fertility_by_lang,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    PATH_GAP_SEC,
    q_events_top_paths,
)

DIM = 64


def test_knn_loo_perfect_on_separated_clusters(spark, tmp_path):
    rng = np.random.default_rng(5)
    d = tmp_path / "emb"
    d.mkdir()
    vecs, labels = [], []
    for i in range(20):
        v = rng.normal(0, 0.05, DIM)
        v[0] += 5.0 if i % 2 == 0 else -5.0
        vecs.append(v.astype(np.float32).tolist())
        labels.append(i % 2)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    out = {r["label"]: r for r in q_knn_loo_accuracy(spark, str(d)).collect()}
    # query sample = vec_id % 5 == 0 → ids 0,5,10,15 → two per label
    assert out[0]["n_queries"] == 2 and out[1]["n_queries"] == 2
    assert out[0]["accuracy"] == 1.0 and out[1]["accuracy"] == 1.0


def _write_events(tmp_path, rows):
    d = tmp_path / "ev"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_top_paths_respects_session_gap(spark, tmp_path):
    rows = [
        (1, 0, 1, "view"),
        (2, 10, 1, "click"),
        (3, 20, 1, "purchase"),
        # second trigram broken by a gap: purchase → (gap) → view
        (4, 20 + PATH_GAP_SEC + 1, 1, "view"),
        (5, 20 + PATH_GAP_SEC + 2, 1, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["path"]: r["n"] for r in q_events_top_paths(spark, sf).collect()}
    assert out == {"view>click>purchase": 1}


def test_fertility_counts(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["ab cd"]),
                "lang": pa.array(["en"]),
                "source": pa.array(["s0"]),
                "n_chars": pa.array([5], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    row = q_fertility_by_lang(spark, str(d)).collect()[0]
    assert row["n_tokens"] == 2
    assert row["tokens_per_word"] == 1.0
    assert row["chars_per_token"] == 2.5
