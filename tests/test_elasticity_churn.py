"""Churn-by-cohort / OOV semantics on crafted data
(streaming/windowed.py, operators/textstats.py late queries)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
    q_oov_rate,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    CHURN_IDLE_DAYS,
    DAY_SEC,
    q_events_churn_by_cohort,
)


def test_churn_flags_idle_users_only(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    horizon = 30 * DAY_SEC
    rows = [
        # u1: active at the horizon → retained
        (0, 0, 1, "view"),
        (1, horizon, 1, "view"),
        # u2: last seen 10 days before horizon → churned
        (2, 0, 2, "view"),
        (3, horizon - 10 * DAY_SEC, 2, "view"),
        # u3: last seen exactly at the fence → NOT churned (strict <)
        (4, 0, 3, "view"),
        (5, horizon - CHURN_IDLE_DAYS * DAY_SEC, 3, "view"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{d}/events.parquet",
    )
    out = q_events_churn_by_cohort(spark, str(d)).collect()[0]
    assert out["n_users"] == 3
    assert out["n_churned"] == 1
    assert abs(out["churn_rate"] - 1 / 3) < 1e-5


def test_oov_rate_counts_unknown_test_tokens(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    # doc 2 (train: 2 % 8 >= 2) vocab = {seen, words}
    # doc 0 (test) = "seen novel" → 1 of 2 tokens OOV
    rows = [
        (2, "seen words", "en"),
        (0, "seen novel", "en"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array(["s0"] * len(rows)),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    out = q_oov_rate(spark, str(d)).collect()[0]
    assert out["n_test_tokens"] == 2
    assert out["n_oov"] == 1
    assert abs(out["oov_rate"] - 0.5) < 1e-9
