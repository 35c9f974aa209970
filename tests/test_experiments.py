"""CUPED / time-decay / SCD2 semantics on crafted events
(operators/experiments.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
    HALF_LIFE_SEC,
    q_events_cuped,
    q_events_scd2,
    q_events_time_decay,
)


def _write_events(tmp_path, rows, name="ev"):
    """rows: (event_id, epoch_sec, user_id, event_type, value)."""
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_cuped_theta_adjustment_exact(spark, tmp_path):
    # pre at s=0, post at s=1000 (cut = midpoint 500).  pre per user
    # (10, 30, 20, 40), post = 2*pre + 5*variant →
    # theta = cov/var = 275/125 = 2.2, mean_pre = 25.
    # adj v0: 20-2.2*(10-25)=53, 40-2.2*(20-25)=51 → mean 52.0
    # adj v1: 65-2.2*(30-25)=54, 85-2.2*(40-25)=52 → mean 53.0
    pre = {0: 10.0, 1: 30.0, 2: 20.0, 3: 40.0}
    rows, eid = [], 0
    for u, p in pre.items():
        post = 2.0 * p + 5.0 * (u % 2)
        rows.append((eid, 0, u, "view", p))
        rows.append((eid + 1, 1000, u, "view", post))
        eid += 2
    sf = _write_events(tmp_path, rows)
    out = {r["variant"]: r for r in q_events_cuped(spark, sf).collect()}
    assert out[0]["n_users"] == 2 and out[1]["n_users"] == 2
    assert abs(out[0]["mean_cuped"] - 52.0) < 1e-6
    assert abs(out[1]["mean_cuped"] - 53.0) < 1e-6
    assert abs(out[0]["mean_post"] - 30.0) < 1e-6
    assert abs(out[1]["mean_post"] - 75.0) < 1e-6


def test_time_decay_half_life_exact(spark, tmp_path):
    # one event at the anchor (weight 1) and one exactly a half-life
    # earlier (weight 1/2): score = 8 + 4/2 = 10
    rows = [
        (0, HALF_LIFE_SEC, 7, "view", 8.0),
        (1, 0, 7, "view", 4.0),
    ]
    sf = _write_events(tmp_path, rows)
    row = q_events_time_decay(spark, sf).collect()[0]
    assert row["user_id"] == 7 and row["n_events"] == 2
    assert abs(row["decayed_score"] - 10.0) < 1e-6


def test_scd2_intervals_and_sample(spark, tmp_path):
    # user 0 is in the 5% sample (0 % 20 == 0); user 5 is not
    rows = [
        (0, 10, 0, "view", 1.0),
        (1, 20, 0, "click", 1.0),
        (2, 30, 5, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = sorted(
        q_events_scd2(spark, sf).collect(), key=lambda r: r["valid_from"]
    )
    assert [r["user_id"] for r in out] == [0, 0]
    assert out[0]["state"] == "view" and out[0]["valid_to"] == 20
    assert out[0]["is_current"] == 0
    assert out[1]["state"] == "click" and out[1]["valid_to"] is None
    assert out[1]["is_current"] == 1
