"""MERGE upsert provenance and sweep-line concurrency semantics on
crafted events (operators/merge.py, streaming/windowed.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.merge import (
    q_merge_upsert,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    q_events_peak_concurrency,
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
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_merge_insert_update_delete_kept(spark, tmp_path):
    rows = [
        # user 1: base view, CDC click → updated
        (1, 10, 1, "view", 1.0),
        (10, 20, 1, "click", 2.0),
        # user 2: base only → kept
        (2, 10, 2, "view", 5.0),
        # user 3: CDC only → inserted
        (20, 30, 3, "signup", 7.0),
        # user 4: base + CDC delete marker → gone
        (4, 10, 4, "view", 9.0),
        (30, 40, 4, "error", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["user_id"]: r for r in q_merge_upsert(spark, sf).collect()}
    assert out[1]["op"] == "updated" and out[1]["state"] == "click"
    assert out[1]["value"] == 2.0 and out[1]["as_of"] == 20
    assert out[2]["op"] == "kept" and out[2]["value"] == 5.0
    assert out[3]["op"] == "inserted" and out[3]["state"] == "signup"
    assert 4 not in out


def test_merge_latest_change_wins_within_cdc(spark, tmp_path):
    # two CDC rows for one user: the later (ts, event_id) wins
    rows = [
        (1, 10, 1, "view", 1.0),
        (10, 20, 1, "click", 2.0),
        (20, 20, 1, "signup", 3.0),  # same ts, higher event_id → wins
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["user_id"]: r for r in q_merge_upsert(spark, sf).collect()}
    assert out[1]["state"] == "signup" and out[1]["value"] == 3.0


def test_peak_concurrency_overlap(spark, tmp_path):
    # three staggered 30-min intervals all open at t=1200 → peak 3
    rows = [
        (1, 0, 1, "a", 0.0),
        (2, 600, 2, "a", 0.0),
        (3, 1200, 3, "a", 0.0),
        # disjoint type: single interval → peak 1
        (4, 0, 4, "b", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in q_events_peak_concurrency(spark, sf).collect()
    }
    assert out["a"]["peak_concurrency"] == 3 and out["a"]["n_intervals"] == 3
    assert out["b"]["peak_concurrency"] == 1


def test_peak_concurrency_straddles_midnight(spark, tmp_path):
    # interval opening at 86300 (day 0) is still open at 86500
    # (day 1): the day-offset must carry it across the boundary
    rows = [
        (1, 86300, 1, "a", 0.0),
        (2, 86500, 2, "a", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = q_events_peak_concurrency(spark, sf).collect()[0]
    assert out["peak_concurrency"] == 2
