"""PSI drift / seasonal-residual semantics on crafted events
(streaming/windowed.py late queries)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    q_events_psi_drift,
    q_events_seasonal_residuals,
)


def _write_events(tmp_path, rows):
    """rows: (event_id, epoch_sec, value)."""
    d = tmp_path / "ev"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_psi_near_zero_without_drift(spark, tmp_path):
    # identical value distribution in both halves → every PSI
    # contribution ~0 (smoothing keeps it finite)
    rows = []
    eid = 0
    for s in (0, 1000):  # period cut lands at 500
        for v in range(100):
            rows.append((eid, s, v))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = q_events_psi_drift(spark, sf).collect()
    assert len(out) == 10
    assert all(abs(r["psi_contrib"]) < 1e-4 for r in out)
    assert sum(r["n1"] for r in out) == 100
    assert sum(r["n2"] for r in out) == 100


def test_psi_flags_shifted_distribution(spark, tmp_path):
    # period 2 values shifted +1000 → mass moves to the top bucket
    rows = [(i, 0, i) for i in range(100)]
    rows += [(100 + i, 1000, 1000 + i) for i in range(100)]
    sf = _write_events(tmp_path, rows)
    out = q_events_psi_drift(spark, sf).collect()
    total_psi = sum(r["psi_contrib"] for r in out)
    assert total_psi > 0.5  # way past the 0.2 retrain fence


def test_seasonal_residual_flags_planted_spike(spark, tmp_path):
    # 4 weeks of phase-0 volume 10, one week 50 → that hour tops |z|;
    # phase 1 constant everywhere → sigma 0, excluded
    rows = []
    eid = 0
    for week in range(4):
        base = week * 168 * 3600
        n = 50 if week == 2 else 10
        for i in range(n):
            rows.append((eid, base + i, 0.0))
            eid += 1
        for i in range(5):
            rows.append((eid, base + 3600 + i, 0.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = q_events_seasonal_residuals(spark, sf).collect()
    assert out, "no residuals emitted"
    top = out[0]
    assert top["phase"] == 0 and top["vol"] == 50 and top["z"] > 1.5
    assert all(r["phase"] == 0 for r in out)  # constant phase excluded
