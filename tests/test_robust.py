"""Median/MAD outlier-fence semantics on crafted events
(streaming/windowed.py late queries)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    q_events_mad_outliers,
)


def test_mad_fence_catches_single_outlier(spark, tmp_path):
    # values 0..9 plus one 100: median 5, adev median (MAD) 3,
    # fence 3*1.4826*3 ≈ 13.3 → exactly one outlier
    d = tmp_path / "ev"
    d.mkdir()
    vals = [float(v) for v in range(10)] + [100.0]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "ts": pa.array([i * 10**9 for i in range(len(vals))], pa.int64()),
            "user_id": pa.array([0] * len(vals), pa.int64()),
            "event_type": pa.array(["a"] * len(vals)),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(vals)),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")

    row = q_events_mad_outliers(spark, str(d)).collect()[0]
    assert row["n_events"] == 11
    assert abs(row["median_value"] - 5.0) < 1e-9
    assert abs(row["mad"] - 3.0) < 1e-9
    assert row["n_outliers"] == 1
    assert abs(row["outlier_share"] - 1 / 11) < 1e-5
