"""Streaming extension: the streamed windowed agg must equal its
batch twin on the same files (one logical declaration, two runners)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR


def test_events_windowed_oracle(spark, duck):
    df = entrymod.queries()["events_windowed"](spark, SF_DIR)
    res = duck.execute(entrymod.oracle_sql()["events_windowed"])
    errs = compare(
        "events_windowed", df, res.fetchall(), [d[0] for d in res.description]
    )
    assert not errs, errs


def test_approx_percentiles_bounded_error(spark):
    """Greenwald-Khanna guarantees a RANK bound, not a value bound
    (in a heavy tail, adjacent order statistics can sit far apart in
    value space): with accuracy=10⁴ the returned value's rank must be
    within n·1e-4 (+2 slack: the sketch returns a data point while the
    exact aggregate interpolates between two) of the target rank."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        load_events,
    )

    vals: dict[str, list[float]] = {}
    for r in load_events(spark, SF_DIR).select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    approx = {
        r["event_type"]: r
        for r in entrymod.queries()["events_percentiles_approx"](
            spark, SF_DIR
        ).collect()
    }
    assert approx.keys() == vals.keys()
    for etype, ap in approx.items():
        xs = sorted(vals[etype])
        n = len(xs)
        assert ap["n_events"] == n
        for q, frac in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            # rank of the approx value among the exact data
            import bisect

            rank = bisect.bisect_left(xs, ap[q])
            target = frac * (n - 1)
            tol = n * 1e-4 + 2
            assert abs(rank - target) <= tol, (etype, q, rank, target, n)


def test_stream_equals_batch(spark, tmp_path):
    import os

    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        windowed_batch,
        windowed_stream,
    )

    # stage a landing-zone directory (the file stream source's contract)
    land = tmp_path / "events_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")

    batch = {
        (r["window_start_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_batch(spark, SF_DIR).collect()
    }
    q = (
        windowed_stream(spark, str(land))
        .writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["window_start_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM win_test").collect()
        }
    finally:
        q.stop()
    assert streamed == batch
