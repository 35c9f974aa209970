"""Pins for the Python streaming data source (sources/pystream.py):
offset/partition determinism at the reader level, and stream≡batch
equality through the full readStream → state → memory-sink path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.sources import pystream
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events

from conftest import SF_DIR

_PARQUET = os.path.join(SF_DIR, "events.parquet")


def test_reader_offsets_and_partitions_cover_rows_exactly():
    r = pystream.EventsReplayStreamReader({"path": _PARQUET})
    assert r.initialOffset() == {"batch": 0}
    # latestOffset advances one batch per trigger, then parks
    seen = [r.latestOffset()["batch"] for _ in range(pystream.N_BATCHES + 3)]
    assert seen[: pystream.N_BATCHES] == list(
        range(1, pystream.N_BATCHES + 1)
    )
    assert set(seen[pystream.N_BATCHES :]) == {pystream.N_BATCHES}
    # partitions over the full range: disjoint, ordered, covering
    parts = r.partitions({"batch": 0}, {"batch": pystream.N_BATCHES})
    spans = [(p.start_row, p.end_row) for p in parts]
    assert spans[0][0] == 0 and spans[-1][1] == r.n_rows
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 == s2
    # re-reading the same partition yields identical rows (restart
    # idempotence), and counts add up
    total = 0
    for p in parts:
        rows1 = list(r.read(p))
        rows2 = list(r.read(p))
        assert rows1 == rows2
        assert len(rows1) == p.end_row - p.start_row
        total += len(rows1)
    assert total == r.n_rows


def test_stream_equals_batch(spark):
    got = {
        (r["window_start_epoch"], r["event_type"]): (
            r["n_events"],
            r["sum_cents"],
        )
        for r in pystream.q_stream_pyds_windowed(spark, SF_DIR).collect()
    }
    exp = {
        (r["window_start_epoch"], r["event_type"]): (
            r["n_events"],
            r["sum_cents"],
        )
        for r in load_events(spark, SF_DIR)
        .groupBy(
            (F.expr("epoch_sec DIV 3600") * 3600)
            .cast("long")
            .alias("window_start_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .collect()
    }
    assert got == exp
