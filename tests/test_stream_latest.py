"""Streaming upsert view (streaming/latest.py): stream ≡ batch after
multiple files, and replaying a stale file is a no-op (monotone
state)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, rows, name):
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
    pq.write_table(tbl, f"{path}/{name}.parquet")


def test_stream_equals_batch_and_replay_is_noop(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.latest import (
        latest_state_stream,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_latest_state,
    )

    land = tmp_path / "land"
    land.mkdir()

    batch1 = [(1, 100, 7, "view", 1.0), (2, 200, 7, "view", 2.0),
              (3, 50, 8, "click", 3.0)]
    batch2 = [(4, 150, 7, "view", 4.0),       # older than id2 → no change
              (5, 300, 8, "click", 5.0)]      # advances user 8
    _write(str(land), batch1, "b1")

    emissions: list[list] = []
    q = (
        latest_state_stream(spark, str(land))
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: emissions.append(df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(str(land), batch2, "b2")
        q.processAllAvailable()
        # stale replay: re-land batch1 under a new file name — the
        # monotone state must emit NOTHING for it
        _write(str(land), batch1, "b1_replay")
        q.processAllAvailable()
    finally:
        q.stop()

    nonempty = [b for b in emissions if b]
    # replay batch produced no emissions
    assert len(nonempty) == 2, [len(b) for b in emissions]

    # final state per key = last emission across batches
    final = {}
    for batch in nonempty:
        for r in batch:
            final[(r["user_id"], r["event_type"])] = (
                r["last_event_id"],
                r["last_epoch_sec"],
                r["last_value"],
            )
    assert final == {
        (7, "view"): (2, 200, 2.0),
        (8, "click"): (5, 300, 5.0),
    }

    # batch twin: q_events_latest_state reads <sf>/events.parquet — give
    # it a dir whose events.parquet holds the full landing-zone union
    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    spark.read.parquet(str(land)).coalesce(1).write.parquet(
        str(sfdir / "events.parquet")
    )
    batch = {
        (r["user_id"], r["event_type"]): (
            r["last_event_id"],
            r["last_epoch_sec"],
            r["last_value"],
        )
        for r in q_events_latest_state(spark, str(sfdir)).collect()
    }
    assert batch == final
