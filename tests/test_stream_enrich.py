"""Stream-static enrichment (streaming/enrich.py): the streamed join
must equal its batch twin, stay stateless (no state store rows), and
broadcast the dimension."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.enrich import (
    enrich_batch,
    enrich_stream,
)


def _key(r):
    return (r["event_id"], r["user_id"], r["event_type"], r["mktsegment"],
            r["nationkey"], r["value"])


def test_enrich_oracle(spark, duck):
    df = entrymod.queries()["events_enriched"](spark, SF_DIR)
    res = duck.execute(entrymod.oracle_sql()["events_enriched"])
    errs = compare(
        "events_enriched", df, res.fetchall(), [d[0] for d in res.description]
    )
    assert not errs, errs


def test_enrich_batch_broadcasts_dim(spark):
    plan = enrich_batch(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_enrich_stream_equals_batch_and_is_stateless(spark, tmp_path):
    land = tmp_path / "events_land"
    land.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", land / "events.parquet")

    batch = sorted(_key(r) for r in enrich_batch(spark, SF_DIR).collect())
    assert batch, "premise: enrichment joins some rows"

    q = (
        enrich_stream(spark, str(land), SF_DIR)
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = sorted(
            _key(r) for r in spark.sql("SELECT * FROM enrich_test").collect()
        )
        progress = q.lastProgress
    finally:
        q.stop()
    assert streamed == batch
    # stream-static is stateless: no state-store operators ran
    assert not progress or not progress.get("stateOperators"), progress
