"""Per-gate keep attribution (pipeline.py) and native unpivot
(relational2.py): consistency with the capstone and melt round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    pipeline,
    relational2,
)


def test_attribution_kept_set_equals_training_corpus(spark):
    """verdict == 'kept' must be EXACTLY the capstone manifest — the
    attribution is a refactoring of the same gates, so any drift is a
    composition bug."""
    attr = pipeline.q_keep_attribution(spark, SF_DIR)
    kept = attr.filter(F.col("verdict") == "kept").select("doc_id")
    capstone = pipeline.q_training_corpus(spark, SF_DIR).select("doc_id")
    assert kept.exceptAll(capstone).count() == 0
    assert capstone.exceptAll(kept).count() == 0


def test_attribution_verdict_respects_gate_order(spark):
    rows = pipeline.q_keep_attribution(spark, SF_DIR).collect()
    assert rows
    seen_drops = set()
    for r in rows:
        flags = (r["pass_keep"], r["pass_contam"], r["pass_mixture"])
        if r["verdict"] == "kept":
            assert flags == (1, 1, 1)
        elif r["verdict"] == "dedup_quality":
            assert r["pass_keep"] == 0
        elif r["verdict"] == "contamination":
            assert flags[:2] == (1, 0)
        else:
            assert r["verdict"] == "mixture" and flags == (1, 1, 0)
        if r["verdict"] != "kept":
            seen_drops.add(r["verdict"])
    assert seen_drops, "fixture exercises no gate at all"


def test_attribution_covers_every_document_once(spark):
    attr = pipeline.q_keep_attribution(spark, SF_DIR)
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    assert attr.count() == docs.count()
    assert attr.select("doc_id").distinct().count() == docs.count()


def test_unpivot_round_trips_back_to_wide(spark):
    long = relational2.q_unpivot_metrics(spark, SF_DIR)
    wide_again = (
        long.groupBy("l_returnflag")
        .pivot("metric", ["sum_qty", "sum_price", "avg_disc"])
        .agg(F.first("value"))
    )
    li = spark.read.parquet(SF_DIR + "/lineitem.parquet")
    expect = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    cols = ["l_returnflag", "sum_qty", "sum_price", "avg_disc"]
    assert (
        wide_again.select(cols).exceptAll(expect.select(cols)).count() == 0
    )
    assert (
        expect.select(cols).exceptAll(wide_again.select(cols)).count() == 0
    )


def test_unpivot_emits_three_rows_per_flag(spark):
    long = relational2.q_unpivot_metrics(spark, SF_DIR)
    per = long.groupBy("l_returnflag").count().collect()
    assert per and all(r["count"] == 3 for r in per)
