"""Parquet schema evolution (sources/evolution.py): the mixed-schema
read must union schemas, null-fill pre-evolution rows, and preserve
values byte-exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.sources import evolution


def test_generations_really_have_different_schemas(spark):
    path = evolution.evolution_path(spark, SF_DIR)
    v1 = spark.read.parquet(os.path.join(path, "gen=v1"))
    v2 = spark.read.parquet(os.path.join(path, "gen=v2"))
    assert "lang" not in v1.columns and "source" not in v1.columns
    assert "lang" in v2.columns and "source" in v2.columns


def test_merged_read_unions_schema_and_null_fills(spark):
    out = evolution.q_evolution_census(spark, SF_DIR).collect()
    by_lang = {r["lang_read"]: r for r in out}
    assert evolution.MISSING in by_lang
    miss = by_lang[evolution.MISSING]
    # every pre-evolution row lands in the missing bucket, and only there
    assert miss["n_pre_evolution"] == miss["n_docs"]
    for lang, r in by_lang.items():
        if lang != evolution.MISSING:
            assert r["n_pre_evolution"] == 0, lang


def test_census_covers_every_document_exactly_once(spark):
    out = evolution.q_evolution_census(spark, SF_DIR)
    total = out.agg(
        F.sum("n_docs").alias("n"), F.sum("sum_chars").alias("c")
    ).collect()[0]
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    expect = docs.agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("c")
    ).collect()[0]
    assert (total["n"], total["c"]) == (expect["n"], expect["c"])
