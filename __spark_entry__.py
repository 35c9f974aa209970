"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``text_sentiment_analysis_in_hadoop_and_spark_spark``
(see SURVEY.md §2 for the operator inventory each entry maps to).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from text_sentiment_analysis_in_hadoop_and_spark_spark.sources import csv as csv_source
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming import sessions as streaming_sessions
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming import windowed as streaming_windowed
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    asof,
    dedup,
    ml,
    multimodal,
    nb,
    pipeline,
    relational,
    similarity,
    textstats,
    tfidf,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end Naive Bayes sentiment pipeline — clean →
    tokenize → train conditional counts → broadcast-join score →
    argmax → confusion matrix (reference: /root/reference/Hadoop/NB.java)."""
    return nb.q_nb_confusion(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(nb.QUERIES)
    out.update(tfidf.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(textstats.QUERIES)
    out.update(ml.QUERIES)
    out.update(csv_source.QUERIES)
    out.update(streaming_windowed.QUERIES)
    out.update(streaming_sessions.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(relational.QUERIES)
    out.update(asof.QUERIES)
    out.update(pipeline.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(nb.ORACLES)
    out.update(tfidf.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(textstats.ORACLES)
    out.update(ml.ORACLES)
    out.update(csv_source.ORACLES)
    out.update(streaming_windowed.ORACLES)
    out.update(streaming_sessions.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(relational.ORACLES)
    out.update(asof.ORACLES)
    out.update(pipeline.ORACLES)
    return out
