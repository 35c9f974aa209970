"""Triangle census semantics on a crafted edge set
(operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.graph import (
    _triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def test_triangle_enumeration_once_each(spark):
    # square 1-2-3-4 with diagonal 1-3 → exactly the triangles
    # (1,2,3) and (1,3,4), each enumerated once
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    tri = sorted(
        tuple(r) for r in _triangles(edges).select("a", "b", "c").collect()
    )
    assert tri == [(1, 2, 3), (1, 3, 4)]


def test_no_triangle_in_chain(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert _triangles(edges).count() == 0


def test_k4_has_four_triangles(spark):
    edges = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    assert _triangles(edges).count() == 4


def test_wedge_and_clustering_math(spark):
    # same square+diagonal: degrees (3,2,3,2) → wedges 8,
    # global clustering = 3*2/8 = 0.75
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    n_tri = _triangles(edges).count()
    assert wedges == 8 and n_tri == 2
    assert abs(3.0 * n_tri / wedges - 0.75) < 1e-9
