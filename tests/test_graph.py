"""PageRank semantics (operators/graph.py): closed-form graphs +
rank-mass conservation (the rows-only pin)."""

from __future__ import annotations

import pytest

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.graph import (
    pagerank,
)


def _g(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "node BIGINT")
    e = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    return n, e


def test_uniform_cycle_is_fixed_point(spark):
    # a triangle is vertex-transitive: rank 1.0 everywhere, exactly,
    # at every iteration
    n, e = _g(spark, [1, 2, 3], [(1, 2), (2, 3), (1, 3)])
    out = {r["node"]: r["rank"] for r in pagerank(n, e).collect()}
    assert out == pytest.approx({1: 1.0, 2: 1.0, 3: 1.0})


def test_star_hub_outranks_spokes(spark):
    # hub 1 with 4 spokes: hub absorbs each spoke's full rank, spokes
    # split the hub's — hub converges to ~2.5x a spoke
    n, e = _g(spark, [1, 2, 3, 4, 5], [(1, s) for s in (2, 3, 4, 5)])
    out = {r["node"]: r["rank"] for r in pagerank(n, e).collect()}
    assert out[1] > 2 * out[2]
    assert out[2] == pytest.approx(out[3]) == pytest.approx(out[4])
    assert sum(out.values()) == pytest.approx(5.0, abs=1e-6)


def test_singletons_hold_base_rank_and_mass_conserves(spark):
    # 2-clique + isolated node: the isolate receives only the base +
    # its own redistributed dangling share; total mass stays |V|
    n, e = _g(spark, [1, 2, 9], [(1, 2)])
    out = {r["node"]: r["rank"] for r in pagerank(n, e).collect()}
    assert sum(out.values()) == pytest.approx(3.0, abs=1e-6)
    assert out[1] == pytest.approx(out[2])
    assert out[9] < out[1]
