"""Connected-components dedup clustering (operators/dedup.py):
verified near-dup pairs resolve into clusters labeled by component-min
doc_id; docs with no verified pair stay singletons.  Transitive
closure on a real multi-hop component is pinned by the recursive-CTE
oracle parity at sf0.01 (a 3-member cluster exists there)."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
    JACCARD_DUP_MIN,
    q_dedup_clusters,
    q_jaccard_pairs,
)


def test_chain_merges_and_singletons_stay(spark, tmp_path):
    # doc 1 = base; doc 2 = one token swapped; doc 3 = one more swap on
    # top of doc 2; doc 4 = disjoint vocabulary.  This configuration is
    # deterministic: all three pairwise LSH candidacies land, jaccards
    # are ~0.9/0.9/0.81, all above the edge threshold.
    words = [f"w{i:02d}" for i in range(60)]
    a = " ".join(words)
    bl = list(words)
    bl[5] = "xchg1"
    b = " ".join(bl)
    cl = list(bl)
    cl[40] = "xchg2"
    c = " ".join(cl)
    d = " ".join(f"zz{i}" for i in range(30))

    base = tmp_path / "cc"
    spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id BIGINT, text STRING"
    ).coalesce(1).write.parquet(str(base / "documents.parquet"))
    sf = str(base)

    edges = q_jaccard_pairs(spark, sf).filter(
        F.col("jaccard") >= JACCARD_DUP_MIN
    )
    assert edges.count() == 3  # the premise: 1-2, 2-3, 1-3 all verified

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_clusters(spark, sf).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_star_cc_equals_propagation_on_random_graphs(spark):
    import random

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    prop = {
        r["node"]: r["label"]
        for r in connected_components(pairs).collect()
    }
    star = {
        r["node"]: r["label"]
        for r in connected_components_star(pairs).collect()
    }
    assert star == prop


def test_star_cc_resolves_deep_chain_in_few_rounds(spark):
    """A 120-node path has diameter 119 — min-label propagation needs
    ~119 rounds (far past CC_MAX_ITERS); star alternation collapses it
    within its default O(log n) round budget."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        connected_components_star,
    )

    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components_star(pairs, max_rounds=12).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_star_cc_exhausted_budget_still_one_row_per_node(spark):
    """ADVICE r4: when max_rounds is exhausted before the edge set
    reaches star form, the result must still be well-formed — exactly
    one (node, label) row per node (labels may be unconverged upper
    bounds, like the propagation variant's degradation mode)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        connected_components_star,
    )

    n = 200  # deep path; 1 round cannot reach star form
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a LONG, doc_b LONG"
    )
    rows = connected_components_star(pairs, max_rounds=1).collect()
    assert len(rows) == n
    assert len({r["node"] for r in rows}) == n  # no conflicting dupes
    # labels are valid upper bounds: label <= node, and label is a node
    nodes = {r["node"] for r in rows}
    assert all(r["label"] <= r["node"] and r["label"] in nodes for r in rows)
