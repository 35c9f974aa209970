"""PageRank over the near-duplicate document graph — the second graph
algorithm next to dedup's connected components (engine extension).

Why a training-data pipeline wants it: connected components answers
"which docs are the same content family"; PageRank over the same
verified-similarity edges scores CENTRALITY — the canonical-doc pick
"highest-rank member" beats "min doc_id" when families are hub-and-
spoke (one original, many partial copies), and rank mass identifies
template/boilerplate hubs that near-dup thresholds alone miss.

Plan shape per iteration (the textbook distributed PageRank):
contributions = ranks ⋈ out-edges (co-partitioned on src — ONE
shuffle family for the whole loop since both sides hash on the same
key), groupBy(dst) sum, damping applied as a narrow map.  Dangling
nodes (no out-edges) redistribute uniformly via a 1-row aggregate
broadcast — the S5 scalar-side-input shape.  Lineage is cut per
round with localCheckpoint like the CC loop.  Iterations are bounded
(N_ITERS), not convergence-polled: no per-round driver relay at all
beyond the dangling-mass scalar.

Rows-only BY DESIGN (SURVEY §5 iterative category): 10 rounds of
damped float recursion are not one SQL statement.  Pinned by
closed-form tests (uniform graphs, star hub/spoke ratios) and a
rank-mass conservation invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import JACCARD_DUP_MIN, q_jaccard_pairs

N_ITERS = 10
DAMPING = 0.85


def pagerank(nodes: DataFrame, edges: DataFrame, n_iters: int = N_ITERS) -> DataFrame:
    """nodes(node), undirected edges(a, b) → (node, rank); Σrank = |nodes|
    (the size-normalized convention, so a singleton's rank is 1.0 only
    until damping redistributes its mass).

    Driver-loop discipline: NO per-round action.  In an undirected
    graph every node that touches an edge has out-degree ≥ 1, so the
    only dangling nodes are the singletons outside the edge set — and
    they all carry the SAME rank, which follows the closed driver-side
    recurrence r_s(t+1) = (1−d) + d·n_sing·r_s(t)/N.  The dangling
    mass and per-round base term therefore precompute analytically;
    the distributed loop touches ONLY the connected subgraph (the same
    only-iterate-the-candidates discipline as dedup's CC loop), and
    singletons join back at the end with their closed-form rank."""
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    directed = edges.selectExpr("a AS src", "b AS dst").unionByName(
        edges.selectExpr("b AS src", "a AS dst")
    )
    deg = directed.groupBy("src").agg(F.count("*").alias("deg"))
    # out-edge table with 1/deg weight, checkpointed once — every
    # iteration joins against this same co-partitioned table
    out = (
        directed.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition("src")
        .localCheckpoint()
    )
    connected = deg.select(F.col("src").alias("node")).localCheckpoint()
    n_connected = connected.count()
    n_sing = n_nodes - n_connected

    # closed-form singleton/base series (no distributed work)
    r_s = 1.0
    bases = []
    for _ in range(n_iters):
        base = (1.0 - DAMPING) + DAMPING * n_sing * r_s / n_nodes
        bases.append(base)
        r_s = base

    ranks = connected.select("node", F.lit(1.0).alias("rank"))
    for rnd, base in enumerate(bases, 1):
        contrib = (
            ranks.join(out, ranks.node == out.src)
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("recv"))
        )
        ranks = connected.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(DAMPING) * F.coalesce("recv", F.lit(0.0))
            ).alias("rank"),
        )
        # cut lineage every third round: each eager checkpoint is a
        # job, and a 3-round plan over the (tiny) subgraph is cheaper
        # than a job per round
        if rnd % 3 == 0 or rnd == len(bases):
            ranks = ranks.localCheckpoint()
    singles = nodes.join(connected, "node", "left_anti").select(
        "node", F.lit(r_s).alias("rank")
    )
    return ranks.unionByName(singles)


def q_dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the verified near-dup graph (same edge source as
    dedup_clusters — the memoized jaccard pair cache), every corpus
    doc a node; ranks rounded to 6 for stable comparison."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    edges = (
        q_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_DUP_MIN)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    return pagerank(docs, edges).select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


ORACLES: dict[str, str] = {}

QUERIES = {
    "dedup_pagerank": q_dedup_pagerank,
}
