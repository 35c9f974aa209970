"""Matryoshka truncation eval (similarity.py) and token-budget
planner (pipeline.py): invariants beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    pipeline,
    similarity,
)


def test_matryoshka_full_dim_row_is_exact_anchor(spark):
    rows = {
        r["dims"]: r
        for r in similarity.q_matryoshka_eval(spark, SF_DIR).collect()
    }
    assert set(rows) == set(similarity.MRL_DIMS)
    full = rows[similarity.DIM]
    assert full["top1_agree"] == similarity.N_QUERIES
    assert full["mean_overlap10"] == 1.0
    for r in rows.values():
        assert 0 <= r["top1_agree"] <= similarity.N_QUERIES
        assert 0.0 <= r["mean_overlap10"] <= 1.0


def test_matryoshka_truncated_ranking_uses_sliced_norms(spark):
    """The d-dim cosine must be computed against d-dim norms — a
    full-norm denominator scales all scores uniformly per vector and
    reorders rankings.  Cross-check one truncated pass against a
    direct recomputation."""
    d = similarity.MRL_DIMS[0]
    td = similarity._topk_at_dim(spark, SF_DIR, d)
    emb = similarity._emb_with_norm(spark, SF_DIR)
    base = emb.select(
        "vec_id", F.slice("embedding", 1, d).alias("v")
    )
    q = base.filter(F.col("vec_id") < similarity.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    direct = (
        base.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                similarity.dot(F.col("v"), F.col("qv"))
                / (similarity.norm(F.col("v")) * similarity.norm(F.col("qv")))
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    expect = (
        direct.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= similarity.TOP_K)
        .select("q_id", "vec_id", "rank")
    )
    assert td.exceptAll(expect).count() == 0
    assert expect.exceptAll(td).count() == 0


def test_token_budget_is_a_reallocation_of_the_corpus(spark):
    out = pipeline.q_token_budget(spark, SF_DIR).collect()
    total_tokens = sum(r["n_tokens"] for r in out)
    total_target = sum(r["target_tokens"] for r in out)
    # integer division per source loses at most (n_sources - 1) tokens
    assert total_tokens - len(out) < total_target <= total_tokens
    for r in out:
        assert r["w"] in (1, 2, 3)
        assert (r["target_tokens"] > r["n_tokens"]) == bool(
            r["oversampled"]
        )
        assert abs(
            r["epochs"] - r["target_tokens"] / r["n_tokens"]
        ) < 1e-6


def test_token_budget_weights_drive_targets(spark):
    """Targets must be proportional to weights: target/w is the same
    integer-rounded base for every source."""
    out = pipeline.q_token_budget(spark, SF_DIR).collect()
    bases = {r["target_tokens"] // r["w"] for r in out}
    assert len(bases) == 1
