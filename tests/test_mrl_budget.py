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


# --- sim_quantized_recall --------------------------------------------


def test_quantized_recall_bounds_and_high_fidelity(spark):
    """int8 with per-vector scale loses < 0.4% of dynamic range per
    component — on 64-dim vectors the ranking should be near-exact
    and the cosine distortion tiny."""
    row = similarity.q_quantized_recall(spark, SF_DIR).collect()[0]
    assert 0 <= row["top1_agree"] <= similarity.N_QUERIES
    assert 0.0 <= row["mean_overlap10"] <= 1.0
    assert row["mean_abs_cos_err"] is not None
    assert row["mean_abs_cos_err"] < 0.01
    assert row["mean_overlap10"] >= 0.9


def test_quantized_ranking_is_scale_invariant(spark):
    """Cosine of the integer codes must equal cosine of the
    dequantized floats — the per-vector scale cancels; spot-check by
    dequantizing and comparing rankings for one query."""
    qv = similarity.q_embedding_quantize(spark, SF_DIR)
    deq = qv.select(
        "vec_id",
        F.transform(
            "qvec", lambda x: x.cast("double") * F.col("scale")
        ).alias("dv"),
    )
    base = deq.withColumn("nrm", similarity.norm(F.col("dv"))).filter(
        F.col("nrm") > 0
    )
    q0 = base.filter(F.col("vec_id") == 0).select(
        F.col("dv").alias("qv0"), F.col("nrm").alias("qn0")
    )
    from pyspark.sql import Window as W

    scored = (
        base.crossJoin(q0)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (
                similarity.dot(F.col("dv"), F.col("qv0"))
                / (F.col("nrm") * F.col("qn0"))
            ).alias("c"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.desc("c"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rank") <= similarity.TOP_K)
        .select("vec_id", "rank")
    )
    # integer-code ranking for the same query, straight from qvec
    iq = qv.select("vec_id", "qvec").withColumn(
        "inrm", similarity.norm(F.col("qvec"))
    ).filter(F.col("inrm") > 0)
    iq0 = iq.filter(F.col("vec_id") == 0).select(
        F.col("qvec").alias("iq0"), F.col("inrm").alias("in0")
    )
    int_ranked = (
        iq.crossJoin(iq0)
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (
                similarity.dot(F.col("qvec"), F.col("iq0"))
                / (F.col("inrm") * F.col("in0"))
            ).alias("c"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.desc("c"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rank") <= similarity.TOP_K)
        .select("vec_id", "rank")
    )
    assert scored.exceptAll(int_ranked).count() == 0
    assert int_ranked.exceptAll(scored).count() == 0


# --- sim_embedding_drift ---------------------------------------------


def test_embedding_drift_bounds_and_counts(spark):
    rows = similarity.q_embedding_drift(spark, SF_DIR).collect()
    assert rows
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet").collect()
    from collections import Counter

    counts = Counter((r["label"], r["vec_id"] % 2) for r in emb)
    for r in rows:
        assert -1.0 <= r["centroid_cos"] <= 1.0
        assert r["l2_shift"] >= 0.0
        assert r["n_a"] == counts[(r["label"], 0)]
        assert r["n_b"] == counts[(r["label"], 1)]


def test_embedding_drift_is_zero_against_itself(spark):
    """Identical halves must read as zero drift: recompute with both
    'halves' being the full corpus and assert cos=1, shift=0."""
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    means = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
    )
    self_drift = means.groupBy("label").agg(
        F.round(
            F.sum(F.col("m") * F.col("m"))
            / (
                F.sqrt(F.sum(F.col("m") * F.col("m")))
                * F.sqrt(F.sum(F.col("m") * F.col("m")))
            ),
            6,
        ).alias("cos"),
    )
    for r in self_drift.collect():
        assert r["cos"] == 1.0
