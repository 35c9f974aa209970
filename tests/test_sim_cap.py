"""Embedding-LSH hot-bucket cap (VERDICT r8 item 2) — the vector twin
of tests/test_dedup_cap.py's shingle bomb: a DEGENERATE embedding
cluster (many vectors pointing one direction — a collapsed encoder, a
constant-padding bug) lands in ONE bucket of every LSH table and must
NOT go quadratic through the corpus-side bucket self-joins; vectors
outside the bomb keep their candidate pairs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import similarity

BOMB = 40   # identical vectors — one bucket of 40 in EVERY table
CAP = 10

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _write_embeddings(spark, tmp_path, rows):
    """Materialize a synthetic embeddings table as an sf_dir the
    similarity operators can load (they read ``<dir>/embeddings.parquet``
    and memoize per (session, sf_dir), so each test gets its own dir)."""
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(rows, _SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    return sf_dir


def _corpus():
    """BOMB copies of +1⃗ (the degenerate cluster) plus one legitimate
    near-dup pair of −1⃗ vectors — complementary hyperplane signs, so
    the pair's bucket (size 2) is disjoint from the bomb's in every
    table."""
    up = [1.0] * similarity.DIM
    down = [-1.0] * similarity.DIM
    rows = [(i, up) for i in range(BOMB)]
    rows.append((1000, down))
    rows.append((1001, down))
    return rows


def test_degenerate_cluster_is_capped(spark, tmp_path, monkeypatch):
    sf_dir = _write_embeddings(spark, tmp_path, _corpus())
    monkeypatch.setattr(similarity, "SIM_HOT_BUCKET_CAP", CAP)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.q_dedup_embedding_pairs(spark, sf_dir).collect()
    }
    # the bomb (40 > CAP in every table) contributes nothing ...
    assert not any(a < BOMB and b < BOMB for a, b in pairs), pairs
    # ... but the legitimate near-dup pair survives (cosine 1.0)
    assert (1000, 1001) in pairs
    # bound: without the cap the bomb alone is 40*39/2 = 780 pairs
    assert len(pairs) < 10


def test_cap_is_inactive_below_threshold(spark, tmp_path):
    """With the default cap (1000) the same corpus keeps ALL its
    same-bucket pairs — the cap only fires on pathological buckets."""
    sf_dir = _write_embeddings(spark, tmp_path, _corpus())
    n = (
        similarity.q_dedup_embedding_pairs(spark, sf_dir)
        .filter((F.col("vec_a") < BOMB) & (F.col("vec_b") < BOMB))
        .count()
    )
    assert n == BOMB * (BOMB - 1) // 2


def test_hubness_candidates_are_capped(spark, tmp_path, monkeypatch):
    """The k-NN graph builder goes through the same guard: capped, the
    bomb vectors form no candidate edges, so all 40 sit at in-degree 0
    while the legit pair point at each other (in-degree 1 each)."""
    sf_dir = _write_embeddings(spark, tmp_path, _corpus())
    monkeypatch.setattr(similarity, "SIM_HOT_BUCKET_CAP", CAP)
    hist = {
        r["in_degree"]: r["n_vectors"]
        for r in similarity.q_sim_knn_hubness(spark, sf_dir).collect()
    }
    assert hist == {0: BOMB, 1: 2}


def test_capped_bucket_rows_is_per_bucket(spark):
    """Capping bucket B in table T must not touch bucket B' or table
    T' — exclusion is per (tbl, bucket) group, exactly like dedup.py's
    per-band hot list."""
    rows = [(i, 0, 7) for i in range(5)] + [(i, 0, 9) for i in range(3)] + [
        (i, 1, 7) for i in range(2)
    ]
    bx = spark.createDataFrame(rows, "vec_id long, tbl int, bucket int")
    kept = similarity.capped_bucket_rows(bx, cap=4).groupBy(
        "tbl", "bucket"
    ).count()
    got = {(r["tbl"], r["bucket"]): r["count"] for r in kept.collect()}
    # (0,7) is hot (5 > 4) and vanishes; (0,9) and (1,7) survive whole
    assert got == {(0, 9): 3, (1, 7): 2}


@pytest.mark.parametrize("cap", [0, 1])
def test_everything_hot_yields_no_pairs_not_an_error(
    spark, tmp_path, monkeypatch, cap
):
    """Degenerate-degenerate edge: a cap below every bucket size empties
    the candidate set cleanly (no join error, no fallback scan)."""
    sf_dir = _write_embeddings(spark, tmp_path, _corpus())
    monkeypatch.setattr(similarity, "SIM_HOT_BUCKET_CAP", cap)
    assert similarity.q_dedup_embedding_pairs(spark, sf_dir).count() == 0
