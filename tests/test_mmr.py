"""MMR diversified re-rank invariants (operators/similarity.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.similarity import (
    MMR_K,
    q_sim_topk_brute,
    q_topk_mmr,
)

DIM = 64


def _write_embeddings(tmp_path, vecs):
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    return str(d)


def _clustered_corpus(rng):
    """Query ~ e0; a tight clique of near-copies along e0 plus a few
    moderately-relevant but DIVERSE directions."""
    vecs = [np.eye(DIM)[0]]  # vec 0 .. 7 are queries; 0 is the probe
    for i in range(1, 8):
        vecs.append(rng.normal(0, 0.01, DIM) + np.eye(DIM)[i])
    # near-duplicate clique along e0 (high relevance, zero diversity)
    for j in range(10):
        vecs.append(np.eye(DIM)[0] + rng.normal(0, 0.01, DIM))
    # diverse strongly-relevant docs: mostly e0 + a distinct residual
    # axis each (cos to query ≈ 0.9, pairwise ≈ 0.81 — diversifiable)
    for j in range(10):
        vecs.append(0.9 * np.eye(DIM)[0] + 0.436 * np.eye(DIM)[10 + j])
    return vecs


def test_first_pick_is_top1_and_output_shape(spark, tmp_path):
    rng = np.random.default_rng(9)
    sf = _write_embeddings(tmp_path, _clustered_corpus(rng))
    mmr = [r for r in q_topk_mmr(spark, sf).collect() if r["q_id"] == 0]
    brute = [
        r
        for r in q_sim_topk_brute(spark, sf).collect()
        if r["q_id"] == 0 and r["rank"] == 1
    ]
    mmr.sort(key=lambda r: r["mmr_rank"])
    assert len(mmr) == MMR_K
    assert mmr[0]["vec_id"] == brute[0]["vec_id"]  # rank-1 agrees


def test_mmr_set_is_more_diverse_than_plain_topk(spark, tmp_path):
    rng = np.random.default_rng(9)
    vecs = _clustered_corpus(rng)
    sf = _write_embeddings(tmp_path, vecs)

    def mean_pair_sim(ids):
        u = []
        for i in ids:
            v = np.asarray(vecs[i], np.float64)
            u.append(v / np.linalg.norm(v))
        sims = [
            float(a @ b) for k, a in enumerate(u) for b in u[k + 1 :]
        ]
        return sum(sims) / len(sims)

    mmr_ids = [
        r["vec_id"]
        for r in q_topk_mmr(spark, sf).collect()
        if r["q_id"] == 0
    ]
    brute_ids = [
        r["vec_id"]
        for r in q_sim_topk_brute(spark, sf).collect()
        if r["q_id"] == 0
    ]
    # the plain top-k is the near-dup clique (mean pair sim ≈ 1);
    # MMR trades some of it for distinct-residual candidates
    assert mean_pair_sim(mmr_ids) < mean_pair_sim(brute_ids) - 0.1


def test_mmr_deterministic(spark, tmp_path):
    rng = np.random.default_rng(9)
    sf = _write_embeddings(tmp_path, _clustered_corpus(rng))
    a = sorted(map(tuple, q_topk_mmr(spark, sf).collect()))
    b = sorted(map(tuple, q_topk_mmr(spark, sf).collect()))
    assert a == b
