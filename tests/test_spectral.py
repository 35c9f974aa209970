"""Covariance / PCA invariants on crafted embeddings
(operators/spectral.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.spectral import (
    DIM,
    _fit_pcs,
    covariance,
    q_pca_components,
    q_pca_project,
)


def _write_embeddings(tmp_path, x, labels=None):
    d = tmp_path / "emb"
    d.mkdir()
    n = x.shape[0]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in x],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(
                labels if labels is not None else [i % 2 for i in range(n)],
                pa.int32(),
            ),
        }
    )
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    return str(d)


def _spiked_data(rng, n=40):
    """Dominant variance along coordinate 0, a weaker spike on 1."""
    x = rng.normal(0, 0.01, size=(n, DIM))
    x[:, 0] += rng.normal(0, 3.0, size=n)
    x[:, 1] += rng.normal(0, 1.0, size=n)
    return x


def test_covariance_matches_numpy(spark, tmp_path):
    rng = np.random.default_rng(7)
    x = _spiked_data(rng)
    sf = _write_embeddings(tmp_path, x)
    xe = x.astype(np.float32).astype(np.float64)
    ref = np.cov(xe, rowvar=False, bias=True)
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    out = covariance(load_table(spark, sf, "embeddings")).collect()
    assert len(out) == DIM * (DIM + 1) // 2
    for r in out:
        assert abs(r["cov"] - round(ref[r["i"], r["j"]], 6)) < 2e-6


def test_pca_axes_invariants(spark, tmp_path):
    rng = np.random.default_rng(11)
    sf = _write_embeddings(tmp_path, _spiked_data(rng))
    (v1, lam1), (v2, lam2) = _fit_pcs(spark, sf)
    assert abs(np.linalg.norm(v1) - 1) < 1e-9
    assert abs(np.linalg.norm(v2) - 1) < 1e-9
    assert abs(float(v1 @ v2)) < 1e-6  # orthogonal after deflation
    assert lam1 >= lam2 >= 0
    # dominant axis is coordinate 0, second is coordinate 1
    assert int(np.abs(v1).argmax()) == 0 and abs(v1[0]) > 0.95
    assert int(np.abs(v2).argmax()) == 1 and abs(v2[1]) > 0.9
    # Rayleigh quotient along pc1 beats every coordinate axis variance
    rows = q_pca_components(spark, sf).collect()
    assert len(rows) == 2 * DIM
    assert all(r["variance"] >= 0 for r in rows)


def test_pca_project_separates_shifted_labels(spark, tmp_path):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.01, size=(30, DIM))
    labels = [i % 2 for i in range(30)]
    # label 1 shifted +5 along coordinate 0 → pc1 separates labels
    for i, l in enumerate(labels):
        x[i, 0] += 5.0 * l
    sf = _write_embeddings(tmp_path, x, labels)
    out = {r["label"]: r for r in q_pca_project(spark, sf).collect()}
    assert abs(out[1]["mean_pc1"] - out[0]["mean_pc1"]) > 3.0
