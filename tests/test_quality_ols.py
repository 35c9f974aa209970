"""Independent cross-check for the closed-form quality OLS.

The Bass-diffusion lesson (r6→r7): a Cramer-rule typo mirrored into
the DuckDB oracle is invisible to parity — both engines agree on the
wrong answer.  So the 3×3 solve here is verified against
``numpy.linalg.lstsq`` on the SAME per-doc design matrix, rebuilt
independently from the quantized signals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import quality


def _design(spark):
    """Per-doc (x1, x2, y) in unit space, straight from the same
    building blocks the query quantizes."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    x1 = F.size(
        F.filter(toks, lambda t: t.isin(*quality._EN_STOP_OLS))
    ) / n
    x2 = F.size(F.array_distinct(toks)) / n
    feats = docs.select(
        "doc_id",
        (F.round(x1 * quality.OLS_SCALE, 0) / quality.OLS_SCALE).alias("x1"),
        (F.round(x2 * quality.OLS_SCALE, 0) / quality.OLS_SCALE).alias("x2"),
    )
    bgc = quality._bigrams_cached(spark, SF_DIR)
    c12 = bgc.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    lnp = F.log(F.col("c12") / F.col("c1"))
    xent = (
        bgc.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            (
                F.round(
                    -F.sum(F.col("n") * lnp) / F.sum("n") * quality.OLS_SCALE,
                    0,
                )
                / quality.OLS_SCALE
            ).alias("y")
        )
    )
    rows = (
        feats.join(xent, "doc_id", "left")
        .select("x1", "x2", F.coalesce(F.col("y"), F.lit(0.0)).alias("y"))
        .collect()
    )
    x1a = np.array([r["x1"] for r in rows])
    x2a = np.array([r["x2"] for r in rows])
    ya = np.array([r["y"] for r in rows])
    return x1a, x2a, ya


def test_ols_matches_numpy_lstsq(spark):
    row = quality.q_quality_ols(spark, SF_DIR).collect()[0]
    x1, x2, y = _design(spark)
    assert row["n_docs"] == len(y)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    for got, want in zip(
        (row["beta0"], row["beta1"], row["beta2"]), coef
    ):
        assert abs(got - want) < 1e-4 * max(1.0, abs(want))
    # R² recomputed from the residuals of the numpy fit
    resid = y - X @ coef
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert abs(row["r_squared"] - r2) < 1e-4


def test_ols_single_aggregate_plan(spark):
    """The training pass must stay one partial-aggregating reduction:
    no Python nodes, no cartesian product, no per-doc collect."""
    plan = quality.q_quality_ols(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
