"""MLlib pipeline parity (M1–M7) — rows-only surface, so determinism
and metric sanity are pinned here instead of a DuckDB oracle
(SURVEY §5: hash-dependent / iterative operators).
"""

from __future__ import annotations

import __spark_entry__ as entrymod

from conftest import SF_DIR

ML_METRIC_QUERIES = [
    "ml_nb_metrics",
    "ml_modified_nb_metrics",
    "ml_svm_metrics",
    "ml_modified_svm_metrics",
    "ml_nb_metrics_noleak",
]


def test_ml_metrics_shape_and_range(spark):
    queries = entrymod.queries()
    for name in ML_METRIC_QUERIES:
        rows = queries[name](spark, SF_DIR).collect()
        assert len(rows) == 1, name
        r = rows[0].asDict()
        assert set(r) == {
            "accuracy",
            "weighted_precision",
            "weighted_recall",
            "weighted_f1",
            "n_test",
        }, name
        for k in ("accuracy", "weighted_precision", "weighted_recall", "weighted_f1"):
            assert 0.0 <= r[k] <= 1.0, (name, k, r[k])
        assert r["n_test"] > 0, name


def test_ml_predictions_deterministic(spark):
    """Same seed → identical predictions across two evaluations."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import ml

    a = sorted(
        tuple(r)
        for r in ml.ml_predictions(spark, SF_DIR, "nb", 0).collect()
    )
    ml._PRED_CACHE.clear()
    b = sorted(
        tuple(r)
        for r in ml.ml_predictions(spark, SF_DIR, "nb", 0).collect()
    )
    assert a == b


def test_ml_split_has_both_labels(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import ml

    preds = ml.ml_predictions(spark, SF_DIR, "nb", 0)
    labels = {r["label"] for r in preds.select("label").distinct().collect()}
    assert labels == {0, 1}


def test_ml_predictions_are_binary(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import ml

    for kind in ("nb", "svm"):
        preds = ml.ml_predictions(spark, SF_DIR, kind, 0)
        vals = {
            r["prediction"]
            for r in preds.select("prediction").distinct().collect()
        }
        assert vals <= {0, 1}, (kind, vals)
