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


# Golden metric values (r7 verdict item 3): the ml_* surface is
# rows-only (hash-dependent featurization), so shape/determinism tests
# alone would let an MLlib upgrade or featurizer drift change results
# SILENTLY.  These exact values were recorded on pyspark 4.1.2 with
# seed 1234 (NB.scala:83 semantics) over the driver's fixed testdata;
# any engine/behavior change must fail here loudly and be re-pinned
# deliberately.  Values are rounded to 6 dp — the same precision every
# oracle-checked double in the repo ships at.
ML_GOLDENS = {
    "/root/testdata/sf0.001": {
        "ml_nb_metrics": (0.477941, 0.228428, 0.477941, 0.309116, 136),
        "ml_modified_nb_metrics": (0.477941, 0.228428, 0.477941, 0.309116, 136),
        "ml_svm_metrics": (0.492647, 0.488665, 0.492647, 0.487436, 136),
        "ml_modified_svm_metrics": (0.492647, 0.488665, 0.492647, 0.487436, 136),
        "ml_nb_metrics_noleak": (0.477941, 0.228428, 0.477941, 0.309116, 136),
    },
    "/root/testdata/sf0.01": {
        "ml_nb_metrics": (0.485294, 0.519595, 0.485294, 0.368949, 136),
        "ml_modified_nb_metrics": (0.485294, 0.519595, 0.485294, 0.368949, 136),
        "ml_svm_metrics": (0.558824, 0.574517, 0.558824, 0.548336, 136),
        "ml_modified_svm_metrics": (0.558824, 0.574517, 0.558824, 0.548336, 136),
        "ml_nb_metrics_noleak": (0.485294, 0.528027, 0.485294, 0.359033, 136),
    },
}

_METRIC_COLS = (
    "accuracy",
    "weighted_precision",
    "weighted_recall",
    "weighted_f1",
    "n_test",
)


def test_ml_metric_goldens():
    """Exact metric values at BOTH small SFs — the loud-failure pin the
    r7 verdict asked for.  Runs in its own Spark-default session shape
    via the shared fixture-less path so cached predictions from other
    tests can't mask a recompute difference."""
    import pytest

    from text_sentiment_analysis_in_hadoop_and_spark_spark.session import get_spark

    spark = get_spark("ml_goldens_test")
    queries = entrymod.queries()
    for sf_dir, goldens in ML_GOLDENS.items():
        for name, want in goldens.items():
            rows = queries[name](spark, sf_dir).collect()
            assert len(rows) == 1, (sf_dir, name)
            r = rows[0].asDict()
            got = tuple(
                round(r[c], 6) if isinstance(r[c], float) else r[c]
                for c in _METRIC_COLS
            )
            assert got == pytest.approx(want, abs=1e-6), (sf_dir, name)


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
