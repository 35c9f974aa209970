"""Console report sink (S8): formatted output matches the metric
queries it wraps."""

from __future__ import annotations

import io

from conftest import SF_DIR


def test_classification_report_matches_queries(spark):
    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.report import (
        classification_report,
    )

    buf = io.StringIO()
    rep = classification_report(spark, SF_DIR, flavor="nb", out=buf)
    text = buf.getvalue()
    assert "CONFUSION MATRIX" in text and "ACCURACY" in text

    conf = {
        (r["label"], r["prediction"]): r["n"]
        for r in entrymod.queries()["nb_confusion"](spark, SF_DIR).collect()
    }
    assert rep["tp"] == conf.get((1, 1), 0)
    assert rep["tn"] == conf.get((0, 0), 0)

    acc = entrymod.queries()["nb_accuracy"](spark, SF_DIR).collect()[0]
    assert rep["accuracy"] == acc["accuracy"]
