"""Train/test-split invariants — the bug class already fixed once in
e297347 (a %4 split silently yields a single-label test set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.common import (
    labeled_docs,
    train_filter,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.common import (
    test_filter as _test_split_filter,  # aliased: pytest must not collect it
)

from conftest import SF_DIR


def test_both_labels_in_both_splits(spark):
    docs = labeled_docs(spark, SF_DIR)
    for name, flt in (("train", train_filter()), ("test", _test_split_filter())):
        labels = {
            r["label"]
            for r in docs.filter(flt).select("label").distinct().collect()
        }
        assert labels == {0, 1}, f"{name} split has labels {labels}"


def test_split_is_partition_and_75_25(spark):
    docs = labeled_docs(spark, SF_DIR)
    n = docs.count()
    n_train = docs.filter(train_filter()).count()
    n_test = docs.filter(_test_split_filter()).count()
    assert n_train + n_test == n
    assert 0.6 <= n_train / n <= 0.9  # 6/8 residues ≈ 75%


def test_filters_are_complementary(spark):
    docs = labeled_docs(spark, SF_DIR)
    both = docs.filter(train_filter() & _test_split_filter()).count()
    assert both == 0
