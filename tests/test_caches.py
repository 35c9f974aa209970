"""Cache eviction (ADVICE r2): memoized .cache()'d plans must be
releasable per sf_dir so long-lived sessions don't leak storage."""

from __future__ import annotations

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    common,
    nb,
)


def test_clear_caches_evicts_and_unpersists(spark):
    nb.nb_model(spark, SF_DIR)  # populates docs + model caches
    key = (spark.sparkContext.applicationId, SF_DIR)
    assert key in common._DOCS_CACHE
    assert key in nb._MODEL_CACHE
    cached_docs = common._DOCS_CACHE[key]

    common.clear_caches(sf_dir="/some/other/dir")  # no-op for SF_DIR
    assert key in common._DOCS_CACHE

    common.clear_caches(sf_dir=SF_DIR)
    assert key not in common._DOCS_CACHE
    assert key not in nb._MODEL_CACHE
    assert not cached_docs.storageLevel.useMemory  # unpersisted

    # engine still works after eviction (repopulates)
    assert nb.nb_model(spark, SF_DIR)[1]["tweets"] > 0
    common.clear_caches()  # wholesale clear also succeeds
    assert not common._DOCS_CACHE
