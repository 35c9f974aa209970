"""Raw-probability fidelity mode (VERDICT r2 item 6): on a long doc
the reference's raw double products underflow to 0.0 → Double.compare
tie → NEGATIVE (/root/reference/Hadoop/NB.java:224-250), while the
engine's default log-space path classifies it correctly.  Both
behaviors are asserted on the same synthetic corpus."""

from __future__ import annotations

import pytest

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import nb


LONG_DOC_ID = 1  # %8 = 1 → test split; %2 = 1 → label POSITIVE


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """Training: ids 2..7 (train split, both labels).  Positive docs
    (odd ids) are saturated with 'happy'/'joy'; negative with
    'sad'/'gloom'; filler words pad the vocabulary so every
    p(word|class) ≤ ~0.3.  Test doc 1: 600 positive-leaning tokens —
    log-sum fine, raw product ~1e-400 → underflow."""
    rows = []
    for i in (3, 5, 7):      # label 1 (positive) train docs
        rows.append((i, "happy joy happy joy delight cheer " * 5))
    for i in (2, 4, 6):      # label 0 (negative) train docs
        rows.append((i, "sad gloom sad gloom dread dismay " * 5))
    # shared vocabulary so the test doc's words exist in BOTH classes
    rows.append((10, "happy sad joy gloom common words here"))   # label 0
    rows.append((11, "happy sad joy gloom common words here"))   # label 1
    rows.append((LONG_DOC_ID, "happy joy happy joy happy sad " * 100))
    d = tmp_path_factory.mktemp("fidelity")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_fidelity_underflows_where_logspace_does_not(spark, corpus_dir):
    logspace = {
        r["doc_id"]: r["prediction"]
        for r in nb.nb_predictions(spark, corpus_dir).collect()
    }
    fid = {
        r["doc_id"]: (r["prediction"], r["underflow"])
        for r in nb.nb_predictions_fidelity(spark, corpus_dir).collect()
    }
    # log-space: the 600-token positive-leaning doc classifies POSITIVE
    assert logspace[LONG_DOC_ID] == 1
    # fidelity: both raw products underflowed to 0.0 → tie → NEGATIVE,
    # exactly the reference's behavior on long docs
    assert fid[LONG_DOC_ID] == (0, True)


def test_fidelity_agrees_with_logspace_on_short_docs(spark, corpus_dir):
    """Docs that don't underflow must get the same argmax from both
    scorers (same model, same smoothing — only the arithmetic domain
    differs)."""
    logspace = {
        r["doc_id"]: r["prediction"]
        for r in nb.nb_predictions(spark, corpus_dir).collect()
    }
    for r in nb.nb_predictions_fidelity(spark, corpus_dir).collect():
        if not r["underflow"]:
            assert r["prediction"] == logspace[r["doc_id"]], r


def test_fidelity_scores_underflow_to_exact_zero(spark, corpus_dir):
    s = {
        r["doc_id"]: (r["pos_prob"], r["neg_prob"])
        for r in nb.nb_scores_fidelity(spark, corpus_dir).collect()
    }
    assert s[LONG_DOC_ID] == (0.0, 0.0)
