"""TF-IDF feature-selection chain (Modified_NB path) — unit semantics
plus an sf0.001 oracle-parity smoke on the end-to-end queries.

Reference semantics under test (/root/reference/Hadoop/Modified_NB.java):
- integer-division IDF: ln(floor(N / df))          :224-233
- per-doc keep floor(n*75/100), at least 1          :273-298
- reassembly ordered by ascending TF-IDF            :311-318
"""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR

SMOKE_QUERIES = [
    "tfidf_scores",
    "tfidf_featsel",
    "tfidf_featsel_docs",
    "tfidf_nb_confusion",
    "tfidf_nb_accuracy",
]


def test_tfidf_oracle_parity_smoke(spark, duck):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = {}
    for name in SMOKE_QUERIES:
        df = queries[name](spark, SF_DIR)
        res = duck.execute(oracles[name])
        errs = compare(
            name, df, res.fetchall(), [d[0] for d in res.description]
        )
        if errs:
            failures[name] = errs
    assert not failures, failures


def test_int_division_idf(spark):
    """Any word present in > N/2 train docs must get tfidf exactly 0
    (ln(floor(N/df)) = ln(1) = 0) — the reference's Java int-division
    quirk, Modified_NB.java:230."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import tfidf

    kept = tfidf.q_tfidf(spark, SF_DIR)
    n = (
        entrymod.queries()["nb_corpus_stats"](spark, SF_DIR)
        .collect()[0]["tweets"]
    )
    df_rows = tfidf.q_df(spark, SF_DIR).collect()
    common = {r["word"] for r in df_rows if r["df"] > n / 2}
    assert common, "fixture should contain at least one very common word"
    scored = {r["word"]: r["tfidf"] for r in kept.collect() if r["word"] in common}
    assert scored and all(v == 0.0 for v in scored.values())


def test_featsel_keeps_75pct_floor_min1(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import tfidf

    wc = tfidf.train_wordcount(spark, SF_DIR)
    n_words = {
        r["doc_id"]: r["n"]
        for r in wc.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    kept, _ = tfidf.featsel(spark, SF_DIR)
    kept_n = {
        r["doc_id"]: r["n"]
        for r in kept.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert set(kept_n) == set(n_words)
    for doc, n in n_words.items():
        expect = math.floor(n * 75 / 100) if n > 1 else 1
        assert kept_n[doc] == max(expect, 1), (doc, n, kept_n[doc])


def test_featsel_docs_ascending_tfidf_order(spark):
    """W2: reassembled text lists kept words lowest-TF-IDF first."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import tfidf

    kept, _ = tfidf.featsel(spark, SF_DIR)
    rows = kept.orderBy("doc_id", "rn").collect()
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["word"])
    docs = {
        r["doc_id"]: r["text"]
        for r in tfidf.q_featsel_docs(spark, SF_DIR).collect()
    }
    for doc_id, words_desc in by_doc.items():
        assert docs[doc_id] == " ".join(reversed(words_desc))
