"""BM25 retrieval semantics (operators/retrieval.py) on a planted
corpus: rare-term matches outrank common-term matches; self/query
docs excluded."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.retrieval import (
    q_bm25_topk,
)


def test_rare_term_outranks_common(spark, tmp_path):
    rows = [
        # query docs are doc_id < 8; doc 0 searches "zebra stripes"
        (0, "zebra stripes"),
        (1, "nothing here"),
        # corpus: doc 10 has the rare term (df=2: query + itself);
        # "stripes" is common (df=5) so its idf is much lower
        (10, "the zebra runs far"),
        (11, "stripes stripes on shirts"),
        (12, "plain stripes words only"),
        (13, "the stripes the stripes"),
    ]
    d = tmp_path / "bm"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    out = [
        (r["q_id"], r["doc_id"], r["rk"])
        for r in q_bm25_topk(spark, str(d)).collect()
    ]
    q0_docs = {doc for q, doc, rk in out if q == 0}
    # every term-matching doc retrieved; no query doc ever appears
    assert q0_docs == {10, 11, 12, 13}
    assert all(doc >= 8 for _, doc, _ in out)
    # doc 10 (rare "zebra", idf high) must outrank doc 11 (common-ish
    # "stripes" repeated): rank 1 for doc 10
    top = [doc for q, doc, rk in out if q == 0 and rk == 1]
    assert top == [10]
