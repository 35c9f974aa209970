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


def test_qlm_smoothing_scores_all_docs_and_prefers_matches(spark, tmp_path):
    """Dirichlet QLM (text_qlm_topk): every corpus doc gets a score
    (background smoothing — absent terms still carry μ·P(t|C) mass),
    matched docs outrank unmatched ones, and at equal tf the shorter
    doc wins the length penalty."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.retrieval import (
        q_qlm_topk,
    )

    rows = [
        (0, "zebra"),
        (10, "zebra cat"),
        (11, "zebra cat cat cat cat cat"),
        (12, "cat dog"),
    ]
    d = tmp_path / "qlm"
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
    out = {
        (r["q_id"], r["doc_id"]): (r["score"], r["rk"])
        for r in q_qlm_topk(spark, str(d)).collect()
    }
    q0 = {doc: v for (q, doc), v in out.items() if q == 0}
    # smoothing: the no-match doc 12 is still scored and retrieved
    assert set(q0) == {10, 11, 12}
    # the short matched doc wins outright
    assert q0[10][1] == 1
    assert q0[10][0] > q0[11][0] and q0[10][0] > q0[12][0]
    # μ-dominance: at tf=1 the Dirichlet length penalty (−ln(dl+μ))
    # outweighs the match bonus (ln(1+tf/(μ·P))), so the SHORT
    # unmatched doc 12 (dl=2) outranks the LONG matched doc 11 (dl=6)
    # — the smoothing behavior that distinguishes QLM from BM25,
    # where an unmatched doc scores exactly zero
    assert q0[12][0] > q0[11][0]
    # no query doc leaks into any result list
    assert all(doc >= 8 for (_, doc) in out)


def test_qlm_plan_is_candidate_bounded(spark):
    """r6 verdict item 6: the QLM dense arm must never materialize
    docs×queries.  The plan's shape is pinned instead of the old
    full cross join: one global k-smallest-(dl, doc_id) pass
    (TakeOrderedAndProject) supplies every query's unmatched
    candidates, unioned with the matched pairs."""
    from tests.conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.retrieval import (
        q_qlm_topk,
    )

    plan = (
        q_qlm_topk(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Union" in plan
