"""Pipeline-operator invariants: packing respects the token budget
(modulo single oversized docs) and hash sampling is deterministic and
duplicate-consistent."""

from __future__ import annotations

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
    PACK_BUDGET,
    q_pack_sequences,
    q_sample_decile,
)


def test_pack_bins_respect_budget(spark):
    rows = q_pack_sequences(spark, SF_DIR).collect()
    bins: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for r in rows:
        bins.setdefault((r["bucket"], r["bin"]), []).append(
            (r["doc_id"], r["n_tokens"])
        )
    assert len(bins) > 1
    for (bucket, b), docs in bins.items():
        toks = [t for _, t in sorted(docs)]  # packing order = doc_id
        # next-fit: everything before the bin's last doc fits within
        # the budget; only the last doc may spill past it
        assert sum(toks[:-1]) < PACK_BUDGET, (bucket, b, toks)


def test_pack_is_exhaustive_and_unique(spark):
    rows = q_pack_sequences(spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500  # every doc packed once


def test_sample_is_deterministic(spark):
    a = {r["doc_id"] for r in q_sample_decile(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in q_sample_decile(spark, SF_DIR).collect()}
    assert a == b
    assert 0 < len(a) < 500  # nontrivial cut
