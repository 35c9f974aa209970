"""Span-level dedup stats and the incremental batch probe
(operators/dedup.py): crafted corpora pin the interval-union coverage
math and the batch/index orientation; full value parity is the DuckDB
oracle at sf0.01 (driver + tools/parity.py)."""

from __future__ import annotations

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
    SPAN_K,
    q_incremental,
    q_span_scrub,
    q_span_stats,
)


def _write_docs(spark, tmp_path, rows):
    base = tmp_path / "corpus"
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_span_coverage_interval_union(spark, tmp_path):
    # docs 1/2 share a 12-token run (embedded at different offsets and
    # surrounded by doc-unique tokens); doc 3 shares nothing.  The
    # union of the K-wide windows over the run's 12-K+1 consecutive
    # dup positions must cover exactly the 12 shared tokens.
    run = [f"shared{i}" for i in range(12)]
    d1 = ["a1x", "a2x"] + run + ["a3x", "a4x"]
    d2 = ["b1x"] + run + ["b2x", "b3x", "b4x"]
    d3 = [f"c{i}x" for i in range(16)]
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
    )
    got = {r["doc_id"]: r for r in q_span_stats(spark, sf).collect()}
    assert set(got) == {1, 2, 3}
    for doc_id, toks in ((1, d1), (2, d2)):
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_dup_grams"] == 12 - SPAN_K + 1
        assert r["covered_tokens"] == 12
        assert abs(r["dup_span_frac"] - round(12 / len(toks), 6)) < 1e-9
    assert got[3]["n_dup_grams"] == 0
    assert got[3]["covered_tokens"] == 0
    assert got[3]["dup_span_frac"] == 0.0


def test_span_two_disjoint_runs_sum(spark, tmp_path):
    # two shared runs of 9 tokens separated (in doc 1) by >K unique
    # tokens: coverage adds per-run (9 + 9), never double-counts
    run_a = [f"ra{i}" for i in range(9)]
    run_b = [f"rb{i}" for i in range(9)]
    gap = [f"g{i}x" for i in range(SPAN_K + 2)]
    d1 = run_a + gap + run_b
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(d1)),
            (2, " ".join(run_a)),
            (3, " ".join(run_b)),
        ],
    )
    got = {r["doc_id"]: r for r in q_span_stats(spark, sf).collect()}
    assert got[1]["covered_tokens"] == 18
    assert got[1]["n_dup_grams"] == 2 * (9 - SPAN_K + 1)
    # the whole of docs 2 and 3 is duplicated material
    assert got[2]["covered_tokens"] == 9
    assert got[3]["covered_tokens"] == 9


def test_span_scrub_canonical_keeps_copy_empties(spark, tmp_path):
    # doc 1 and doc 2 are byte-identical; doc 3 is novel.  The
    # canonical owner (min doc_id) survives verbatim, the re-crawl
    # scrubs to empty, the novel doc is untouched.
    words = [f"w{i:02d}" for i in range(30)]
    base = " ".join(words)
    novel = " ".join(f"n{i}x" for i in range(20))
    sf = _write_docs(spark, tmp_path, [(1, base), (2, base), (3, novel)])
    got = {r["doc_id"]: r for r in q_span_scrub(spark, sf).collect()}
    assert got[1]["scrubbed_text"] == base
    assert got[1]["n_kept_tokens"] == 30
    assert got[2]["scrubbed_text"] == ""
    assert got[2]["n_kept_tokens"] == 0
    assert got[3]["scrubbed_text"] == novel


def test_span_scrub_near_dup_keeps_novel_context(spark, tmp_path):
    # doc 2 differs from doc 1 at position 15 only: after scrubbing,
    # doc 2 keeps exactly the tokens no duplicated gram covers — the
    # changed token plus the sub-K flanks reachable only through it.
    words = [f"w{i:02d}" for i in range(40)]
    changed = ["CHANGED" if i == 15 else w for i, w in enumerate(words)]
    sf = _write_docs(
        spark, tmp_path, [(1, " ".join(words)), (2, " ".join(changed))]
    )
    got = {r["doc_id"]: r for r in q_span_scrub(spark, sf).collect()}
    assert got[1]["scrubbed_text"] == " ".join(words)
    kept = got[2]["scrubbed_text"].split(" ")
    assert "CHANGED" in kept
    # dup grams of doc 2 start at 0..15-K and 16..40-K; their interval
    # union covers [0, 15) and [16, 40) exactly → only CHANGED survives
    assert kept == ["CHANGED"]


def test_incremental_probe_orientation(spark, tmp_path):
    # batch = doc_id % 10 == 0.  doc 10 is an exact re-crawl of index
    # doc 3; doc 20 is a near-dup of index doc 7; doc 30 is novel.
    # Index-side near-dups of each other (3 vs 7 differ) must NOT
    # appear — only batch docs are probed.
    words = [f"w{i:02d}" for i in range(60)]
    base = " ".join(words)
    neardup = " ".join(["xchg" if i == 30 else w for i, w in enumerate(words)])
    novel = " ".join(f"z{i}y" for i in range(40))
    other = " ".join(f"q{i}y" for i in range(40))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (3, base),
            (7, neardup),
            (8, other),
            (10, base),
            (20, neardup),
            (30, novel),
        ],
    )
    got = {r["doc_id"]: r for r in q_incremental(spark, sf).collect()}
    # every reported doc is a batch doc
    assert all(doc_id % 10 == 0 for doc_id in got)
    # exact re-crawl: best match is its original at jaccard 1
    assert got[10]["dup_of"] == 3
    assert got[10]["jaccard"] == 1.0
    # near-dup: matched to SOME index doc above threshold (3 and 7 are
    # mutual near-dups, so the best match just has to be one of them)
    assert got[20]["dup_of"] in (3, 7)
    assert got[20]["jaccard"] >= 0.5
    # novel batch doc admits (absent); index docs never probed
    assert 30 not in got
