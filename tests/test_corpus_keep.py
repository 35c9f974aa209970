"""The generic connected_components operator and the end-to-end
corpus keep-list (operators/dedup.py).

connected_components is pair-family agnostic — these tests drive it
with a hand-built edge table (no LSH involved), pinning multi-hop
transitivity and singleton exclusion.  q_corpus_keep's three gates
(repetition pass ∧ exact-canonical ∧ cluster-canonical) are pinned on
a corpus crafted to trip each gate independently; full value parity
is the recursive-CTE oracle at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
    connected_components,
    q_corpus_keep,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.quality import (
    q_repetition,
)


def test_connected_components_generic_pairs(spark):
    # path 1-2-3-4 (diameter 3, needs >1 propagation round) plus the
    # disjoint pair 10-11; node 99 appears in no pair → not labeled
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (11, 10)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    got = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_corpus_keep_each_gate_fires(spark, tmp_path):
    words = [f"w{i:02d}" for i in range(60)]
    clean = " ".join(words)
    neardup = " ".join(["xchg1" if i == 5 else w for i, w in enumerate(words)])
    # 30 repeats of one token: adj_repeat_frac ≈ 1 → repetition gate drops
    spam = " ".join(["loop"] * 30)
    other = " ".join(f"zz{i}" for i in range(30))

    rows = [
        (1, clean),      # kept: canonical everywhere, passes gate
        (2, clean),      # dropped: exact duplicate of 1 (min doc_id loses it)
        (3, neardup),    # dropped: near-dup cluster canonical is doc 1
        (4, spam),       # dropped: repetition gate
        (5, other),      # kept: singleton, passes gate
    ]
    base = tmp_path / "keep"
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(base / "documents.parquet"))
    sf = str(base)

    # premise: the repetition gate really fires on doc 4 only
    gate = {
        r["doc_id"]: r["keep"] for r in q_repetition(spark, sf).collect()
    }
    assert gate == {1: True, 2: True, 3: True, 4: False, 5: True}

    kept = sorted(r["doc_id"] for r in q_corpus_keep(spark, sf).collect())
    assert kept == [1, 5]


def test_corpus_keep_idempotent(spark, tmp_path):
    # running the pipeline on its own output keeps everything: the
    # kept set contains no duplicate content, no near-dup non-canonical,
    # no gate failure — so a second pass is the identity
    words = [f"w{i:02d}" for i in range(60)]
    rows = [
        (1, " ".join(words)),
        (2, " ".join(words)),
        (5, " ".join(f"zz{i}" for i in range(30))),
    ]
    base = tmp_path / "keep1"
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(base / "documents.parquet"))
    kept1 = q_corpus_keep(spark, str(base))

    base2 = tmp_path / "keep2"
    docs = spark.read.parquet(str(base / "documents.parquet"))
    docs.join(kept1, "doc_id", "left_semi").coalesce(1).write.parquet(
        str(base2 / "documents.parquet")
    )
    kept2 = sorted(
        r["doc_id"] for r in q_corpus_keep(spark, str(base2)).collect()
    )
    assert kept2 == sorted(r["doc_id"] for r in kept1.collect())
