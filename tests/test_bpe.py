"""BPE merge training semantics (operators/bpe.py): the canonical
Sennrich low/lower/newest/widest corpus has a hand-computable merge
sequence; apply side must reconstruct exact segmentations; reruns are
deterministic (the rows-only contract's pin)."""

from __future__ import annotations

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.bpe import (
    apply_merges,
    train_bpe,
)


def _docs(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")


def test_golden_merge_sequence(spark):
    docs = _docs(
        spark, "low low low low low lower lower newest newest newest widest"
    )
    merges = [
        (m["left"], m["right"], m["pair_count"])
        for m in train_bpe(docs.select("text"), 6)
    ]
    # hand-computed: l·o appears in low(5)+lower(2)=7, then lo·w 7,
    # low·</w> 5, then the est family from newest(3)+widest(1)
    assert merges == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("low", "</w>", 5),
        ("e", "s", 4),
        ("es", "t", 4),
        ("est", "</w>", 4),
    ]


def test_apply_reconstructs_token_counts(spark):
    docs = _docs(spark, "low low lower")
    merges = train_bpe(docs.select("text"), 3)
    # merges: l+o (3), lo+w (3), low+</w> (2)
    out = apply_merges(docs, merges).collect()[0]
    assert out["n_words"] == 3
    # low → [low</w>] ×2 (1 sym), lower → [low, e, r, </w>] (4 syms)
    assert out["n_bpe_tokens"] == 2 * 1 + 4


def test_training_is_deterministic(spark):
    sf = "/root/testdata/sf0.001"
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.bpe import (
        q_bpe_merges,
    )

    a = [tuple(r) for r in q_bpe_merges(spark, sf).collect()]
    b = [tuple(r) for r in q_bpe_merges(spark, sf).collect()]
    assert a == b and len(a) > 0


def test_sampled_trainer_mod1_is_identical_to_full(spark):
    """sample_mod=1 keeps every doc, so the sampled trainer must
    reduce EXACTLY to the full trainer — the identity that pins the
    sampling layer as pure input selection, not a different
    algorithm."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.bpe import (
        train_bpe_sampled,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low low low lower", "newest newest widest", "low newest"]
        )],
        "doc_id BIGINT, text STRING",
    ).select("text")
    full = train_bpe(docs, 5)
    sampled = train_bpe_sampled(docs, 5, sample_mod=1)
    assert sampled == full and len(full) > 0


def test_sampled_tokenizer_compression_tracks_full(spark):
    """The production pairing: sample-trained merges applied to the
    FULL corpus.  On the testdata the sampled tokenizer's overall
    compression (bpe tokens per word) must stay within 20% of the
    full-trained tokenizer's — the transfer property that justifies
    sampling at scale; also pins determinism of the sampled path."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.bpe import (
        q_bpe_merges_sampled,
        q_bpe_tokenize,
        q_bpe_tokenize_sampled,
    )

    sf = "/root/testdata/sf0.001"

    def ratio(df):
        r = df.agg(
            F.sum("n_bpe_tokens").alias("t"), F.sum("n_words").alias("w")
        ).collect()[0]
        return r["t"] / r["w"]

    r_full = ratio(q_bpe_tokenize(spark, sf))
    r_sampled = ratio(q_bpe_tokenize_sampled(spark, sf))
    assert abs(r_sampled - r_full) / r_full < 0.20, (r_sampled, r_full)

    a = [tuple(r) for r in q_bpe_merges_sampled(spark, sf).collect()]
    b = [tuple(r) for r in q_bpe_merges_sampled(spark, sf).collect()]
    assert a == b and len(a) > 0
