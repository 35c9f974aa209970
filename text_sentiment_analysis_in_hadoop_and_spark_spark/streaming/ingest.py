"""Streaming incremental dedup — the daily-ingest landing zone probed
against the persisted corpus index, as an unbounded stream (EXTENSION;
the reference has no streaming, SURVEY §2.7).

This is the stream twin of ``operators/dedup.py:q_incremental``: new
documents land as parquet files; each micro-batch MinHash-bands the
arrivals, probes the STATIC banded-signature index of the existing
corpus (band-key equi-join, index-side hot buckets capped exactly like
the batch path), exact-Jaccard-verifies the candidates, and emits the
ADMIT set (arrivals with no index match at the duplicate threshold).

Why ``foreachBatch`` and not a stateful stream: the index is a big
SLOWLY-CHANGING table, not stream state — per micro-batch we want the
full batch DataFrame machinery (the banded self-join, the hot-bucket
cap, the verify join) against a table that a production pipeline
updates between batches.  The stream therefore carries ZERO streaming
state (no watermark, no state store); each batch is an independent
batch-mode probe, which also makes replays idempotent per batch
(admits are a pure function of the batch files + index snapshot).

At 100 TB the index is the partitioned signature table on storage; a
micro-batch probes only its own band keys against it — the probe
shuffle is O(batch), never O(index)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    BATCH_MOD,
    HOT_BUCKET_CAP,
    JACCARD_DUP_MIN,
    _banded_cached,
    banded_long,
    banded_signatures,
    doc_shingles,
    minhash_signatures,
    verify_jaccard,
)


def probe_batch_against_index(
    spark: SparkSession, batch_docs: DataFrame, sf_dir: str
) -> DataFrame:
    """ADMIT set of one arrival batch: (doc_id) rows for batch docs
    whose best index match is below the duplicate threshold.  Pure
    batch logic — shared verbatim by the stream wrapper below and
    testable standalone.

    The verify stage takes the arrival side's shingles from the BATCH
    text (not the corpus documents table): a production arrival's
    doc_id need not exist in the corpus, and corpus-keyed shingle
    lookup would silently drop all its candidate pairs and admit an
    exact duplicate (ADVICE r4)."""
    batch_shingles = doc_shingles(batch_docs.select("doc_id", "text"))
    sigs = banded_signatures(minhash_signatures(batch_shingles))
    b_long = banded_long(sigs).select(
        F.col("doc_id").alias("doc_a"), "bi", "bk"
    )
    # the persisted index = every doc OUTSIDE the arrival decile (the
    # same index definition as the batch q_incremental, so stream ≡
    # batch is checkable end-to-end)
    i_long = banded_long(_banded_cached(spark, sf_dir)).filter(
        F.col("doc_id") % BATCH_MOD != 0
    )
    hot = (
        i_long.groupBy("bi", "bk")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > HOT_BUCKET_CAP)
        .select("bi", "bk")
    )
    pairs = (
        b_long.join(F.broadcast(hot), ["bi", "bk"], "left_anti")
        .join(
            i_long.select(F.col("doc_id").alias("doc_b"), "bi", "bk"),
            ["bi", "bk"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    matched = (
        verify_jaccard(spark, sf_dir, pairs, shingles_a=batch_shingles)
        .filter(F.col("jaccard") >= JACCARD_DUP_MIN)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return batch_docs.select("doc_id").join(matched, "doc_id", "left_anti")


def admit_stream(
    spark: SparkSession,
    landing_dir: str,
    sf_dir: str,
    sink: Callable[[DataFrame, int], None],
):
    """Start the landing-zone stream: parquet files of new documents
    arrive in ``landing_dir``; each micro-batch's admit set is handed
    to ``sink(admits_df, batch_id)``.  Returns the StreamingQuery."""
    schema = "doc_id LONG, text STRING"

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(probe_batch_against_index(spark, batch_df, sf_dir), batch_id)

    return (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(_on_batch)
        .outputMode("append")
        .start()
    )


ORACLES: dict[str, str] = {}
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
