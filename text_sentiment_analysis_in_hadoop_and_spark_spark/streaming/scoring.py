"""Streaming Naive Bayes scoring — train in batch, classify a
document STREAM (the extension SURVEY §7 M5 sketches: "scoring a
tweet stream with a trained model").  The reference is batch-only.

Shape: the batch-trained model (operators/nb.py — log-likelihood per
word) is the STATIC side of a stream-static broadcast join; the
document stream is cleaned and tokenized with the exact same Column
expression chain as batch (one declaration, two runners), then
per-doc log-sums and the argmax produce streaming predictions.

Semantics note (documented divergence of the stream variant): docs
with no in-vocabulary token after cleaning produce no rows out of
the inner join, so — unlike the batch path, which scores them
prior-only via a left join — they are absent from the stream output.
tests/test_stream_scoring.py compares the streamed predictions to
the batch predictions on exactly the docs the stream emits.

Scale: the model broadcast is renewed per micro-batch (cheap — it is
a small table); state is the per-doc partial sums of the current
micro-batches, bounded by watermarking ingestion in production (the
demo uses complete mode over a finite landing zone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_text, explode_tokens, nonempty
from ..operators import nb


def score_stream(
    spark: SparkSession, docs_dir: str, model_sf_dir: str
) -> DataFrame:
    """Stream predictions (doc_id, prediction) for parquet documents
    arriving in ``docs_dir``, using the model trained in batch from
    ``model_sf_dir``."""
    model, stats = nb.nb_model(spark, model_sf_dir)
    prior_pos = F.log(F.lit(stats["pos_tweets"] / stats["tweets"]))
    prior_neg = F.log(F.lit(stats["neg_tweets"] / stats["tweets"]))

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    docs = stream.select(
        "doc_id", clean_text(F.col("text")).alias("text")
    ).filter(nonempty(F.col("text")))
    tokens = docs.select("doc_id", explode_tokens(F.col("text")).alias("word"))
    scored = (
        tokens.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(F.sum("lpw_pos").alias("s_pos"), F.sum("lpw_neg").alias("s_neg"))
    )
    return scored.select(
        "doc_id",
        F.when(
            prior_pos + F.col("s_pos") > prior_neg + F.col("s_neg"), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("prediction"),
    )
