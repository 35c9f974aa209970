"""Training-data pipeline operators: deterministic sampling and
sequence packing (engine extensions; the reference has neither).

Both are the reproducibility-first variants a 100 TB corpus needs:

- **Hash sampling** replaces RNG sampling: membership is a pure
  function of content, so the sample is identical across runs,
  engines, partitionings and retries, exact duplicates land on the
  same side of the cut (no train/eval leakage between copies), and
  rates compose (a 1/100 sample is a subset of the 1/10 sample when
  rates are nested powers).
- **Sequence packing** bins documents into fixed token-budget groups
  (the "pack short docs into one context window" step of LLM
  training).  A single global greedy pack is inherently sequential,
  so the scalable form shards docs into hash buckets and packs each
  bucket independently with a per-bucket running token count — the
  windows are bucket-partitioned (bounded, parallel), never global.
  Packing quality is unaffected: any partition of docs into
  independent streams packs as well as one stream under next-fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hex32, hex32_sql
from ..sources.tables import load_table

SAMPLE_MOD = 10        # keep hash % 10 == 0  →  ~10% sample
PACK_BUDGET = 512      # token budget per packed sequence
PACK_BUCKETS = 32      # independent packing streams (≈ cluster cores)


def q_sample_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample by content hash — narrow map, the
    filter reaches the scan, zero RNG state to manage."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        hex32(F.col("text")) % SAMPLE_MOD == 0
    ).select("doc_id")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing: per hash bucket, docs (in doc_id order)
    accumulate whitespace-token counts; a doc's bin is the budget
    quotient of the tokens packed BEFORE it — docs stream into a bin
    until the budget spills into the next.  Output is the packing
    manifest (doc → bucket, bin) a sequence-builder job would join
    back to the text."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % PACK_BUCKETS).cast("long").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return docs.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET)
        .cast("long")
        .alias("bin"),
    )


ORACLES: dict[str, str] = {
    "pipe_sample_decile": (
        f"SELECT doc_id FROM documents WHERE {hex32_sql('text')} % {SAMPLE_MOD} = 0"
    ),
    "pipe_pack_sequences": (
        "WITH sized AS (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        f"CAST(doc_id % {PACK_BUCKETS} AS BIGINT) AS bucket FROM documents) "
        "SELECT doc_id, bucket, n_tokens, "
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) "
        f"/ {PACK_BUDGET}) AS BIGINT) AS bin FROM sized"
    ),
}

QUERIES = {
    "pipe_sample_decile": q_sample_decile,
    "pipe_pack_sequences": q_pack_sequences,
}
