"""JSON-lines ingestion — the third source format next to parquet and
CSV (engine extension; the reference is CSV-only, see sources/csv.py).

What a production JSONL front door must get right, and what this
module makes oracle-checkable:

- **Explicit schema, never inference** — `from_json` with a declared
  struct: one JVM-side Jackson pass, no sampling pre-scan of the
  corpus (the same discipline as `events_json_extract`).
- **PERMISSIVE corrupt-record accounting** — crawled JSONL always
  contains broken lines; they must surface in a `_corrupt_record`
  column and be COUNTED, not silently dropped (FAILFAST) or silently
  nulled.  The query injects deterministic corruption (every
  ``doc_id % 13 == 5`` line truncated mid-object) so the corrupt
  branch is load-bearing in the oracle check: a reader that drops or
  mis-tags bad lines diverges from the closed-form corrupt set.

Scale shape: synthesis, parse, and tagging are narrow maps; the only
shuffle is the final lang rollup.  Corrupt lines keep their bytes in
one column for quarantine-sink routing rather than poisoning the
typed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_MOD = 13
CORRUPT_RESIDUE = 5

_JSON_SCHEMA = (
    "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING, "
    "_corrupt_record STRING"
)


def synth_jsonl_lines(docs: DataFrame) -> DataFrame:
    """documents → one JSON text line per doc, with every
    (doc_id % 13 == 5) line truncated mid-object (always invalid: the
    cut lands inside ``{"doc_id":``)."""
    line = F.to_json(F.struct("doc_id", "lang", "n_chars", "text"))
    return docs.select(
        F.when(
            F.col("doc_id") % CORRUPT_MOD == CORRUPT_RESIDUE,
            F.substring(line, 1, 10),
        )
        .otherwise(line)
        .alias("line")
    )


def parse_jsonl(lines: DataFrame) -> DataFrame:
    """line → typed columns + `_corrupt_record` (PERMISSIVE): broken
    lines carry their raw bytes there and NULL everywhere else."""
    parsed = lines.select(
        F.from_json(
            F.col("line"),
            _JSON_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j")
    )
    return parsed.select("j.*")


def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize → parse → per-lang rollup with corrupt accounting
    (corrupt lines group under lang NULL; their raw bytes counted,
    their typed fields excluded from sums)."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    parsed = parse_jsonl(synth_jsonl_lines(docs))
    return parsed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_corrupt"),
    )


ORACLES: dict[str, str] = {
    "jsonl_ingest": (
        "SELECT CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(coalesce(sum(CASE WHEN doc_id % 13 = 5 THEN NULL "
        "ELSE n_chars END), 0) AS BIGINT) AS sum_chars, "
        "CAST(sum(CASE WHEN doc_id % 13 = 5 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_corrupt FROM documents GROUP BY 1"
    ),
}

QUERIES = {
    "jsonl_ingest": q_jsonl_ingest,
}


# --- nested documents: array<struct> round-trip + flatten (r5) --------

_NESTED_SCHEMA = (
    "o BIGINT, items ARRAY<STRUCT<pk BIGINT, qty DOUBLE, price DOUBLE>>"
)


def q_jsonl_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semi-structured shape JSONL actually ships in production:
    one document per ORDER with its line items nested as an array of
    structs — serialized with ``to_json``, parsed back through an
    explicit ``ARRAY<STRUCT>`` schema, flattened with ``explode`` +
    dot-path access, and rolled up.  This is the missing third leg of
    the JSON surface next to flat-object parsing (jsonl_ingest) and
    scalar extraction (events_json_extract): real event/order payloads
    nest, and an engine that can only flatten flat JSON can't ingest
    them.

    Determinism: items sort by (pk, qty, price) before serialization
    so even the intermediate document bytes are reproducible; the
    rollup itself is order-insensitive.  Scale shape: one groupBy to
    nest, narrow serialize/parse/explode maps, one bucket rollup —
    the explode multiplies rows back to lineitem cardinality, never
    beyond."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_partkey").alias("pk"),
                        F.col("l_quantity").alias("qty"),
                        F.col("l_extendedprice").alias("price"),
                    )
                )
            ).alias("items")
        )
    )
    lines = nested.select(F.to_json(F.struct("o", "items")).alias("line"))
    parsed = lines.select(
        F.from_json(F.col("line"), _NESTED_SCHEMA).alias("j")
    ).select("j.*")
    flat = parsed.select(
        "o", F.explode("items").alias("it")
    ).select(
        (F.col("o") % 10).alias("bucket"),
        "o",
        F.col("it.pk").alias("pk"),
        F.col("it.qty").alias("qty"),
    )
    return flat.groupBy("bucket").agg(
        F.countDistinct("o").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_items"),
        F.round(F.sum("qty"), 6).alias("sum_qty"),
        F.sum("pk").cast("long").alias("pk_checksum"),
    )


ORACLES["jsonl_nested_flatten"] = (
    "SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket, "
    "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, "
    "CAST(count(*) AS BIGINT) AS n_items, "
    "round(sum(l_quantity), 6) AS sum_qty, "
    "CAST(sum(l_partkey) AS BIGINT) AS pk_checksum "
    "FROM lineitem GROUP BY 1"
)

QUERIES["jsonl_nested_flatten"] = q_jsonl_nested_flatten
