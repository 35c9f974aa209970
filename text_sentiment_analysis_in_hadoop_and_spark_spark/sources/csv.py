"""CSV ingestion — fidelity mode (the reference's naive splitter) and
correct mode (a real CSV reader).

The reference parses the Sentiment140 CSV layout
``ItemID, Sentiment, SentimentSource, SentimentText`` with a naive
``split(",")`` plus a re-stitch: if a line has more than 4 fields, the
extra fields (commas inside the tweet text) are appended back onto
column 3 WITHOUT the comma characters —
/root/reference/Spark/NB/src/main/scala/NB.scala:19-32
(``columns(3) += columns(i)``), duplicated in all four Scala apps and
in /root/reference/Hadoop/NB.java:52-61.  Quotes are NOT handled; they
survive into the text and die later in the punctuation regex.

``fidelity_parse`` reproduces that exactly as a pure Column expression
(S3).  ``read_csv_correct`` is the idiomatic path: Spark's CSV reader
with proper quote handling — what a user migrating off the reference
should switch to once they accept the (intended) semantic difference.

Difference vs Java kept in mind: Java's ``split(",")`` drops trailing
empty fields; Spark's keeps them.  Sentiment140 text is never empty,
and the engine only reads fields 0-3 plus the re-stitched tail, so the
distinction is unobservable for the reference layout; documented here
for honesty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SENTIMENT140_COLUMNS = ("item_id", "sentiment", "source", "text")


def fidelity_parse(line: Column) -> list[Column]:
    """S3 — naive comma split + comma-destroying re-stitch, as four
    Column expressions over a raw line."""
    arr = F.split(line, ",")
    n = F.size(arr)
    text = F.when(
        n > 4, F.concat_ws("", F.slice(arr, 4, n - 3))
    ).otherwise(F.element_at(arr, 4))
    return [
        F.element_at(arr, 1).alias("item_id"),
        F.element_at(arr, 2).alias("sentiment"),
        F.element_at(arr, 3).alias("source"),
        text.alias("text"),
    ]


def read_csv_fidelity(spark: SparkSession, path: str) -> DataFrame:
    """Read a Sentiment140-layout CSV the way the reference does."""
    lines = spark.read.text(path)
    return lines.select(*fidelity_parse(F.col("value")))


def read_csv_correct(spark: SparkSession, path: str) -> DataFrame:
    """Idiomatic mode: proper CSV semantics (quoting, embedded commas
    preserved)."""
    return (
        spark.read.option("quote", '"')
        .option("escape", '"')
        .csv(path)
        .toDF(*SENTIMENT140_COLUMNS)
    )


# --------------------------------------------------------------------------
# queries() entry: synthesize CSV-shaped lines from `documents`, then
# fidelity-parse them — oracle-checkable without any extra input file.
# The synthesized text embeds a comma (first space becomes ","), so the
# >4-field re-stitch path is actually exercised.
# --------------------------------------------------------------------------


def _synth_line(df: DataFrame) -> Column:
    noisy_text = F.regexp_replace(F.col("text"), r"^(\w+) ", r"$1,")
    return F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        (F.col("doc_id") % 2).cast("string"),
        F.lit("Sentiment140"),
        noisy_text,
    )


def q_csv_fidelity_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(_synth_line(docs).alias("line"))
    return lines.select(*fidelity_parse(F.col("line")))


_CSV_ORACLE = (
    "WITH lines AS (SELECT doc_id::VARCHAR || ',' || (doc_id % 2)::VARCHAR "
    "|| ',Sentiment140,' || regexp_replace(text, '^(\\w+) ', '\\1,') AS line "
    "FROM documents), "
    "arrs AS (SELECT string_split(line, ',') AS arr FROM lines) "
    "SELECT arr[1] AS item_id, arr[2] AS sentiment, arr[3] AS source, "
    "CASE WHEN len(arr) > 4 "
    "THEN array_to_string(list_slice(arr, 4, len(arr)), '') "
    "ELSE arr[4] END AS text FROM arrs"
)

ORACLES: dict[str, str] = {"csv_fidelity_parse": _CSV_ORACLE}

QUERIES = {"csv_fidelity_parse": q_csv_fidelity_parse}
