"""Bucketed tables — the shuffle-elimination knob for repeated
co-located joins (100 TB posture; engine extension, the reference
re-shuffles every job).

Writing both sides of a recurring fact⋈fact join bucketed by the join
key with the SAME bucket count lets Spark's scan report a compatible
``HashPartitioning``: the SortMergeJoin consumes the bucketed layout
directly and the plan contains NO Exchange — the single biggest cost
of a 100 TB join paid once at write time instead of on every query.
``tests/test_bucketing.py`` asserts exactly that plan property.

``sortBy`` on the join key additionally pre-orders rows within each
bucket file so the merge side can skip its Sort at read time (Spark
still inserts a Sort when bucket-sort metadata can't be used; the
Exchange elimination is the guaranteed win).

Tables are written as EXTERNAL (explicit ``path``) so callers control
placement; the catalog entry (in-memory or Hive metastore) carries
the bucketing metadata that the scan needs — a plain
``spark.read.parquet`` of the same files would NOT get bucketed-scan
treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table named ``table``.

    Both sides of a co-located join must use the same ``bucket_cols``
    semantics and the same ``n_buckets``."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (required: the path
    alone carries no bucketing metadata)."""
    return spark.table(table)
