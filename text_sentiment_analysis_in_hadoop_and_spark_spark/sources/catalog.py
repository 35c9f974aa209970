"""Catalog surface: partitioned tables + partition pruning (engine
extension; the reference ships ``spark-hive`` only as a commented-out
dependency — Spark/NB/build.sbt:14 — so its jobs re-scan flat files
every run.  A 100 TB warehouse instead registers PARTITIONED tables
and lets the planner prune directories before any IO).

``orders`` persists once as an external parquet table partitioned by
order YEAR; the registered query filters one year and the scan then
touches exactly ONE partition directory — ``PartitionFilters`` in the
plan, pinned by ``tests/test_catalog.py``.  The DuckDB oracle
computes the same aggregate from the raw (unpartitioned) parquet, so
the layout must be invisible to results, like the bucketed twin in
``bucketing.py``.

Scale notes: partition pruning happens at PLANNING time against
catalog/file-listing metadata — the pruned year never produces a scan
task, which at 100 TB is the difference between reading ~15 TB (one
year of seven) and all of it.  The partition column is a derived
year so partition count stays bounded (single-digit dirs here;
date-grain partitioning of a multi-year fact would create the classic
small-files problem).
"""

from __future__ import annotations

import os as _os
import re as _re
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

PRUNE_YEAR = 1997


def _tag(sf_dir: str) -> str:
    return _re.sub(
        r"[^0-9A-Za-z]", "_", _os.path.basename(_os.path.normpath(sf_dir))
    )


def ensure_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per session/sf) the year-partitioned external
    orders table; clears a stale location left by a previous session
    (in-memory catalog forgets tables, files survive)."""
    t = f"tsa_orders_by_year_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(t):
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
            "file:"
        )
        path = _os.path.join(wh, t)
        if _os.path.exists(path):
            _shutil.rmtree(path, ignore_errors=True)
        (
            load_table(spark, sf_dir, "orders")
            .withColumn(
                "o_year", F.year("o_orderdate").cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("o_year")
            .option("path", path)
            .format("parquet")
            .saveAsTable(t)
        )
    return t


def q_catalog_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly order volume for ONE year, read through the
    partitioned catalog table — the filter prunes every other year's
    directory at planning time (plan shows
    ``PartitionFilters: [isnotnull(o_year), (o_year = 1997)]``)."""
    t = ensure_partitioned_orders(spark, sf_dir)
    o = spark.table(t).filter(F.col("o_year") == PRUNE_YEAR)
    return o.groupBy(
        F.month("o_orderdate").cast("int").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


def ensure_managed_customers(spark: SparkSession, sf_dir: str) -> str:
    """MANAGED twin of the external table above (r6 verdict item 7):
    no ``path`` option, so the table lives wherever the session
    catalog's warehouse puts it and is owned by the metastore — the
    ``spark-hive`` capability the reference left commented out
    (/root/reference/Spark/NB/build.sbt:14).  Partitioned by market
    segment (5 values — bounded partition count); pruning must be
    proven through ``spark.table`` + catalog API alone, no file paths
    anywhere in the consumer."""
    t = f"tsa_customer_by_segment_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(t):
        # a stale managed LOCATION from a previous session breaks
        # saveAsTable (in-memory catalog forgets tables, files
        # survive) — drop through the catalog first, then scrub
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
            "file:"
        )
        stale = _os.path.join(wh, t)
        if _os.path.exists(stale):
            _shutil.rmtree(stale, ignore_errors=True)
        (
            load_table(spark, sf_dir, "customer")
            .write.mode("overwrite")
            .partitionBy("c_mktsegment")
            .format("parquet")
            .saveAsTable(t)
        )
    return t


PRUNE_SEGMENT = "BUILDING"


def q_catalog_managed_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-nation customer count + balance for ONE market segment,
    read through a MANAGED partitioned table: the segment filter
    prunes 4 of 5 partition directories at planning time (plan shows
    ``PartitionFilters: [... (c_mktsegment = BUILDING)]``), proving
    the metastore path end-to-end — create via ``saveAsTable``,
    discover via ``spark.catalog``, read via ``spark.table``."""
    t = ensure_managed_customers(spark, sf_dir)
    c = spark.table(t).filter(
        F.col("c_mktsegment") == PRUNE_SEGMENT
    )
    return c.groupBy(F.col("c_nationkey").cast("long").alias("nationkey")).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )


ORACLES = {
    "catalog_managed_pruning": (
        "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, "
        "CAST(count(*) AS BIGINT) AS n_customers, "
        "CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS acctbal_cents FROM customer "
        f"WHERE c_mktsegment = '{PRUNE_SEGMENT}' "
        "GROUP BY c_nationkey"
    ),
    "catalog_partition_pruning": (
        "SELECT CAST(month(o_orderdate) AS INTEGER) AS month, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS total_cents FROM orders "
        f"WHERE year(o_orderdate) = {PRUNE_YEAR} "
        "GROUP BY month(o_orderdate)"
    )
}

QUERIES = {
    "catalog_partition_pruning": q_catalog_partition_pruning,
    "catalog_managed_pruning": q_catalog_managed_pruning,
}

# bench bills the one-off partitioned writes as layout-build entries
BENCH_PREPARE = {
    "catalog_partition_build": lambda spark, sf_dir: (
        ensure_partitioned_orders(spark, sf_dir)
    ),
    "catalog_managed_build": lambda spark, sf_dir: (
        ensure_managed_customers(spark, sf_dir)
    ),
}
