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


# --- ANALYZE-style column stats + join-strategy advisory (r10) --------
#
# The catalog's other half: partition pruning needs the LAYOUT in the
# catalog; the cost-based optimizer needs COLUMN STATISTICS.  This is
# the engine's `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
# pass, distilled to the three numbers join planning runs on — row
# count, join-key NDV, and key null fraction — plus the advisory the
# planner derives: the classic System-R equi-join cardinality estimate
#
#     |A ⋈ B| ≈ |A|·|B| / max(ndv_A(key), ndv_B(key))
#
# and the broadcast-vs-shuffle call for the build side (Spark's own
# autoBroadcastJoinThreshold decision, expressed in rows here so the
# oracle can replicate it exactly).  One aggregation per table — NDVs
# are EXACT count-distincts (what ANALYZE stores; estimation error
# belongs in the sketch family, see sketches.py), computed in the
# same pass as the row count.  At 100 TB this is the nightly stats
# job whose output makes every subsequent plan pick the right join
# strategy without scanning anything at plan time.

BROADCAST_ROW_LIMIT = 100_000


def q_catalog_stats_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").cast("long").alias("li_rows"),
        F.countDistinct("l_orderkey").cast("long").alias("li_ndv_ok"),
        F.countDistinct("l_partkey").cast("long").alias("li_ndv_pk"),
    )
    orders = load_table(spark, sf_dir, "orders").agg(
        F.count("*").cast("long").alias("o_rows"),
        F.countDistinct("o_orderkey").cast("long").alias("o_ndv_ok"),
        F.countDistinct("o_custkey").cast("long").alias("o_ndv_ck"),
    )
    cust = load_table(spark, sf_dir, "customer").agg(
        F.count("*").cast("long").alias("c_rows"),
        F.countDistinct("c_custkey").cast("long").alias("c_ndv_ck"),
    )
    part = load_table(spark, sf_dir, "part").agg(
        F.count("*").cast("long").alias("p_rows"),
        F.countDistinct("p_partkey").cast("long").alias("p_ndv_pk"),
    )
    wide = li.crossJoin(orders).crossJoin(cust).crossJoin(part)
    joins = F.array(
        F.struct(
            F.lit("lineitem*orders").alias("join_name"),
            F.col("li_rows").alias("probe_rows"),
            F.col("o_rows").alias("build_rows"),
            F.col("li_ndv_ok").alias("ndv_probe"),
            F.col("o_ndv_ok").alias("ndv_build"),
        ),
        F.struct(
            F.lit("orders*customer").alias("join_name"),
            F.col("o_rows").alias("probe_rows"),
            F.col("c_rows").alias("build_rows"),
            F.col("o_ndv_ck").alias("ndv_probe"),
            F.col("c_ndv_ck").alias("ndv_build"),
        ),
        F.struct(
            F.lit("lineitem*part").alias("join_name"),
            F.col("li_rows").alias("probe_rows"),
            F.col("p_rows").alias("build_rows"),
            F.col("li_ndv_pk").alias("ndv_probe"),
            F.col("p_ndv_pk").alias("ndv_build"),
        ),
    )
    j = wide.select(F.explode(joins).alias("j")).select("j.*")
    # cast to double BEFORE multiplying: BIGINT*BIGINT overflows under
    # ANSI mode once either side exceeds ~3e9 rows (the 100 TB regime
    # this estimator is for), while DuckDB would silently promote to
    # HUGEINT — a latent engine divergence at exactly the design scale
    # (ADVICE r10).  The double product is exact enough for a planner
    # estimate and both engines agree on it.
    est = F.floor(
        F.col("probe_rows").cast("double")
        * F.col("build_rows").cast("double")
        / F.greatest("ndv_probe", "ndv_build").cast("double")
    ).cast("long")
    return j.select(
        "join_name",
        "probe_rows",
        "build_rows",
        "ndv_probe",
        "ndv_build",
        est.alias("est_out_rows"),
        F.when(
            F.col("build_rows") <= BROADCAST_ROW_LIMIT, F.lit("broadcast")
        )
        .otherwise(F.lit("shuffle"))
        .alias("strategy"),
    )


_PLANNER_SQL = (
    "WITH li AS (SELECT CAST(count(*) AS BIGINT) AS li_rows, "
    "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS li_ndv_ok, "
    "CAST(count(DISTINCT l_partkey) AS BIGINT) AS li_ndv_pk "
    "FROM lineitem), "
    "o AS (SELECT CAST(count(*) AS BIGINT) AS o_rows, "
    "CAST(count(DISTINCT o_orderkey) AS BIGINT) AS o_ndv_ok, "
    "CAST(count(DISTINCT o_custkey) AS BIGINT) AS o_ndv_ck FROM orders), "
    "c AS (SELECT CAST(count(*) AS BIGINT) AS c_rows, "
    "CAST(count(DISTINCT c_custkey) AS BIGINT) AS c_ndv_ck FROM customer), "
    "p AS (SELECT CAST(count(*) AS BIGINT) AS p_rows, "
    "CAST(count(DISTINCT p_partkey) AS BIGINT) AS p_ndv_pk FROM part), "
    "w AS (SELECT * FROM li CROSS JOIN o CROSS JOIN c CROSS JOIN p), "
    "j AS ("
    "SELECT 'lineitem*orders' AS join_name, li_rows AS probe_rows, "
    "o_rows AS build_rows, li_ndv_ok AS ndv_probe, o_ndv_ok AS ndv_build "
    "FROM w UNION ALL "
    "SELECT 'orders*customer', o_rows, c_rows, o_ndv_ck, c_ndv_ck FROM w "
    "UNION ALL "
    "SELECT 'lineitem*part', li_rows, p_rows, li_ndv_pk, p_ndv_pk FROM w) "
    "SELECT join_name, probe_rows, build_rows, ndv_probe, ndv_build, "
    "CAST(floor(CAST(probe_rows AS DOUBLE) * CAST(build_rows AS DOUBLE) / "
    "CAST(greatest(ndv_probe, ndv_build) AS DOUBLE)) AS BIGINT) "
    "AS est_out_rows, "
    "CASE WHEN build_rows <= 100000 THEN 'broadcast' ELSE 'shuffle' END "
    "AS strategy FROM j"
)

QUERIES_R10 = {"catalog_stats_ndv_planner": q_catalog_stats_planner}
ORACLES_R10 = {"catalog_stats_ndv_planner": _PLANNER_SQL}
