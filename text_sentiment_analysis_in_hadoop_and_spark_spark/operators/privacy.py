"""Privacy risk audit over the customer dimension (engine extension —
release-gating analytics a data platform runs before sharing a table;
complements quality.py's PII redaction, which fixes individual rows
while these measure RE-IDENTIFICATION risk of the whole release).

- ``priv_k_anonymity`` — equivalence classes over the quasi-identifier
  tuple (nation, market segment, account-balance bucket) with their
  sizes; a class smaller than K re-identifies its members (Sweeney,
  2002).
- ``priv_risk_by_nation`` — per-nation rollup: how many records sit in
  sub-K classes and what share of the nation that is.
- ``priv_l_diversity`` — with the segment treated as the SENSITIVE
  attribute and (nation, balance bucket) as the QI: per-nation minimum
  l (distinct sensitive values per class) and the share of classes
  meeting l ≥ L_MIN (Machanavajjhala et al., 2007).

Scale: one QI-keyed partial aggregation each (bounded state: |QI|
classes, not |rows|); the risky-class join broadcasts the class table
(quasi-identifier cardinality ≪ data size by construction — if it
were not, k-anonymity would be trivially satisfied).  No windows over
unpartitioned data, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

K_ANON = 5
L_MIN = 3

_BAL_BUCKET = "CAST(floor(c_acctbal / 1000.0) AS BIGINT)"


def _classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(_BAL_BUCKET).alias("bal_bucket"),
    ).agg(F.count("*").alias("class_size"))


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _classes(spark, sf_dir).select(
        "nationkey",
        "segment",
        "bal_bucket",
        "class_size",
        (F.col("class_size") < K_ANON).cast("int").alias("is_risky"),
    )


def q_risk_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cls = _classes(spark, sf_dir)
    return cls.groupBy("nationkey").agg(
        F.sum("class_size").alias("n_customers"),
        F.sum(
            F.when(F.col("class_size") < K_ANON, F.col("class_size")).otherwise(
                F.lit(0)
            )
        ).alias("n_risky"),
        F.round(
            F.sum(
                F.when(
                    F.col("class_size") < K_ANON, F.col("class_size")
                ).otherwise(F.lit(0))
            )
            / F.sum("class_size"),
            6,
        ).alias("risk_share"),
    )


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.expr(_BAL_BUCKET).alias("bal_bucket"),
    ).agg(F.countDistinct("c_mktsegment").alias("l"))
    return cls.groupBy("nationkey").agg(
        F.count("*").alias("n_classes"),
        F.min("l").alias("min_l"),
        F.round(
            F.sum((F.col("l") >= L_MIN).cast("bigint")) / F.count("*"), 6
        ).alias("diverse_share"),
    )


ORACLES: dict[str, str] = {
    "priv_k_anonymity": (
        "SELECT c_nationkey AS nationkey, c_mktsegment AS segment, "
        f"{_BAL_BUCKET} AS bal_bucket, "
        "CAST(count(*) AS BIGINT) AS class_size, "
        f"CAST(count(*) < {K_ANON} AS INTEGER) AS is_risky "
        "FROM customer GROUP BY 1, 2, 3"
    ),
    "priv_risk_by_nation": (
        "WITH cls AS (SELECT c_nationkey AS nationkey, "
        f"c_mktsegment, {_BAL_BUCKET} AS bal_bucket, "
        "CAST(count(*) AS BIGINT) AS class_size "
        "FROM customer GROUP BY 1, 2, 3) "
        "SELECT nationkey, CAST(sum(class_size) AS BIGINT) AS n_customers, "
        f"CAST(sum(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END) "
        "AS BIGINT) AS n_risky, "
        f"round(sum(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END) "
        "/ CAST(sum(class_size) AS DOUBLE), 6) AS risk_share "
        "FROM cls GROUP BY nationkey"
    ),
    "priv_l_diversity": (
        "WITH cls AS (SELECT c_nationkey AS nationkey, "
        f"{_BAL_BUCKET} AS bal_bucket, "
        "CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l "
        "FROM customer GROUP BY 1, 2) "
        "SELECT nationkey, CAST(count(*) AS BIGINT) AS n_classes, "
        "min(l) AS min_l, "
        f"round(sum(CASE WHEN l >= {L_MIN} THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE), 6) AS diverse_share "
        "FROM cls GROUP BY nationkey"
    ),
}

QUERIES = {
    "priv_k_anonymity": q_k_anonymity,
    "priv_risk_by_nation": q_risk_by_nation,
    "priv_l_diversity": q_l_diversity,
}
