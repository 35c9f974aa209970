"""SQL front door — the engine's surface exposed as plain SQL over
registered views (the interface a reference user migrating from
spark-submit jobs reaches for first: `spark.sql(...)` against the
same tables, same Catalyst plans as the DataFrame API).

`register_views` binds every TESTDATA table as a temp view named
exactly as the driver's DuckDB oracle names them, so a query string
can run UNCHANGED on both engines — the two entries here are literal
ANSI strings whose Spark text and oracle text are character-identical
(modulo the integer-cents helper macros).  A plan test asserts the
SQL path produces the same physical plan family as the DataFrame
twin: there is ONE optimizer underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import _cents_sql
from .tables import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# Q1 shape as ONE literal string both engines execute unchanged
_SQL_PRICING = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, "
    f"CAST(sum({_cents_sql('l_extendedprice')}) AS BIGINT) AS sum_base_cents, "
    "CAST(count(*) AS BIGINT) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus"
)

# a cross-table string: per-nation customer count + total balance
_SQL_NATION_CUSTOMERS = (
    "SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers, "
    f"CAST(sum({_cents_sql('c_acctbal')}) AS BIGINT) AS balance_cents "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name"
)


def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_PRICING)


def q_sql_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_NATION_CUSTOMERS)


ORACLES: dict[str, str] = {
    # the SAME strings, verbatim — one dialect, two engines
    "sql_pricing_summary": _SQL_PRICING,
    "sql_nation_customers": _SQL_NATION_CUSTOMERS,
}

QUERIES = {
    "sql_pricing_summary": q_sql_pricing_summary,
    "sql_nation_customers": q_sql_nation_customers,
}
