"""Decorrelation-shape relational queries — round-4 breadth over the
TPC-H-style star schema (sibling of operators/relational.py; same
integer-cents arithmetic contract so Spark's partition-parallel sums
hash-match DuckDB's sequential ones).

Each query is a classic *correlated-subquery* benchmark shape
(TPC-H Q2 / Q11 / Q15 / Q20) rewritten the way a distributed engine
must run it: the correlated scalar becomes a standalone aggregate
joined (broadcast when dimension-sized) or crossed (when 1-row) back
into the probe — never a per-row re-aggregation.

Scale notes (100 TB posture):

- The per-part / per-supplier aggregate tables are DIMENSION-sized
  (bounded by |part| / |supplier|, not by fact rows), so their joins
  back into the fact-derived rows broadcast; only the initial
  fact-side groupBy shuffles, keyed the same as the downstream join.
- The two-level aggregates (Q20 shape) derive the coarser level from
  the finer one — the fact is shuffled ONCE on (part, supplier); the
  part-level rollup re-aggregates the already-small result.
- 1-row global scalars (Q11's total, Q15's max) ride a broadcast
  cross-join, the same pattern as the reference's counters-via-conf
  side input (/root/reference/Hadoop/NB.java:305-316).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .common import register_cache
from .relational import _cents, _cents_sql, _revenue_cents, _REV_SQL

Q2_MAX_SIZE = 10
Q2_TYPE = "STANDARD"
Q11_NATION = "NATION_7"
Q11_FRACTION_DEN = 1000  # keep parts with value > total/1000
Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"
Q20_YEAR_FROM, Q20_YEAR_TO = "1997-01-01", "1998-01-01"


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small STANDARD part, the supplier(s)
    quoting its minimum price.  The correlated ``price = (SELECT
    min(price) ...)`` subquery decorrelates into a per-part min table
    joined back on the SAME key the aggregate grouped by — co-keyed,
    and dimension-sized so it broadcasts."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= Q2_MAX_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    li = load_table(spark, sf_dir, "lineitem")
    scoped = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "l_partkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    mins = scoped.groupBy("l_partkey").agg(
        F.min("price_c").alias("min_price_cents")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        scoped.join(F.broadcast(mins), "l_partkey")
        .filter(F.col("price_c") == F.col("min_price_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "min_price_cents",
        )
        .distinct()
        .join(F.broadcast(sup), "s_suppkey")
        .select("p_partkey", "s_suppkey", "s_name", "min_price_cents")
    )


def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue from one nation's suppliers,
    keeping parts whose value exceeds 1/1000 of the nation total.  The
    HAVING-against-a-global-scalar decorrelates into a 1-row aggregate
    broadcast-crossed into the per-part rows; the threshold compare is
    integer (value*1000 > total) — no float boundary."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    scoped = li.join(
        F.broadcast(sup), li.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", _revenue_cents(li).alias("rev_u"))
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum("rev_u").cast("long").alias("value_u")
    )
    total = per_part.agg(
        F.sum("value_u").cast("long").alias("total_u")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_u") * Q11_FRACTION_DEN > F.col("total_u"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "value_u",
            F.round(F.col("value_u") / F.col("total_u"), 6).alias("share"),
        )
    )


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter.  ``revenue = (SELECT max(total) ...)`` decorrelates into
    a 1-row max broadcast-crossed into the per-supplier aggregate —
    an argmax with no global sort and no single-partition window."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM))
        & (F.col("l_shipdate") < F.lit(Q15_TO))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_revenue_cents(li)).cast("long").alias("total_revenue_u")
    )
    best = rev.agg(F.max("total_revenue_u").alias("max_u"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue_u") == F.col("max_u"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"), "total_revenue_u"
        )
        .join(F.broadcast(sup), "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue_u")
    )


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of some
    part's 1997 volume, with how many parts they dominate.  Two-level
    aggregate: the fact scans and shuffles ONCE, on (part, supplier);
    the part-level total is a whole-partition window SUM over that
    already-dimension-sized result (a re-aggregate via self-join would
    make Catalyst plan — and scan — the shared subtree twice; the
    window re-exchanges only |part×supplier| rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_FROM))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_TO))
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q_ps")
    )
    w_part = Window.partitionBy("l_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.withColumn(
            "q_total", F.sum("q_ps").over(w_part).cast("long")
        )
        .filter(F.col("q_ps") * 2 > F.col("q_total"))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_parts_dominated"))
        .join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name", "n_parts_dominated")
    )


Q7_NATIONS = ("NATION_4", "NATION_9")  # bilateral-trade pair


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue flowing
    between one nation PAIR, split by (supplier nation, customer
    nation, ship year), both directions.

    Scale shape: the nation filter lands on the DIMENSION tables
    before any fact join, shrinking supplier/customer to the pair's
    members (2/25 of rows) — so the supplier side broadcasts and the
    orders⋈customer equi-join carries only pair-member customers.
    The fact-fact lineitem⋈orders join is the one full shuffle; the
    final rollup groups on a 2×2×years key with map-side combine."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*Q7_NATIONS)
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _revenue_cents(li)
    return (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            rev.alias("rev_u"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_u").cast("long").alias("revenue_u"))
    )


Q8_NATION = "NATION_3"
Q9_YEARS = ("1996", "1997", "1998")
Q16_MIN_SIZE = 40


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly revenue — a
    conditional fraction per group, computed in ONE aggregate pass
    (``sum(when(nation, rev)) / sum(rev)``), not two joined
    aggregates.  The nation attaches via broadcast supplier⋈nation
    before the fact rollup; only lineitem⋈orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    rev = _revenue_cents(li)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("n_name") == Q8_NATION, rev).otherwise(0))
            .cast("long")
            .alias("nation_rev_u"),
            F.sum(rev).cast("long").alias("total_rev_u"),
        )
        .withColumn(
            "share",
            F.round(F.col("nation_rev_u") / F.col("total_rev_u"), 6),
        )
    )


def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: supplier-nation profit per year, with
    ``p_retailprice·qty`` standing in for the missing partsupp cost.
    Two broadcast dims (part, supplier⋈nation) ride on the single
    lineitem⋈orders fact shuffle; profit is exact integer cents-units
    (revenue at price-cents·pct scale, cost scaled ×100 to match)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", _cents(F.col("p_retailprice")).alias("cost_c")
    )
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    qty = F.col("l_quantity").cast("long")
    profit_u = _revenue_cents(li) - F.col("cost_c") * qty * 100
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("o_year").isin([int(y) for y in Q9_YEARS]))
        .groupBy("n_name", "o_year")
        .agg(F.sum(profit_u).cast("long").alias("profit_u"))
    )


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type) for large
    parts, EXCLUDING an unwanted-supplier list (negative balance) via
    broadcast anti-join.  The exclusion list is dimension-sized; the
    countDistinct groups by part attributes after one (part, supplier)
    projection of the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") >= Q16_MIN_SIZE
    ).select("p_partkey", "p_brand", "p_type")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
        )
    )


ORACLES: dict[str, str] = {
    "rel_min_price_supplier": (
        "WITH scoped AS (SELECT l_partkey, l_suppkey, "
        f"{_cents_sql('l_extendedprice')} AS price_c "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        f"WHERE p_size <= {Q2_MAX_SIZE} AND p_type = '{Q2_TYPE}'), "
        "m AS (SELECT l_partkey, min(price_c) AS min_price_cents "
        "FROM scoped GROUP BY l_partkey) "
        "SELECT DISTINCT sc.l_partkey AS p_partkey, "
        "sc.l_suppkey AS s_suppkey, sup.s_name, m.min_price_cents "
        "FROM scoped sc JOIN m USING (l_partkey) "
        "JOIN supplier sup ON sc.l_suppkey = sup.s_suppkey "
        "WHERE sc.price_c = m.min_price_cents"
    ),
    "rel_part_value_share": (
        "WITH scoped AS (SELECT l_partkey, "
        f"{_REV_SQL} AS rev_u "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE n_name = '{Q11_NATION}'), "
        "pp AS (SELECT l_partkey, CAST(sum(rev_u) AS BIGINT) AS value_u "
        "FROM scoped GROUP BY l_partkey), "
        "t AS (SELECT CAST(sum(value_u) AS BIGINT) AS total_u FROM pp) "
        "SELECT pp.l_partkey AS p_partkey, pp.value_u, "
        "round(pp.value_u / t.total_u, 6) AS share "
        "FROM pp, t "
        f"WHERE pp.value_u * {Q11_FRACTION_DEN} > t.total_u"
    ),
    "rel_top_supplier": (
        "WITH rev AS (SELECT l_suppkey, "
        f"CAST(sum({_REV_SQL}) AS BIGINT) AS total_revenue_u "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}' "
        f"AND l_shipdate < TIMESTAMP '{Q15_TO}' "
        "GROUP BY l_suppkey), "
        "best AS (SELECT max(total_revenue_u) AS max_u FROM rev) "
        "SELECT rev.l_suppkey AS s_suppkey, sup.s_name, "
        "rev.total_revenue_u "
        "FROM rev, best "
        "JOIN supplier sup ON rev.l_suppkey = sup.s_suppkey "
        "WHERE rev.total_revenue_u = best.max_u"
    ),
    "rel_dominant_suppliers": (
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_ps "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_FROM}' "
        f"AND l_shipdate < TIMESTAMP '{Q20_YEAR_TO}' "
        "GROUP BY l_partkey, l_suppkey), "
        "pt AS (SELECT l_partkey, CAST(sum(q_ps) AS BIGINT) AS q_total "
        "FROM ps GROUP BY l_partkey) "
        "SELECT ps.l_suppkey AS s_suppkey, sup.s_name, "
        "CAST(count(*) AS BIGINT) AS n_parts_dominated "
        "FROM ps JOIN pt USING (l_partkey) "
        "JOIN supplier sup ON ps.l_suppkey = sup.s_suppkey "
        "WHERE ps.q_ps * 2 > pt.q_total "
        "GROUP BY ps.l_suppkey, sup.s_name"
    ),
}

ORACLES.update(
    {
        "rel_market_share": (
            "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            f"CAST(sum(CASE WHEN n_name = '{Q8_NATION}' THEN {_REV_SQL} "
            "ELSE 0 END) AS BIGINT) AS nation_rev_u, "
            f"CAST(sum({_REV_SQL}) AS BIGINT) AS total_rev_u, "
            f"round(sum(CASE WHEN n_name = '{Q8_NATION}' THEN {_REV_SQL} "
            f"ELSE 0 END) / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS share "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY year(o_orderdate)"
        ),
        "rel_profit_by_nation_year": (
            "SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            f"CAST(sum({_REV_SQL} - {_cents_sql('p_retailprice')} "
            "* CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_u "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE year(o_orderdate) IN ("
            + ", ".join(Q9_YEARS)
            + ") GROUP BY n_name, year(o_orderdate)"
        ),
        "rel_volume_shipping": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS INTEGER) AS l_year, "
            f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_u "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "WHERE n1.n_name IN (\'NATION_4\', \'NATION_9\') "
            "AND n2.n_name IN (\'NATION_4\', \'NATION_9\') "
            "AND n1.n_name <> n2.n_name "
            "GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"
        ),
        "rel_supplier_part_counts": (
            "SELECT p_brand, p_type, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            f"WHERE p_size >= {Q16_MIN_SIZE} AND l_suppkey NOT IN ("
            "SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type"
        ),
    }
)

QUERIES = {
    "rel_min_price_supplier": q_min_price_supplier,
    "rel_part_value_share": q_part_value_share,
    "rel_top_supplier": q_top_supplier,
    "rel_dominant_suppliers": q_dominant_suppliers,
    "rel_market_share": q_market_share,
    "rel_profit_by_nation_year": q_profit_by_nation_year,
    "rel_supplier_part_counts": q_supplier_part_counts,
    "rel_volume_shipping": q_volume_shipping,
}


# --- r5 gap-fill: Q3 / Q6 shapes + GROUPING SETS ---------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-15"
Q3_TOP = 10
Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.03, 0.07   # inclusive band, TPC-H Q6 style
Q6_QTY_MAX = 24


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 not-yet-shipped orders by revenue for
    one market segment.  Join order is the scale story: lineitem is
    filtered (shipdate pushed to the scan) and PRE-AGGREGATED to
    per-order revenue BEFORE meeting orders — the orderkey shuffle
    carries one row per order, not one per line — while the segment's
    customers semi-join orders broadcast.  The top-10 is
    TakeOrderedAndProject (no global sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(Q3_DATE))
        .join(F.broadcast(cust.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE)
    )
    rev = li.groupBy("l_orderkey").agg(
        F.sum(_revenue_cents(li)).alias("revenue_cents_pct")
    )
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue_cents_pct",
        )
        .orderBy(F.desc("revenue_cents_pct"), F.asc("o_orderkey"))
        .limit(Q3_TOP)
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-and-sum forecast — everything
    rides predicate pushdown (date + discount band + quantity reach
    the parquet scan; `.explain` shows them in PushedFilters) and one
    partial-agg global sum; no join, no wide shuffle.  Discount cents
    keep the band integer-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = _cents(F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_FROM))
            & (F.col("l_shipdate") < F.lit(Q6_TO))
            & (disc_c >= int(Q6_DISC_LO * 100))
            & (disc_c <= int(Q6_DISC_HI * 100))
            & (F.col("l_quantity") < Q6_QTY_MAX)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice")) * disc_c)
            .cast("long")
            .alias("forecast_cents_pct"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the third grouping surface next to the
    existing ROLLUP/CUBE twins: ((nation, year), (year), ()) with a
    grouping_id disambiguating aggregation levels (NULL nation in a
    subtotal row vs a hypothetical NULL key).  One fact-side shuffle;
    Spark expands the sets map-side (Expand), not by re-scanning per
    set."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("year"),
            _revenue_cents(li).alias("rev"),
        )
    )
    return joined.groupingSets(
        [["nation", "year"], ["year"], []], "nation", "year"
    ).agg(
        F.grouping_id("nation", "year").cast("long").alias("gid"),
        F.sum("rev").cast("long").alias("revenue_cents_pct"),
        F.count("*").cast("long").alias("n_lines"),
    )


ORACLES.update(
    {
        "rel_shipping_priority": (
            "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') "
            "AS o_orderdate, "
            f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents_pct "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            f"WHERE c_mktsegment = '{Q3_SEGMENT}' "
            f"AND o_orderdate < TIMESTAMP '{Q3_DATE}' "
            f"AND l_shipdate > TIMESTAMP '{Q3_DATE}' "
            "GROUP BY o_orderkey, o_orderdate "
            f"ORDER BY revenue_cents_pct DESC, o_orderkey LIMIT {Q3_TOP}"
        ),
        "rel_forecast_revenue": (
            "SELECT CAST(sum("
            f"{_cents_sql('l_extendedprice')} * {_cents_sql('l_discount')}"
            ") AS BIGINT) AS forecast_cents_pct, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM lineitem "
            f"WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}' "
            f"AND l_shipdate < TIMESTAMP '{Q6_TO}' "
            f"AND {_cents_sql('l_discount')} >= {int(Q6_DISC_LO * 100)} "
            f"AND {_cents_sql('l_discount')} <= {int(Q6_DISC_HI * 100)} "
            f"AND l_quantity < {Q6_QTY_MAX}"
        ),
        "rel_revenue_grouping_sets": (
            "WITH j AS (SELECT n_name AS nation, year(l_shipdate) AS year, "
            f"{_REV_SQL} AS rev FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey) "
            "SELECT nation, year, "
            "CAST(grouping(nation) * 2 + grouping(year) AS BIGINT) AS gid, "
            "CAST(sum(rev) AS BIGINT) AS revenue_cents_pct, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM j "
            "GROUP BY GROUPING SETS ((nation, year), (year), ())"
        ),
    }
)

QUERIES["rel_shipping_priority"] = q_shipping_priority
QUERIES["rel_forecast_revenue"] = q_forecast_revenue
QUERIES["rel_revenue_grouping_sets"] = q_revenue_grouping_sets


TOPK_PER_NATION = 3


def q_top_parts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the window-rank pattern the global top-N
    queries (TakeOrderedAndProject) cannot express: the 3
    highest-revenue parts WITHIN each supplier nation.  Revenue
    pre-aggregates per (nation, part) BEFORE ranking, so the window
    sorts |nations|·|parts| aggregate rows, never fact rows, and the
    rank filter prunes inside the window stage.  Ties broken on
    p_partkey for an engine-stable total order."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_partkey")
        .agg(F.sum(_revenue_cents(li)).cast("long").alias("revenue_cents_pct"))
    )
    w = Window.partitionBy("nation").orderBy(
        F.desc("revenue_cents_pct"), F.asc("l_partkey")
    )
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_PER_NATION)
        .select(
            "nation",
            F.col("l_partkey").alias("p_partkey"),
            "revenue_cents_pct",
            F.col("rk").cast("int").alias("rk"),
        )
    )


ORACLES["rel_top_parts_per_nation"] = (
    "WITH per AS (SELECT n_name AS nation, l_partkey, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents_pct "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), "
    "rk AS (SELECT nation, l_partkey AS p_partkey, revenue_cents_pct, "
    "CAST(row_number() OVER (PARTITION BY nation "
    "ORDER BY revenue_cents_pct DESC, l_partkey) AS INTEGER) AS rk FROM per) "
    f"SELECT * FROM rk WHERE rk <= {TOPK_PER_NATION}"
)

QUERIES["rel_top_parts_per_nation"] = q_top_parts_per_nation


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / cumulative-share analysis: customers ranked by revenue
    with their running share of the total — the 80/20 concentration
    curve.  The window runs over the AGGREGATED per-customer table
    (|customers| rows, never fact rows), the global total rides the
    same window (no second scan or cross join), and the curve is
    cut to the top 100 rows for a bounded result; rank ties break on
    custkey so both engines emit the identical prefix."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue_cents(li)).cast("long").alias("rev"))
    )
    # the global-window form (row_number + cumsum over ALL customers)
    # funnels the whole per-customer table through one partition; the
    # scale-correct cut is TakeOrderedAndProject to the 100-row prefix
    # FIRST, the global total as a 1-row broadcast scalar, and the
    # running sum over just those 100 rows (an ordered prefix's
    # running sum is unchanged by the cut)
    top = per_cust.orderBy(F.desc("rev"), F.asc("o_custkey")).limit(100)
    total = per_cust.agg(F.sum("rev").alias("total_rev"))
    w_order = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.crossJoin(F.broadcast(total)).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("rev").alias("revenue_cents_pct"),
        F.row_number().over(w_order).cast("int").alias("rk"),
        F.round(
            F.sum("rev").over(w_cum) / F.col("total_rev"), 6
        ).alias("cum_share"),
    )


ORACLES["rel_revenue_concentration"] = (
    "WITH per AS (SELECT o_custkey, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY o_custkey), "
    "c AS (SELECT o_custkey AS c_custkey, rev AS revenue_cents_pct, "
    "CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS INTEGER) "
    "AS rk, "
    "round(sum(rev) OVER (ORDER BY rev DESC, o_custkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "* 1.0 / sum(rev) OVER (), 6) AS cum_share FROM per) "
    "SELECT * FROM c WHERE rk <= 100"
)

QUERIES["rel_revenue_concentration"] = q_revenue_concentration


def q_ship_latency_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: exact
    interpolated p25/p50/p75/p95 over datediff(shipdate, orderdate).
    The percentile aggregate runs per priority group with partial
    aggregation — a priorities-sized result off one fact join; the
    orders side pre-projects (orderkey, date, priority) only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("lat_days"),
    )
    # r12 (guide §2.2): one array-percentile buffer for the four
    # ranks — bit-identical per rank, 4 per-group value maps → 1
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.expr(
            "percentile(lat_days, array(0.25, 0.5, 0.75, 0.95))"
        ).alias("_ps"),
    ).select(
        "o_orderpriority",
        "n_lines",
        F.col("_ps")[0].alias("p25"),
        F.col("_ps")[1].alias("p50"),
        F.col("_ps")[2].alias("p75"),
        F.round(F.col("_ps")[3], 6).alias("p95"),
    )


ORACLES["rel_ship_latency_dist"] = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines, "
    "quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.25) AS p25, "
    "quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.5) AS p50, "
    "quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.75) AS p75, "
    "round(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.95), 6) "
    "AS p95 "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority"
)

QUERIES["rel_ship_latency_dist"] = q_ship_latency_dist


RFM_ANCHOR = "2001-09-01"  # fixed recency anchor (just past max orderdate)


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the CRM staple: per customer Recency (days
    since last order, from a FIXED anchor so the result is
    deterministic), Frequency (order count), Monetary (total spend in
    cents); each scored 1–4 against its quartile boundaries and rolled
    up into segment counts.  The base is ONE orders groupBy; quartile
    boundaries are a 1-row exact-percentile aggregate broadcast back
    (the same fence discipline as winsorization/equi-depth — no
    ntile window funnelling customers through one partition); strict
    `<` boundary comparison keeps ties deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ANCHOR), F.max("o_orderdate")).alias("rec"),
        F.count("*").cast("double").alias("freq"),
        F.sum(_cents(F.col("o_totalprice"))).cast("double").alias("mon"),
    )
    fences = base.agg(
        F.expr("percentile(rec, array(0.25, 0.5, 0.75))").alias("rb"),
        F.expr("percentile(freq, array(0.25, 0.5, 0.75))").alias("fb"),
        F.expr("percentile(mon, array(0.25, 0.5, 0.75))").alias("mb"),
    )

    def score(v, bounds):
        return F.lit(1) + F.size(F.filter(bounds, lambda b: b < v))

    scored = base.crossJoin(F.broadcast(fences)).select(
        # recency: RECENT is good → invert the quartile index
        (F.lit(5) - score(F.col("rec").cast("double"), F.col("rb")))
        .cast("int")
        .alias("r_score"),
        score(F.col("freq"), F.col("fb")).cast("int").alias("f_score"),
        score(F.col("mon"), F.col("mb")).cast("int").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("long").alias("n_customers")
    )


ORACLES["rel_customer_rfm"] = (
    "WITH base AS (SELECT o_custkey, "
    f"datediff('day', max(o_orderdate), TIMESTAMP '{RFM_ANCHOR}') AS rec, "
    "CAST(count(*) AS DOUBLE) AS freq, "
    f"CAST(sum({_cents_sql('o_totalprice')}) AS DOUBLE) AS mon "
    "FROM orders GROUP BY o_custkey), "
    "fences AS (SELECT "
    "[quantile_cont(rec, 0.25), quantile_cont(rec, 0.5), "
    "quantile_cont(rec, 0.75)] AS rb, "
    "[quantile_cont(freq, 0.25), quantile_cont(freq, 0.5), "
    "quantile_cont(freq, 0.75)] AS fb, "
    "[quantile_cont(mon, 0.25), quantile_cont(mon, 0.5), "
    "quantile_cont(mon, 0.75)] AS mb FROM base), "
    "scored AS (SELECT "
    "CAST(5 - (1 + len(list_filter(f.rb, b -> b < CAST(rec AS DOUBLE)))) "
    "AS INTEGER) AS r_score, "
    "CAST(1 + len(list_filter(f.fb, b -> b < freq)) AS INTEGER) AS f_score, "
    "CAST(1 + len(list_filter(f.mb, b -> b < mon)) AS INTEGER) AS m_score "
    "FROM base CROSS JOIN fences f) "
    "SELECT r_score, f_score, m_score, "
    "CAST(count(*) AS BIGINT) AS n_customers "
    "FROM scored GROUP BY 1, 2, 3"
)

QUERIES["rel_customer_rfm"] = q_customer_rfm


def q_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the trend query on
    top of the profit rollup: lag window over the (nation, year)
    AGGREGATE (|nations|·|years| rows, never fact rows), growth as a
    rounded ratio, first year NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("year"),
        )
        .agg(F.sum(_revenue_cents(li)).cast("long").alias("revenue_cents_pct"))
    )
    w = Window.partitionBy("nation").orderBy("year")
    prev = F.lag("revenue_cents_pct").over(w)
    return per.select(
        "nation",
        "year",
        "revenue_cents_pct",
        F.round(
            (F.col("revenue_cents_pct") - prev) / prev, 6
        ).alias("yoy_growth"),
    )


ORACLES["rel_yearly_growth"] = (
    "WITH per AS (SELECT n_name AS nation, year(l_shipdate) AS year, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents_pct "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2) "
    "SELECT nation, year, revenue_cents_pct, "
    "round((revenue_cents_pct - lag(revenue_cents_pct) OVER w) * 1.0 "
    "/ lag(revenue_cents_pct) OVER w, 6) AS yoy_growth "
    "FROM per WINDOW w AS (PARTITION BY nation ORDER BY year)"
)

QUERIES["rel_yearly_growth"] = q_yearly_growth


def q_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per calendar month: the month's mean daily
    revenue divided by the overall mean daily revenue (>1 = a hot
    month) — computed over (month, day) daily aggregates so month lengths
    don't bias the index; the global mean rides a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.month("l_shipdate").alias("month"),
        F.to_date("l_shipdate").alias("day"),
    ).agg(F.sum(_revenue_cents(li)).alias("rev"))
    # exact-integer sums divided ONCE: avg() accumulates running means
    # in engine-specific order and drifts a ulp at 1e9 scale — sum and
    # count are exact BIGINTs, so s/n is the same double both engines
    monthly = daily.groupBy("month").agg(
        F.sum("rev").cast("long").alias("s"),
        F.count("*").cast("long").alias("n_days"),
    )
    overall = daily.agg(
        F.sum("rev").cast("long").alias("gs"),
        F.count("*").cast("long").alias("gn"),
    )
    # the mean itself ships as exact integer division (cents): rounding
    # a 1e9-scale double to 6 decimals lands on half-way cases where
    # Spark's and DuckDB's round() disagree by one ulp — the index
    # (≈1.0 scale) rounds safely
    mean = F.col("s") / F.col("n_days")
    gmean = F.col("gs") / F.col("gn")
    return monthly.crossJoin(F.broadcast(overall)).select(
        F.col("month").cast("int").alias("month"),
        "n_days",
        F.expr("s DIV n_days").cast("long").alias("mean_daily_rev_cents"),
        F.round(mean / gmean, 6).alias("seasonal_index"),
    )


ORACLES["rel_monthly_seasonality"] = (
    "WITH daily AS (SELECT month(l_shipdate) AS month, "
    "CAST(l_shipdate AS DATE) AS day, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev "
    "FROM lineitem GROUP BY 1, 2), "
    "m AS (SELECT month, CAST(sum(rev) AS BIGINT) AS s, "
    "CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY month), "
    "g AS (SELECT CAST(sum(rev) AS BIGINT) AS gs, "
    "CAST(count(*) AS BIGINT) AS gn FROM daily) "
    "SELECT CAST(month AS INTEGER) AS month, n_days, "
    "CAST(s // n_days AS BIGINT) AS mean_daily_rev_cents, "
    "round((s * 1.0 / n_days) / (gs * 1.0 / gn), 6) AS seasonal_index "
    "FROM m CROSS JOIN g"
)

QUERIES["rel_monthly_seasonality"] = q_monthly_seasonality


DISC_CAP = 0.05


def q_discount_cap_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if scenario in one pass: revenue under the CURRENT
    discount schedule vs a counterfactual 5%-cap, per order priority
    — both measures are conditional expressions over the same scan
    (never two passes or a self-join), the standard scenario-analysis
    shape.  Exact integer cents throughout; the delta column is the
    margin the cap would recover."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    disc_c = _cents(F.col("l_discount"))
    capped_c = F.least(disc_c, F.lit(int(DISC_CAP * 100)))
    price_c = _cents(F.col("l_extendedprice"))
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.sum(price_c * (100 - disc_c)).cast("long").alias("rev_actual_cpct"),
        F.sum(price_c * (100 - capped_c))
        .cast("long")
        .alias("rev_capped_cpct"),
        F.sum(price_c * (disc_c - capped_c))
        .cast("long")
        .alias("delta_cpct"),
    )


ORACLES["rel_discount_cap_whatif"] = (
    "SELECT o_orderpriority, "
    f"CAST(sum({_cents_sql('l_extendedprice')} * "
    f"(100 - {_cents_sql('l_discount')})) AS BIGINT) AS rev_actual_cpct, "
    f"CAST(sum({_cents_sql('l_extendedprice')} * "
    f"(100 - least({_cents_sql('l_discount')}, {int(DISC_CAP * 100)}))) "
    "AS BIGINT) AS rev_capped_cpct, "
    f"CAST(sum({_cents_sql('l_extendedprice')} * "
    f"({_cents_sql('l_discount')} - least({_cents_sql('l_discount')}, "
    f"{int(DISC_CAP * 100)}))) AS BIGINT) AS delta_cpct "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority"
)

QUERIES["rel_discount_cap_whatif"] = q_discount_cap_whatif


BASKET_MIN_SUPPORT = 5   # pair must co-occur in ≥ this many orders
BASKET_TOP_K = 50
_BASKET_OP_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})
_BASKET_N_CACHE: dict[tuple[str, str], int] = register_cache({})


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs bought together more often
    than chance — lift = N·c(a,b)/(c(a)·c(b)) over order baskets,
    support-floored and cut to the top-K on the ROUNDED lift total
    order.  The pair explode is the within-order self-join (keyed on
    orderkey, fan bounded by basket size², never catalog²); marginals
    re-aggregate from the same distinct (order, part) postings; the
    1-row order count broadcasts.  The double arithmetic runs in the
    same operation order both engines (the PMI discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r12: the distinct postings table feeds FOUR consumers (the eager
    # order count, both self-join sides, the marginals) — memoized so
    # the 600k-row distinct runs once per (session, sf_dir) instead of
    # per consumer (guide §5 caching: reused AND expensive).
    # r13 (guide §2.4): the memo is cached PARTITIONED ON l_orderkey —
    # the within-order self-join then consumes the cached layout on
    # both sides with no exchange (the distinct's (orderkey, partkey)
    # hash satisfied neither join side, so every run re-shuffled the
    # postings twice); and the 1-row order count memoizes as a scalar
    # beside the table instead of re-running a distinct+count job per
    # invocation.  Interleaved A/B min-of-4: 2.23 → 1.75 (layout)
    # → 1.39 (scalar memo), identical top-K.
    key = (spark.sparkContext.applicationId, sf_dir)
    op = _BASKET_OP_CACHE.get(key)
    if op is None:
        op = (
            li.select("l_orderkey", "l_partkey")
            .distinct()
            .repartition("l_orderkey")
            .cache()
        )
        _BASKET_OP_CACHE[key] = op
    n_orders = _BASKET_N_CACHE.get(key)
    if n_orders is None:
        n_orders = op.select("l_orderkey").distinct().count()
        _BASKET_N_CACHE[key] = n_orders
    a = op.withColumnRenamed("l_partkey", "part_a")
    b = op.select(
        F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, (a.l_orderkey == b.ok_b) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= BASKET_MIN_SUPPORT)
    )
    marg = op.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    ma = marg.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    mb = marg.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    lift = (
        F.lit(float(n_orders)) * F.col("c_ab") / (F.col("c_a") * F.col("c_b"))
    )
    return (
        pairs.join(ma, "part_a")
        .join(mb, "part_b")
        .select(
            "part_a",
            "part_b",
            "c_ab",
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


ORACLES["rel_basket_affinity"] = (
    "WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders "
    "FROM op), "
    "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
    "CAST(count(*) AS BIGINT) AS c_ab FROM op a "
    "JOIN op b ON a.l_orderkey = b.l_orderkey "
    "AND a.l_partkey < b.l_partkey "
    f"GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}), "
    "marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM op "
    "GROUP BY l_partkey) "
    "SELECT p.part_a, p.part_b, p.c_ab, "
    "round(CAST(n.n_orders AS DOUBLE) * p.c_ab / (ma.c * mb.c), 6) AS lift "
    "FROM pairs p CROSS JOIN n "
    "JOIN marg ma ON ma.l_partkey = p.part_a "
    "JOIN marg mb ON mb.l_partkey = p.part_b "
    f"ORDER BY lift DESC, part_a, part_b LIMIT {BASKET_TOP_K}"
)

QUERIES["rel_basket_affinity"] = q_basket_affinity


def q_returns_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table per part brand: returned-line fraction
    and returned revenue share — the supplier-quality scoreboard.
    One fact pass with conditional aggregates, the brand dimension
    broadcast; rates from exact integer sums divided once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = (F.col("l_returnflag") == "R").cast("long")
    rev = _revenue_cents(li)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(ret).cast("long").alias("n_returned"),
            F.sum(rev * ret).cast("long").alias("returned_cents_pct"),
            F.sum(rev).cast("long").alias("total_cents_pct"),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returned",
            F.round(F.col("n_returned") / F.col("n_lines"), 6).alias(
                "return_rate"
            ),
            F.round(
                F.col("returned_cents_pct") / F.col("total_cents_pct"), 6
            ).alias("returned_rev_share"),
        )
    )


ORACLES["rel_returns_by_brand"] = (
    "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_returned, "
    "round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0 "
    "/ count(*), 6) AS return_rate, "
    f"round(sum(CASE WHEN l_returnflag = 'R' THEN {_REV_SQL} ELSE 0 END) "
    f"* 1.0 / sum({_REV_SQL}), 6) AS returned_rev_share "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "GROUP BY p_brand"
)

QUERIES["rel_returns_by_brand"] = q_returns_by_brand


def q_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-style data-quality test suite as ONE query — the
    checks a warehouse runs on every load, each an anti-join or
    duplicate count over the star schema: lineitem orphans (no
    order), order orphans (no customer), supplier/customer nation
    references, duplicate primary keys, and negative-amount rows.
    Every check is a left-anti or groupBy count; the result is one
    bounded (check, n_violations) table a scheduler can alert on —
    all zeros on healthy data, and the oracle proves the CHECKS
    themselves (both engines agree on every violation count, so a
    broken check would hash-fail even while reporting zero)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    def count_of(df) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_violations"))

    checks = [
        (
            "lineitem_orphans",
            count_of(
                li.join(
                    orders.select("o_orderkey"),
                    li.l_orderkey == F.col("o_orderkey"),
                    "left_anti",
                )
            ),
        ),
        (
            "order_orphans",
            count_of(
                orders.join(
                    cust.select("c_custkey"),
                    orders.o_custkey == F.col("c_custkey"),
                    "left_anti",
                )
            ),
        ),
        (
            "supplier_bad_nation",
            count_of(
                sup.join(
                    nat.select("n_nationkey"),
                    sup.s_nationkey == F.col("n_nationkey"),
                    "left_anti",
                )
            ),
        ),
        (
            "customer_bad_nation",
            count_of(
                cust.join(
                    nat.select("n_nationkey"),
                    cust.c_nationkey == F.col("n_nationkey"),
                    "left_anti",
                )
            ),
        ),
        (
            "duplicate_orderkeys",
            count_of(
                orders.groupBy("o_orderkey")
                .count()
                .filter(F.col("count") > 1)
            ),
        ),
        (
            "negative_price_lines",
            count_of(li.filter(F.col("l_extendedprice") < 0)),
        ),
    ]
    out = None
    for name, df in checks:
        row = df.select(F.lit(name).alias("check"), "n_violations")
        out = row if out is None else out.unionByName(row)
    return out


ORACLES["rel_integrity_checks"] = (
    "SELECT 'lineitem_orphans' AS check, CAST((SELECT count(*) "
    "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o "
    "WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_violations "
    "UNION ALL SELECT 'order_orphans', CAST((SELECT count(*) "
    "FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c "
    "WHERE c.c_custkey = o.o_custkey)) AS BIGINT) "
    "UNION ALL SELECT 'supplier_bad_nation', CAST((SELECT count(*) "
    "FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n "
    "WHERE n.n_nationkey = s.s_nationkey)) AS BIGINT) "
    "UNION ALL SELECT 'customer_bad_nation', CAST((SELECT count(*) "
    "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n "
    "WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT) "
    "UNION ALL SELECT 'duplicate_orderkeys', CAST((SELECT count(*) FROM "
    "(SELECT o_orderkey FROM orders GROUP BY o_orderkey "
    "HAVING count(*) > 1)) AS BIGINT) "
    "UNION ALL SELECT 'negative_price_lines', CAST((SELECT count(*) "
    "FROM lineitem WHERE l_extendedprice < 0) AS BIGINT)"
)

QUERIES["rel_integrity_checks"] = q_integrity_checks


MIG_Y1, MIG_Y2 = 1996, 1997


def q_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value migration — the churn-analytics transition
    matrix: each customer's spend tercile in one year vs the next
    ('new' and 'churned' are first-class states, not dropped rows).
    Per-year spend is one conditional aggregate over a single orders
    pass; tercile fences are per-year 1-row percentile aggregates
    broadcast back (strict-< ties, the RFM discipline); the matrix is
    a 4×4-bounded rollup."""
    orders = load_table(spark, sf_dir, "orders")

    def year_spend(y: int, alias: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01"))
            )
            .groupBy("o_custkey")
            .agg(F.sum(_cents(F.col("o_totalprice"))).cast("double").alias(alias))
        )

    s1 = year_spend(MIG_Y1, "v1")
    s2 = year_spend(MIG_Y2, "v2")
    f1 = s1.agg(F.expr("percentile(v1, array(0.3333, 0.6667))").alias("b1"))
    f2 = s2.agg(F.expr("percentile(v2, array(0.3333, 0.6667))").alias("b2"))

    def tercile(v, bounds):
        return F.when(
            v.isNull(), F.lit("none")
        ).otherwise(
            F.when(v <= F.element_at(bounds, 1), "low")
            .when(v <= F.element_at(bounds, 2), "mid")
            .otherwise("high")
        )

    joined = (
        s1.join(s2, "o_custkey", "full_outer")
        .crossJoin(F.broadcast(f1))
        .crossJoin(F.broadcast(f2))
    )
    return joined.groupBy(
        tercile(F.col("v1"), F.col("b1")).alias("seg_from"),
        tercile(F.col("v2"), F.col("b2")).alias("seg_to"),
    ).agg(F.count("*").cast("long").alias("n_customers"))


ORACLES["rel_customer_migration"] = (
    "WITH s1 AS (SELECT o_custkey, "
    f"CAST(sum({_cents_sql('o_totalprice')}) AS DOUBLE) AS v1 FROM orders "
    f"WHERE o_orderdate >= TIMESTAMP '{MIG_Y1}-01-01' "
    f"AND o_orderdate < TIMESTAMP '{MIG_Y1 + 1}-01-01' GROUP BY o_custkey), "
    "s2 AS (SELECT o_custkey, "
    f"CAST(sum({_cents_sql('o_totalprice')}) AS DOUBLE) AS v2 FROM orders "
    f"WHERE o_orderdate >= TIMESTAMP '{MIG_Y2}-01-01' "
    f"AND o_orderdate < TIMESTAMP '{MIG_Y2 + 1}-01-01' GROUP BY o_custkey), "
    "f1 AS (SELECT quantile_cont(v1, 0.3333) AS a, "
    "quantile_cont(v1, 0.6667) AS b FROM s1), "
    "f2 AS (SELECT quantile_cont(v2, 0.3333) AS a, "
    "quantile_cont(v2, 0.6667) AS b FROM s2) "
    "SELECT CASE WHEN v1 IS NULL THEN 'none' "
    "WHEN v1 <= f1.a THEN 'low' WHEN v1 <= f1.b THEN 'mid' "
    "ELSE 'high' END AS seg_from, "
    "CASE WHEN v2 IS NULL THEN 'none' "
    "WHEN v2 <= f2.a THEN 'low' WHEN v2 <= f2.b THEN 'mid' "
    "ELSE 'high' END AS seg_to, "
    "CAST(count(*) AS BIGINT) AS n_customers "
    "FROM s1 FULL OUTER JOIN s2 USING (o_custkey) "
    "CROSS JOIN f1 CROSS JOIN f2 GROUP BY 1, 2"
)

QUERIES["rel_customer_migration"] = q_customer_migration


def q_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for the orders⋈lineitem fact join: the
    per-orderkey row-count distribution (avg / p99 / max / top-1-key
    share).  This is the measurement that decides the join strategy at
    scale — a top-1 share near uniform means plain shuffle-hash is
    fine; a hot key means salting or AQE skew-split (functions/skew.py
    implements the cure; this query is the diagnosis).

    Scale: one partial-agg groupBy on the join key, then a 1-row
    summary over the (keys-sized) count table with an exact
    percentile — no sort of the fact table itself."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n_rows").alias("n_rows_total"),
        F.round(F.avg("n_rows"), 6).alias("avg_rows_per_key"),
        F.round(F.expr("percentile(n_rows, 0.99)"), 6).alias("p99_rows"),
        F.max("n_rows").alias("max_rows"),
        F.round(F.max("n_rows") / F.sum("n_rows"), 6).alias("top1_share"),
    )


ORACLES["rel_join_skew_audit"] = (
    "WITH pk AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows "
    "FROM lineitem GROUP BY l_orderkey) "
    "SELECT CAST(count(*) AS BIGINT) AS n_keys, "
    "CAST(sum(n_rows) AS BIGINT) AS n_rows_total, "
    "round(avg(n_rows), 6) AS avg_rows_per_key, "
    "round(quantile_cont(n_rows, 0.99), 6) AS p99_rows, "
    "max(n_rows) AS max_rows, "
    "round(max(n_rows) / CAST(sum(n_rows) AS DOUBLE), 6) AS top1_share "
    "FROM pk"
)

QUERIES["rel_join_skew_audit"] = q_join_skew_audit


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand QUANTITY-WEIGHTED median unit price — the robust
    "typical selling price" (an unweighted median over line items
    overweights small orders; weighting by quantity answers "the
    median UNIT sold went for X").

    Shape: broadcast dim join → (brand, price)-grouped partial agg →
    ONE cumulative window PARTITIONED by brand over the price-distinct
    rollup (thousands of independent partitions, bounded rows each —
    never a global sort of the fact table) → min price crossing half
    the total weight."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
        F.col("l_quantity").alias("w"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("p_brand").alias("brand"), "price", "w")
    pp = j.groupBy("brand", "price").agg(
        F.sum("w").alias("w"), F.count("*").cast("long").alias("n")
    )
    win = (
        Window.partitionBy("brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r12 (guide §2.4): the per-brand totals come from a FULL-frame
    # window over the same partitioning instead of a second pp
    # aggregation + join — one WindowExec computes both frames, the
    # rollup subtree evaluates once, and the brand re-shuffle for the
    # join disappears.  The totals are sums of integer-valued
    # quantities/counts (exact in double), so the tot/2 threshold is
    # bit-identical to the join form.
    full = Window.partitionBy("brand")
    cum = pp.select(
        "brand",
        "price",
        F.sum("w").over(win).alias("cumw"),
        F.sum("w").over(full).alias("tot"),
        F.sum("n").over(full).alias("n_lineitems"),
    )
    return (
        cum.filter(F.col("cumw") >= F.col("tot") / 2)
        .groupBy("brand")
        .agg(
            F.round(F.min("price"), 6).alias("weighted_median_price"),
            F.max("n_lineitems").alias("n_lineitems"),
        )
    )


ORACLES["rel_weighted_median_price"] = (
    "WITH j AS (SELECT p.p_brand AS brand, "
    "l.l_extendedprice / l.l_quantity AS price, l.l_quantity AS w "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey), "
    "pp AS (SELECT brand, price, sum(w) AS w, "
    "CAST(count(*) AS BIGINT) AS n FROM j GROUP BY brand, price), "
    "cum AS (SELECT brand, price, "
    "sum(w) OVER (PARTITION BY brand ORDER BY price "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw "
    "FROM pp), "
    "tot AS (SELECT brand, sum(w) AS tot, "
    "CAST(sum(n) AS BIGINT) AS n_lineitems FROM pp GROUP BY brand) "
    "SELECT c.brand, round(min(c.price), 6) AS weighted_median_price, "
    "max(t.n_lineitems) AS n_lineitems "
    "FROM cum c JOIN tot t USING (brand) "
    "WHERE c.cumw >= t.tot / 2 GROUP BY c.brand"
)

QUERIES["rel_weighted_median_price"] = q_weighted_median_price


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of customers WITHIN each nation:
    A = the top spenders covering 80% of the nation's revenue mass,
    B = the next 15%, C = the tail — the classic BI treatment-tiering
    rollup.  The cumulative-share window is PARTITIONED by nation over
    the per-customer AGGREGATE (bounded rows per partition, never the
    fact table); class boundaries compare the share of revenue
    STRICTLY BEFORE each customer so the customer that crosses 80%
    still belongs to A on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rev = (
        li.select("l_orderkey", _revenue_cents(li).alias("rev"))
        .groupBy("l_orderkey")
        .agg(F.sum("rev").alias("rev"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
        .join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
            "rev",
        )
    )
    w = (
        Window.partitionBy("nationkey")
        .orderBy(F.desc("rev"), F.asc("custkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.partitionBy("nationkey")
    classed = rev.select(
        "nationkey",
        F.when(
            F.coalesce(F.sum("rev").over(w), F.lit(0))
            < F.lit(0.8) * F.sum("rev").over(tot),
            "A",
        )
        .when(
            F.coalesce(F.sum("rev").over(w), F.lit(0))
            < F.lit(0.95) * F.sum("rev").over(tot),
            "B",
        )
        .otherwise("C")
        .alias("abc"),
        "rev",
    )
    return classed.groupBy("nationkey", "abc").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").alias("rev_cents"),
    )


ORACLES["rel_abc_classification"] = (
    "WITH orev AS (SELECT l_orderkey, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev FROM lineitem "
    "GROUP BY l_orderkey), "
    "crev AS (SELECT o.o_custkey AS custkey, sum(orev.rev) AS rev "
    "FROM orev JOIN orders o ON o.o_orderkey = orev.l_orderkey "
    "GROUP BY 1), "
    "n AS (SELECT c.c_nationkey AS nationkey, crev.custkey, crev.rev "
    "FROM crev JOIN customer c ON c.c_custkey = crev.custkey), "
    "cls AS (SELECT nationkey, rev, "
    "CASE WHEN coalesce(sum(rev) OVER w, 0) < 0.8 * sum(rev) OVER t "
    "THEN 'A' WHEN coalesce(sum(rev) OVER w, 0) < 0.95 * sum(rev) OVER t "
    "THEN 'B' ELSE 'C' END AS abc FROM n "
    "WINDOW w AS (PARTITION BY nationkey ORDER BY rev DESC, custkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
    "t AS (PARTITION BY nationkey)) "
    "SELECT nationkey, abc, CAST(count(*) AS BIGINT) AS n_customers, "
    "CAST(sum(rev) AS BIGINT) AS rev_cents FROM cls GROUP BY 1, 2"
)

QUERIES["rel_abc_classification"] = q_abc_classification


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals — the
    classic fabricated-numbers screen: organic monetary amounts follow
    P(d) = log10(1 + 1/d); uniform or hand-entered data does not.
    Output per digit: count, observed share, Benford share, absolute
    deviation (auditors flag sustained deviation, not single digits).

    First digit via integer math on exact cents (never string
    formatting, which is locale/engine-shaped): d = c DIV 10^(len-1).
    One narrow map + 9-row rollup."""
    ords = load_table(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    digit = F.expr(
        f"CAST({_cents_sql('o_totalprice')} DIV "
        f"CAST(power(10, length(CAST({_cents_sql('o_totalprice')} "
        "AS STRING)) - 1) AS BIGINT) AS INT)"
    )
    counts = (
        ords.filter(cents > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("t"))
    import math

    benford = F.lit(None).cast("double")
    expr = None
    for d in range(1, 10):
        share = math.log10(1 + 1 / d)
        expr = (
            F.when(F.col("digit") == d, F.lit(share))
            if expr is None
            else expr.when(F.col("digit") == d, F.lit(share))
        )
    benford = expr.otherwise(F.lit(0.0))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(F.abs(F.col("n") / F.col("t") - benford), 6).alias(
                "abs_dev"
            ),
        )
    )


_BENFORD_CASE = " ".join(
    f"WHEN digit = {d} THEN {__import__('math').log10(1 + 1 / d)!r}"
    for d in range(1, 10)
)

ORACLES["rel_benford_audit"] = (
    f"WITH c AS (SELECT {_cents_sql('o_totalprice')} AS cents FROM orders), "
    # CAST the power to BIGINT first: DuckDB's // with a DOUBLE
    # divisor is plain division and CAST(DOUBLE AS INT) ROUNDS
    "d AS (SELECT CAST(cents // CAST(power(10, "
    "length(CAST(cents AS VARCHAR)) - 1) AS BIGINT) "
    "AS INTEGER) AS digit FROM c WHERE cents > 0), "
    "counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d "
    "GROUP BY digit), "
    "tot AS (SELECT sum(n) AS t FROM counts) "
    "SELECT digit, n, round(n / CAST(t AS DOUBLE), 6) AS observed_share, "
    f"round(CAST(CASE {_BENFORD_CASE} ELSE 0.0 END AS DOUBLE), 6) "
    "AS benford_share, "
    f"round(abs(n / CAST(t AS DOUBLE) - "
    f"CAST(CASE {_BENFORD_CASE} ELSE 0.0 END AS DOUBLE)), "
    "6) AS abs_dev FROM counts, tot"
)

QUERIES["rel_benford_audit"] = q_benford_audit


FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_custkey", "c_nationkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
)


def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiler: for each candidate det → dep,
    how many determinant values map to MORE than one dependent value
    (0 violations = the FD holds; a holding FD is a normalization /
    join-key contract worth enforcing, a near-holding one is usually
    dirty data).  One distinct-pair aggregate per candidate over its
    determinant key — the same partial-agg shape as a groupBy
    countDistinct — unioned into a bounded report."""
    out = None
    for table, det, dep in FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        per = t.groupBy(F.col(det)).agg(
            F.countDistinct(F.col(dep)).alias("n_dep")
        )
        row = per.agg(
            F.lit(f"{table}.{det}->{dep}").alias("fd"),
            F.count("*").cast("long").alias("n_keys"),
            F.sum((F.col("n_dep") > 1).cast("bigint")).alias(
                "n_violating_keys"
            ),
            (F.sum((F.col("n_dep") > 1).cast("bigint")) == 0)
            .cast("int")
            .alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


ORACLES["rel_fd_audit"] = " UNION ALL ".join(
    f"(WITH per AS (SELECT {det}, count(DISTINCT {dep}) AS n_dep "
    f"FROM {table} GROUP BY {det}) "
    f"SELECT '{table}.{det}->{dep}' AS fd, "
    "CAST(count(*) AS BIGINT) AS n_keys, "
    "CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_violating_keys, "
    "CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS INTEGER) "
    "AS holds FROM per)"
    for table, det, dep in FD_CANDIDATES
)

QUERIES["rel_fd_audit"] = q_fd_audit


def q_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent rollup: each nation's revenue share WITHIN its
    region (the hierarchy drill BI tools render as a treemap).  Facts
    aggregate once to the nations-bounded level; the region total is
    a window over that tiny rollup — never a second fact scan; share
    is a ratio of exact integer cents divided once."""
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    rev = (
        li.select("l_orderkey", _revenue_cents(li).alias("rev"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("rev").alias("rev_cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        "rev_cents",
        F.round(F.col("rev_cents") / F.sum("rev_cents").over(w), 6).alias(
            "share_of_region"
        ),
    )


ORACLES["rel_nation_share_of_region"] = (
    "WITH rev AS (SELECT r.r_name AS region, n.n_name AS nation, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev_cents "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY 1, 2) "
    "SELECT region, nation, rev_cents, "
    "round(rev_cents / CAST(sum(rev_cents) OVER "
    "(PARTITION BY region) AS DOUBLE), 6) AS share_of_region FROM rev"
)

QUERIES["rel_nation_share_of_region"] = q_nation_share_of_region


def q_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall in ONE fact pass: gross → discount given →
    net → tax collected → total billed, each stage an exact-integer
    conditional aggregate over the same scan (never one self-join per
    stage).  The bridge chart finance reads first; also the canonical
    example of turning N scenario scans into N expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.sum(_cents(F.col("l_extendedprice")) * 100)
    disc = F.sum(
        _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount"))
    )
    net = F.sum(_revenue_cents(li))
    # exact integer sum; divide ONCE at the end (a per-row /100 would
    # sum doubles in engine-specific order)
    tax_units = F.sum(_revenue_cents(li) * _cents(F.col("l_tax")))
    return li.agg(
        F.count("*").alias("n_lines"),
        gross.alias("gross_cents"),
        disc.alias("discount_cents"),
        net.alias("net_cents"),
        F.round(tax_units / 10000.0, 6).alias("tax_cents"),
        F.round(
            (net + tax_units / 10000.0) / 100.0, 6
        ).alias("billed_dollars_x100"),
    )


ORACLES["rel_margin_waterfall"] = (
    "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
    f"CAST(sum({_cents_sql('l_extendedprice')} * 100) AS BIGINT) "
    "AS gross_cents, "
    f"CAST(sum({_cents_sql('l_extendedprice')} * {_cents_sql('l_discount')}) "
    "AS BIGINT) AS discount_cents, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS net_cents, "
    f"round(sum({_REV_SQL} * {_cents_sql('l_tax')}) / 10000.0, 6) "
    "AS tax_cents, "
    f"round((sum({_REV_SQL}) + sum({_REV_SQL} * {_cents_sql('l_tax')}) "
    "/ 10000.0) / 100.0, 6) AS billed_dollars_x100 "
    "FROM lineitem"
)

QUERIES["rel_margin_waterfall"] = q_margin_waterfall


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band demand readout: mean quantity and revenue per
    discount band (integer cents bands — the Q6 predicate turned into
    a full elasticity curve).  One fact pass, bands-bounded rollup;
    the merchandising question "do deeper discounts actually move
    volume" answered without a self-join per band."""
    li = load_table(spark, sf_dir, "lineitem")
    band = _cents(F.col("l_discount"))
    return (
        li.groupBy(band.alias("discount_pct"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("l_quantity"), 6).alias("avg_quantity"),
            F.sum(_revenue_cents(li)).alias("rev_cents"),
        )
    )


ORACLES["rel_discount_elasticity"] = (
    f"SELECT {_cents_sql('l_discount')} AS discount_pct, "
    "CAST(count(*) AS BIGINT) AS n_lines, "
    "round(avg(l_quantity), 6) AS avg_quantity, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev_cents "
    "FROM lineitem GROUP BY 1"
)

QUERIES["rel_discount_elasticity"] = q_discount_elasticity


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration HHI per part type: the Herfindahl index
    Σ share² of supplier revenue within each part type (≈1/n for
    balanced supply, →1 for a single-supplier chokepoint — the
    procurement-risk scan).  Shares derive from exact integer cents;
    the squared-share sum runs over the (type, supplier)-bounded
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.select("l_partkey", "l_suppkey", _revenue_cents(li).alias("rev"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("ptype"), "l_suppkey")
        .agg(F.sum("rev").alias("rev"))
    )
    tot = rev.groupBy("ptype").agg(
        F.sum("rev").alias("tot"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    return (
        rev.join(F.broadcast(tot), "ptype")
        .groupBy("ptype", "n_suppliers")
        .agg(
            F.round(
                F.sum(
                    (F.col("rev") / F.col("tot"))
                    * (F.col("rev") / F.col("tot"))
                ),
                6,
            ).alias("hhi")
        )
        .select("ptype", "n_suppliers", "hhi")
    )


ORACLES["rel_supplier_hhi"] = (
    "WITH rev AS (SELECT p.p_type AS ptype, l.l_suppkey, "
    f"CAST(sum({_REV_SQL}) AS BIGINT) AS rev "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "GROUP BY 1, 2), "
    "tot AS (SELECT ptype, sum(rev) AS tot, "
    "CAST(count(*) AS BIGINT) AS n_suppliers FROM rev GROUP BY ptype) "
    "SELECT r.ptype, t.n_suppliers, "
    "round(sum((r.rev / CAST(t.tot AS DOUBLE)) "
    "* (r.rev / CAST(t.tot AS DOUBLE))), 6) AS hhi "
    "FROM rev r JOIN tot t USING (ptype) GROUP BY 1, 2"
)

QUERIES["rel_supplier_hhi"] = q_supplier_hhi


def q_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per market segment: exact median /
    p90 days between a customer's consecutive orders — the
    replenishment-cycle metric behind every reorder-nudge campaign.

    Shape: gaps come from one lag() window PARTITIONED BY CUSTOMER
    over integer epoch days (bounded independent partitions), the
    segment dimension joins broadcast, and the rollup runs an exact
    percentile per segment (bounded group count)."""
    ords = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"
        ).alias("day"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        ords.withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev_day").isNotNull())
        .select(
            "o_custkey", (F.col("day") - F.col("prev_day")).alias("gap_days")
        )
    )
    return (
        gaps.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        # r12: the array-percentile merge was A/B'd here and reverted
        # (0.625 → 0.708 warm min-of-3 twice — per-customer gaps are
        # too few for the buffer saving to beat the extra projection)
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias(
                "median_gap_days"
            ),
            F.round(F.expr("percentile(gap_days, 0.9)"), 6).alias(
                "p90_gap_days"
            ),
        )
    )


ORACLES["rel_repeat_purchase_interval"] = (
    "WITH o AS (SELECT o_custkey, o_orderkey, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) AS day "
    "FROM orders), "
    "g AS (SELECT o_custkey, day - lag(day) OVER w AS gap_days FROM o "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)) "
    "SELECT c.c_mktsegment AS segment, "
    "CAST(count(*) AS BIGINT) AS n_gaps, "
    "round(quantile_cont(g.gap_days, 0.5), 6) AS median_gap_days, "
    "round(quantile_cont(g.gap_days, 0.9), 6) AS p90_gap_days "
    "FROM g JOIN customer c ON g.o_custkey = c.c_custkey "
    "WHERE g.gap_days IS NOT NULL GROUP BY 1"
)

QUERIES["rel_repeat_purchase_interval"] = q_repeat_purchase_interval


# --- UNPIVOT / melt (r5) ---------------------------------------------


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping through the engine's NATIVE unpivot (melt)
    operator — the inverse surface of events_hourly_pivot's PIVOT: the
    per-returnflag pricing rollup (3 measure columns) melts into one
    (flag, metric, value) row per measure, the shape metric stores
    and chart layers ingest.  All measures round to 6 BEFORE the melt
    so the long table carries engine-identical doubles.

    Scale shape: the melt runs on the post-aggregation rollup (groups
    × 3 rows), not the fact table — pivot/unpivot on bounded rollups
    is free; the fact scan partial-aggregates exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "avg_disc"],
        "metric",
        "value",
    )


ORACLES["rel_unpivot_metrics"] = (
    "WITH w AS (SELECT l_returnflag, "
    "round(sum(l_quantity), 6) AS sum_qty, "
    "round(sum(l_extendedprice), 6) AS sum_price, "
    "round(avg(l_discount), 6) AS avg_disc "
    "FROM lineitem GROUP BY l_returnflag) "
    "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w "
    "UNION ALL "
    "SELECT l_returnflag, 'sum_price', sum_price FROM w "
    "UNION ALL "
    "SELECT l_returnflag, 'avg_disc', avg_disc FROM w"
)

QUERIES["rel_unpivot_metrics"] = q_unpivot_metrics


# --- GROUPED_AGG pandas twin of the weighted median ------------------


def q_weighted_median_pandas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The quantity-weighted median through a GROUPED_AGG
    ``pandas_udf`` — the last Python-boundary API the engine had not
    priced (mapInPandas, applyInPandas[WithState],
    cogroup.applyInPandas, mapInArrow and UDTF all have twins).  Same
    oracle as :func:`q_weighted_median_price`: the JVM
    partitioned-window plan is the production path; THIS form is the
    template for group-reductions that outgrow SQL expressions, and
    the bench prices the Arrow transfer + per-group pandas eval.

    Boundary caveat (why the JVM plan wins at 100 TB): a grouped-agg
    UDF materializes each group's columns in executor memory, so cost
    is O(largest group); the window plan streams sorted runs.  Shuffle
    shape is identical — ONE exchange keyed on the group."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wmedian(price: pd.Series, w: pd.Series) -> float:
        d = pd.DataFrame({"p": price, "w": w}).sort_values("p")
        cum = d["w"].cumsum()
        return round(float(d["p"][cum >= d["w"].sum() / 2].iloc[0]), 6)

    # Catalyst forbids mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a second tiny pandas aggregate
    @pandas_udf("long")
    def _n(price: pd.Series) -> int:
        return int(price.size)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
        F.col("l_quantity").alias("w"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("p_brand").alias("brand"), "price", "w")
    return j.groupBy("brand").agg(
        _wmedian("price", "w").alias("weighted_median_price"),
        _n("price").alias("n_lineitems"),
    )


# identical contract, second physical strategy — one oracle, two plans
ORACLES["rel_weighted_median_pandas"] = ORACLES[
    "rel_weighted_median_price"
]
QUERIES["rel_weighted_median_pandas"] = q_weighted_median_pandas


# --- pandas-on-Spark twin of the pricing summary ---------------------


def q_pricing_summary_ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 through the pandas API on Spark (``pyspark.pandas``) —
    the third front door to the same logical plan (DataFrame API,
    SQL, and now the pandas dialect analysts already know).  The
    point this twin proves: ps operations COMPILE TO CATALYST — the
    filter, the integer-cents derivations and the groupby-agg all run
    as JVM column expressions (no Python boundary anywhere; the plan
    test pins zero Arrow/pandas eval nodes), so a pandas user gets
    distributed execution without rewriting.  Same oracle as
    `rel_pricing_summary`, column for column.

    Caveat the docstring owes the 100 TB reader: ps defaults that
    materialize orderings (iloc, default index = SEQUENCE) are the
    expensive path — this query keeps a distributed-friendly shape
    (`attach_distributed_sequence` never triggers; groupby keys form
    the result identity, not the index)."""
    import os

    import pyspark.pandas as ps

    prev = ps.get_option("compute.default_index_type")
    ps.set_option("compute.default_index_type", "distributed")
    try:
        li = ps.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li = li[li.l_shipdate <= "1998-09-02"]
        cents = (li.l_extendedprice * 100).round(0).astype("int64")
        disc = (li.l_discount * 100).round(0).astype("int64")
        tax = (li.l_tax * 100).round(0).astype("int64")
        li = li.assign(
            qty=li.l_quantity.astype("int64"),
            base_cents=cents,
            disc_price_u=cents * (100 - disc),
            charge_u=cents * (100 - disc) * (100 + tax),
            disc_pct=disc,
        )
        g = li.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("qty", "sum"),
            sum_base_price_cents=("base_cents", "sum"),
            sum_disc_price_u=("disc_price_u", "sum"),
            sum_charge_u=("charge_u", "sum"),
            count_order=("qty", "count"),
            sum_disc=("disc_pct", "sum"),
        )
        out = g.reset_index().to_spark()
    finally:
        ps.set_option("compute.default_index_type", prev)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("long"),
        F.col("sum_base_price_cents").cast("long"),
        F.col("sum_disc_price_u").cast("long"),
        F.col("sum_charge_u").cast("long"),
        F.col("count_order").cast("long"),
        F.round(
            F.col("sum_qty").cast("double") / F.col("count_order"), 6
        ).alias("avg_qty"),
        F.round(
            F.col("sum_base_price_cents").cast("double")
            / F.col("count_order"),
            6,
        ).alias("avg_price_cents"),
        F.round(
            F.col("sum_disc").cast("double") / F.col("count_order"), 6
        ).alias("avg_disc_pct"),
    )


from .relational import ORACLES as _REL1_ORACLES  # noqa: E402

ORACLES["rel_pricing_summary_ps"] = _REL1_ORACLES["rel_pricing_summary"]
QUERIES["rel_pricing_summary_ps"] = q_pricing_summary_ps


# --- Pareto frontier (skyline) -----------------------------------------
#
# The classic SKYLINE operator (Börzsönyi et al., ICDE 2001): parts
# not dominated on (minimize p_retailprice, maximize p_size) — the
# "best price for at least this size" procurement shortlist.  SQL
# states it as a NOT EXISTS self-join (the oracle does exactly that);
# a distributed engine must NOT run the O(N²) theta-join it implies.
#
# Two-phase plan, the standard distributed skyline:
#   1. BUCKET PREFILTER — bucket price into fixed $5 cells, take each
#      bucket's max size (a B-row aggregate), prefix-max it over
#      strictly-cheaper buckets (a window over B rows — calendar-small,
#      broadcast back).  A part whose size ≤ that prefix max is
#      dominated by some strictly-cheaper part and is cut HERE, in a
#      narrow map against a broadcast — this is where ~all of the
#      corpus disappears at scale.
#   2. EXACT FINISH — among survivors (≈ frontier-sized; worst case a
#      fully anti-correlated corpus where the skyline IS large and no
#      algorithm can emit less), per-price max-size + a running max
#      over strictly-lower prices decides exact dominance, including
#      the equal-price / equal-size tie rules (ties both survive —
#      neither strictly dominates).
#
# Cents discipline: all comparisons run on integer cents; the dollar
# price re-exposes as round(cents/100, 2) so both engines hash the
# same doubles.

SKY_BUCKET_CENTS = 500  # $5 price cells for the prefilter


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        _cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    bkt = part.withColumn(
        "bk", F.floor(F.col("price_c") / SKY_BUCKET_CENTS).cast("long")
    )
    bmax = bkt.groupBy("bk").agg(F.max("size").alias("bsize"))
    wb = Window.orderBy("bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pre = bmax.select(
        "bk", F.max("bsize").over(wb).alias("cheaper_max")
    )
    cand = bkt.join(F.broadcast(pre), "bk").filter(
        F.col("cheaper_max").isNull()
        | (F.col("size") > F.col("cheaper_max"))
    )
    per_price = cand.groupBy("price_c").agg(F.max("size").alias("msize"))
    wp = Window.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_prices = per_price.select(
        "price_c",
        "msize",
        F.max("msize").over(wp).alias("run_max"),
    ).filter(
        F.col("run_max").isNull() | (F.col("msize") > F.col("run_max"))
    )
    return (
        cand.join(
            F.broadcast(frontier_prices.select("price_c", "msize")),
            "price_c",
        )
        .filter(F.col("size") == F.col("msize"))
        .select(
            "p_partkey",
            F.round(F.col("price_c") / 100.0, 2).alias("p_retailprice"),
            F.col("size").alias("p_size"),
        )
    )


ORACLES["rel_pareto_frontier"] = (
    f"WITH p AS (SELECT p_partkey, {_cents_sql('p_retailprice')} "
    "AS price_c, CAST(p_size AS BIGINT) AS size FROM part) "
    "SELECT a.p_partkey, round(a.price_c / 100.0, 2) AS p_retailprice, "
    "a.size AS p_size FROM p a WHERE NOT EXISTS ("
    "SELECT 1 FROM p b WHERE b.price_c <= a.price_c "
    "AND b.size >= a.size "
    "AND (b.price_c < a.price_c OR b.size > a.size))"
)

QUERIES["rel_pareto_frontier"] = q_pareto_frontier


# --- Kitagawa mix-vs-rate decomposition (r5) ------------------------------
#
# "AOV moved — did customers change their behavior, or did the
# CUSTOMER MIX change?"  The Kitagawa (1955) / Oaxaca-Blinder
# decomposition splits the year-over-year change in average order
# value into, per market segment,
#   mix  effect = (share₁ − share₀) · aov₀_seg
#   rate effect =  share₁ · (aov₁_seg − aov₀_seg)
# which sum EXACTLY to ΔAOV across segments (the test pins the
# identity).  The additive complement of events_kpi_decomposition's
# multiplicative factor split.
#
# Scale shape: orders ⋈ broadcast customer dim → one (year, segment)
# partial agg (integer cents/counts); the decomposition runs on the
# segments-sized table.  Doubles appear once, at the exposed ratios.

MIX_YEAR0 = 1996
MIX_YEAR1 = 1997


def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    base = (
        orders.filter(
            F.year("o_orderdate").isin(MIX_YEAR0, MIX_YEAR1)
        )
        .join(F.broadcast(cust), "o_custkey")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"), "segment"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    tot = base.groupBy("yr").agg(
        F.sum("n").cast("long").alias("n_tot")
    )
    seg = base.join(F.broadcast(tot), "yr").select(
        "segment",
        "yr",
        (F.col("n") / F.col("n_tot").cast("double")).alias("share"),
        (F.col("cents") / (F.lit(100.0) * F.col("n"))).alias("aov"),
    )
    y0 = seg.filter(F.col("yr") == MIX_YEAR0).select(
        "segment",
        F.col("share").alias("share0"),
        F.col("aov").alias("aov0"),
    )
    y1 = seg.filter(F.col("yr") == MIX_YEAR1).select(
        "segment",
        F.col("share").alias("share1"),
        F.col("aov").alias("aov1"),
    )
    j = y0.join(y1, "segment")
    return j.select(
        "segment",
        F.round("share0", 6).alias("share0"),
        F.round("share1", 6).alias("share1"),
        F.round("aov0", 6).alias("aov0"),
        F.round("aov1", 6).alias("aov1"),
        F.round(
            (F.col("share1") - F.col("share0")) * F.col("aov0"), 6
        ).alias("mix_effect"),
        F.round(
            F.col("share1") * (F.col("aov1") - F.col("aov0")), 6
        ).alias("rate_effect"),
    )


ORACLES["rel_mix_shift"] = (
    "WITH base AS (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS yr, "
    "c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) "
    "AS cents FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    f"WHERE year(o.o_orderdate) IN ({MIX_YEAR0}, {MIX_YEAR1}) "
    "GROUP BY 1, 2), "
    "tot AS (SELECT yr, CAST(sum(n) AS BIGINT) AS n_tot FROM base "
    "GROUP BY yr), "
    "seg AS (SELECT b.segment, b.yr, "
    "b.n / CAST(t.n_tot AS DOUBLE) AS share, "
    "b.cents / (100.0 * b.n) AS aov FROM base b JOIN tot t "
    "ON b.yr = t.yr) "
    "SELECT a.segment, round(a.share, 6) AS share0, "
    "round(b.share, 6) AS share1, round(a.aov, 6) AS aov0, "
    "round(b.aov, 6) AS aov1, "
    "round((b.share - a.share) * a.aov, 6) AS mix_effect, "
    "round(b.share * (b.aov - a.aov), 6) AS rate_effect "
    f"FROM (SELECT * FROM seg WHERE yr = {MIX_YEAR0}) a "
    f"JOIN (SELECT * FROM seg WHERE yr = {MIX_YEAR1}) b "
    "ON a.segment = b.segment"
)

QUERIES["rel_mix_shift"] = q_mix_shift


# --- order-velocity audit (r5) ---------------------------------------------
#
# The fraud/DQ sweep over purchase cadence: for every customer with
# ≥ 2 orders, the gap between consecutive orders (lag over a
# per-customer window), the minimum gap, and how many orders arrived
# within RAPID_DAYS of the previous one — sub-3-day bursts from a
# single account are double-submission / bot suspects, and the flag
# makes the audit a one-filter readout.  (An exact-amount
# double-charge join was considered and dropped: synthetic prices
# are collision-free, so that audit would prove itself on zero rows.)
#
# Scale shape: ONE lag window partitioned BY CUSTOMER (bounded rows
# per partition), then a per-customer partial agg.  Gaps are exact
# integer days; no doubles anywhere.

RAPID_DAYS = 3


def q_order_velocity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(unix_timestamp(o_orderdate) AS LONG) DIV 86400")
        .cast("long")
        .alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        (F.col("d") - F.lag("d").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per = gaps.groupBy(F.col("o_custkey").alias("custkey")).agg(
        (F.count("*") + 1).cast("long").alias("n_orders"),
        F.min("gap").cast("long").alias("min_gap_days"),
        F.sum((F.col("gap") <= RAPID_DAYS).cast("long"))
        .cast("long")
        .alias("n_rapid"),
    )
    return per.select(
        "custkey",
        "n_orders",
        "min_gap_days",
        "n_rapid",
        (F.col("n_rapid") > 0).alias("velocity_flag"),
    )


ORACLES["rel_order_velocity_audit"] = (
    "WITH o AS (SELECT o_custkey, o_orderkey, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) AS d "
    "FROM orders), "
    "g AS (SELECT o_custkey, d - lag(d) OVER "
    "(PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap FROM o) "
    "SELECT o_custkey AS custkey, "
    "CAST(count(*) + 1 AS BIGINT) AS n_orders, "
    "CAST(min(gap) AS BIGINT) AS min_gap_days, "
    f"CAST(sum(CASE WHEN gap <= {RAPID_DAYS} THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_rapid, "
    f"sum(CASE WHEN gap <= {RAPID_DAYS} THEN 1 ELSE 0 END) > 0 "
    "AS velocity_flag "
    "FROM g WHERE gap IS NOT NULL GROUP BY o_custkey"
)

QUERIES["rel_order_velocity_audit"] = q_order_velocity_audit


# --- p-chart: returns-rate control chart (r5) -------------------------------
#
# Statistical process control over the returns stream: a p-chart
# (Shewhart) plots each month's return PROPORTION against 3σ binomial
# control limits around the long-run center line, with per-month
# limits widening as that month's volume shrinks (the n-dependent
# limits are what distinguish a p-chart from a naive z-score on the
# rate).  Months outside the limits are special-cause signals —
# the supplier-quality incident readout, complementing the EWMA
# level monitor on revenue.
#
# Exactness: n and returned are exact integers; the center line and
# limits are single-expression doubles, and the flag compares
# 6-rounded values.  Shape: ONE month-keyed partial agg + a 1-row
# center-line aggregate broadcast back.


def q_returns_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    monthly = li.groupBy("month").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("ret").cast("long").alias("n_returned"),
    )
    center = monthly.agg(
        (
            F.sum("n_returned").cast("double")
            / F.sum("n_items").cast("double")
        ).alias("p_bar")
    )
    j = monthly.crossJoin(F.broadcast(center))
    sigma = F.sqrt(
        F.col("p_bar") * (F.lit(1.0) - F.col("p_bar")) / F.col("n_items")
    )
    phat = F.col("n_returned") / F.col("n_items").cast("double")
    ucl = F.round(F.col("p_bar") + 3.0 * sigma, 6)
    lcl = F.round(
        F.greatest(F.lit(0.0), F.col("p_bar") - 3.0 * sigma), 6
    )
    return j.select(
        "month",
        "n_items",
        "n_returned",
        F.round(phat, 6).alias("p_hat"),
        F.round(F.col("p_bar"), 6).alias("center_line"),
        lcl.alias("lcl"),
        ucl.alias("ucl"),
        ((F.round(phat, 6) > ucl) | (F.round(phat, 6) < lcl)).alias(
            "out_of_control"
        ),
    )


ORACLES["rel_returns_p_chart"] = (
    "WITH li AS (SELECT strftime(l_shipdate, '%Y-%m') AS month, "
    "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret "
    "FROM lineitem), "
    "m AS (SELECT month, CAST(count(*) AS BIGINT) AS n_items, "
    "CAST(sum(ret) AS BIGINT) AS n_returned FROM li GROUP BY month), "
    "c AS (SELECT sum(n_returned) / CAST(sum(n_items) AS DOUBLE) "
    "AS p_bar FROM m) "
    "SELECT m.month, m.n_items, m.n_returned, "
    "round(m.n_returned / CAST(m.n_items AS DOUBLE), 6) AS p_hat, "
    "round(c.p_bar, 6) AS center_line, "
    "round(greatest(0.0, c.p_bar - 3.0 * sqrt(c.p_bar * (1.0 - c.p_bar) "
    "/ m.n_items)), 6) AS lcl, "
    "round(c.p_bar + 3.0 * sqrt(c.p_bar * (1.0 - c.p_bar) / m.n_items), "
    "6) AS ucl, "
    "(round(m.n_returned / CAST(m.n_items AS DOUBLE), 6) > "
    "round(c.p_bar + 3.0 * sqrt(c.p_bar * (1.0 - c.p_bar) / m.n_items), 6) "
    "OR round(m.n_returned / CAST(m.n_items AS DOUBLE), 6) < "
    "round(greatest(0.0, c.p_bar - 3.0 * sqrt(c.p_bar * (1.0 - c.p_bar) "
    "/ m.n_items)), 6)) AS out_of_control "
    "FROM m CROSS JOIN c"
)

QUERIES["rel_returns_p_chart"] = q_returns_p_chart


# --- join-cardinality estimation audit (r5) ---------------------------------
#
# The query-optimizer's own arithmetic, exposed as a query: the
# textbook equi-join estimate |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B)
# (uniform-frequency assumption — what a CBO computes from table
# stats before picking a join order) next to the TRUE output size
# (Σ_k cnt_A(k)·cnt_B(k), computed from the per-key count tables
# without materializing the join), and the skew diagnosis: the
# max-frequency product bounds how much one hot key contributes.
# Reading est vs actual on your own data is how you learn whether
# ANALYZE-based planning can be trusted on it (here the FK is
# uniform, so the estimate lands close — the row proves it).
#
# Shape: two per-key partial aggs co-partitioned on the join key,
# one key-equi join of COUNT tables (≪ the data join), 1-row output.


def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    ca = o.groupBy("k").agg(F.count("*").cast("long").alias("na"))
    cb = li.groupBy("k").agg(F.count("*").cast("long").alias("nb"))
    stats_a = ca.agg(
        F.sum("na").cast("long").alias("rows_a"),
        F.count("*").cast("long").alias("ndv_a"),
        F.max("na").cast("long").alias("maxf_a"),
    )
    stats_b = cb.agg(
        F.sum("nb").cast("long").alias("rows_b"),
        F.count("*").cast("long").alias("ndv_b"),
        F.max("nb").cast("long").alias("maxf_b"),
    )
    actual = (
        ca.join(cb, "k")
        .agg(
            F.sum(F.col("na") * F.col("nb")).cast("long").alias("actual")
        )
    )
    est = (
        F.col("rows_a")
        * F.col("rows_b")
        / F.greatest("ndv_a", "ndv_b").cast("double")
    )
    return (
        stats_a.crossJoin(F.broadcast(stats_b))
        .crossJoin(F.broadcast(actual))
        .select(
            "rows_a",
            "rows_b",
            "ndv_a",
            "ndv_b",
            F.floor(est).cast("long").alias("estimated_rows"),
            F.col("actual").alias("actual_rows"),
            F.round(
                F.floor(est) / F.col("actual").cast("double"), 6
            ).alias("est_over_actual"),
            (F.col("maxf_a") * F.col("maxf_b"))
            .cast("long")
            .alias("hot_key_bound"),
        )
    )


ORACLES["rel_join_cardinality_estimate"] = (
    "WITH ca AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na "
    "FROM orders GROUP BY 1), "
    "cb AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb "
    "FROM lineitem GROUP BY 1), "
    "sa AS (SELECT CAST(sum(na) AS BIGINT) AS rows_a, "
    "CAST(count(*) AS BIGINT) AS ndv_a, "
    "CAST(max(na) AS BIGINT) AS maxf_a FROM ca), "
    "sb AS (SELECT CAST(sum(nb) AS BIGINT) AS rows_b, "
    "CAST(count(*) AS BIGINT) AS ndv_b, "
    "CAST(max(nb) AS BIGINT) AS maxf_b FROM cb), "
    "ac AS (SELECT CAST(sum(ca.na * cb.nb) AS BIGINT) AS actual "
    "FROM ca JOIN cb USING (k)) "
    "SELECT sa.rows_a, sb.rows_b, sa.ndv_a, sb.ndv_b, "
    "CAST(floor(sa.rows_a * sb.rows_b / "
    "CAST(greatest(sa.ndv_a, sb.ndv_b) AS DOUBLE)) AS BIGINT) "
    "AS estimated_rows, ac.actual AS actual_rows, "
    "round(floor(sa.rows_a * sb.rows_b / "
    "CAST(greatest(sa.ndv_a, sb.ndv_b) AS DOUBLE)) / "
    "CAST(ac.actual AS DOUBLE), 6) AS est_over_actual, "
    "CAST(sa.maxf_a * sb.maxf_b AS BIGINT) AS hot_key_bound "
    "FROM sa CROSS JOIN sb CROSS JOIN ac"
)

QUERIES["rel_join_cardinality_estimate"] = q_join_cardinality_estimate


# --- open-order aging report (r5) --------------------------------------------
#
# The operations staple: every order still open ('O') aged against
# the corpus as-of date (max orderdate — a warehouse would pass
# CURRENT_DATE; using the data's own horizon keeps the query
# deterministic), bucketed into the 30/60/90/90+ day ladder with
# order counts and value at risk per bucket.  Exact integer days and
# cents; the as-of date is a 1-row broadcast aggregate.

_AGING_FENCES = (30, 60, 90)


def q_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr("CAST(unix_timestamp(o_orderdate) AS LONG) DIV 86400")
        .cast("long")
        .alias("d"),
    )
    asof = o.agg(F.max("d").alias("asof_d"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            (F.col("asof_d") - F.col("d")).cast("long").alias("age_days"),
            "cents",
        )
    )
    bucket = (
        F.when(F.col("age_days") <= _AGING_FENCES[0], "0-30")
        .when(F.col("age_days") <= _AGING_FENCES[1], "31-60")
        .when(F.col("age_days") <= _AGING_FENCES[2], "61-90")
        .otherwise("90+")
    )
    return aged.groupBy(bucket.alias("age_bucket")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("cents") / 100.0, 6).alias("open_value"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )


ORACLES["rel_order_aging"] = (
    "WITH o AS (SELECT o_orderstatus, "
    "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) AS d "
    "FROM orders), "
    "ad AS (SELECT max(d) AS asof_d FROM o), "
    "aged AS (SELECT CAST(ad.asof_d - o.d AS BIGINT) AS age_days, "
    "o.cents FROM o CROSS JOIN ad WHERE o.o_orderstatus = 'O') "
    "SELECT CASE WHEN age_days <= 30 THEN '0-30' "
    "WHEN age_days <= 60 THEN '31-60' "
    "WHEN age_days <= 90 THEN '61-90' ELSE '90+' END AS age_bucket, "
    "CAST(count(*) AS BIGINT) AS n_orders, "
    "round(sum(cents) / 100.0, 6) AS open_value, "
    "CAST(min(age_days) AS BIGINT) AS min_age_days, "
    "CAST(max(age_days) AS BIGINT) AS max_age_days "
    "FROM aged GROUP BY 1"
)

QUERIES["rel_order_aging"] = q_order_aging


# --- unit-price dispersion across suppliers (r5) -----------------------------
#
# The procurement-arbitrage sweep: for each part, how far apart are
# the unit prices different suppliers actually charged?  Per
# (part, supplier) the mean unit price (milli-cents integers — the
# extendedprice/quantity ratio rounded ONCE per line item), then per
# part the supplier count, min/max mean price, and the spread as a
# fraction of the min; the PRICE_DISP_K widest spreads with ≥ 2
# suppliers are the renegotiation queue.
#
# Shape: two nested partial aggs on (partkey, suppkey) → partkey —
# co-partitioned, no window until the final bounded top-k.

PRICE_DISP_K = 20


def q_unit_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") / F.col("l_quantity") * 1000
        )
        .cast("long")
        .alias("up_milli"),
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum("up_milli") / F.count("*").cast("double"))
        .cast("long")
        .alias("mean_up_milli"),
    )
    per_part = ps.groupBy(F.col("l_partkey").alias("partkey")).agg(
        # r12: ps is already unique in (partkey, suppkey) — its own
        # groupBy key — so count(*) IS the distinct supplier count;
        # dropping countDistinct removes the distinct-agg double
        # shuffle (guide §2.2) with an identical value
        F.count("*").cast("long").alias("n_suppliers"),
        F.min("mean_up_milli").cast("long").alias("min_up_milli"),
        F.max("mean_up_milli").cast("long").alias("max_up_milli"),
    ).filter(F.col("n_suppliers") >= 2)
    spread = F.round(
        (F.col("max_up_milli") - F.col("min_up_milli"))
        / F.col("min_up_milli").cast("double"),
        6,
    )
    top = (
        per_part.select(
            "partkey",
            "n_suppliers",
            F.round(F.col("min_up_milli") / 1000.0, 6).alias("min_unit_price"),
            F.round(F.col("max_up_milli") / 1000.0, 6).alias("max_unit_price"),
            spread.alias("spread_frac"),
        )
        .orderBy(F.desc("spread_frac"), F.asc("partkey"))
        .limit(PRICE_DISP_K)
    )
    w = Window.orderBy(F.desc("spread_frac"), F.asc("partkey"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "partkey",
        "n_suppliers",
        "min_unit_price",
        "max_unit_price",
        "spread_frac",
    )


ORACLES["rel_unit_price_dispersion"] = (
    "WITH li AS (SELECT l_partkey, l_suppkey, "
    "CAST(round(l_extendedprice / l_quantity * 1000, 0) AS BIGINT) "
    "AS up_milli FROM lineitem), "
    "ps AS (SELECT l_partkey, l_suppkey, "
    "CAST(round(sum(up_milli) / CAST(count(*) AS DOUBLE), 0) AS BIGINT) "
    "AS mean_up_milli FROM li GROUP BY l_partkey, l_suppkey), "
    "pp AS (SELECT l_partkey AS partkey, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers, "
    "CAST(min(mean_up_milli) AS BIGINT) AS mn, "
    "CAST(max(mean_up_milli) AS BIGINT) AS mx "
    "FROM ps GROUP BY l_partkey HAVING count(DISTINCT l_suppkey) >= 2) "
    "SELECT CAST(row_number() OVER (ORDER BY "
    "round((mx - mn) / CAST(mn AS DOUBLE), 6) DESC, partkey) "
    "AS INTEGER) AS rank, partkey, n_suppliers, "
    "round(mn / 1000.0, 6) AS min_unit_price, "
    "round(mx / 1000.0, 6) AS max_unit_price, "
    "round((mx - mn) / CAST(mn AS DOUBLE), 6) AS spread_frac "
    "FROM pp ORDER BY spread_frac DESC, partkey "
    f"LIMIT {PRICE_DISP_K}"
)

QUERIES["rel_unit_price_dispersion"] = q_unit_price_dispersion


# --- fill rate by order priority (r5) ----------------------------------------
#
# The fulfillment SLA readout: per order priority, what fraction of
# line items has actually shipped (l_linestatus = 'F'), in lines and
# in value — urgent orders stuck below the fleet average is the
# operations escalation trigger.  Broadcast the orders dim's
# (orderkey → priority) projection?  No: orders is fact-sized, so the
# join keys both sides on orderkey (co-partitioned fact⋈fact, the
# same single-shuffle family every rel_* fact join uses) and the
# rollup collapses to 5 priority rows map-side.

def q_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_linestatus") == "F").cast("long").alias("filled"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return (
        li.join(o, "l_orderkey")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("filled").cast("long").alias("n_filled"),
            F.round(
                F.sum("filled") / F.count("*").cast("double"), 6
            ).alias("line_fill_rate"),
            F.round(
                F.sum(F.col("filled") * F.col("cents"))
                / F.sum("cents").cast("double"),
                6,
            ).alias("value_fill_rate"),
        )
    )


ORACLES["rel_fill_rate"] = (
    "WITH li AS (SELECT l_orderkey, "
    "CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS filled, "
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents "
    "FROM lineitem) "
    "SELECT o.o_orderpriority AS priority, "
    "CAST(count(*) AS BIGINT) AS n_lines, "
    "CAST(sum(li.filled) AS BIGINT) AS n_filled, "
    "round(sum(li.filled) / CAST(count(*) AS DOUBLE), 6) "
    "AS line_fill_rate, "
    "round(sum(li.filled * li.cents) / CAST(sum(li.cents) AS DOUBLE), 6) "
    "AS value_fill_rate "
    "FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderpriority"
)

QUERIES["rel_fill_rate"] = q_fill_rate


# --- Laspeyres / Paasche / Fisher price indices (r6) -----------------------
#
# The economics readout over the fact table: how much did the
# EFFECTIVE price level move per year, holding the basket fixed?
# Laspeyres weights by the BASE year's part quantities (overstates
# inflation under substitution), Paasche by the CURRENT year's
# (understates), Fisher is their geometric mean.  Unit price per
# (part, year) = Σ extendedprice / Σ quantity — the volume-weighted
# realized price, not the list price.  The basket is the inner join
# of parts trading in BOTH years (the standard matched-basket
# discipline; composition drift is the documented Laspeyres caveat).
#
# Scale shape: the fact table reduces to the (part × year) price
# table in ONE partial-agg groupBy; every index is then arithmetic
# over that dimension-sized table self-joined on part (base year vs
# y).  Determinism: unit prices integer-scale to micro-cents
# (round(Σext_cents·1e6/Σqty) — exact BIGINT), so the basket sums are
# exact integer dot products (decimal ↔ HUGEINT); one double
# division at the edge, rounded 6.  The micro-scaling itself passes
# through a double, exact while ext_cents·1e6 < 2^53 (≈ $90M revenue
# per part-year — upgrade to decimal division if a corpus exceeds
# it; both engines use the identical op either way).

def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("yr")
    )
    py = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_partkey", "yr")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("ext_cents"),
            F.sum(F.round("l_quantity").cast("long")).alias("qty"),
        )
        .select(
            "l_partkey",
            "yr",
            "qty",
            F.round(
                F.col("ext_cents") * 1000000.0 / F.col("qty")
            )
            .cast("long")
            .alias("uprice_micro"),
        )
        # r12 (guide §5.3): the rollup fed THREE full evaluations of
        # the lineitem⨝orders subtree — the base-year scalar probe,
        # then the base and current sides of the self-join.  One
        # localCheckpoint materializes the ~|parts|·|years| rollup
        # once per invocation (no cross-run reuse; unlike cache() it
        # is not keyed on the logical plan, so every bench lap still
        # recomputes from parquet) and all three consumers read it.
        .localCheckpoint()
    )
    base_yr = py.agg(F.min("yr").alias("b")).first()["b"]  # scalar
    base = py.filter(F.col("yr") == base_yr).select(
        "l_partkey",
        F.col("qty").alias("q0"),
        F.col("uprice_micro").alias("p0"),
    )
    cur = py.filter(F.col("yr") != base_yr)
    j = cur.join(F.broadcast(base), "l_partkey")
    dec = "decimal(38,0)"
    agg = j.groupBy("yr").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum((F.col("uprice_micro") * F.col("q0")).cast(dec)).alias(
            "l_num"
        ),
        F.sum((F.col("p0") * F.col("q0")).cast(dec)).alias("l_den"),
        F.sum((F.col("uprice_micro") * F.col("qty")).cast(dec)).alias(
            "p_num"
        ),
        F.sum((F.col("p0") * F.col("qty")).cast(dec)).alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return agg.select(
        "yr",
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


ORACLES["rel_price_index"] = (
    "WITH py AS (SELECT l_partkey, "
    "CAST(year(o_orderdate) AS INTEGER) AS yr, "
    "CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty, "
    "CAST(round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) "
    "* 1000000.0 / sum(CAST(round(l_quantity, 0) AS BIGINT)), 0) "
    "AS BIGINT) AS uprice_micro "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY l_partkey, year(o_orderdate)), "
    "b AS (SELECT min(yr) AS byr FROM py), "
    "base AS (SELECT l_partkey, qty AS q0, uprice_micro AS p0 "
    "FROM py CROSS JOIN b WHERE yr = byr), "
    "j AS (SELECT py.yr, py.qty, py.uprice_micro, base.q0, base.p0 "
    "FROM py CROSS JOIN b JOIN base USING (l_partkey) "
    "WHERE py.yr <> byr), "
    "a AS (SELECT yr, CAST(count(*) AS BIGINT) AS n_parts, "
    "sum(uprice_micro * q0) AS l_num, sum(p0 * q0) AS l_den, "
    "sum(uprice_micro * qty) AS p_num, sum(p0 * qty) AS p_den "
    "FROM j GROUP BY yr) "
    "SELECT yr, n_parts, "
    "round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6) "
    "AS laspeyres, "
    "round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6) "
    "AS paasche, "
    "round(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)) * "
    "(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6) AS fisher "
    "FROM a"
)

QUERIES["rel_price_index"] = q_price_index


# --- BG/NBD P(alive) — buy-till-you-die CLV (r6) --------------------------
#
# The probabilistic-CLV workhorse (Fader, Hardie & Lee 2005,
# "Counting your customers the easy way"): under the BG/NBD model a
# customer with frequency x (repeat purchases), recency t_x and
# observation span T is still alive with closed-form probability
#   P(alive) = 1 / (1 + a/(b+x−1) · ((α+T)/(α+t_x))^(r+x)),  x ≥ 1
# (x = 0 ⇒ 1 under the model's "churn only at a purchase"
# assumption).  The shape parameters (r, α, a, b) are MODEL inputs —
# fitted offline by MLE in practice; the documented defaults here are
# the classic CDNOW-magnitude values, making the query the SCORING
# pass a fitted model ships to.
#
# Scale shape: one orders groupBy to per-customer (x, t_x, T) RFM
# sufficient statistics (integer day arithmetic), the corpus horizon
# a 1-row broadcast; the formula is a narrow map with one pow per
# row.  Rounding: t_x/T are exact integer days; pow applies once to
# identical doubles; output rounds to 6.

BTYD_R = 0.25
BTYD_ALPHA = 4.0
BTYD_A = 0.8
BTYD_B = 2.5


def q_btyd_palive(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)"
        ).alias("d"),
    )
    per = orders.groupBy("o_custkey").agg(
        (F.count("*") - 1).cast("long").alias("x"),
        F.min("d").alias("first_d"),
        F.max("d").alias("last_d"),
    )
    horizon = orders.agg(F.max("d").alias("end_d"))
    j = per.crossJoin(F.broadcast(horizon)).select(
        F.col("o_custkey").alias("custkey"),
        "x",
        (F.col("last_d") - F.col("first_d")).cast("long").alias("t_x"),
        (F.col("end_d") - F.col("first_d")).cast("long").alias("t_obs"),
    )
    ratio = (F.lit(BTYD_ALPHA) + F.col("t_obs")) / (
        F.lit(BTYD_ALPHA) + F.col("t_x")
    )
    odds = (
        F.lit(BTYD_A)
        / (F.lit(BTYD_B) + F.col("x") - 1)
        * F.pow(ratio, F.lit(BTYD_R) + F.col("x"))
    )
    palive = F.when(F.col("x") == 0, F.lit(1.0)).otherwise(
        1.0 / (1.0 + odds)
    )
    return j.select(
        "custkey",
        "x",
        "t_x",
        "t_obs",
        F.round(palive, 6).alias("p_alive"),
    )


ORACLES["rel_btyd_palive"] = (
    "WITH o AS (SELECT o_custkey, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) "
    "AS d FROM orders), "
    "per AS (SELECT o_custkey, CAST(count(*) - 1 AS BIGINT) AS x, "
    "min(d) AS first_d, max(d) AS last_d FROM o GROUP BY o_custkey), "
    "h AS (SELECT max(d) AS end_d FROM o), "
    "j AS (SELECT o_custkey AS custkey, x, "
    "CAST(last_d - first_d AS BIGINT) AS t_x, "
    "CAST(end_d - first_d AS BIGINT) AS t_obs "
    "FROM per CROSS JOIN h) "
    "SELECT custkey, x, t_x, t_obs, "
    "round(CASE WHEN x = 0 THEN 1.0 ELSE "
    f"1.0 / (1.0 + {BTYD_A} / ({BTYD_B} + x - 1) * "
    f"power(({BTYD_ALPHA} + t_obs) / ({BTYD_ALPHA} + t_x), "
    f"{BTYD_R} + x)) END, 6) AS p_alive "
    "FROM j"
)

QUERIES["rel_btyd_palive"] = q_btyd_palive


# --- newsvendor stocking quantile (r6) ------------------------------------
#
# The operations-research classic: with underage cost c_u and overage
# cost c_o, the optimal stock is the demand distribution's quantile
# at the critical ratio c_u/(c_u+c_o) (here 0.8).  Per brand: the
# exact 0.8 order statistic of DAILY demand (ceil(0.8·n)-th smallest
# — integer rank, engine-exact, no interpolation), plus the realized
# service level at that stock (share of days fully served) — ≥ 0.8 by
# construction, the test's invariant.
#
# Scale shape: the fact scan reduces to (brand × day) demand in ONE
# partial-agg groupBy (lineitem⋈part with the part dim broadcast);
# the order statistic is a window over each brand's DAY-grain series
# (bounded by the calendar, not the data), the same discipline as the
# exact-percentile family.

NEWSVENDOR_CR = 0.8  # critical ratio c_u / (c_u + c_o)


def q_newsvendor_stock(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)"
        ).alias("day"),
    )
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("p_brand", "day")
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("demand")
        )
    )
    # r12 (guide §2.4, the weighted-median precedent): q_star used to
    # come from a filtered copy of `daily` broadcast-joined back onto
    # a SECOND full evaluation of the lineitem⨝part⨝orders rollup.
    # Both window frames share the p_brand partitioning, so attaching
    # q_star as a full-frame MAX over the already-ranked rows keeps
    # ONE evaluation of the join subtree and one exchange; the
    # demand-at-ceil(cr·n) row and every downstream aggregate are
    # identical (integer demand, same rn tie order).
    w = Window.partitionBy("p_brand").orderBy("demand", "day")
    full = Window.partitionBy("p_brand")
    ranked = daily.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).withColumn("n_days", F.count("*").over(full).cast("long"))
    idx = F.ceil(F.lit(NEWSVENDOR_CR) * F.col("n_days")).cast("long")
    with_q = ranked.withColumn(
        "q_star",
        F.max(F.when(F.col("rn") == idx, F.col("demand"))).over(full),
    )
    served = with_q.groupBy("p_brand").agg(
        F.max("n_days").alias("n_days"),
        F.max("q_star").alias("q_star"),
        F.round(
            F.avg((F.col("demand") <= F.col("q_star")).cast("double")),
            6,
        ).alias("service_level"),
        F.round(F.avg("demand"), 6).alias("mean_demand"),
    )
    return served.select(
        "p_brand", "n_days", "q_star", "mean_demand", "service_level"
    )


ORACLES["rel_newsvendor_stock"] = (
    "WITH daily AS (SELECT p_brand, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) "
    "AS day, "
    "CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) "
    "AS demand "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY p_brand, day), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY p_brand "
    "ORDER BY demand, day) AS rn, "
    "count(*) OVER (PARTITION BY p_brand) AS n_days FROM daily), "
    "q AS (SELECT p_brand, CAST(n_days AS BIGINT) AS n_days, "
    "demand AS q_star FROM r "
    f"WHERE rn = CAST(ceil({NEWSVENDOR_CR} * n_days) AS BIGINT)) "
    "SELECT d.p_brand, max(q.n_days) AS n_days, "
    "max(q.q_star) AS q_star, "
    "round(avg(d.demand), 6) AS mean_demand, "
    "round(avg(CASE WHEN d.demand <= q.q_star THEN 1.0 ELSE 0.0 "
    "END), 6) AS service_level "
    "FROM daily d JOIN q ON d.p_brand = q.p_brand "
    "GROUP BY d.p_brand"
)

QUERIES["rel_newsvendor_stock"] = q_newsvendor_stock


# --- Bass diffusion fit (r6) ----------------------------------------------
#
# New-product adoption analytics (Bass 1969): daily NEW-customer
# counts y_t follow y = pM + (q−p)·N − (q/M)·N² in the cumulative
# adopters N — quadratic in N, so the nonlinear (p, q, M) fit reduces
# to 3-variable OLS (the classic discrete-Bass trick) followed by the
# closed-form recovery M = (−b − √(b²−4ac))/(2c), p = a/M, q = −cM
# and the adoption-peak time t* = ln(q/p)/(p+q).
#
# Scale shape: first-order day per customer is one groupBy; the daily
# y series and its cumulative are DAY-grain windows (calendar-
# bounded); the normal-equation sums are ONE exact-integer aggregate
# (Σ N^k y^j as decimal ↔ HUGEINT — N⁴ stays inside 2¹²⁷ far past
# bench scale), and Cramer's rule runs on those sums ONCE, with the
# identical literal expression on both engines so every IEEE op
# matches.  Days with zero new adopters don't appear as rows (the
# regression runs over observed adoption days; identical on both
# engines, documented).

def q_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)"
        ).alias("d"),
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("d").alias("fd")
    )
    daily = first.groupBy("fd").agg(
        F.count("*").cast("long").alias("y")
    )
    wcum = Window.orderBy("fd").rowsBetween(
        Window.unboundedPreceding, -1
    )
    series = daily.select(
        "fd",
        "y",
        F.coalesce(F.sum("y").over(wcum), F.lit(0))
        .cast("long")
        .alias("n_prev"),
    )
    dec = "decimal(38,0)"
    s = series.agg(
        F.count("*").cast("long").alias("s0"),
        F.sum(F.col("n_prev").cast(dec)).alias("s1"),
        F.sum((F.col("n_prev") * F.col("n_prev")).cast(dec)).alias(
            "s2"
        ),
        F.sum(
            (
                F.col("n_prev") * F.col("n_prev") * F.col("n_prev")
            ).cast(dec)
        ).alias("s3"),
        F.sum(
            (
                F.col("n_prev")
                * F.col("n_prev")
                * F.col("n_prev")
                * F.col("n_prev")
            ).cast(dec)
        ).alias("s4"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("n_prev") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum(
            (F.col("n_prev") * F.col("n_prev") * F.col("y")).cast(dec)
        ).alias("sx2y"),
    )
    d = {
        k: F.col(k).cast("double")
        for k in ("s0", "s1", "s2", "s3", "s4", "sy", "sxy", "sx2y")
    }
    det = (
        d["s0"] * (d["s2"] * d["s4"] - d["s3"] * d["s3"])
        - d["s1"] * (d["s1"] * d["s4"] - d["s3"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s3"] - d["s2"] * d["s2"])
    )
    det_a = (
        d["sy"] * (d["s2"] * d["s4"] - d["s3"] * d["s3"])
        - d["s1"] * (d["sxy"] * d["s4"] - d["s3"] * d["sx2y"])
        + d["s2"] * (d["sxy"] * d["s3"] - d["s2"] * d["sx2y"])
    )
    det_b = (
        d["s0"] * (d["sxy"] * d["s4"] - d["sx2y"] * d["s3"])
        - d["sy"] * (d["s1"] * d["s4"] - d["s3"] * d["s2"])
        + d["s2"] * (d["s1"] * d["sx2y"] - d["s2"] * d["sxy"])
    )
    det_c = (
        d["s0"] * (d["s2"] * d["sx2y"] - d["s3"] * d["sxy"])
        - d["s1"] * (d["s1"] * d["sx2y"] - d["s2"] * d["sxy"])
        + d["sy"] * (d["s1"] * d["s3"] - d["s2"] * d["s2"])
    )
    a, b, c = det_a / det, det_b / det, det_c / det
    disc = b * b - 4.0 * a * c
    m = F.when(
        (disc >= 0) & (c < 0),
        (-b - F.sqrt(disc)) / (2.0 * c),
    )
    p = a / m
    q = -c * m
    return s.select(
        F.col("s0").alias("n_days"),
        F.round(a, 6).alias("coef_a"),
        F.round(b, 6).alias("coef_b"),
        F.round(c, 6).alias("coef_c"),
        F.round(m, 2).alias("m_hat"),
        F.round(p, 6).alias("p_hat"),
        F.round(q, 6).alias("q_hat"),
        F.round(F.log(q / p) / (p + q), 4).alias("t_peak_days"),
    )


ORACLES["rel_bass_diffusion"] = (
    "WITH o AS (SELECT o_custkey, "
    "CAST(epoch_ns(o_orderdate) // 1000000000 // 86400 AS BIGINT) "
    "AS d FROM orders), "
    "fst AS (SELECT o_custkey, min(d) AS fd FROM o GROUP BY o_custkey), "
    "daily AS (SELECT fd, CAST(count(*) AS BIGINT) AS y "
    "FROM fst GROUP BY fd), "
    "series AS (SELECT fd, y, "
    "CAST(coalesce(sum(y) OVER (ORDER BY fd ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_prev FROM daily), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS s0, sum(n_prev) AS s1, "
    "sum(n_prev * n_prev) AS s2, "
    "sum(n_prev * n_prev * n_prev) AS s3, "
    "sum(n_prev * n_prev * n_prev * n_prev) AS s4, "
    "sum(y) AS sy, sum(n_prev * y) AS sxy, "
    "sum(n_prev * n_prev * y) AS sx2y FROM series), "
    "dd AS (SELECT s0, CAST(s0 AS DOUBLE) AS s0d, "
    "CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d, "
    "CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d, "
    "CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd, "
    "CAST(sx2y AS DOUBLE) AS sx2yd FROM s), "
    "f AS (SELECT s0, "
    "(syd * (s2d * s4d - s3d * s3d) "
    "- s1d * (sxyd * s4d - s3d * sx2yd) "
    "+ s2d * (sxyd * s3d - s2d * sx2yd)) / "
    "(s0d * (s2d * s4d - s3d * s3d) "
    "- s1d * (s1d * s4d - s3d * s2d) "
    "+ s2d * (s1d * s3d - s2d * s2d)) AS a, "
    "(s0d * (sxyd * s4d - sx2yd * s3d) "
    "- syd * (s1d * s4d - s3d * s2d) "
    "+ s2d * (s1d * sx2yd - s2d * sxyd)) / "
    "(s0d * (s2d * s4d - s3d * s3d) "
    "- s1d * (s1d * s4d - s3d * s2d) "
    "+ s2d * (s1d * s3d - s2d * s2d)) AS b, "
    "(s0d * (s2d * sx2yd - s3d * sxyd) "
    "- s1d * (s1d * sx2yd - s2d * sxyd) "
    "+ syd * (s1d * s3d - s2d * s2d)) / "
    "(s0d * (s2d * s4d - s3d * s3d) "
    "- s1d * (s1d * s4d - s3d * s2d) "
    "+ s2d * (s1d * s3d - s2d * s2d)) AS c FROM dd), "
    "g AS (SELECT s0, a, b, c, "
    "CASE WHEN b * b - 4.0 * a * c >= 0 AND c < 0 THEN "
    "(-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c) END AS m FROM f) "
    "SELECT s0 AS n_days, round(a, 6) AS coef_a, "
    "round(b, 6) AS coef_b, round(c, 6) AS coef_c, "
    "round(m, 2) AS m_hat, round(a / m, 6) AS p_hat, "
    "round(-c * m, 6) AS q_hat, "
    "round(ln((-c * m) / (a / m)) / (a / m + -c * m), 4) "
    "AS t_peak_days FROM g"
)

QUERIES["rel_bass_diffusion"] = q_bass_diffusion


# --- referential-integrity audit (r7) ----------------------------------
#
# The dbt-test / data-contract staple a warehouse runs before every
# publish: per foreign-key edge, how many child rows point at a
# missing parent?  Each edge is ONE left-anti join (Catalyst plans
# broadcast-anti for the dimension edges, shuffle-anti for
# fact→fact) plus a 1-row count — no row ever widens, so the audit is
# scan-bound at any scale and the per-edge aggregates union into a
# fixed |edges|-row report.

_FK_EDGES = (
    # (edge label, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def q_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §1.2/§2.4): the per-edge anti-join + separate count
    # scanned every child twice per edge (lineitem 6×).  Grouping the
    # edges by child table and probing each child ONCE — left joins
    # against the parents' distinct keys, orphan = unmatched — yields
    # the same counts from 5 child passes instead of 14 subtree
    # evaluations: a row is an orphan for edge e iff its key has no
    # parent match, exactly the anti-join membership, and a left join
    # against DISTINCT keys preserves child cardinality so count(*)
    # is n_child.  Join strategy stays planner-chosen (broadcast at
    # bench scale, shuffle when a parent outgrows the threshold).
    by_child: dict[str, list] = {}
    for label, child, ck, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((label, ck, parent, pk))
    out = None
    for child, edges in by_child.items():
        j = load_table(spark, sf_dir, child).select(
            *[F.col(ck).alias(f"k{i}") for i, (_, ck, _, _) in enumerate(edges)]
        )
        for i, (_, _, parent, pk) in enumerate(edges):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"pk{i}"))
                .distinct()
            )
            j = j.join(p, F.col(f"k{i}") == F.col(f"pk{i}"), "left")
        agg = j.agg(
            F.count("*").cast("long").alias("n_child"),
            *[
                # coalesce: SUM over an empty child is NULL, the old
                # anti-join count was 0
                F.coalesce(
                    F.sum(F.col(f"pk{i}").isNull().cast("long")), F.lit(0)
                )
                .cast("long")
                .alias(f"n_orphans_{i}")
                for i in range(len(edges))
            ],
        )
        arms = F.array(
            *[
                F.struct(
                    F.lit(label).alias("edge"),
                    F.col("n_child").alias("n_child"),
                    F.col(f"n_orphans_{i}").alias("n_orphans"),
                    F.round(
                        F.col(f"n_orphans_{i}") / F.col("n_child"), 6
                    ).alias("orphan_rate"),
                )
                for i, (label, _, _, _) in enumerate(edges)
            ]
        )
        rowdf = agg.select(F.explode(arms).alias("s")).select("s.*")
        out = rowdf if out is None else out.unionByName(rowdf)
    return out


ORACLES_R7 = {
    "rel_referential_audit": " UNION ALL ".join(
        f"SELECT '{label}' AS edge, "
        f"CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child, "
        f"CAST((SELECT count(*) FROM {child} c WHERE NOT EXISTS "
        f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS BIGINT) "
        "AS n_orphans, "
        f"round(CAST((SELECT count(*) FROM {child} c WHERE NOT EXISTS "
        f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS DOUBLE) "
        f"/ (SELECT count(*) FROM {child}), 6) AS orphan_rate"
        for label, child, ck, parent, pk in _FK_EDGES
    )
}
QUERIES_R7 = {"rel_referential_audit": q_referential_audit}


# --- release gate (r7 capstone) ----------------------------------------
#
# The publish-time one-liner a warehouse runs before sharing the
# dataset: compose the referential audit (orphan FKs), the
# key-dependency audit (the two true-key FDs below must HOLD), and
# the k-anonymity floor into one PASS/FAIL row with each gate's
# evidence number.  All three inputs are already bounded rollups, so
# the gate is three 1-row broadcast aggregates — the same S5 scalar
# shape the corpus-health capstone uses on the documents side.

# true-key dependencies only (the FD_CANDIDATES list also carries
# deliberately-violated hypotheses for the audit's sake)
_GATE_FDS = (
    ("orders", "o_orderkey", "o_custkey"),
    ("customer", "c_custkey", "c_nationkey"),
)
_GATE_MIN_K = 2  # release floor: no singleton QI class


def q_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .privacy import _classes

    orphans = q_referential_audit(spark, sf_dir).agg(
        F.sum("n_orphans").cast("long").alias("n_orphans")
    )
    fd_bad = None
    for table, det, dep in _GATE_FDS:
        per = (
            load_table(spark, sf_dir, table)
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("n_dep"))
            .agg(
                F.sum((F.col("n_dep") > 1).cast("long")).alias("v")
            )
        )
        fd_bad = per if fd_bad is None else fd_bad.unionByName(per)
    fd = fd_bad.agg(F.sum("v").cast("long").alias("n_fd_violations"))
    kmin = _classes(spark, sf_dir).agg(
        F.min("class_size").cast("long").alias("min_class_size")
    )
    return (
        orphans.crossJoin(F.broadcast(fd))
        .crossJoin(F.broadcast(kmin))
        .select(
            "n_orphans",
            "n_fd_violations",
            "min_class_size",
            (F.col("n_orphans") == 0).cast("int").alias("referential_ok"),
            (F.col("n_fd_violations") == 0).cast("int").alias("fd_ok"),
            (F.col("min_class_size") >= _GATE_MIN_K)
            .cast("int")
            .alias("kanon_ok"),
            (
                (F.col("n_orphans") == 0)
                & (F.col("n_fd_violations") == 0)
                & (F.col("min_class_size") >= _GATE_MIN_K)
            )
            .cast("int")
            .alias("release_ok"),
        )
    )


def _release_gate_sql() -> str:
    ref = ORACLES_R7["rel_referential_audit"]
    fd_parts = " + ".join(
        f"(SELECT CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) "
        f"AS BIGINT) FROM (SELECT {det}, count(DISTINCT {dep}) AS "
        f"n_dep FROM {table} GROUP BY {det}))"
        for table, det, dep in _GATE_FDS
    )
    return (
        f"WITH ref AS (SELECT CAST(sum(n_orphans) AS BIGINT) AS "
        f"n_orphans FROM ({ref})), "
        f"fd AS (SELECT {fd_parts} AS n_fd_violations), "
        "kv AS (SELECT CAST(min(class_size) AS BIGINT) AS "
        "min_class_size FROM (SELECT count(*) AS class_size "
        "FROM customer GROUP BY c_nationkey, c_mktsegment, "
        "CAST(floor(c_acctbal / 1000.0) AS BIGINT))) "
        "SELECT n_orphans, n_fd_violations, min_class_size, "
        "CAST(n_orphans = 0 AS INTEGER) AS referential_ok, "
        "CAST(n_fd_violations = 0 AS INTEGER) AS fd_ok, "
        f"CAST(min_class_size >= {_GATE_MIN_K} AS INTEGER) AS kanon_ok, "
        "CAST(n_orphans = 0 AND n_fd_violations = 0 AND "
        f"min_class_size >= {_GATE_MIN_K} AS INTEGER) AS release_ok "
        "FROM ref, fd, kv"
    )


ORACLES_R7["rel_release_gate"] = _release_gate_sql()
QUERIES_R7["rel_release_gate"] = q_release_gate
