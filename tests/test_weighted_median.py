"""Quantity-weighted median semantics on crafted lineitem/part
(operators/relational2.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
    q_weighted_median_price,
)


def test_weighted_median_differs_from_unweighted(spark, tmp_path):
    # unit prices 10 (qty 1), 20 (qty 2), 30 (qty 7): half the 10
    # units sold at 30 → weighted median 30 (unweighted would be 20)
    d = tmp_path / "rel"
    d.mkdir()
    lines = [(10.0, 1.0), (20.0, 2.0), (30.0, 7.0)]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1] * 3, pa.int64()),
                "l_quantity": pa.array([q for _, q in lines], pa.float64()),
                "l_extendedprice": pa.array(
                    [p * q for p, q in lines], pa.float64()
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_brand": pa.array(["B1"]),
            }
        ),
        f"{d}/part.parquet",
    )
    row = q_weighted_median_price(spark, str(d)).collect()[0]
    assert row["brand"] == "B1"
    assert abs(row["weighted_median_price"] - 30.0) < 1e-9
    assert row["n_lineitems"] == 3


def test_weighted_median_exact_half_boundary(spark, tmp_path):
    # two prices with equal weight: cumw at the lower price equals
    # exactly tot/2 → the LOWER price is the weighted median (>= rule)
    d = tmp_path / "rel"
    d.mkdir()
    lines = [(10.0, 5.0), (30.0, 5.0)]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1] * 2, pa.int64()),
                "l_quantity": pa.array([q for _, q in lines], pa.float64()),
                "l_extendedprice": pa.array(
                    [p * q for p, q in lines], pa.float64()
                ),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_brand": pa.array(["B1"]),
            }
        ),
        f"{d}/part.parquet",
    )
    row = q_weighted_median_price(spark, str(d)).collect()[0]
    assert abs(row["weighted_median_price"] - 10.0) < 1e-9


def test_pandas_twin_matches_jvm_plan(spark):
    """GROUPED_AGG pandas twin must agree row-for-row with the JVM
    window plan, and its physical plan must show AggregateInPandas
    with ONE exchange keyed on the group."""
    from conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import relational2

    jvm = {
        r["brand"]: (r["weighted_median_price"], r["n_lineitems"])
        for r in relational2.q_weighted_median_price(
            spark, SF_DIR
        ).collect()
    }
    pdf = relational2.q_weighted_median_pandas(spark, SF_DIR)
    got = {
        r["brand"]: (r["weighted_median_price"], r["n_lineitems"])
        for r in pdf.collect()
    }
    assert got == jvm
    plan = pdf._jdf.queryExecution().executedPlan().toString()
    # Spark 4.1 names the grouped-agg pandas node ArrowAggregatePython
    assert ("ArrowAggregatePython" in plan) or ("AggregateInPandas" in plan)
    # AQE's toString prints Final AND Initial plan sections — count
    # within the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning(brand") == 1
