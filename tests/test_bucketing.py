"""Bucketed co-located joins: writing both fact tables bucketed by
the join key must eliminate the join Exchange entirely — the 100 TB
shuffle paid once at write time."""

from __future__ import annotations

import pytest

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
    load_table,
)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 8, path=str(tmp_path / "li"))
    write_bucketed(
        orders, "ord_b", ["o_orderkey"], 8, path=str(tmp_path / "ord")
    )
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    li, orders = read_table(spark, li_t), read_table(spark, ord_t)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # at sf0.001 the planner would broadcast (and rightly skip the
    # bucketed scan); disable broadcast to exercise the shape the
    # bucketing exists for — the 100 TB fact⋈fact SortMergeJoin
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan

    # and it computes the same join as the shuffling plan
    li_p = load_table(spark, SF_DIR, "lineitem")
    ord_p = load_table(spark, SF_DIR, "orders")
    plain = li_p.join(ord_p, li_p.l_orderkey == ord_p.o_orderkey)
    assert joined.count() == plain.count()


def test_unbucketed_join_shuffles(spark):
    """Control: the same join over plain parquet DOES exchange —
    proving the bucketing, not AQE, removed it."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    plan = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan or "Broadcast" in plan, plan
