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


@pytest.mark.slow
def test_bucketed_join_exchange_free_at_bench_scale(spark, tmp_path):
    """r4 verdict stretch item: the exchange-elimination claim proven
    at the BENCH scale factor — write the sf0.1 fact tables bucketed
    by the join key, run an actual aggregation over the co-located
    fact⋈fact join, and assert the executed plan carries no Exchange
    on the join while producing the same result as the shuffling
    plan."""
    import os

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf01}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf01}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "li_b01", ["l_orderkey"], 16, path=str(tmp_path / "li"))
    write_bucketed(
        orders, "ord_b01", ["o_orderkey"], 16, path=str(tmp_path / "ord")
    )
    try:
        from pyspark.sql import functions as F

        lb, ob = read_table(spark, "li_b01"), read_table(spark, "ord_b01")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the downstream per-orderkey aggregate ALSO rides the
            # bucketed partitioning — no exchange anywhere in the DAG
            agg = joined.groupBy("o_orderpriority", "l_orderkey").agg(
                F.sum("l_quantity").alias("q")
            )
            agg_plan = agg._jdf.queryExecution().executedPlan().toString()
            n_bucketed = joined.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Exchange" not in agg_plan, agg_plan
        assert "bucketed: true" in plan.lower() or "Bucketed: true" in plan, plan

        li_p = spark.read.parquet(f"{sf01}/lineitem.parquet")
        ord_p = spark.read.parquet(f"{sf01}/orders.parquet")
        assert (
            n_bucketed
            == li_p.join(ord_p, li_p.l_orderkey == ord_p.o_orderkey).count()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b01")
        spark.sql("DROP TABLE IF EXISTS ord_b01")


def test_registered_bucketed_query_single_exchange(spark):
    """The DECLARED rel_bucketed_join_agg plan: the fact⋈fact join
    consumes the bucketed layout (no join Exchange — the merge hint
    pins SMJ even at toy scale); the ONLY Exchange left is the final
    o_orderpriority rollup, which is unavoidable (different key) and
    tiny (post-join partial agg)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources import (
        bucketing,
    )

    df = bucketing.q_rel_bucketed_join_agg(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange") == 1, plan
    for t in ("tsa_li_bucketed_sf0_001", "tsa_ord_bucketed_sf0_001"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
