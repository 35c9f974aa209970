"""SQL function surface: SQL-UDF inlining, LATERAL decorrelation,
UDTF/mapInArrow twin equivalence (operators/sqlfn.py, the
text_arrow_token_count registration in operators/textstats.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    sqlfn,
    textstats,
)

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sql_udf_is_catalyst_inlined(spark):
    """The named SQL UDFs must vanish from the physical plan: no
    Python eval node, the scan pruned to exactly the three lineitem
    columns the inlined expression needs, and the aggregation still
    partial (map-side combine survives the UDF indirection)."""
    df = sqlfn.q_sql_udf_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial_sum" in plan
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    for col in ("l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema


def test_sql_udf_matches_hand_inlined_expression(spark):
    """UDF-composed revenue == the module's own hand-inlined
    expression, row for row."""
    via_udf = {
        r["ship_year"]: (r["revenue_cents"], r["n_items"])
        for r in sqlfn.q_sql_udf_revenue(spark, SF_DIR).collect()
    }
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    rev = F.expr(
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) "
        "* (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
    )
    inlined = {
        r["ship_year"]: (r["revenue_cents"], r["n_items"])
        for r in li.groupBy(
            F.year("l_shipdate").cast("long").alias("ship_year")
        )
        .agg(
            F.sum(rev).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
        .collect()
    }
    assert via_udf == inlined


def test_lateral_topk_is_decorrelated_and_bounded(spark):
    """Catalyst must rewrite the correlated LATERAL LIMIT into a
    ranked-window plan (one pass over customer), not a nested-loop
    re-scan per nation; and every nation emits at most 3 rows in
    strictly non-increasing balance order."""
    df = sqlfn.q_sql_lateral_topk(spark, SF_DIR)
    plan = _plan(df)
    assert "Window" in plan  # decorrelated to rank-per-group
    assert "CartesianProduct" not in plan
    rows = df.collect()
    by_nation: dict[str, list[int]] = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r["bal_cents"])
    for nation, bals in by_nation.items():
        assert len(bals) <= 3, nation


def test_udtf_chunks_twin_matches_column_chunker(spark):
    """The LATERAL Python-UDTF chunker and the pure-Column
    higher-order-function chunker must agree row-for-row — same
    windows, same short-doc floor, same text."""
    key = lambda r: (r["doc_id"], r["chunk_idx"])  # noqa: E731
    via_udtf = sorted(
        sqlfn.q_sql_udtf_chunks(spark, SF_DIR).collect(), key=key
    )
    via_cols = sorted(
        textstats.q_chunk_windows(spark, SF_DIR).collect(), key=key
    )
    assert [tuple(r) for r in via_udtf] == [tuple(r) for r in via_cols]
    assert len(via_udtf) > 500  # expansion actually happened


def test_arrow_token_count_twin_and_plan(spark):
    """mapInArrow output == the JVM split/size expression; the plan is
    a narrow MapInArrow over a 2-column pruned scan (no shuffle, no
    pandas conversion node)."""
    df = textstats.q_arrow_token_count(spark, SF_DIR)
    plan = _plan(df)
    assert "MapInArrow" in plan
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents")
    jvm = {
        r["doc_id"]: r["n_tokens"]
        for r in docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        ).collect()
    }
    arrow = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    assert arrow == jvm


def test_script_bisection_brackets_the_weighted_median(spark):
    """After 20 bisection steps the scripted cap must (a) cover at
    least half the rows and (b) sit within one bisection-resolution
    step above the true minimal such price — the script converges, it
    doesn't just terminate."""
    row = sqlfn.q_sql_script_median_search(spark, SF_DIR).collect()[0]
    assert row["covered_rows"] * 2 >= row["total_rows"]

    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "price_cents"
        )
    )
    from pyspark.sql.window import Window

    total = li.count()
    true_min = (
        li.groupBy("price_cents")
        .count()
        .withColumn(
            "cum",
            F.sum("count").over(
                Window.orderBy("price_cents").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .filter(F.col("cum") * 2 >= total)
        .agg(F.min("price_cents"))
        .collect()[0][0]
    )
    max_price = li.agg(F.max("price_cents")).collect()[0][0]
    resolution = max_price // (1 << 20) + 1
    assert true_min <= row["median_cap_cents"] <= true_min + resolution


def test_parameterized_binding_matches_literal(spark):
    """The named-parameter plan must equal the literal-spliced plan's
    results, and the bound cutoff must reach the scan as a pushed
    filter."""
    df = sqlfn.q_sql_parameterized_pricing(spark, SF_DIR)
    plan = _plan(df)
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    assert "l_shipdate" in pushed
    via_param = {tuple(r) for r in df.collect()}
    via_literal = {
        tuple(r)
        for r in spark.sql(
            sqlfn.ORACLES["sql_parameterized_pricing"]
        ).collect()
    }
    assert via_param == via_literal
