"""Physical-plan assertions for the late-session operators (merge,
concurrency, audio/image gates, interleave, MMR pool) — same 100 TB
posture checks as test_plans.py / test_plans2.py."""

from __future__ import annotations

import __spark_entry__ as entrymod

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    return entrymod.queries()[name](spark, SF_DIR)


def test_merge_sides_preaggregate_before_join(spark):
    """Both MERGE sides must reduce to one row per key (partial-agg
    max_by) BEFORE the full-outer join — no window, no sort of raw
    events."""
    plan = _plan(_q(spark, "events_merge_upsert"))
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_peak_concurrency_windows_are_day_partitioned(spark):
    """The sweep's running sums must partition by (type, day) — the
    whole point of the decomposition is avoiding one global window."""
    plan = _plan(_q(spark, "events_peak_concurrency"))
    assert "hashpartitioning(event_type" in plan
    assert "rangepartitioning" not in plan


def test_audio_and_image_gates_are_narrow_arrow(spark):
    """The decode gates are chained MapInPandas stages over a pruned
    doc_id scan — no shuffle before the bounded rollup, no row UDF."""
    for name in ("mm_audio_quality", "mm_image_quality"):
        plan = _plan(_q(spark, name))
        assert "MapInPandas" in plan, name
        assert "BatchEvalPython" not in plan, name
        read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
        assert "doc_id" in read_schema and "text" not in read_schema, name


def test_interleave_rank_is_source_partitioned_with_topk_cut(spark):
    plan = _plan(_q(spark, "pipe_interleave_schedule"))
    assert "hashpartitioning(source" in plan
    assert "TakeOrderedAndProject" in plan


def test_mmr_pool_is_query_partitioned_pandas(spark):
    """The greedy runs per query group in FlatMapGroupsInPandas over
    the pooled candidates — bounded per group, parallel across
    queries."""
    plan = _plan(_q(spark, "sim_topk_mmr"))
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(q_id" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Engine capability pin: with a selective dimension filter and a
    shuffle join, Spark injects a runtime Bloom filter on the fact
    scan (`might_contain`) — at 100 TB this is the difference between
    scanning the whole fact table and skipping most of it before the
    exchange.  Thresholds are scoped to this test and restored."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(SF_DIR + "/lineitem.parquet")
        orders = spark.read.parquet(SF_DIR + "/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observation_metrics_ride_the_main_scan(spark):
    """Engine capability pin: `df.observe` accumulates audit metrics
    DURING the action — at 100 TB this is how a write job reports row
    counts and sums without a second scan.  Metrics must equal a
    direct aggregation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet(SF_DIR + "/lineitem.parquet")
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
    )
    observed.write.format("noop").mode("overwrite").save()
    direct = li.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert obs.get["n"] == direct["n"]
    assert abs(obs.get["q"] - direct["q"]) < 1e-6


def test_dynamic_partition_pruning_on_partitioned_docs(spark):
    """A join between the lang-partitioned table and a filtered tiny
    dim must inject a dynamicpruning expression into the scan's
    PartitionFilters — at 100 TB this is what turns a full-corpus scan
    into reading only the partitions the dim side admits, decided at
    RUNTIME from the broadcast side (no static literal needed)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.orc import (
        orc_table_path,
    )

    docs = spark.read.orc(orc_table_path(spark, SF_DIR))
    dim = spark.createDataFrame(
        [("en", 1), ("de", 0), ("fr", 0), ("es", 0), ("zh", 0)],
        "lang STRING, keep INT",
    )
    j = docs.join(dim.filter("keep = 1"), "lang").groupBy("lang").count()
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()
    pf = plan[plan.lower().index("partitionfilters") :].splitlines()[0]
    assert "lang" in pf


def test_pandas_api_twin_compiles_to_jvm_plan(spark):
    """pyspark.pandas must compile this query to pure Catalyst: no
    Arrow/pandas eval nodes, no distributed-sequence index stage, and
    the scan must be column-pruned."""
    from conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_pricing_summary_ps,
    )

    df = q_pricing_summary_ps(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "MapInPandas",
        "AttachDistributedSequence",
    ):
        assert bad not in plan, bad
    assert "Scan parquet" in plan


def test_pit_and_velocity_windows_partition_by_entity(spark):
    """The two newest per-entity window operators must shuffle BY KEY,
    never into the one-partition global-window trap."""
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        asof,
        relational2,
    )

    p = (
        asof.q_pit_features(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in p
    assert "hashpartitioning(user_id" in p
    p = (
        relational2.q_order_velocity_audit(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in p
    assert "hashpartitioning(o_custkey" in p
