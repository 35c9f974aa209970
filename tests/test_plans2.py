"""Physical-plan assertions for the round-5 continuation operators
(experiments, privacy, spectral, ER, robust stats, weighted median):
the same 100 TB-posture checks test_plans.py pins for the original
surface."""

from __future__ import annotations

import __spark_entry__ as entrymod

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    return entrymod.queries()[name](spark, SF_DIR)


def test_cuped_scalars_are_broadcast(spark):
    """The period-cut and (theta, mean_pre) side inputs are 1-row
    aggregates: they must enter as broadcast joins, and the only
    data-sized shuffle is the per-user aggregation."""
    plan = _plan(_q(spark, "events_cuped"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_time_decay_anchor_is_broadcast(spark):
    plan = _plan(_q(spark, "events_time_decay"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_scd2_window_is_user_partitioned(spark):
    """The lead() window must partition by user — a global window
    would move every event to one task."""
    plan = _plan(_q(spark, "events_scd2"))
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan
    assert "rangepartitioning" not in plan


def test_curriculum_has_no_window_or_global_sort(spark):
    """Quartile staging is a broadcast-scalar compare — ntile() (a
    single-partition global window) must never appear."""
    plan = _plan(_q(spark, "pipe_curriculum"))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_weighted_median_window_is_brand_partitioned(spark):
    plan = _plan(_q(spark, "rel_weighted_median_price"))
    assert "hashpartitioning(brand" in plan
    assert "rangepartitioning" not in plan


def test_mad_fence_joins_are_broadcast(spark):
    """Both percentile side-tables key on event_type (bounded
    cardinality) and must broadcast — the event stream itself never
    re-shuffles for them."""
    plan = _plan(_q(spark, "events_mad_outliers"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_covariance_is_arrow_batched_and_pruned(spark):
    """The covariance partials run in Arrow-batched MapInPandas (never
    row-at-a-time Python), and the embeddings scan reads ONLY the
    embedding column."""
    plan = _plan(_q(spark, "sim_embedding_covariance"))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "embedding" in read_schema
    assert "vec_id" not in read_schema and "label" not in read_schema


def test_er_block_size_filter_is_broadcast(spark):
    """The oversized-block drop joins the (tiny) size table broadcast;
    the quadratic verify itself is a block-key equi-join — no
    nested-loop anywhere."""
    plan = _plan(_q(spark, "er_fuzzy_pairs"))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_joins_are_equi(spark):
    """Triangle enumeration is pure equi-joins on edge keys — a
    nested-loop join here would be the all-pairs trap."""
    plan = _plan(_q(spark, "graph_triangle_stats"))
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the final 1-row × 1-row
    # tri × wedges combine
    nl = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert len(nl) <= 1
