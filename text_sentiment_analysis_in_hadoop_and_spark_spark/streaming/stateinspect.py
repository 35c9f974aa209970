"""Offline state-store inspection — Spark's `state-metadata` /
`statestore` reader formats over a streaming checkpoint.

The ops surface a production streaming pipeline needs and batch tools
can't fake: AFTER (or while) a stateful query runs, read the state it
persisted — which operators hold state, how many partitions, and the
actual key→state rows — as ordinary DataFrames.  At 100 TB-class
streams this is how you answer "why is executor 7 spilling" (state
skew), "did the totals survive the redeploy" (state content), and
"how big is state per key-space" without instrumenting the job
itself: the checkpoint IS the queryable artifact.

tests/test_stateinspect.py pins the loop end-to-end: run the
stateful totals query (streaming/stateful.py) against a checkpoint,
read the state back offline, and the persisted (n_events, sum_value)
per key must equal the same aggregation computed in batch — plus the
skew report must account for every key exactly once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level census of a checkpoint: one row per stateful
    operator × state store with its partition count and batch range."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str = "default",
) -> DataFrame:
    """Raw key→state rows of one operator's store at the latest
    committed batch.  Columns come back as (key STRUCT, value STRUCT,
    partition_id) — callers flatten with the schema they declared."""
    return (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("storeName", store_name)
        .load(checkpoint)
    )


def totals_state_snapshot(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The running-totals operator's persisted state, flattened to the
    operator's own output schema (event_type, n_events, sum_value) —
    what a redeploy would resume from."""
    return state_rows(spark, checkpoint).select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.groupState.n_events").alias("n_events"),
        F.round(F.col("value.groupState.sum_value"), 6).alias("sum_value"),
    )


def state_skew_report(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Keys and state rows per state-store partition — the first query
    to run when one executor's state store is hot.  A healthy hash
    distribution puts O(distinct_keys / partitions) on each; a single
    giant partition here is the streaming analogue of a skewed join
    key."""
    rows = state_rows(spark, checkpoint)
    return (
        rows.groupBy("partition_id")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("partition_id")
    )
