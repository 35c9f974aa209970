"""MERGE INTO (upsert/delete) as a batch operator — the warehouse
primitive Delta/Iceberg expose, expressed as one full-outer join
(engine extension; the lakehouse write path next to the
CDC-compaction and incremental-aggregate operators).

``events_merge_upsert`` reconstructs the shape end-to-end from the
events stream, deterministically:

- BASE table: latest state per user among events with
  ``event_id % 10 != 0`` (yesterday's snapshot).
- CDC batch: latest change per user among ``event_id % 10 == 0``
  rows (today's arrivals) — 'error' arrivals are DELETE markers.
- MERGE semantics: matched + delete-marker → row removed; matched +
  data row → UPDATE; unmatched CDC → INSERT; base rows never touched
  by the batch → KEPT.  Every surviving row carries its provenance in
  ``op`` so the oracle hash-checks the DECISION, not just the values.

Scale shape: both sides reduce to one row per key BEFORE the join
(max_by under the (epoch_sec, event_id) total order — partial-agg
friendly, no window), then ONE key-keyed full-outer join; at
warehouse scale this is the shuffle MERGE already is, and the
snapshot side would arrive partition-pruned to touched partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windowed import load_events

CDC_MOD = 10  # event_id % 10 == 0 rows form the change batch
DELETE_TYPE = "error"


def _latest_per_user(ev: DataFrame) -> DataFrame:
    """One row per user: the (event_type, value) under the max
    (epoch_sec, event_id) total order — the same order the upsert
    view maintains — as a partial-agg max_by.

    The change-version key is a STRUCT (Catalyst orders structs
    lexicographically), not an arithmetic epoch_sec·SHIFT+event_id
    pack: a packed key only encodes the order while event_id < SHIFT,
    which a 100 TB CDC feed exceeds (r5 advice on the identical OHLC
    key).  DuckDB's arg_max needs a scalar key, so the oracle
    expresses the same order as a row_number window instead."""
    ordk = F.struct("epoch_sec", "event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", ordk).alias("state"),
        F.max_by("value", ordk).alias("value"),
        F.max("epoch_sec").alias("as_of"),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    base = _latest_per_user(ev.filter(F.col("event_id") % CDC_MOD != 0))
    cdc = _latest_per_user(ev.filter(F.col("event_id") % CDC_MOD == 0))
    b = base.select(
        "user_id",
        F.col("state").alias("b_state"),
        F.col("value").alias("b_value"),
        F.col("as_of").alias("b_as_of"),
    )
    c = cdc.select(
        "user_id",
        F.col("state").alias("c_state"),
        F.col("value").alias("c_value"),
        F.col("as_of").alias("c_as_of"),
    )
    merged = b.join(c, "user_id", "full_outer")
    alive = merged.filter(
        ~(
            F.col("c_state").isNotNull()
            & (F.col("c_state") == DELETE_TYPE)
        )
    )
    return alive.select(
        "user_id",
        F.coalesce("c_state", "b_state").alias("state"),
        F.round(F.coalesce("c_value", "b_value"), 6).alias("value"),
        F.coalesce("c_as_of", "b_as_of").alias("as_of"),
        F.when(F.col("b_state").isNull(), "inserted")
        .when(F.col("c_state").isNull(), "kept")
        .otherwise("updated")
        .alias("op"),
    )


_EV_S = "CAST(epoch_ns(ts) // 1000000000 AS BIGINT)"

ORACLES: dict[str, str] = {
    "events_merge_upsert": (
        f"WITH e AS (SELECT event_id, user_id, event_type, value, {_EV_S} AS s "
        "FROM events), "
        "base AS (SELECT user_id, event_type AS b_state, "
        "value AS b_value, s AS b_as_of FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY s DESC, event_id DESC) AS rn "
        f"FROM e WHERE event_id % {CDC_MOD} <> 0) WHERE rn = 1), "
        "cdc AS (SELECT user_id, event_type AS c_state, "
        "value AS c_value, s AS c_as_of FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY s DESC, event_id DESC) AS rn "
        f"FROM e WHERE event_id % {CDC_MOD} = 0) WHERE rn = 1) "
        "SELECT user_id, coalesce(c_state, b_state) AS state, "
        "round(coalesce(c_value, b_value), 6) AS value, "
        "coalesce(c_as_of, b_as_of) AS as_of, "
        "CASE WHEN b_state IS NULL THEN 'inserted' "
        "WHEN c_state IS NULL THEN 'kept' ELSE 'updated' END AS op "
        "FROM base FULL OUTER JOIN cdc USING (user_id) "
        f"WHERE NOT (c_state IS NOT NULL AND c_state = '{DELETE_TYPE}')"
    ),
}

QUERIES = {
    "events_merge_upsert": q_merge_upsert,
}
