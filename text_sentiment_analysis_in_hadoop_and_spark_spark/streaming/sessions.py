"""Gap-based sessionization over ``events`` — stateful-operator
extension (nothing like it exists in the reference; SURVEY §2.7).

Two implementations of the same semantics (30-minute inactivity gap):

- :func:`sessions_batch` — lag/cumsum window functions, declared as
  the ``events_sessions`` query with a DuckDB oracle.  The session
  id is the running count of session-starts per user in event-time
  order, so both engines number sessions identically.
- :func:`sessions_stream` — Structured Streaming's native
  ``session_window`` (the Spark-first choice over a hand-rolled
  ``applyInPandasWithState``: merge logic, state bounding and
  watermark eviction are built in).  Emitted sessions carry
  (user_id, start, end, n) — tests match them against the batch
  result; append mode only emits sessions closed by the watermark,
  which is exactly the production contract.

Scale notes: batch sessionization is one shuffle (hash by user_id)
plus two in-partition window passes; streaming state is per-open-
session and evicted at watermark — both O(users), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .windowed import event_ts_col, load_events

GAP_SEC = 1800
GAP = "30 minutes"
WATERMARK = "1 hour"


def sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "epoch_sec", "event_id")
    order = [F.asc("epoch_sec"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("epoch_sec").over(w_lag)
    is_new = F.when(
        prev.isNull() | (F.col("epoch_sec") - prev >= GAP_SEC), 1
    ).otherwise(0)
    return (
        ev.withColumn("sid", F.sum(is_new).over(w_run))
        .groupBy("user_id", F.col("sid").cast("long").alias("session_id"))
        .agg(
            F.min("epoch_sec").cast("long").alias("start_epoch"),
            F.max("epoch_sec").cast("long").alias("end_epoch"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def sessions_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Same sessions via the native streaming session_window (gap
    merge + watermark state eviction built in).  ``events_dir`` is a
    file landing zone, as in windowed.py."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    raw = spark.readStream.schema(schema).parquet(events_dir)
    stream = raw.withColumn(
        "event_ts", event_ts_col(raw)
    ).withWatermark("event_ts", WATERMARK)
    return (
        stream.groupBy(
            F.col("user_id"), F.session_window(F.col("event_ts"), GAP)
        )
        .agg(
            F.min(F.unix_timestamp("event_ts"))
            .cast("long")
            .alias("start_epoch"),
            F.max(F.unix_timestamp("event_ts")).cast("long").alias("end_epoch"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select("user_id", "start_epoch", "end_epoch", "n_events")
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessions_batch(spark, sf_dir)


ORACLES: dict[str, str] = {
    "events_sessions": (
        "WITH e AS (SELECT user_id, event_id, "
        "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es FROM events), "
        "lagged AS (SELECT *, lag(es) OVER "
        "(PARTITION BY user_id ORDER BY es, event_id) AS prev FROM e), "
        "flagged AS (SELECT *, CASE WHEN prev IS NULL OR es - prev >= "
        f"{GAP_SEC} THEN 1 ELSE 0 END AS is_new FROM lagged), "
        "numbered AS (SELECT *, sum(is_new) OVER "
        "(PARTITION BY user_id ORDER BY es, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) "
        "SELECT user_id, CAST(sid AS BIGINT) AS session_id, "
        "CAST(min(es) AS BIGINT) AS start_epoch, "
        "CAST(max(es) AS BIGINT) AS end_epoch, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM numbered GROUP BY user_id, sid"
    )
}

QUERIES = {"events_sessions": q_events_sessions}
