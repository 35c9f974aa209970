"""Experiment / causal analytics over the events stream (engine
extension — the reference has no experimentation surface; these are
the readouts an A/B platform runs next to a training-data pipeline).

Three operators, all oracle-checked:

- ``events_cuped`` — CUPED variance-reduced experiment readout
  (Deng et al., WSDM'13): per-user pre/post-period metric sums, a
  pooled ``theta = cov(pre, post) / var(pre)`` regression adjustment,
  and per-variant adjusted means.  The pre-period covariate absorbs
  between-user variance so the adjusted lift needs far fewer users
  for the same power.
- ``events_time_decay`` — exponentially time-decayed engagement score
  per user (half-life 7 days), the recency-weighted activity metric
  feature stores keep per entity.
- ``events_scd2`` — slowly-changing-dimension type-2 reconstruction:
  each event opens a validity interval ``[ts, next ts)`` for its
  user's "current event_type" state; the latest interval per user is
  open-ended (``is_current``).

Scale notes (the 100 TB shapes):
- cuped: ONE per-user shuffle; the period cut and the (theta,
  mean_pre) pair are 1-row aggregates broadcast back — the S5
  scalar-side-input shape, never a driver loop.  The final variant
  rollup reduces user rows map-side to 2 groups.
- time_decay: same single per-user shuffle; the decay kernel is a
  JVM-side expression (no UDF).
- scd2: one window shuffle partitioned BY USER — thousands of
  independent partitions, no global window (the WindowExec
  all-to-one-partition trap).  Sums use exact integer epoch seconds.

Determinism: per-user period sums are pre-rounded to 6 decimals
before entering covariance/variance so float sum-order divergence
between engines cannot leak into ``theta``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..streaming.windowed import load_events

HALF_LIFE_SEC = 7 * 86400
SCD2_USER_MOD = 20  # deterministic 5% user sample for the SCD2 audit


def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED readout: variant = user_id % 2, period cut = midpoint of
    the observed epoch-second range (integer math both engines)."""
    ev = load_events(spark, sf_dir).select("user_id", "epoch_sec", "value")
    cut = ev.agg(
        F.expr("(min(epoch_sec) + max(epoch_sec)) DIV 2").alias("cut")
    )
    per_user = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("epoch_sec") < F.col("cut"), F.col("value")
                    ).otherwise(0.0)
                ),
                6,
            ).alias("pre"),
            F.round(
                F.sum(
                    F.when(
                        F.col("epoch_sec") >= F.col("cut"), F.col("value")
                    ).otherwise(0.0)
                ),
                6,
            ).alias("post"),
        )
    )
    stats = per_user.agg(
        (F.covar_pop("pre", "post") / F.var_pop("pre")).alias("theta"),
        F.avg("pre").alias("mean_pre_all"),
    )
    return (
        per_user.crossJoin(F.broadcast(stats))
        .withColumn(
            "adj",
            F.col("post")
            - F.col("theta") * (F.col("pre") - F.col("mean_pre_all")),
        )
        .groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("pre"), 6).alias("mean_pre"),
            F.round(F.avg("post"), 6).alias("mean_post"),
            F.round(F.avg("adj"), 6).alias("mean_cuped"),
        )
    )


def q_events_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement: sum(value · 2^(-age/half_life)),
    age anchored at the corpus max timestamp (broadcast scalar)."""
    ev = load_events(spark, sf_dir).select("user_id", "epoch_sec", "value")
    anchor = ev.agg(F.max("epoch_sec").alias("anchor"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn(
            "w",
            F.col("value")
            * F.exp(
                -float(0.6931471805599453)
                * (F.col("anchor") - F.col("epoch_sec"))
                / float(HALF_LIFE_SEC)
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("w"), 6).alias("decayed_score"),
        )
    )


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 intervals over a deterministic 5% user sample: each
    event opens a [ts, next-event ts) validity window for the user's
    current event_type state; open interval = current row."""
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") % SCD2_USER_MOD == 0)
        .select("event_id", "user_id", "event_type", "epoch_sec")
    )
    w = Window.partitionBy("user_id").orderBy("epoch_sec", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.col("event_type").alias("state"),
        F.col("epoch_sec").alias("valid_from"),
        F.lead("epoch_sec").over(w).alias("valid_to"),
        F.when(F.lead("epoch_sec").over(w).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
    )


_EV_S = "CAST(epoch_ns(ts) // 1000000000 AS BIGINT)"

ORACLES: dict[str, str] = {
    "events_cuped": (
        f"WITH b AS (SELECT user_id, {_EV_S} AS s, value FROM events), "
        "cut AS (SELECT (min(s) + max(s)) // 2 AS cut FROM b), "
        "pu AS (SELECT user_id, "
        "round(sum(CASE WHEN s < cut THEN value ELSE 0 END), 6) AS pre, "
        "round(sum(CASE WHEN s >= cut THEN value ELSE 0 END), 6) AS post "
        "FROM b, cut GROUP BY user_id), "
        "st AS (SELECT covar_pop(pre, post) / var_pop(pre) AS theta, "
        "avg(pre) AS mean_pre_all FROM pu) "
        "SELECT CAST(user_id % 2 AS BIGINT) AS variant, "
        "CAST(count(*) AS BIGINT) AS n_users, "
        "round(avg(pre), 6) AS mean_pre, "
        "round(avg(post), 6) AS mean_post, "
        "round(avg(post - theta * (pre - mean_pre_all)), 6) AS mean_cuped "
        "FROM pu, st GROUP BY 1"
    ),
    "events_time_decay": (
        f"WITH b AS (SELECT user_id, {_EV_S} AS s, value FROM events), "
        "a AS (SELECT max(s) AS anchor FROM b) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "round(sum(value * exp(-0.6931471805599453 * (anchor - s) / "
        f"{float(HALF_LIFE_SEC)})), 6) AS decayed_score "
        "FROM b, a GROUP BY user_id"
    ),
    "events_scd2": (
        f"WITH b AS (SELECT event_id, user_id, event_type, {_EV_S} AS s "
        f"FROM events WHERE user_id % {SCD2_USER_MOD} = 0) "
        "SELECT event_id, user_id, event_type AS state, s AS valid_from, "
        "lead(s) OVER w AS valid_to, "
        "CAST(CASE WHEN lead(s) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) "
        "AS is_current FROM b "
        "WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)"
    ),
}

QUERIES = {
    "events_cuped": q_events_cuped,
    "events_time_decay": q_events_time_decay,
    "events_scd2": q_events_scd2,
}
