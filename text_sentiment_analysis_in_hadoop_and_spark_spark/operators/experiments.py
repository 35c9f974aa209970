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

from ..functions.hashing import hex32_sql
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


# --- sample-ratio-mismatch check (r5) --------------------------------

SRM_CHI2_CRIT = 3.841459  # chi-square 95% critical value, 1 dof


def q_events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The #1 experiment health alarm: sample-ratio mismatch.  Users
    hash 50/50 into arms (the same deterministic hex32 assignment an
    engine-side bucketing service uses); if the observed split's
    chi-square statistic exceeds the 95% critical value, the
    assignment or logging pipeline is biased and every downstream
    readout (CUPED included) is suspect.  One user-distinct
    aggregate; the statistic is exact integer arithmetic over the two
    counts divided once."""
    from ..functions.hashing import hex32

    users = (
        load_events(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            F.pmod(hex32(F.col("user_id").cast("string")), 2).alias("arm")
        )
    )
    counts = users.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    # chi2 vs 50/50: (a-e)^2/e + (b-e)^2/e with e=(a+b)/2
    #             = (a-b)^2 / (a+b)  — exact integers until one division
    chi2 = F.round(
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b")))
        / (F.col("n_a") + F.col("n_b")).cast("double"),
        6,
    )
    return counts.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).cast("int").alias("srm_flag"),
    )


ORACLES["events_srm_check"] = (
    "WITH u AS (SELECT DISTINCT user_id FROM events), "
    "arms AS (SELECT "
    + hex32_sql("CAST(user_id AS VARCHAR)")
    + " % 2 AS arm FROM u), "
    "c AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_a, "
    "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b "
    "FROM arms) "
    "SELECT n_a, n_b, "
    "round((n_a - n_b) * (n_a - n_b) / CAST(n_a + n_b AS DOUBLE), 6) "
    "AS chi2, "
    "CAST(round((n_a - n_b) * (n_a - n_b) / CAST(n_a + n_b AS DOUBLE), 6) "
    f"> {SRM_CHI2_CRIT} AS INTEGER) AS srm_flag FROM c"
)

QUERIES["events_srm_check"] = q_events_srm_check


# --- multi-touch attribution model comparison (r5) -------------------

TOUCH_TYPES = ("view", "click", "signup")
TOUCH_WINDOW_SEC = 1800  # same lookback as the stream-stream join


def q_events_attribution_models(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch vs last-touch vs linear credit, side by side: every
    purchase's same-user touches in the 30-minute lookback form its
    journey; each model allocates one conversion of credit across the
    journey's channels (touch event types).  The three models sum to
    the same attributed-conversion total — disagreement BETWEEN them
    is the point: channels that open journeys (first-heavy) vs close
    them (last-heavy) get different budgets under different models,
    and this table is the comparison marketing runs before picking
    one.

    Shape: purchases ⋈ touches is a user-keyed equi-join with a range
    predicate (the batch twin of the stream-stream interval join);
    first/last election is one journey-partitioned window; credits
    aggregate to |models|×|channels| rows.  Linear credit (1/n) is
    the only non-integer and rounds once at the end."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "epoch_sec"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("epoch_sec").alias("ps"),
    )
    touches = ev.filter(F.col("event_type").isin(*TOUCH_TYPES)).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("epoch_sec").alias("ts"),
    )
    journeys = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("ts") <= F.col("ps"))
        & (F.col("ts") >= F.col("ps") - TOUCH_WINDOW_SEC),
    )
    w = Window.partitionBy("p_id")
    w_first = w.orderBy(F.asc("ts"), F.asc("t_id"))
    w_last = w.orderBy(F.desc("ts"), F.desc("t_id"))
    scored = journeys.select(
        "p_id",
        "channel",
        F.count("*").over(w).alias("n_touch"),
        F.row_number().over(w_first).alias("rk_first"),
        F.row_number().over(w_last).alias("rk_last"),
    )
    first = (
        scored.filter(F.col("rk_first") == 1)
        .groupBy("channel")
        .agg(F.count("*").cast("double").alias("credit"))
        .withColumn("model", F.lit("first_touch"))
    )
    last = (
        scored.filter(F.col("rk_last") == 1)
        .groupBy("channel")
        .agg(F.count("*").cast("double").alias("credit"))
        .withColumn("model", F.lit("last_touch"))
    )
    linear = (
        scored.groupBy("channel")
        .agg(F.sum(F.lit(1.0) / F.col("n_touch")).alias("credit"))
        .withColumn("model", F.lit("linear"))
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .select("model", "channel", F.round("credit", 6).alias("credit"))
    )


ORACLES["events_attribution_models"] = (
    "WITH b AS (SELECT event_id, user_id, event_type, "
    "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s FROM events), "
    "p AS (SELECT event_id AS p_id, user_id, s AS ps FROM b "
    "WHERE event_type = 'purchase'), "
    "t AS (SELECT event_id AS t_id, user_id, event_type AS channel, "
    "s AS ts FROM b WHERE event_type IN ("
    + ", ".join(f"'{c}'" for c in TOUCH_TYPES)
    + ")), "
    "j AS (SELECT p.p_id, t.channel, t.ts, t.t_id FROM p JOIN t "
    "ON p.user_id = t.user_id AND t.ts <= p.ps "
    f"AND t.ts >= p.ps - {TOUCH_WINDOW_SEC}), "
    "sc AS (SELECT p_id, channel, "
    "count(*) OVER (PARTITION BY p_id) AS n_touch, "
    "row_number() OVER (PARTITION BY p_id ORDER BY ts, t_id) "
    "AS rk_first, "
    "row_number() OVER (PARTITION BY p_id ORDER BY ts DESC, t_id DESC) "
    "AS rk_last FROM j) "
    "SELECT 'first_touch' AS model, channel, "
    "round(CAST(count(*) AS DOUBLE), 6) AS credit FROM sc "
    "WHERE rk_first = 1 GROUP BY channel "
    "UNION ALL "
    "SELECT 'last_touch', channel, round(CAST(count(*) AS DOUBLE), 6) "
    "FROM sc WHERE rk_last = 1 GROUP BY channel "
    "UNION ALL "
    "SELECT 'linear', channel, round(sum(1.0 / n_touch), 6) "
    "FROM sc GROUP BY channel"
)

QUERIES["events_attribution_models"] = q_events_attribution_models


# --- Mann-Whitney U (nonparametric A/B readout) ----------------------


def q_events_mwu_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test on purchase VALUES between the two hash
    arms — the nonparametric companion to the CUPED mean readout:
    heavy-tailed revenue distributions routinely break t-test
    normality assumptions, so experiment platforms report the
    rank-sum verdict next to the mean lift.

    Scale shape: ranking 100 TB of raw rows needs a global sort, so
    the ranks are computed over the VALUE HISTOGRAM instead — one
    (value)-keyed partial agg with per-arm counts, then midranks via
    a cumulative window over the histogram, whose size is bounded by
    the value DOMAIN (distinct prices), not the data (the same
    bounded-artifact argument as the scripted bisection's price
    histogram; the single-partition window is over that bounded
    artifact only).  Tie correction uses the same histogram.

    Determinism: doubled midranks (``2·cum_before + t + 1``) keep
    every rank-sum INTEGER until the final z formula, so engines
    cannot diverge on float summation order; the z expression is
    written identically on both sides and rounded to 6."""
    from ..functions.hashing import hex32

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    arm = F.pmod(hex32(F.col("user_id").cast("string")), 2)
    hist = (
        ev.select(arm.alias("arm"), "value")
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.count("*").cast("long").alias("t"),
        )
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.withColumn(
        "rank2",
        2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1,
    )
    agg = ranked.agg(
        F.sum("c0").cast("long").alias("n_a"),
        F.sum("c1").cast("long").alias("n_b"),
        F.sum(F.col("c1") * F.col("rank2")).cast("long").alias("r2_b"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("long")
        .alias("tie3"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u2 = F.col("r2_b") - nb * (nb + 1)  # doubled U statistic
    sigma2 = (
        (na * nb).cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie3").cast("double")
            / (n.cast("double") * (n.cast("double") - 1.0))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(u2.cast("double") / 2.0, 6).alias("u_stat"),
        F.round(
            (u2 - na * nb).cast("double") / (2.0 * F.sqrt(sigma2)),
            6,
        ).alias("z_score"),
    )


ORACLES["events_mwu_test"] = (
    "WITH pv AS (SELECT "
    + hex32_sql("CAST(user_id AS VARCHAR)")
    + " % 2 AS arm, value FROM events WHERE event_type = 'purchase'), "
    "hist AS (SELECT value, "
    "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, "
    "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1, "
    "CAST(count(*) AS BIGINT) AS t FROM pv GROUP BY value), "
    "ranked AS (SELECT *, 2 * coalesce(sum(t) OVER "
    "(ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "+ t + 1 AS rank2 FROM hist), "
    "agg AS (SELECT CAST(sum(c0) AS BIGINT) AS n_a, "
    "CAST(sum(c1) AS BIGINT) AS n_b, "
    "CAST(sum(c1 * rank2) AS BIGINT) AS r2_b, "
    "CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM ranked) "
    "SELECT n_a, n_b, "
    "round(CAST(r2_b - n_b * (n_b + 1) AS DOUBLE) / 2.0, 6) AS u_stat, "
    "round(CAST((r2_b - n_b * (n_b + 1)) - n_a * n_b AS DOUBLE) / "
    "(2.0 * sqrt(CAST(n_a * n_b AS DOUBLE) / 12.0 * "
    "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) / "
    "(CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))))), 6) "
    "AS z_score FROM agg"
)

QUERIES["events_mwu_test"] = q_events_mwu_test


# --- two-sample Kolmogorov-Smirnov drift test ------------------------


def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between EARLY and LATE purchase values
    (split at the integer epoch midpoint): the distribution-SHAPE
    drift monitor that catches what the Mann-Whitney location test
    misses (variance widening, emerging bimodality) — the pair a
    platform runs before trusting week-over-week revenue comparisons.

    Same scale shape as :func:`q_events_mwu_test`: CDFs come from the
    value-domain-bounded histogram (one partial agg + one cumulative
    window over the bounded artifact), never a global sort of rows.

    Determinism: D is maximized in the INTEGER cross-multiplied form
    |cumA·n_b − cumB·n_a| (floats appear only in the final rounded
    division), and the reported crossing value is the MIN value among
    argmax rows — no float argmax ties between engines."""
    from ..functions.hashing import hex32  # noqa: F401  (module convention)

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    mid = ev.agg(
        ((F.min("epoch_sec") + F.max("epoch_sec")) / 2)
        .cast("long")
        .alias("t_mid")
    )
    tagged = ev.join(F.broadcast(mid)).select(
        (F.col("epoch_sec") < F.col("t_mid")).cast("int").alias("early"),
        "value",
    )
    hist = tagged.groupBy("value").agg(
        F.sum("early").cast("long").alias("ca"),
        F.sum(1 - F.col("early")).cast("long").alias("cb"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "value",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = hist.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    scored = cum.join(F.broadcast(tot)).select(
        "value",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("d2"),
    )
    return scored.groupBy("n_a", "n_b").agg(
        F.round(
            F.max("d2").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("ks_stat"),
        F.min_by("value", F.struct(-F.col("d2"), F.col("value"))).alias(
            "ks_value"
        ),
    )


ORACLES["events_ks_drift"] = (
    "WITH pv AS (SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es, "
    "value FROM events WHERE event_type = 'purchase'), "
    "mid AS (SELECT CAST((min(es) + max(es)) // 2 AS BIGINT) AS t_mid "
    "FROM pv), "
    "tagged AS (SELECT CAST(es < t_mid AS INTEGER) AS early, value "
    "FROM pv, mid), "
    "hist AS (SELECT value, CAST(sum(early) AS BIGINT) AS ca, "
    "CAST(sum(1 - early) AS BIGINT) AS cb FROM tagged GROUP BY value), "
    "cum AS (SELECT value, sum(ca) OVER (ORDER BY value "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a, "
    "sum(cb) OVER (ORDER BY value "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b "
    "FROM hist), "
    "tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, "
    "CAST(sum(cb) AS BIGINT) AS n_b FROM hist), "
    "scored AS (SELECT value, n_a, n_b, "
    "abs(cum_a * n_b - cum_b * n_a) AS d2 FROM cum, tot) "
    "SELECT n_a, n_b, "
    "round(CAST(max(d2) AS DOUBLE) / "
    "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_stat, "
    "min(value) FILTER (WHERE d2 = (SELECT max(d2) FROM scored)) "
    "AS ks_value FROM scored GROUP BY n_a, n_b"
)

QUERIES["events_ks_drift"] = q_events_ks_drift


# --- deterministic Poisson-bootstrap confidence interval -------------

BOOT_B = 200  # bootstrap replicates

# Poisson(1) inverse-CDF thresholds scaled to the hex32 2^32 space:
# weight k for u in [th[k-1], th[k]); u >= th[-1] caps at 7.  Integer
# constants → both engines derive IDENTICAL weights from the portable
# hash (no RNG state, no float CDF comparisons).
_POISSON_TH = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
)


def q_events_bootstrap_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """95% bootstrap CI for the arm-B-minus-arm-A purchase-value lift
    via the DETERMINISTIC Poisson bootstrap — the production
    large-scale bootstrap (resampling 100 TB with replacement is
    impossible; per-(unit, replicate) Poisson(1) weights are the
    standard streaming equivalent, and deriving them from the
    portable hash makes every replicate exactly reproducible across
    runs AND engines).

    Shape (r12, guide §2.2 — pre-aggregate before the fan-out): the
    Poisson weight k is a function of (user, replicate) ONLY, and
    every purchase row of a user shares its arm, so the per-row
    explode collapses onto a per-(arm, user) integer rollup first:
    Σ_rows k·cents ≡ Σ_users k·(Σ cents) and Σ_rows k ≡ Σ_users
    k·count — exact long arithmetic, bit-identical partial aggs.
    The ×B explode and the B per-replicate hex32 evaluations now run
    over DISTINCT USERS, not purchase rows (~9× fewer md5s at sf0.1),
    and the point estimate reads the same rollup; weighted sums stay
    in integer cents so replicate means are exact-integer ratios;
    the percentile over the B replicate lifts interpolates
    identically in both engines (the ``events_percentiles``
    bit-for-bit precedent).  Output: the point lift, the percentile
    CI, and the replicate s.d."""
    from ..functions.hashing import hex32

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    arm = F.pmod(hex32(F.col("user_id").cast("string")), 2)
    base = ev.select(
        arm.alias("arm"),
        F.col("user_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_user = base.groupBy("arm", "user_id").agg(
        F.sum("cents").cast("long").alias("cs"),
        F.count("*").cast("long").alias("cnt"),
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    u = hex32(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        )
    )
    k = sum(
        (u >= F.lit(t)).cast("int") for t in _POISSON_TH
    )  # 0..7 resample multiplicity
    rep = (
        per_user.select("arm", "user_id", "cs", "cnt", b)
        .withColumn("k", k)
        .groupBy("b", "arm")
        .agg(
            F.sum(F.col("k") * F.col("cs")).cast("long").alias("s"),
            F.sum(F.col("k") * F.col("cnt")).cast("long").alias("n"),
        )
    )
    lift = (
        rep.groupBy("b")
        .pivot("arm", [0, 1])
        .agg(F.first("s").alias("s"), F.first("n").alias("n"))
        .select(
            (
                F.col("1_s").cast("double") / F.col("1_n")
                - F.col("0_s").cast("double") / F.col("0_n")
            ).alias("lift_cents")
        )
    )
    point = per_user.groupBy("arm").agg(
        F.sum("cs").cast("long").alias("s"),
        F.sum("cnt").cast("long").alias("n"),
    )
    pt = point.groupBy().pivot("arm", [0, 1]).agg(
        F.first("s").alias("s"), F.first("n").alias("n")
    ).select(
        (
            F.col("1_s").cast("double") / F.col("1_n")
            - F.col("0_s").cast("double") / F.col("0_n")
        ).alias("point_cents")
    )
    ci = lift.agg(
        F.round(F.expr("percentile(lift_cents, 0.025)") / 100.0, 6).alias(
            "ci_lo"
        ),
        F.round(F.expr("percentile(lift_cents, 0.975)") / 100.0, 6).alias(
            "ci_hi"
        ),
        F.count("*").cast("long").alias("n_replicates"),
    )
    return ci.join(
        pt.select(F.round(F.col("point_cents") / 100.0, 6).alias("lift"))
    ).select("lift", "ci_lo", "ci_hi", "n_replicates")


def _bootstrap_sql() -> str:
    h_arm = hex32_sql("CAST(user_id AS VARCHAR)")
    h_rep = hex32_sql("CAST(user_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")
    kexpr = " + ".join(
        f"CASE WHEN {h_rep} >= {t} THEN 1 ELSE 0 END" for t in _POISSON_TH
    )
    return (
        f"WITH pv AS (SELECT {h_arm} % 2 AS arm, user_id, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents "
        "FROM events WHERE event_type = 'purchase'), "
        "reps AS (SELECT arm, user_id, cents, b FROM pv, "
        f"(SELECT unnest(range(0, {BOOT_B})) AS b)), "
        f"wk AS (SELECT arm, b, cents, ({kexpr}) AS k FROM reps), "
        "agg AS (SELECT b, arm, CAST(sum(k * cents) AS BIGINT) AS s, "
        "CAST(sum(k) AS BIGINT) AS n FROM wk GROUP BY b, arm), "
        "lifts AS (SELECT a1.s / CAST(a1.n AS DOUBLE) - "
        "a0.s / CAST(a0.n AS DOUBLE) AS lift_cents "
        "FROM (SELECT * FROM agg WHERE arm = 1) a1 "
        "JOIN (SELECT * FROM agg WHERE arm = 0) a0 USING (b)), "
        "pt AS (SELECT "
        "sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) / "
        "CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) - "
        "sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) / "
        "CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) "
        "AS point_cents FROM pv) "
        "SELECT round(pt.point_cents / 100.0, 6) AS lift, "
        "round(quantile_cont(l.lift_cents, 0.025) / 100.0, 6) AS ci_lo, "
        "round(quantile_cont(l.lift_cents, 0.975) / 100.0, 6) AS ci_hi, "
        "CAST(count(*) AS BIGINT) AS n_replicates "
        "FROM lifts l, pt GROUP BY pt.point_cents"
    )


ORACLES["events_bootstrap_ci"] = _bootstrap_sql()
QUERIES["events_bootstrap_ci"] = q_events_bootstrap_ci


# --- Poisson rate-ratio (C-test) and tail risk (CVaR) ----------------


def q_events_rate_ratio_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Did the PURCHASE RATE change between the early and late halves
    of the observation window?  The conditional binomial C-test for
    two Poisson rates: given N = X₁ + X₂ total purchases and exposure
    share p₀ = T₁/(T₁+T₂), X₁ ~ Binomial(N, p₀) under H₀, and the
    normal-approximation z = (X₁ − N·p₀)/√(N·p₀(1−p₀)) is the
    standard readout — counts-based, so it complements the
    value-based MWU/KS pair (a rate change with unchanged value
    distribution is invisible to both).

    All inputs are integers (counts and epoch seconds); p₀ and z are
    the only float steps and are written identically in both engines.
    One filtered aggregate — no join, no window."""
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    agg = ev.agg(
        F.min("epoch_sec").alias("t0"),
        F.max("epoch_sec").alias("t1"),
    )
    # when/otherwise, not cond.cast + (1 − cond): a NULL epoch_sec
    # makes the comparison NULL, which sum() drops from BOTH halves
    # while the oracle's CASE ... ELSE 1 counts it late (same latent
    # NULL class as rel_q12, ADVICE r8) — otherwise() pins the ELSE
    early = F.col("epoch_sec") < (F.col("t0") + F.col("t1")) / 2
    tagged = ev.join(F.broadcast(agg)).select(
        F.when(early, 1).otherwise(0).alias("x1_inc"),
        F.when(early, 0).otherwise(1).alias("x2_inc"),
    )
    c = tagged.groupBy().agg(
        F.sum("x1_inc").cast("long").alias("x1"),
        F.sum("x2_inc").cast("long").alias("x2"),
    )
    n = F.col("x1") + F.col("x2")
    # the midpoint split makes both exposures equal by construction,
    # so p0 = 0.5 exactly — stated explicitly to keep the formula
    # engine-identical and float-trivial
    p0 = F.lit(0.5)
    z = (F.col("x1").cast("double") - n.cast("double") * p0) / F.sqrt(
        n.cast("double") * p0 * (1.0 - p0)
    )
    return c.select(
        "x1",
        "x2",
        F.round(
            F.col("x1").cast("double") / F.col("x2"), 6
        ).alias("rate_ratio"),
        F.round(z, 6).alias("z_score"),
    )


ORACLES["events_rate_ratio_test"] = (
    "WITH pv AS (SELECT CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es "
    "FROM events WHERE event_type = 'purchase'), "
    "b AS (SELECT min(es) AS t0, max(es) AS t1 FROM pv), "
    "c AS (SELECT CAST(sum(CASE WHEN es < (t0 + t1) / 2 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS x1, "
    "CAST(sum(CASE WHEN es < (t0 + t1) / 2 THEN 0 ELSE 1 END) AS BIGINT) "
    "AS x2 FROM pv, b) "
    "SELECT x1, x2, "
    "round(CAST(x1 AS DOUBLE) / x2, 6) AS rate_ratio, "
    "round((CAST(x1 AS DOUBLE) - (x1 + x2) * 0.5) / "
    "sqrt((x1 + x2) * 0.5 * 0.5), 6) AS z_score FROM c"
)

QUERIES["events_rate_ratio_test"] = q_events_rate_ratio_test


def q_events_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk of purchase values: VaR₉₅ (the exact 95th
    percentile) and CVaR₉₅ (expected shortfall — the MEAN of the tail
    at or beyond VaR), per the convention that CVaR, unlike VaR, is
    coherent and actually moves when the tail fattens.  The pair is
    the standard "how bad is bad" readout over any heavy-tailed
    metric (refund exposure, job runtimes, token counts).

    Shape: one exact ``percentile`` aggregate (groupwise sort — the
    honest exact cost; `events_percentiles_approx` documents the
    sketch escape), broadcast back as a 1-row threshold, one filtered
    re-aggregate in integer cents."""
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    var = ev.agg(
        F.expr("percentile(value, 0.95)").alias("var95")
    )
    tail = ev.join(F.broadcast(var)).filter(
        F.col("value") >= F.col("var95")
    )
    return tail.agg(
        F.round(F.max("var95"), 6).alias("var95"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("double")
            / F.count("*")
            / 100.0,
            6,
        ).alias("cvar95"),
        F.count("*").cast("long").alias("n_tail"),
    )


ORACLES["events_cvar"] = (
    "WITH pv AS (SELECT value FROM events "
    "WHERE event_type = 'purchase'), "
    "v AS (SELECT quantile_cont(value, 0.95) AS var95 FROM pv), "
    "t AS (SELECT value, var95 FROM pv, v WHERE value >= var95) "
    "SELECT round(max(var95), 6) AS var95, "
    "round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) "
    "/ count(*) / 100.0, 6) AS cvar95, "
    "CAST(count(*) AS BIGINT) AS n_tail FROM t"
)

QUERIES["events_cvar"] = q_events_cvar


# --- Wilson interval and sample-size power analysis ------------------

Z95 = 1.959964  # two-sided 95%
Z80_POWER = 0.841621  # one-sided 80% power


def q_events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for the per-user view→purchase conversion
    rate — the binomial CI that behaves at the extremes where the
    naive Wald interval collapses (p̂ near 0 with small n yields Wald
    width 0; Wilson stays honest).  Closed form over two integer
    counts:

        (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    One aggregate over per-user flags — no join, no window; the z
    constant is fixed so both engines run the identical float
    expression."""
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    c = per_user.filter(F.col("v") == 1).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("p").cast("long").alias("k"),
    )
    n = F.col("n").cast("double")
    phat = F.col("k").cast("double") / n
    z2 = F.lit(Z95 * Z95)
    centre = (phat + z2 / (2 * n)) / (1 + z2 / n)
    half = (
        F.lit(Z95)
        * F.sqrt(phat * (1 - phat) / n + z2 / (4 * n * n))
        / (1 + z2 / n)
    )
    return c.select(
        "n",
        "k",
        F.round(phat, 6).alias("p_hat"),
        F.round(centre - half, 6).alias("wilson_lo"),
        F.round(centre + half, 6).alias("wilson_hi"),
    )


ORACLES["events_wilson_ci"] = (
    "WITH pu AS (SELECT user_id, "
    "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v, "
    "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p "
    "FROM events GROUP BY user_id), "
    "c AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(p) AS BIGINT) AS k FROM pu WHERE v = 1) "
    "SELECT n, k, "
    "round(CAST(k AS DOUBLE) / n, 6) AS p_hat, "
    f"round(((CAST(k AS DOUBLE) / n + {Z95 * Z95} / (2 * n)) "
    f"- {Z95} * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) "
    f"/ n + {Z95 * Z95} / (4 * CAST(n AS DOUBLE) * n))) "
    f"/ (1 + {Z95 * Z95} / n), 6) AS wilson_lo, "
    f"round(((CAST(k AS DOUBLE) / n + {Z95 * Z95} / (2 * n)) "
    f"+ {Z95} * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) "
    f"/ n + {Z95 * Z95} / (4 * CAST(n AS DOUBLE) * n))) "
    f"/ (1 + {Z95 * Z95} / n), 6) AS wilson_hi "
    "FROM c"
)

QUERIES["events_wilson_ci"] = q_events_wilson_ci

MDE_GRID_PCT = (1, 2, 5, 10)  # relative minimum detectable effects


def q_events_power_analysis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sample-size calculator for the purchase-value A/B readout:
    users-per-arm needed to detect a relative lift of 1/2/5/10% at
    α=.05 (two-sided), 80% power — n = 2σ²(z_{α/2}+z_β)²/δ² with σ²
    and the mean taken from the per-user purchase totals the CUPED
    readout uses.  The number every experiment review asks for
    ("can this corpus even power that test?"), straight from one
    variance aggregate — no simulation.

    Determinism: σ² is the exact population variance of integer-cents
    per-user sums (var_pop of integers), the grid is constant, and
    the formula is one float expression per row; ``ceil`` lands on
    integers identically in both engines."""
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    # integer moments, not var_pop: the aggregate's float accumulation
    # noise (~1e-6 relative on 1e10-scale variances) can flip the ceil
    # at a boundary between engines; Σx (BIGINT) and Σx²
    # (decimal(38,0) ↔ HUGEINT — the cents operand is widened BEFORE
    # the multiply, so per-user squares can't wrap in LONG) are EXACT
    # and make mu/var bit-identical everywhere
    base = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .alias("sxx"),
    ).select(
        "n_users",
        (F.col("sx").cast("double") / F.col("n_users")).alias("mu"),
        (
            (
                F.col("sxx").cast("double") * F.col("n_users")
                - F.col("sx").cast("double") * F.col("sx")
            )
            / (F.col("n_users").cast("double") * F.col("n_users"))
        ).alias("var"),
    )
    zsum2 = F.lit((Z95 + Z80_POWER) ** 2)
    out = None
    for pct in MDE_GRID_PCT:
        delta = base.mu * F.lit(pct / 100.0)
        row = base.select(
            F.lit(pct).cast("long").alias("mde_pct"),
            "n_users",
            F.ceil(2.0 * F.col("var") * zsum2 / (delta * delta))
            .cast("long")
            .alias("n_per_arm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


ORACLES["events_power_analysis"] = " UNION ALL ".join(
    "SELECT * FROM (WITH pu AS (SELECT user_id, CAST(sum(CAST(round(value * 100, 0) "
    "AS BIGINT)) AS BIGINT) AS cents FROM events "
    "WHERE event_type = 'purchase' GROUP BY user_id), "
    "m AS (SELECT CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(cents) AS BIGINT) AS sx, "
    "sum(CAST(cents AS HUGEINT) * cents) AS sxx FROM pu), "
    "b AS (SELECT n_users, CAST(sx AS DOUBLE) / n_users AS mu, "
    "(CAST(sxx AS DOUBLE) * n_users - CAST(sx AS DOUBLE) * sx) "
    "/ (CAST(n_users AS DOUBLE) * n_users) AS var FROM m) "
    f"SELECT CAST({pct} AS BIGINT) AS mde_pct, n_users, "
    f"CAST(ceil(2.0 * var * {(Z95 + Z80_POWER) ** 2} "
    f"/ ((mu * {pct / 100.0}) * (mu * {pct / 100.0}))) AS BIGINT) "
    "AS n_per_arm FROM b)"
    for pct in MDE_GRID_PCT
)

QUERIES["events_power_analysis"] = q_events_power_analysis


# --- McNemar paired-classifier test (r5) --------------------------------
#
# "Is the TF-IDF-feature-selected NB actually better than the plain
# NB?" asked properly: both classifiers score the SAME test docs, so
# the accuracies are paired, and the information is in the DISCORDANT
# docs only — b = plain-right/featsel-wrong, c = plain-wrong/
# featsel-right.  McNemar's continuity-corrected statistic
# (|b−c|−1)²/(b+c) ~ χ²₁ under H₀ "both error rates equal"
# (McNemar 1947; Dietterich 1998 recommends exactly this test for
# comparing classifiers on one test set).  A chi2 above 3.841 rejects
# at 5%.
#
# Scale shape: the two prediction tables come from the memoized NB and
# TF-IDF chains (each one bounded model-side broadcast join over the
# test split); the pair table is a doc_id equi-join co-partitioned on
# the same key, and the 2×2 contingency is ONE partial-agg aggregate.
# Exactness: b and c are integers; chi2 is a single double division
# rounded once.


def q_nb_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import nb as nb_mod
    from . import tfidf as tfidf_mod

    a = nb_mod.q_nb_predictions(spark, sf_dir).select(
        "doc_id",
        "label",
        F.col("prediction").alias("pred_plain"),
    )
    b = tfidf_mod.q_predictions(spark, sf_dir).select(
        "doc_id", F.col("prediction").alias("pred_featsel")
    )
    paired = a.join(b, "doc_id").select(
        (F.col("pred_plain") == F.col("label"))
        .cast("int")
        .alias("r_plain"),
        (F.col("pred_featsel") == F.col("label"))
        .cast("int")
        .alias("r_featsel"),
    )
    agg = paired.agg(
        F.sum(
            (F.col("r_plain") * F.col("r_featsel"))
        ).cast("long").alias("n_both_right"),
        F.sum(
            (1 - F.col("r_plain")) * (1 - F.col("r_featsel"))
        ).cast("long").alias("n_both_wrong"),
        F.sum(F.col("r_plain") * (1 - F.col("r_featsel")))
        .cast("long")
        .alias("n_only_plain"),
        F.sum((1 - F.col("r_plain")) * F.col("r_featsel"))
        .cast("long")
        .alias("n_only_featsel"),
    )
    disc = F.col("n_only_plain") + F.col("n_only_featsel")
    diff = F.abs(F.col("n_only_plain") - F.col("n_only_featsel"))
    chi2 = F.when(
        disc > 0,
        F.round(
            F.pow(
                F.greatest(diff.cast("double") - 1.0, F.lit(0.0)),
                F.lit(2.0),
            )
            / disc.cast("double"),
            6,
        ),
    )
    return agg.select(
        "n_both_right",
        "n_both_wrong",
        "n_only_plain",
        "n_only_featsel",
        chi2.alias("mcnemar_chi2"),
        F.when(disc > 0, chi2 > F.lit(3.841459))
        .otherwise(F.lit(False))
        .alias("reject_5pct"),
    )


def _mcnemar_sql() -> str:
    from . import nb as nb_mod
    from . import tfidf as tfidf_mod

    return (
        "WITH plain AS (SELECT * FROM ("
        + nb_mod.ORACLES["nb_predictions"]
        + ") ), featsel AS (SELECT * FROM ("
        + tfidf_mod.ORACLES["tfidf_nb_predictions"]
        + ") ), paired AS (SELECT "
        "CAST(p.prediction = p.label AS INTEGER) AS r_plain, "
        "CAST(f.prediction = p.label AS INTEGER) AS r_featsel "
        "FROM plain p JOIN featsel f USING (doc_id)), "
        "agg AS (SELECT "
        "CAST(sum(r_plain * r_featsel) AS BIGINT) AS n_both_right, "
        "CAST(sum((1 - r_plain) * (1 - r_featsel)) AS BIGINT) "
        "AS n_both_wrong, "
        "CAST(sum(r_plain * (1 - r_featsel)) AS BIGINT) AS n_only_plain, "
        "CAST(sum((1 - r_plain) * r_featsel) AS BIGINT) "
        "AS n_only_featsel FROM paired) "
        "SELECT n_both_right, n_both_wrong, n_only_plain, n_only_featsel, "
        "CASE WHEN n_only_plain + n_only_featsel > 0 THEN "
        "round(pow(greatest(CAST(abs(n_only_plain - n_only_featsel) "
        "AS DOUBLE) - 1.0, 0.0), 2.0) / "
        "CAST(n_only_plain + n_only_featsel AS DOUBLE), 6) END "
        "AS mcnemar_chi2, "
        "coalesce(CASE WHEN n_only_plain + n_only_featsel > 0 THEN "
        "round(pow(greatest(CAST(abs(n_only_plain - n_only_featsel) "
        "AS DOUBLE) - 1.0, 0.0), 2.0) / "
        "CAST(n_only_plain + n_only_featsel AS DOUBLE), 6) > 3.841459 "
        "END, FALSE) AS reject_5pct FROM agg"
    )


ORACLES["nb_mcnemar_test"] = _mcnemar_sql()
QUERIES["nb_mcnemar_test"] = q_nb_mcnemar_test


# --- per-variant conversion funnel (r5) ------------------------------------
#
# The experiment readout stitched from two existing primitives: the
# ordered view → click → purchase funnel (windowed.q_events_funnel's
# stage-chaining semantics), segmented by the experiment assignment
# (user_id % 2, the same deterministic variant CUPED/SRM use).  One
# row per variant with per-stage survivors and the end-to-end
# conversion — the table an A/B readout actually prints, and the
# denominator discipline (variant's own population, not global)
# is where hand-rolled versions go wrong.
#
# Scale shape: identical to the funnel — stage filters push to the
# scan, per-user stage tables key on user_id, and the final rollup
# groups by the 2-value variant (map-side combinable).

FUNNEL_V_STAGES = ("view", "click", "purchase")


def q_events_variant_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "epoch_sec"
    )
    variant = (F.col("user_id") % 2).cast("int")
    views = (
        ev.filter(F.col("event_type") == FUNNEL_V_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("epoch_sec").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == FUNNEL_V_STAGES[1])
        .join(views, "user_id")
        .filter(F.col("epoch_sec") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("epoch_sec").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == FUNNEL_V_STAGES[2])
        .join(clicks, "user_id")
        .filter(F.col("epoch_sec") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("epoch_sec").alias("t_purchase"))
    )
    pop = ev.select("user_id").distinct().select(
        "user_id", variant.alias("variant")
    )
    staged = (
        pop.join(views.withColumn("s1", F.lit(1)), "user_id", "left")
        .join(clicks.withColumn("s2", F.lit(1)), "user_id", "left")
        .join(purchases.withColumn("s3", F.lit(1)), "user_id", "left")
    )
    return staged.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.coalesce("s1", F.lit(0))).cast("long").alias("n_viewed"),
        F.sum(F.coalesce("s2", F.lit(0))).cast("long").alias("n_clicked"),
        F.sum(F.coalesce("s3", F.lit(0)))
        .cast("long")
        .alias("n_purchased"),
        F.round(
            F.sum(F.coalesce("s3", F.lit(0)))
            / F.count("*").cast("double"),
            6,
        ).alias("conversion"),
    )


ORACLES["events_variant_funnel"] = (
    "WITH e AS (SELECT user_id, event_type, "
    "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es FROM events), "
    "v AS (SELECT user_id, min(es) AS t_view FROM e "
    f"WHERE event_type = '{FUNNEL_V_STAGES[0]}' GROUP BY user_id), "
    "c AS (SELECT e.user_id, min(e.es) AS t_click FROM e "
    "JOIN v ON e.user_id = v.user_id AND e.es >= v.t_view "
    f"WHERE e.event_type = '{FUNNEL_V_STAGES[1]}' GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, min(e.es) AS t_purchase FROM e "
    "JOIN c ON e.user_id = c.user_id AND e.es >= c.t_click "
    f"WHERE e.event_type = '{FUNNEL_V_STAGES[2]}' GROUP BY e.user_id), "
    "pop AS (SELECT DISTINCT user_id FROM e) "
    "SELECT CAST(pop.user_id % 2 AS INTEGER) AS variant, "
    "CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_viewed, "
    "CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_clicked, "
    "CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_purchased, "
    "round(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) "
    "/ CAST(count(*) AS DOUBLE), 6) AS conversion "
    "FROM pop LEFT JOIN v ON pop.user_id = v.user_id "
    "LEFT JOIN c ON pop.user_id = c.user_id "
    "LEFT JOIN p ON pop.user_id = p.user_id "
    "GROUP BY pop.user_id % 2"
)
QUERIES["events_variant_funnel"] = q_events_variant_funnel


# --- two-proportion z-test on the variant funnels (r5) ----------------------
#
# The readout that closes the A/B loop (SRM gate → variant funnel →
# THIS → power analysis): pooled two-proportion z-test on end-to-end
# conversion between the arms, z = (p₁−p₀)/√(p̄(1−p̄)(1/n₀+1/n₁)),
# with the absolute and relative lift.  |z| > 1.959964 rejects equal
# conversion at 5% — the number the experiment dashboard prints next
# to the funnel.
#
# Exactness: all four inputs are the funnel's exact integers; the z
# arithmetic is one fixed-shape double expression rounded at the
# edge.  Shape: composes the 2-row variant funnel (its own one-pass
# plan), then a 1-row pivot.


def q_events_funnel_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = q_events_variant_funnel(spark, sf_dir).select(
        "variant", "n_users", "n_purchased"
    )
    piv = f.groupBy().pivot("variant", [0, 1]).agg(
        F.first("n_users").alias("n"),
        F.first("n_purchased").alias("c"),
    )
    n0, c0 = F.col("0_n").cast("double"), F.col("0_c").cast("double")
    n1, c1 = F.col("1_n").cast("double"), F.col("1_c").cast("double")
    p0, p1 = c0 / n0, c1 / n1
    pbar = (c0 + c1) / (n0 + n1)
    z = (p1 - p0) / F.sqrt(
        pbar * (F.lit(1.0) - pbar) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
    )
    return piv.select(
        F.col("0_n").cast("long").alias("n_control"),
        F.col("0_c").cast("long").alias("conv_control"),
        F.col("1_n").cast("long").alias("n_treatment"),
        F.col("1_c").cast("long").alias("conv_treatment"),
        F.round(p1 - p0, 6).alias("abs_lift"),
        F.when(p0 > 0, F.round((p1 - p0) / p0, 6)).alias("rel_lift"),
        F.when(
            (pbar > 0) & (pbar < 1), F.round(z, 6) + F.lit(0.0)
        ).alias("z_score"),
        F.coalesce(
            F.when((pbar > 0) & (pbar < 1), F.abs(F.round(z, 6)) > 1.959964),
            F.lit(False),
        ).alias("significant_5pct"),
    )


ORACLES["events_funnel_significance"] = (
    "WITH f AS (SELECT CAST(pop.user_id % 2 AS INTEGER) AS variant, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) "
    "AS BIGINT) AS c FROM "
    "(SELECT DISTINCT user_id FROM events) pop "
    "LEFT JOIN (SELECT e.user_id, min(e.es) AS t_purchase FROM "
    "(SELECT user_id, event_type, "
    "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es FROM events) e "
    "JOIN (SELECT e2.user_id, min(e2.es) AS t_click FROM "
    "(SELECT user_id, event_type, "
    "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es FROM events) e2 "
    "JOIN (SELECT user_id, min(CAST(epoch_ns(ts) // 1000000000 AS "
    "BIGINT)) AS t_view FROM events WHERE event_type = 'view' "
    "GROUP BY user_id) v ON e2.user_id = v.user_id "
    "AND e2.es >= v.t_view WHERE e2.event_type = 'click' "
    "GROUP BY e2.user_id) c2 ON e.user_id = c2.user_id "
    "AND e.es >= c2.t_click WHERE e.event_type = 'purchase' "
    "GROUP BY e.user_id) p ON pop.user_id = p.user_id "
    "GROUP BY pop.user_id % 2), "
    "piv AS (SELECT "
    "max(CASE WHEN variant = 0 THEN n END) AS n0, "
    "max(CASE WHEN variant = 0 THEN c END) AS c0, "
    "max(CASE WHEN variant = 1 THEN n END) AS n1, "
    "max(CASE WHEN variant = 1 THEN c END) AS c1 FROM f) "
    "SELECT CAST(n0 AS BIGINT) AS n_control, "
    "CAST(c0 AS BIGINT) AS conv_control, "
    "CAST(n1 AS BIGINT) AS n_treatment, "
    "CAST(c1 AS BIGINT) AS conv_treatment, "
    "round(c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE), 6) "
    "AS abs_lift, "
    "CASE WHEN c0 > 0 THEN "
    "round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE)) / "
    "(c0 / CAST(n0 AS DOUBLE)), 6) END AS rel_lift, "
    "CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN "
    "round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE)) / "
    "sqrt((c0 + c1) / CAST(n0 + n1 AS DOUBLE) * "
    "(1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE)) * "
    "(1.0 / n0 + 1.0 / n1)), 6) + 0.0 END AS z_score, "
    "coalesce(CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN "
    "abs(round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE)) / "
    "sqrt((c0 + c1) / CAST(n0 + n1 AS DOUBLE) * "
    "(1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE)) * "
    "(1.0 / n0 + 1.0 / n1)), 6)) > 1.959964 END, FALSE) "
    "AS significant_5pct "
    "FROM piv"
)
QUERIES["events_funnel_significance"] = q_events_funnel_significance


# --- Cohen's kappa between the two classifier chains (r5) -------------------
#
# The labeling-ops companion to nb_mcnemar_test: McNemar asks "do the
# two models have DIFFERENT error rates"; Cohen's κ asks "how much do
# they AGREE beyond chance" (Cohen 1960) — the same statistic an
# annotation pipeline computes between two human raters before
# trusting their labels.  κ = (p_o − p_e)/(1 − p_e) with p_e from the
# marginal prediction rates; κ ≈ 1 means the featsel chain is mostly
# a re-labeling of the plain one (and an ensemble of the two would
# add nothing), κ ≈ 0 means chance-level agreement.
#
# Shape: one doc_id equi-join of the memoized prediction chains, one
# 4-cell aggregate, closed-form κ rounded once (exact integer cells).


def q_nb_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import nb as nb_mod
    from . import tfidf as tfidf_mod

    a = nb_mod.q_nb_predictions(spark, sf_dir).select(
        "doc_id", F.col("prediction").alias("pa")
    )
    b = tfidf_mod.q_predictions(spark, sf_dir).select(
        "doc_id", F.col("prediction").alias("pb")
    )
    cells = a.join(b, "doc_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("pa") == F.col("pb")).cast("long"))
        .cast("long")
        .alias("n_agree"),
        F.sum("pa").cast("long").alias("a_pos"),
        F.sum("pb").cast("long").alias("b_pos"),
    )
    n = F.col("n").cast("double")
    po = F.col("n_agree") / n
    pe = (F.col("a_pos") / n) * (F.col("b_pos") / n) + (
        (n - F.col("a_pos")) / n
    ) * ((n - F.col("b_pos")) / n)
    kappa = F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
    return cells.select(
        "n",
        "n_agree",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        kappa.alias("kappa"),
    )


def _kappa_sql() -> str:
    from . import nb as nb_mod
    from . import tfidf as tfidf_mod

    return (
        "WITH a AS (SELECT doc_id, prediction AS pa FROM ("
        + nb_mod.ORACLES["nb_predictions"]
        + ")), b AS (SELECT doc_id, prediction AS pb FROM ("
        + tfidf_mod.ORACLES["tfidf_nb_predictions"]
        + ")), cells AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_agree, CAST(sum(pa) AS BIGINT) AS a_pos, "
        "CAST(sum(pb) AS BIGINT) AS b_pos "
        "FROM a JOIN b USING (doc_id)) "
        "SELECT n, n_agree, "
        "round(n_agree / CAST(n AS DOUBLE), 6) AS p_observed, "
        "round((a_pos / CAST(n AS DOUBLE)) * (b_pos / CAST(n AS DOUBLE)) "
        "+ ((n - a_pos) / CAST(n AS DOUBLE)) * "
        "((n - b_pos) / CAST(n AS DOUBLE)), 6) AS p_expected, "
        "CASE WHEN (a_pos / CAST(n AS DOUBLE)) * (b_pos / CAST(n AS "
        "DOUBLE)) + ((n - a_pos) / CAST(n AS DOUBLE)) * ((n - b_pos) / "
        "CAST(n AS DOUBLE)) < 1.0 THEN "
        "round((n_agree / CAST(n AS DOUBLE) - ((a_pos / CAST(n AS DOUBLE)) "
        "* (b_pos / CAST(n AS DOUBLE)) + ((n - a_pos) / CAST(n AS DOUBLE)) "
        "* ((n - b_pos) / CAST(n AS DOUBLE)))) / "
        "(1.0 - ((a_pos / CAST(n AS DOUBLE)) * (b_pos / CAST(n AS DOUBLE)) "
        "+ ((n - a_pos) / CAST(n AS DOUBLE)) * ((n - b_pos) / "
        "CAST(n AS DOUBLE)))), 6) END AS kappa FROM cells"
    )


ORACLES["nb_cohens_kappa"] = _kappa_sql()
QUERIES["nb_cohens_kappa"] = q_nb_cohens_kappa


# --- difference-in-differences (r6) --------------------------------------
#
# The quasi-experimental workhorse when a clean A/B split is not
# available: compare the treated group's pre→post change against the
# control group's, so any shared time trend cancels.  Cells reuse the
# CUPED conventions (treat = user_id % 2, period cut = midpoint of
# the observed epoch range).  Reported: the four cell sizes and
# means, the DiD point estimate, its pooled standard error
# (sqrt of Σ cell_var/cell_n — the unequal-variance Welch form over
# the 2×2), and the t statistic.
#
# Scale shape: ONE full-scan groupBy onto FOUR rows (map-side
# combinable conditional sums), folded to a single row with
# conditional aggregation — never a driver loop.  Determinism: cell
# sums are exact integers (cents, and cents² in decimal(38,0) ↔
# DuckDB HUGEINT); floats only enter in the final scalar formulas on
# identical inputs, and every exposed double rounds to 6.


def q_events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "epoch_sec",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cut = ev.agg(
        F.expr("(min(epoch_sec) + max(epoch_sec)) DIV 2").alias("cut")
    )
    cells = (
        ev.crossJoin(F.broadcast(cut))
        .select(
            # when/otherwise, not cond.cast: a NULL user_id/epoch_sec
            # would form a NULL group key here while the oracle's
            # CASE ... ELSE 0 buckets it with the controls (latent
            # NULL class of ADVICE r8's rel_q12 finding)
            F.when(F.col("user_id") % 2 == 1, 1)
            .otherwise(0)
            .alias("treated"),
            F.when(F.col("epoch_sec") > F.col("cut"), 1)
            .otherwise(0)
            .alias("post"),
            "cents",
        )
        .groupBy("treated", "post")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").alias("s1"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).alias("s2"),
        )
    )

    def cell(name: str, t: int, p: int):
        return F.sum(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col(name),
            )
        ).alias(f"{name}_{t}{p}")

    one = cells.agg(
        *[
            cell(c, t, p)
            for t in (0, 1)
            for p in (0, 1)
            for c in ("n", "s1", "s2")
        ]
    )

    def mean(t: int, p: int):
        return F.col(f"s1_{t}{p}") / F.col(f"n_{t}{p}") / 100.0

    def var_over_n(t: int, p: int):
        # sample variance of the dollar value, divided by n (the
        # cell's contribution to var(DiD)); exact integer sums enter
        # the float formula once
        n = F.col(f"n_{t}{p}").cast("double")
        s1 = F.col(f"s1_{t}{p}").cast("double")
        s2 = F.col(f"s2_{t}{p}").cast("double")
        var_cents = (s2 - s1 * s1 / n) / (n - 1.0)
        return var_cents / 10000.0 / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        var_over_n(0, 0)
        + var_over_n(0, 1)
        + var_over_n(1, 0)
        + var_over_n(1, 1)
    )
    return one.select(
        *[F.col(f"n_{t}{p}") for t in (0, 1) for p in (0, 1)],
        *[
            F.round(mean(t, p), 6).alias(f"mean_{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
    )


def _did_sql() -> str:
    cells = (
        "WITH e AS (SELECT user_id, "
        "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "cut AS (SELECT (min(es) + max(es)) // 2 AS cut FROM e), "
        "c AS (SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END "
        "AS treated, CASE WHEN es > cut.cut THEN 1 ELSE 0 END AS post, "
        "cents FROM e CROSS JOIN cut), "
        "g AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n, "
        "sum(cents) AS s1, sum(CAST(cents AS HUGEINT) * cents) AS s2 "
        "FROM c GROUP BY treated, post), "
        "one AS (SELECT "
        + ", ".join(
            f"sum(CASE WHEN treated = {t} AND post = {p} "
            f"THEN {c} END) AS {c}_{t}{p}"
            for t in (0, 1)
            for p in (0, 1)
            for c in ("n", "s1", "s2")
        )
        + " FROM g) "
    )

    def mean(t, p):
        return f"(CAST(s1_{t}{p} AS DOUBLE) / n_{t}{p} / 100.0)"

    def von(t, p):
        return (
            f"((CAST(s2_{t}{p} AS DOUBLE) - CAST(s1_{t}{p} AS DOUBLE) * "
            f"CAST(s1_{t}{p} AS DOUBLE) / n_{t}{p}) / (n_{t}{p} - 1.0) "
            f"/ 10000.0 / n_{t}{p})"
        )

    did = (
        f"(({mean(1, 1)} - {mean(1, 0)}) - ({mean(0, 1)} - {mean(0, 0)}))"
    )
    se = f"sqrt({von(0, 0)} + {von(0, 1)} + {von(1, 0)} + {von(1, 1)})"
    return (
        cells
        + "SELECT "
        + ", ".join(
            f"CAST(n_{t}{p} AS BIGINT) AS n_{t}{p}"
            for t in (0, 1)
            for p in (0, 1)
        )
        + ", "
        + ", ".join(
            f"round({mean(t, p)}, 6) AS mean_{t}{p}"
            for t in (0, 1)
            for p in (0, 1)
        )
        + f", round({did}, 6) AS did, round({se}, 6) AS se, "
        f"round({did} / {se}, 6) AS t_stat FROM one"
    )


ORACLES["events_diff_in_diff"] = _did_sql()
QUERIES["events_diff_in_diff"] = q_events_diff_in_diff


# --- mixture sequential probability ratio test (r6) ----------------------
#
# The always-valid p-value for continuously monitored experiments
# (Johari et al., "Peeking at A/B tests", KDD'17): a fixed-horizon
# t-test is invalid when the dashboard is checked daily, while the
# mSPRT's p_n = min(1, min_{m≤n} 1/Λ_m) is a supermartingale bound
# that stays valid under ANY stopping rule.  Λ uses the normal
# mixture with τ² = σ² (the scale-free default): with
# k_n = 1/n_t + 1/n_c,  Λ_n = sqrt(k_n/(k_n+1)) ·
# exp(θ̂_n² / (2σ²·k_n·(k_n+1))).  σ² is the pooled variance over the
# whole horizon (two-pass; a production monitor would plug in a
# pre-experiment estimate).
#
# Scale shape: the full scan reduces to |days| rows via ONE partial-agg
# groupBy (conditional integer sums per arm); the cumulative/running-
# min windows then run over that tiny day table — a global window is
# fine at |days| cardinality, and is explicitly NOT applied to the
# event-grain data.  Determinism: cumulative sums are exact integers;
# sqrt/exp apply once to identical doubles, and outputs round to 6.


def q_events_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.expr("epoch_sec DIV 86400").cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    glob = ev.agg(
        F.count("*").cast("long").alias("gn"),
        F.sum("cents").alias("gs1"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("gs2"),
    ).select(
        (
            (
                F.col("gs2").cast("double")
                - F.col("gs1").cast("double")
                * F.col("gs1").cast("double")
                / F.col("gn")
            )
            / (F.col("gn") - 1.0)
            / 10000.0
        ).alias("sigma2")
    )
    # when/otherwise pins the oracle's CASE ... ELSE semantics: a NULL
    # user_id would otherwise vanish from BOTH arms' counts/sums while
    # the oracle assigns it to control (rel_q12's latent NULL class)
    t_flag = F.col("user_id") % 2 == 1
    daily = ev.groupBy("day").agg(
        F.sum(F.when(t_flag, 1).otherwise(0)).cast("long").alias("dn_t"),
        F.sum(F.when(t_flag, F.col("cents")).otherwise(0)).alias("ds_t"),
        F.sum(F.when(t_flag, 0).otherwise(1)).cast("long").alias("dn_c"),
        F.sum(F.when(t_flag, 0).otherwise(F.col("cents"))).alias("ds_c"),
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = daily.select(
        "day",
        F.sum("dn_t").over(wcum).cast("long").alias("n_t"),
        F.sum("ds_t").over(wcum).alias("s_t"),
        F.sum("dn_c").over(wcum).cast("long").alias("n_c"),
        F.sum("ds_c").over(wcum).alias("s_c"),
    ).filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    theta = (
        F.col("s_t") / F.col("n_t") - F.col("s_c") / F.col("n_c")
    ) / 100.0
    k = 1.0 / F.col("n_t") + 1.0 / F.col("n_c")
    inv_lam = (
        F.sqrt((k + 1.0) / k)
        * F.exp(
            -(theta * theta) / (2.0 * F.col("sigma2") * k * (k + 1.0))
        )
    )
    scored = cum.crossJoin(F.broadcast(glob)).select(
        "day",
        "n_t",
        "n_c",
        F.round(theta, 6).alias("theta_hat"),
        inv_lam.alias("_inv_lam"),
    )
    return scored.select(
        "day",
        "n_t",
        "n_c",
        "theta_hat",
        F.round(F.col("_inv_lam"), 6).alias("inv_lambda"),
        F.round(
            F.least(F.lit(1.0), F.min("_inv_lam").over(wcum)), 6
        ).alias("p_always_valid"),
    )


def _msprt_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, "
        "CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "gstats AS (SELECT (CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) - "
        "CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE) "
        "/ count(*)) / (count(*) - 1.0) / 10000.0 AS sigma2 FROM e), "
        "daily AS (SELECT day, "
        "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS dn_t, "
        "sum(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END) AS ds_t, "
        "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) "
        "AS BIGINT) AS dn_c, "
        "sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE cents END) AS ds_c "
        "FROM e GROUP BY day), "
        "cum AS (SELECT day, "
        "CAST(sum(dn_t) OVER w AS BIGINT) AS n_t, "
        "CAST(sum(ds_t) OVER w AS BIGINT) AS s_t, "
        "CAST(sum(dn_c) OVER w AS BIGINT) AS n_c, "
        "CAST(sum(ds_c) OVER w AS BIGINT) AS s_c FROM daily "
        "WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW)), "
        "sc AS (SELECT day, n_t, n_c, "
        "(CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c) "
        "/ 100.0 AS theta, "
        "1.0 / n_t + 1.0 / n_c AS k FROM cum "
        "WHERE n_t > 0 AND n_c > 0), "
        "lam AS (SELECT day, n_t, n_c, theta, "
        "sqrt((k + 1.0) / k) * exp(-(theta * theta) / "
        "(2.0 * gstats.sigma2 * k * (k + 1.0))) AS inv_lam "
        "FROM sc CROSS JOIN gstats) "
        "SELECT day, n_t, n_c, round(theta, 6) AS theta_hat, "
        "round(inv_lam, 6) AS inv_lambda, "
        "round(least(1.0, min(inv_lam) OVER (ORDER BY day ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_always_valid "
        "FROM lam"
    )


ORACLES["events_msprt"] = _msprt_sql()
QUERIES["events_msprt"] = q_events_msprt


# --- inverse-propensity off-policy evaluation (r6) ------------------------
#
# Counterfactual policy value from logged interaction data (Horvitz-
# Thompson / IPS, and the self-normalized SNIPS variant): "what value
# per impression would the ALWAYS-RECOMMEND-CLICK policy have earned,
# judged only from the logged stream?"  The logging policy's
# propensities are estimated empirically PER USER SEGMENT
# (user_id % 4), so weights vary by context and IPS genuinely differs
# from both the naive mean and SNIPS.  Also reported: Kish's
# effective sample size (Σw)²/Σw² — the overlap diagnostic that says
# how many logged rows actually support the counterfactual.
#
# Scale shape: segment propensities are a 4-row broadcast aggregate
# (the S5 scalar-side-input shape); the weighted pass is ONE partial-
# agg reduce.  Determinism: propensities round to 6 BEFORE weighting,
# weights are then micro-scaled integers (round(1e6/p)), so every sum
# is exact integer/decimal arithmetic — float enters once, in the
# final 1-row formulas.

IPS_TARGET_ACTION = "click"
IPS_SEG_MOD = 4


def q_events_ips_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        (F.col("user_id") % IPS_SEG_MOD).alias("seg"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    prop = ev.groupBy("seg").agg(
        F.round(
            F.sum((F.col("event_type") == IPS_TARGET_ACTION).cast("long"))
            / F.count("*").cast("double"),
            6,
        ).alias("p_log")
    )
    # Zero-guard (r6 advice): a segment with no target-action events
    # has p_log = 0 — an unguarded 1e6/p_log saturates to
    # Long.MaxValue in Spark while DuckDB errors on CAST(inf AS
    # BIGINT).  NULL weight on both engines instead; hit = 0 on every
    # such row anyway, so the NULLs drop out of the weighted sums.
    # The weight is decimal(38,0) (HUGEINT in the oracle) so hit·w·w
    # — up to 1e24 at the 1e-6 propensity floor — stays exact instead
    # of wrapping in LONG.
    w = F.when(
        F.col("p_log") > 0, F.round(1000000.0 / F.col("p_log"))
    ).cast("decimal(38,0)")
    hit = (F.col("event_type") == IPS_TARGET_ACTION).cast("long")
    agg = (
        ev.join(F.broadcast(prop), "seg")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").alias("s_all"),
            F.sum(hit * w * F.col("cents")).alias("swr"),
            F.sum(hit * w).alias("sw"),
            F.sum(hit * w * w).alias("sw2"),
        )
    )
    return agg.select(
        "n",
        F.round(F.col("s_all") / F.col("n") / 100.0, 6).alias(
            "naive_mean"
        ),
        F.round(
            F.col("swr").cast("double") / 1000000.0 / F.col("n") / 100.0,
            6,
        ).alias("ips_value"),
        F.round(
            F.col("swr").cast("double") / F.col("sw").cast("double")
            / 100.0,
            6,
        ).alias("snips_value"),
        F.round(
            F.col("sw").cast("double") * F.col("sw").cast("double")
            / F.col("sw2").cast("double"),
            2,
        ).alias("effective_n"),
    )


def _ips_sql() -> str:
    return (
        "WITH e AS (SELECT "
        f"user_id % {IPS_SEG_MOD} AS seg, event_type, "
        "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "prop AS (SELECT seg, round(sum(CASE WHEN event_type = "
        f"'{IPS_TARGET_ACTION}' THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE), 6) AS p_log FROM e GROUP BY seg), "
        "j AS (SELECT e.*, CASE WHEN p.p_log > 0 THEN "
        "CAST(round(1000000.0 / p.p_log, 0) AS HUGEINT) END "
        "AS w, CASE WHEN e.event_type = "
        f"'{IPS_TARGET_ACTION}' THEN 1 ELSE 0 END AS hit "
        "FROM e JOIN prop p USING (seg)), "
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(cents) AS s_all, "
        "sum(hit * w * cents) AS swr, sum(hit * w) AS sw, "
        "sum(hit * w * w) AS sw2 FROM j) "
        "SELECT n, round(CAST(s_all AS DOUBLE) / n / 100.0, 6) "
        "AS naive_mean, "
        "round(CAST(swr AS DOUBLE) / 1000000.0 / n / 100.0, 6) "
        "AS ips_value, "
        "round(CAST(swr AS DOUBLE) / CAST(sw AS DOUBLE) / 100.0, 6) "
        "AS snips_value, "
        "round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / "
        "CAST(sw2 AS DOUBLE), 2) AS effective_n FROM a"
    )


ORACLES["events_ips_value"] = _ips_sql()
QUERIES["events_ips_value"] = q_events_ips_value


# --- adstock marketing-mix regression (r6) --------------------------------
#
# The MMM building block: advertising exposure carries over, so
# response regresses on the ADSTOCK a_t = x_t + λ·a_{t−1} (geometric
# carryover, λ = 0.7 literal on both engines) rather than on raw
# daily exposure.  Here: daily click volume → adstock → closed-form
# OLS of daily purchase revenue on adstock, with R².  λ is a model
# input (fitted by grid search in practice); the query is the
# transform+fit pass a fixed λ ships to.
#
# Scale shape: the full scan reduces to the |days| table in ONE
# partial-agg groupBy; the recursion + closed-form OLS then run
# driver-side on the collected day table (the S5 tiny-aggregate
# shape, like events_absorption_prob) with per-iteration round-to-6 —
# the DuckDB oracle replays the identical recursion as a recursive
# CTE.  Sums for the OLS are exact integers (adstock micro-scaled —
# exact while a_t·1e6 < 2⁶³ per day and Σa² < 2¹²⁷; drop to
# milli-scaling beyond), floats only at the closed-form edge.

ADSTOCK_LAMBDA = 0.7  # carryover per day, literal on both engines


def q_events_adstock_mmm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import math

    def r6(v: float) -> float:
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    ev = load_events(spark, sf_dir).select(
        F.expr("epoch_sec DIV 86400").cast("long").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = (
        ev.groupBy("day")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long"))
            .cast("long")
            .alias("clicks"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("cents")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("rev_cents"),
        )
        .orderBy("day")
        .collect()
    )  # |days| rows — the S5 tiny-aggregate shape
    a = 0.0
    n = len(daily)
    sa = saa = sy = say = syy = 0
    first = True
    for r in daily:
        if first:
            a = float(r["clicks"])
            first = False
        else:
            a = r6(r["clicks"] + 0.7 * a)
        ai = int(math.copysign(math.floor(abs(a) * 1e6 + 0.5), a))
        y = int(r["rev_cents"])
        sa += ai
        saa += ai * ai
        sy += y
        say += ai * y
        syy += y * y
    den = n * saa - sa * sa
    deny = n * syy - sy * sy
    # Degenerate corpora (no events, or a constant adstock series)
    # give den == 0; DuckDB's DOUBLE/0 is NULL, so mirror NULL
    # coefficients here instead of raising ZeroDivisionError (r6
    # advice: the registered query and its oracle must fail — or not
    # fail — the same way).
    if n == 0 or den == 0:
        beta = alpha = None
        r2 = None if (n > 0 and deny > 0) else 0.0
    else:
        beta = (n * say - sa * sy) / float(den)  # cents per micro-adstock
        alpha = (sy - beta * sa) / n / 100.0
        r2 = beta * beta * den / float(deny) if deny > 0 else 0.0
    return spark.createDataFrame(
        [
            (
                int(n),
                float(ADSTOCK_LAMBDA),
                None if beta is None else float(r6(beta * 1e6 / 100.0)),
                None if alpha is None else float(r6(alpha)),
                None if r2 is None else float(r6(r2)),
            )
        ],
        schema=(
            "n_days long, lam double, beta_rev_per_adstock double, "
            "alpha_rev double, r2 double"
        ),
    )


def _adstock_sql() -> str:
    return (
        "WITH RECURSIVE e AS (SELECT "
        "CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day, "
        "event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents "
        "FROM events), "
        "daily AS (SELECT day, "
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS clicks, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN cents "
        "ELSE 0 END) AS BIGINT) AS rev_cents FROM e GROUP BY day), "
        "d AS (SELECT *, row_number() OVER (ORDER BY day) AS rn "
        "FROM daily), "
        "ad AS ("
        "SELECT rn, CAST(clicks AS DOUBLE) AS a, rev_cents "
        "FROM d WHERE rn = 1 "
        "UNION ALL "
        "SELECT d.rn, round(d.clicks + 0.7 * ad.a, 6), d.rev_cents "
        "FROM ad JOIN d ON d.rn = ad.rn + 1), "
        "s AS (SELECT count(*) AS n, "
        "sum(CAST(round(a * 1000000, 0) AS BIGINT)) AS sa, "
        "sum(CAST(round(a * 1000000, 0) AS BIGINT) * "
        "CAST(round(a * 1000000, 0) AS BIGINT)) AS saa, "
        "sum(rev_cents) AS sy, "
        "sum(CAST(round(a * 1000000, 0) AS BIGINT) * rev_cents) AS say, "
        "sum(rev_cents * rev_cents) AS syy FROM ad), "
        "fit AS (SELECT n, "
        "(n * CAST(say AS DOUBLE) - CAST(sa AS DOUBLE) * "
        "CAST(sy AS DOUBLE)) / (n * CAST(saa AS DOUBLE) - "
        "CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) AS beta, "
        "CAST(sa AS DOUBLE) AS sad, CAST(sy AS DOUBLE) AS syd, "
        "n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * "
        "CAST(sa AS DOUBLE) AS den, "
        "n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * "
        "CAST(sy AS DOUBLE) AS deny FROM s) "
        "SELECT CAST(n AS BIGINT) AS n_days, "
        f"CAST({ADSTOCK_LAMBDA} AS DOUBLE) AS lam, "
        "round(beta * 1000000 / 100.0, 6) AS beta_rev_per_adstock, "
        "round((syd - beta * sad) / n / 100.0, 6) AS alpha_rev, "
        "round(CASE WHEN deny > 0 THEN beta * beta * den / deny "
        "ELSE 0.0 END, 6) AS r2 FROM fit"
    )


ORACLES["events_adstock_mmm"] = _adstock_sql()
QUERIES["events_adstock_mmm"] = q_events_adstock_mmm
