"""Calendar-spine time-series operators (timeseries.py) and the
two-phase epoch shuffle (pipeline.py): semantic invariants the DuckDB
oracle hash alone wouldn't localize, plus 100 TB plan-shape pins."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    pipeline,
    timeseries,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- events_gap_fill -------------------------------------------------


def test_gap_fill_spine_is_dense_and_complete(spark):
    out = timeseries.q_gap_fill(spark, SF_DIR).cache()
    try:
        per_type = (
            out.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.min("hr").alias("mn"),
                F.max("hr").alias("mx"),
                F.countDistinct("hr").alias("nd"),
            )
            .collect()
        )
        assert per_type, "no event types"
        spans = {(r["mn"], r["mx"], r["n"]) for r in per_type}
        assert len({(r["mn"], r["mx"]) for r in per_type}) == 1, (
            "all types must share the one global spine"
        )
        for r in per_type:
            expected = (r["mx"] - r["mn"]) // timeseries.HOUR_SEC + 1
            assert r["n"] == expected, (r["event_type"], r["n"], expected)
            assert r["nd"] == r["n"], "duplicate hours in spine"
        del spans
    finally:
        out.unpersist()


def test_gap_fill_gap_rows_are_zero_and_ffilled(spark):
    out = timeseries.q_gap_fill(spark, SF_DIR).cache()
    try:
        gaps = out.filter(F.col("gap") == 1)
        assert gaps.count() > 0, (
            "fixture has no empty hours — gap semantics untested"
        )
        assert gaps.filter(
            (F.col("n_events") != 0) | (F.col("volume") != 0.0)
        ).count() == 0
        # a gap row's ffill must equal the last preceding non-gap volume
        w = (
            Window.partitionBy("event_type")
            .orderBy("hr")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        chk = out.withColumn(
            "expect",
            F.coalesce(
                F.last(
                    F.when(F.col("gap") == 0, F.col("volume")),
                    ignorenulls=True,
                ).over(w),
                F.lit(0.0),
            ),
        )
        assert chk.filter(F.col("ffill_vol") != F.col("expect")).count() == 0
    finally:
        out.unpersist()


def test_gap_fill_agrees_with_windowed_batch_on_nonempty_hours(spark):
    """Non-gap rows must be exactly the events_windowed aggregation —
    the spine adds rows, never changes observed ones."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        windowed_batch,
    )

    out = timeseries.q_gap_fill(spark, SF_DIR)
    observed = out.filter(F.col("gap") == 0).select(
        F.col("hr").alias("window_start_epoch"),
        "event_type",
        "n_events",
        F.col("volume").alias("sum_value"),
    )
    base = windowed_batch(spark, SF_DIR)
    assert observed.exceptAll(base).count() == 0
    assert base.exceptAll(observed).count() == 0


# --- events_rolling_corr ---------------------------------------------


def test_rolling_corr_nulls_exactly_on_partial_windows(spark):
    rows = (
        timeseries.q_rolling_corr(spark, SF_DIR)
        .orderBy("day")
        .collect()
    )
    assert len(rows) >= timeseries.CORR_DAYS, "fixture shorter than window"
    for i, r in enumerate(rows):
        if i < timeseries.CORR_DAYS - 1:
            assert r["corr7"] is None, f"partial window at day index {i}"
        elif r["corr7"] is not None:
            assert -1.0 <= r["corr7"] <= 1.0


def test_rolling_corr_matches_numpy_on_full_windows(spark):
    import numpy as np

    rows = (
        timeseries.q_rolling_corr(spark, SF_DIR)
        .orderBy("day")
        .collect()
    )
    xs = [r["n_click"] for r in rows]
    ys = [r["n_purchase"] for r in rows]
    k = timeseries.CORR_DAYS
    for i in range(k - 1, len(rows)):
        wx, wy = xs[i - k + 1 : i + 1], ys[i - k + 1 : i + 1]
        if np.std(wx) == 0 or np.std(wy) == 0:
            assert rows[i]["corr7"] is None
            continue
        expect = float(np.corrcoef(wx, wy)[0, 1])
        assert rows[i]["corr7"] is not None
        assert abs(rows[i]["corr7"] - expect) < 1e-6, (i, expect)


# --- pipe_epoch_shuffle ----------------------------------------------


def test_epoch_shuffle_is_a_permutation_per_epoch(spark):
    out = pipeline.q_epoch_shuffle(spark, SF_DIR).cache()
    try:
        n_docs = (
            out.select("doc_id").distinct().count()
        )
        per_epoch = (
            out.groupBy("epoch")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("pos").alias("npos"),
                F.min("pos").alias("mn"),
                F.max("pos").alias("mx"),
            )
            .collect()
        )
        assert len(per_epoch) == pipeline.N_EPOCHS
        for r in per_epoch:
            assert r["n"] == n_docs
            assert r["npos"] == n_docs, "pos must be collision-free"
            assert (r["mn"], r["mx"]) == (1, n_docs), "pos must be dense 1..N"
    finally:
        out.unpersist()


def test_epoch_shuffle_epochs_are_different_orders(spark):
    out = pipeline.q_epoch_shuffle(spark, SF_DIR)
    e0 = out.filter(F.col("epoch") == 0).select("doc_id", "pos")
    e1 = out.filter(F.col("epoch") == 1).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    moved = e0.join(e1, "doc_id").filter(F.col("pos") != F.col("pos1"))
    assert moved.count() > 0, "epochs replayed the identical order"


def test_epoch_shuffle_two_phase_equals_global_rank(spark):
    """The bucketed prefix-sum rank must equal the flat global
    row_number over the same (key, doc_id) order — computed here the
    slow single-window way as the test oracle."""
    out = pipeline.q_epoch_shuffle(spark, SF_DIR)
    key = F.md5(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    w = Window.partitionBy("epoch").orderBy(key.asc(), F.col("doc_id").asc())
    chk = out.withColumn("flat", F.row_number().over(w).cast("long"))
    assert chk.filter(F.col("pos") != F.col("flat")).count() == 0


def test_epoch_shuffle_plan_has_no_global_window(spark):
    """Phase-1 window must partition by (epoch, bucket) — a
    partition-less row_number (one-task global sort) is the
    anti-pattern this operator exists to avoid."""
    plan = _plan(pipeline.q_epoch_shuffle(spark, SF_DIR))
    assert "hashpartitioning(epoch" in plan and "bucket" in plan
    # the only SinglePartition exchange allowed is the 512-row offsets
    # side (windowed prefix-sum over bucket counts), which broadcasts
    assert "BroadcastExchange" in plan


def test_gap_fill_plan_prunes_and_partial_aggs(spark):
    """events scan must read only the consumed columns, and the hourly
    rollup must partial-aggregate before its shuffle."""
    plan = _plan(timeseries.q_gap_fill(spark, SF_DIR))
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "props" not in read_schema and "user_id" not in read_schema
    assert "partial" in plan.lower()


# --- events_snaive_backtest ------------------------------------------


def test_snaive_scores_exactly_the_final_week(spark):
    rows = timeseries.q_snaive_backtest(spark, SF_DIR).collect()
    assert rows, "no event types scored"
    for r in rows:
        assert r["n_hours"] == timeseries.BACKTEST_H
        assert r["wape"] >= 0.0
        # WAPE bounds |bias|: Σ|f-a| >= |Σ(f-a)|
        assert abs(r["bias"]) <= r["wape"] + 1e-9


def test_snaive_perfect_on_weekly_periodic_series(spark):
    """If the final week repeats the prior week exactly, the seasonal
    naive is exact — WAPE 0 — by construction.  Verified by scoring
    the gap-filled series against a shifted copy of itself."""
    from pyspark.sql import Window as W

    gf = timeseries.q_gap_fill(spark, SF_DIR).select(
        "event_type", "hr", "n_events"
    )
    w_asc = W.partitionBy("event_type").orderBy("hr")
    # build a synthetic series whose last week copies the week before
    lagged = gf.withColumn(
        "prev", F.lag("n_events", timeseries.BACKTEST_H).over(w_asc)
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("hr"))
        ),
    )
    synth = lagged.select(
        "event_type",
        "hr",
        F.when(
            (F.col("rn") <= timeseries.BACKTEST_H)
            & F.col("prev").isNotNull(),
            F.col("prev"),
        )
        .otherwise(F.col("n_events"))
        .alias("n_events"),
    )
    scored = synth.select(
        "event_type",
        "n_events",
        F.lag("n_events", timeseries.BACKTEST_H).over(w_asc).alias("fc"),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy(F.desc("hr")))
        .alias("rn"),
    ).filter(
        (F.col("rn") <= timeseries.BACKTEST_H) & F.col("fc").isNotNull()
    )
    bad = scored.filter(F.col("fc") != F.col("n_events")).count()
    assert bad == 0


# --- pipe_neyman_sample ----------------------------------------------


def test_neyman_quotas_match_recomputed_allocation(spark):
    import math

    draws = pipeline.q_neyman_sample(spark, SF_DIR).collect()
    got = {}
    for r in draws:
        got[r["source"]] = got.get(r["source"], 0) + 1
    docs = (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    mass = {}
    for src, xs in by_src.items():
        n = len(xs)
        mean = sum(xs) / n
        var = sum(x * x for x in xs) / n - mean * mean
        mass[src] = n * round(math.sqrt(max(var, 0.0)), 6)
    total = round(sum(mass.values()), 6)
    for src, m in mass.items():
        frac = round(m / total, 6)
        quota = min(
            int(math.floor(pipeline.NEYMAN_N * frac)), len(by_src[src])
        )
        assert got.get(src, 0) == quota, src
    assert sum(got.values()) <= pipeline.NEYMAN_N


def test_neyman_ranks_are_dense_within_stratum(spark):
    out = pipeline.q_neyman_sample(spark, SF_DIR)
    per = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.max("rk").alias("mx"),
            F.countDistinct("rk").alias("nd"),
        )
        .collect()
    )
    for r in per:
        assert r["mx"] == r["n"] == r["nd"], r["source"]


# --- events_watermark_audit ------------------------------------------


def test_watermark_decomposed_equals_flat_running_max(spark):
    """The bucketed prefix-max lateness must equal the plain global
    running max — computed here the slow single-window way."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        load_events,
    )

    ev = load_events(spark, SF_DIR).select(
        "event_id", "event_type", "epoch_sec"
    )
    w = (
        Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flat = ev.select(
        "event_type",
        (F.max("epoch_sec").over(w) - F.col("epoch_sec"))
        .cast("long")
        .alias("late"),
    )
    expect = flat.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.expr("percentile(late, 0.5)"), 6).alias("p50_late"),
        F.round(F.expr("percentile(late, 0.95)"), 6).alias("p95_late"),
        F.round(F.expr("percentile(late, 0.99)"), 6).alias("p99_late"),
        F.max("late").cast("long").alias("max_late"),
        F.round(
            F.avg(
                (F.col("late") > timeseries.LATE_FENCE).cast("double")
            ),
            6,
        ).alias("frac_late_1h"),
    )
    got = timeseries.q_watermark_audit(spark, SF_DIR)
    cols = sorted(got.columns)
    assert got.select(cols).exceptAll(expect.select(cols)).count() == 0
    assert expect.select(cols).exceptAll(got.select(cols)).count() == 0


def test_watermark_quantiles_are_ordered_and_nonnegative(spark):
    for r in timeseries.q_watermark_audit(spark, SF_DIR).collect():
        assert 0 <= r["p50_late"] <= r["p95_late"] <= r["p99_late"]
        assert r["p99_late"] <= r["max_late"]
        assert 0.0 <= r["frac_late_1h"] <= 1.0


def test_watermark_plan_windows_are_bucket_partitioned(spark):
    plan = _plan(timeseries.q_watermark_audit(spark, SF_DIR))
    assert "hashpartitioning(bk" in plan
    assert "BroadcastExchange" in plan


def test_changepoint_detects_planted_level_shift(spark, tmp_path):
    """10 days at mean $10, then 10 days at mean $50 — the split must
    land exactly on the last low day, with both segment means exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_changepoint,
    )

    rows = []
    eid = 0
    for day in range(20):
        for k in range(5):  # 5 purchases per day
            val = 10.0 if day < 10 else 50.0
            rows.append((eid, day * 86400 + k * 3600, k, "purchase", val))
            eid += 1
    d = tmp_path / "cp"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    out = q_events_changepoint(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["change_day_epoch"] == 9 * 86400  # last low day's boundary
    assert r["n_before"] == 50 and r["n_after"] == 50
    assert abs(r["mean_before"] - 10.0) < 1e-9
    assert abs(r["mean_after"] - 50.0) < 1e-9


def test_seasonality_strength_planted_weekly_pattern(spark, tmp_path):
    """A pure weekly pattern (same value every same weekday) must
    score strength ~1; a constant series scores ~0 residual variance
    too — so use a noisy-constant to pin the low end instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_seasonality_strength,
    )

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] * 10**9 for r in rows], pa.int64()),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["purchase"] * len(rows)),
                "value": pa.array([float(r[1]) for r in rows]),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        return str(d)

    weekly = [(day * 86400, 10.0 * (day % 7 + 1)) for day in range(28)]
    r = q_events_seasonality_strength(spark, write(weekly, "w")).collect()[0]
    assert r["n_days"] == 28
    assert r["seasonal_strength"] > 0.999

    # alternating-by-day (period 2, coprime with 7): weekday means all
    # converge to the same value, so the weekly pattern explains ~0
    alt = [(day * 86400, 10.0 if day % 2 == 0 else 50.0) for day in range(28)]
    r2 = q_events_seasonality_strength(spark, write(alt, "a")).collect()[0]
    assert r2["seasonal_strength"] < 0.1


def _write_daily_purchases(tmp_path, name, day_values, per_day=1):
    """events.parquet with `per_day` purchases per day; day_values[d]
    is the TOTAL daily revenue (split evenly across the day's rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for day, total in enumerate(day_values):
        for k in range(per_day):
            rows.append(
                (eid, day * 86400 + k * 3600, k, "purchase", total / per_day)
            )
            eid += 1
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_trend_test_planted_monotone_series(spark, tmp_path):
    """Strictly increasing dailies: S = C(10,2) = 45 (every pair
    concordant), no ties, z = (S−1)/√(n(n−1)(2n+5)/18) ≈ 3.94 →
    'increasing', and the Theil-Sen slope is the exact planted +10/day
    (every pairwise slope is identical, so the median is too)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_trend_test,
    )

    d = _write_daily_purchases(
        tmp_path, "mk_up", [(day + 1) * 10.0 for day in range(10)]
    )
    r = q_events_trend_test(spark, d).collect()[0]
    assert r["n_days"] == 10
    assert r["s_stat"] == 45
    assert abs(r["var_s"] - 125.0) < 1e-9
    assert abs(r["z"] - 44.0 / 125.0**0.5) < 1e-6
    assert abs(r["sen_slope"] - 10.0) < 1e-9
    assert r["trend"] == "increasing"


def test_trend_test_constant_series_is_trendless(spark, tmp_path):
    """All-equal dailies: S = 0 and the tie correction removes the
    ENTIRE variance (one tie group of size n), so z is NULL — the
    degenerate case must come out 'none', not a division error."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_trend_test,
    )

    d = _write_daily_purchases(tmp_path, "mk_flat", [100.0] * 8)
    r = q_events_trend_test(spark, d).collect()[0]
    assert r["s_stat"] == 0
    assert r["var_s"] == 0.0
    assert r["z"] is None
    assert abs(r["sen_slope"]) < 1e-9
    assert r["trend"] == "none"


def test_ewma_constant_series_has_no_anomalies(spark, tmp_path):
    """Flat $100/day: the adjusted truncated-kernel forecast is exactly
    the level (weighted mean of identical values), every residual
    rounds to zero, and nothing flags.  The first day has no lags at
    all → NULL forecast, flag coalesced to False."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_ewma_anomaly,
    )

    d = _write_daily_purchases(tmp_path, "ewma_flat", [100.0] * 20)
    rows = sorted(
        q_events_ewma_anomaly(spark, d).collect(),
        key=lambda r: r["day_epoch"],
    )
    assert len(rows) == 20
    assert rows[0]["forecast"] is None
    assert not rows[0]["is_anomaly"]
    for r in rows[1:]:
        assert abs(r["forecast"] - 100.0) < 1e-6
        assert abs(r["resid"]) < 1e-6
        assert not r["is_anomaly"]


def test_ewma_flags_planted_spike_only(spark, tmp_path):
    """One 10× day in a flat series: the spike's residual (~+$900
    against a $100 forecast) is the lone 3σ breach — the polluted
    day AFTER the spike inherits only the α-share of the jump, which
    stays inside the fence, and the clean prefix never flags."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.timeseries import (
        q_events_ewma_anomaly,
    )

    vals = [100.0] * 30
    vals[15] = 1000.0
    d = _write_daily_purchases(tmp_path, "ewma_spike", vals)
    rows = {
        r["day_epoch"] // 86400: r
        for r in q_events_ewma_anomaly(spark, d).collect()
    }
    flagged = {day for day, r in rows.items() if r["is_anomaly"]}
    assert flagged == {15}
    # the spike's residual is the max-magnitude residual by far
    assert rows[15]["resid"] > 800.0
    # clean prefix days forecast the level exactly
    assert abs(rows[10]["forecast"] - 100.0) < 1e-6


# --- events_survival_km ----------------------------------------------


def test_survival_km_monotone_and_recurrence(spark):
    rows = (
        timeseries.q_events_survival_km(spark, SF_DIR)
        .orderBy("t_day")
        .collect()
    )
    assert rows, "KM table is empty"
    # risk set starts at the full user population
    n_users = rows[0]["n_risk"]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert n_users == ev.select("user_id").distinct().count()
    prev_s = 1.0 + 1e-12
    removed = 0
    surv = 1.0
    for r in rows:
        # risk set = population minus everyone who exited earlier
        assert r["n_risk"] == n_users - removed
        removed += r["n_churned"] + r["n_censored"]
        # survival recomputed from the exposed integer columns
        surv *= 1.0 - r["n_churned"] / r["n_risk"]
        assert abs(r["survival"] - round(surv, 6)) <= 1e-9
        # KM curve is non-increasing and in [0, 1]
        assert 0.0 <= r["survival"] <= prev_s + 1e-12
        prev_s = r["survival"]


def test_survival_km_censoring_never_drops_curve(spark):
    # a censor-only day (d=0) must leave survival unchanged vs the
    # previous day: censoring shrinks the risk set, not the curve
    rows = (
        timeseries.q_events_survival_km(spark, SF_DIR)
        .orderBy("t_day")
        .collect()
    )
    for prev, cur in zip(rows, rows[1:]):
        if cur["n_churned"] == 0:
            assert abs(cur["survival"] - prev["survival"]) <= 1e-9


# --- events_ohlc -------------------------------------------------------


def test_ohlc_candle_invariants_and_boundary_values(spark):
    rows = timeseries.q_events_ohlc(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_trades"] >= 1
    # open/close recomputed from the raw events under the same order
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.unix_timestamp("ts").alias("es"), "event_id", "value"
        )
        .collect()
    )
    import collections

    by_day = collections.defaultdict(list)
    for e in ev:
        by_day[e["es"] // 86400].append(
            ((e["es"], e["event_id"]), e["value"])
        )
    got = {r["day"]: r for r in rows}
    assert set(got) == set(by_day)
    for day, trades in by_day.items():
        trades.sort()
        assert got[day]["open"] == trades[0][1]
        assert got[day]["close"] == trades[-1][1]
        assert got[day]["n_trades"] == len(trades)


# --- events_timestamp_heaping -------------------------------------------


def test_timestamp_heaping_detects_a_planted_truncation(spark):
    import pyarrow as pa

    # half the events truncated to the minute -> expected z far above 6
    n = 6000
    es = [1_700_000_000 + i * 7 for i in range(n)]
    es = [e - e % 60 if i % 2 == 0 else e for i, e in enumerate(es)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [e * 1_000_000 for e in es], pa.timestamp("us")
            ),
            "user_id": pa.array([i % 50 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="heap_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    rows = {
        r["boundary"]: r
        for r in timeseries.q_events_timestamp_heaping(spark, d).collect()
    }
    assert rows["minute"]["heaped"]
    assert rows["minute"]["observed_rate"] > 0.5 - 0.02
    # the clean corpus shows no heaping anywhere
    clean = timeseries.q_events_timestamp_heaping(spark, SF_DIR).collect()
    for r in clean:
        assert r["n_on_boundary"] <= r["n_events"]
        want_p0 = round(1.0 / {"minute": 60, "hour": 3600, "day": 86400}[r["boundary"]], 6)
        assert r["expected_rate"] == want_p0


# --- events_kpi_decomposition -------------------------------------------


def test_kpi_decomposition_log_ratios_add_up(spark):
    rows = {
        r["factor"]: r
        for r in timeseries.q_events_kpi_decomposition(spark, SF_DIR).collect()
    }
    assert set(rows) == {"users", "frequency", "aov", "revenue"}
    # the multiplicative identity: revenue = users · frequency · aov
    for col in ("week_prev", "week_last"):
        prod = (
            rows["users"][col]
            * rows["frequency"][col]
            * rows["aov"][col]
        )
        assert abs(prod - rows["revenue"][col]) <= 1e-4 * abs(prod)
    # log-additivity: factor ln-ratios sum to the revenue ln-ratio
    s = sum(rows[f]["ln_ratio"] for f in ("users", "frequency", "aov"))
    assert abs(s - rows["revenue"]["ln_ratio"]) <= 1e-5
    # contributions are shares of the total move, summing to 1
    cs = sum(rows[f]["contribution"] for f in ("users", "frequency", "aov"))
    assert abs(cs - 1.0) <= 1e-5
    assert abs(rows["revenue"]["contribution"] - 1.0) <= 1e-9


# --- events_alert_rules --------------------------------------------------


def test_alert_rules_cover_every_rule_and_fire_correctly(spark):
    rows = {
        r["rule_id"]: r
        for r in timeseries.q_events_alert_rules(spark, SF_DIR).collect()
    }
    assert set(rows) == {rid for rid, *_ in timeseries.ALERT_RULES}
    for rid, metric, op, thr in timeseries.ALERT_RULES:
        r = rows[rid]
        assert r["metric"] == metric and r["op"] == op
        want = r["value"] > thr if op == ">" else r["value"] < thr
        assert r["fired"] == want
    # shares are consistent probabilities
    assert 0.0 <= rows["R1_error_share_high"]["value"] <= 1.0
    assert 0.0 <= rows["R2_purchase_share_low"]["value"] <= 1.0


# --- events_reactivation --------------------------------------------------


def test_reactivation_matches_serial_gap_scan(spark):
    import collections

    rows = {
        r["week_start_day"]: r
        for r in timeseries.q_events_reactivation(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    import datetime

    by_user = collections.defaultdict(set)
    for e in ev:
        es = int(e["ts"].replace(tzinfo=datetime.timezone.utc).timestamp())
        by_user[e["user_id"]].add(es // 86400)
    want = collections.defaultdict(lambda: [0, set(), 0, 0])
    for u, days in by_user.items():
        ds = sorted(days)
        for a, b in zip(ds, ds[1:]):
            gap = b - a
            if gap >= timeseries.DORMANT_DAYS:
                wk = b - b % 7
                st = want[wk]
                st[0] += 1
                st[1].add(u)
                st[2] += gap
                st[3] = max(st[3], gap)
    assert set(rows) == set(want)
    for wk, (n, users, gsum, gmax) in want.items():
        r = rows[wk]
        assert r["n_reactivations"] == n
        assert r["n_users"] == len(users)
        assert r["max_dormancy_days"] == gmax
        assert abs(r["mean_dormancy_days"] - round(gsum / n, 6)) <= 1e-9


# --- events_revenue_volatility ---------------------------------------------


def test_revenue_volatility_matches_numpy(spark):
    import math

    import numpy as np

    r = timeseries.q_events_revenue_volatility(spark, SF_DIR).collect()[0]
    from pyspark.sql import functions as F

    daily = sorted(
        (row["d"], row["cents"])
        for row in timeseries.load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.expr("epoch_sec DIV 86400").cast("long").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
        .collect()
    )
    assert r["n_days"] == len(daily)
    cents = [c for _, c in daily]
    lr6 = [
        round(math.log(b / a) * 1e6) for a, b in zip(cents, cents[1:])
    ]
    want_vol = round(float(np.std(lr6, ddof=1)) / 1e6, 6)
    assert abs(r["realized_vol"] - want_vol) <= 2e-6
    # drawdown recomputed serially
    peak, mdd, mdd_day = 0, 0.0, None
    for d, c in daily:
        peak = max(peak, c)
        dd = round((peak - c) / peak, 6)
        if dd > mdd or (dd == mdd and mdd_day is None):
            mdd, mdd_day = dd, d
    assert abs(r["max_drawdown"] - mdd) <= 1e-9
    assert r["max_dd_day"] == mdd_day
    assert 0.0 <= r["max_drawdown"] < 1.0
