"""Cohort retention + hourly anomaly semantics on crafted events
(streaming/windowed.py late queries)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    DAY_SEC,
    q_events_anomaly,
    q_events_retention,
)


def _write_events(tmp_path, rows):
    """rows: (event_id, epoch_sec, user_id, event_type, value)."""
    d = tmp_path / "ev"
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


def test_retention_matrix(spark, tmp_path):
    # u1 first active day 0, returns day 1 and day 3 (twice: still one
    # active-day row); u2 first active day 0 only; u3 first active day 1
    rows = [
        (1, 0, 1, "view", 0),
        (2, DAY_SEC + 5, 1, "view", 0),
        (3, 3 * DAY_SEC, 1, "click", 0),
        (4, 3 * DAY_SEC + 9, 1, "view", 0),
        (5, 10, 2, "view", 0),
        (6, DAY_SEC + 1, 3, "view", 0),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_active"], r["retention_frac"])
        for r in q_events_retention(spark, sf).collect()
    }
    assert got == {
        (0, 0): (2, 1.0),    # u1, u2
        (0, 1): (1, 0.5),    # u1 returns
        (0, 3): (1, 0.5),    # u1 returns once despite two events
        (1, 0): (1, 1.0),    # u3's own cohort
    }


def test_anomaly_flags_the_spike(spark, tmp_path):
    # 9 quiet hours of 2 events + 1 hour of 20 -> the spike's z is the
    # only one past the threshold
    rows = []
    eid = 0
    for h in range(9):
        for k in range(2):
            rows.append((eid := eid + 1, h * 3600 + k, 100 + k, "view", 1))
    for k in range(20):
        rows.append((eid := eid + 1, 9 * 3600 + k, 200 + k, "view", 1))
    sf = _write_events(tmp_path, rows)
    out = {r["hour_epoch"]: r for r in q_events_anomaly(spark, sf).collect()}
    assert len(out) == 10
    assert out[9 * 3600]["is_anomaly"] is True
    assert all(not out[h * 3600]["is_anomaly"] for h in range(9))
    assert out[9 * 3600]["n_events"] == 20


def test_gap_fill_densifies_and_carries_forward(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_gap_fill,
    )

    H = 3600
    # type "a": hours 0 and 3 observed, 1-2 are gaps; value mean 5.0 then 9.0
    rows = [
        (1, 10, 1, "a", 4.0),
        (2, 20, 2, "a", 6.0),
        (3, 3 * H + 5, 1, "a", 9.0),
        (4, 0, 1, "b", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r["event_type"], r["hour_epoch"]): (r["n_events"], r["locf_mean"])
        for r in q_events_gap_fill(spark, sf).collect()
    }
    assert out[("a", 0)] == (2, 5.0)
    assert out[("a", H)] == (0, 5.0)        # gap: zero events, LOCF mean
    assert out[("a", 2 * H)] == (0, 5.0)
    assert out[("a", 3 * H)] == (1, 9.0)
    assert out[("b", 0)] == (1, 1.0)
    assert len(out) == 5                     # dense spine, per-type bounds


def test_latest_state_compaction(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_latest_state,
    )

    rows = [
        (1, 100, 7, "view", 1.0),
        (2, 200, 7, "view", 2.0),     # later ts wins
        (3, 200, 8, "view", 3.0),
        (4, 200, 8, "view", 4.0),     # equal ts: higher event_id wins
        (5, 50, 7, "click", 5.0),     # separate key
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r["user_id"], r["event_type"]): (r["last_event_id"], r["last_value"])
        for r in q_events_latest_state(spark, sf).collect()
    }
    assert out == {
        (7, "view"): (2, 2.0),
        (8, "view"): (4, 4.0),
        (7, "click"): (5, 5.0),
    }


def test_latest_state_uses_window_group_limit(spark):
    """rk=1 must prune inside the window stage (WindowGroupLimit),
    not materialize full ranked partitions."""
    import __spark_entry__ as entrymod
    from conftest import SF_DIR

    df = entrymod.queries()["events_latest_state"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_histogram_buckets_cover_all_rows(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        N_HIST_BUCKETS,
        q_events_value_histogram,
    )

    rows = [(i, i, 1, "a", float(v)) for i, v in enumerate([0, 1, 5, 9, 10, 10])]
    sf = _write_events(tmp_path, rows)
    out = {r["bucket"]: r["n"] for r in q_events_value_histogram(spark, sf).collect()}
    assert len(out) == N_HIST_BUCKETS          # dense spine
    assert sum(out.values()) == 6              # every row in exactly one bucket
    assert out[N_HIST_BUCKETS] == 2            # max values clamp into the top bucket


def test_winsorize_clamps_only_the_tails(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_winsorized,
    )

    # 99 moderate values + one huge outlier: the outlier must clamp,
    # the winsorized mean must drop below the raw mean
    rows = [(i, i, 1, "a", float(v)) for i, v in enumerate(range(99))]
    rows.append((99, 99, 1, "a", 1e6))
    sf = _write_events(tmp_path, rows)
    r = q_events_winsorized(spark, sf).collect()[0]
    assert r["n_events"] == 100
    assert r["n_clamped_hi"] == 1
    assert r["mean_winsorized"] < r["mean_raw"]


def test_transition_matrix_counts_and_rows_sum_to_one(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_transitions,
    )

    rows = [
        (1, 10, 1, "view", 0),
        (2, 20, 1, "click", 0),
        (3, 30, 1, "view", 0),
        (4, 40, 1, "click", 0),
        (5, 15, 2, "view", 0),
        (6, 25, 2, "purchase", 0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in q_events_transitions(spark, sf).collect()
    }
    # user 1: view→click ×2, click→view ×1; user 2: view→purchase ×1
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "purchase")] == (1, round(1 / 3, 6))
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3


def test_daily_uniques_hll_tracks_exact(spark):
    """Sketch↔exact pairing discipline: the HLL twin must agree with
    the exact DAU within 5·rsd on every day of the real corpus."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_daily_uniques,
        q_events_daily_uniques_approx,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        r["day_epoch"]: r["n_users"]
        for r in q_events_daily_uniques(spark, sf).collect()
    }
    approx = {
        r["day_epoch"]: r["n_users_approx"]
        for r in q_events_daily_uniques_approx(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.1 * n), (day, n, approx[day])


def test_equidepth_buckets_roughly_balanced(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        N_EQUIDEPTH,
        q_events_value_histogram_equidepth,
    )

    # heavily skewed values: equal-width would starve the tail, the
    # equi-depth deciles must stay within 2x of the ideal count
    rows = [(i, i, 1, "a", float(2 ** (i % 17))) for i in range(200)]
    sf = _write_events(tmp_path, rows)
    out = q_events_value_histogram_equidepth(spark, sf).collect()
    ns = [r["n"] for r in out]
    assert sum(ns) == 200
    ideal = 200 / N_EQUIDEPTH
    assert max(ns) <= 2 * ideal


def test_user_entropy_bands(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_user_entropy,
    )

    rows = (
        # user 1: single-type bot → entropy 0 (band 0)
        [(i, i, 1, "view", 0) for i in range(8)]
        # user 2: perfect 50/50 mix → entropy 1.0 (band 2)
        + [(10 + i, 10 + i, 2, "view" if i % 2 else "click", 0) for i in range(8)]
    )
    sf = _write_events(tmp_path, rows)
    out = {r["entropy_band"]: r for r in q_events_user_entropy(spark, sf).collect()}
    assert out[0]["n_users"] == 1 and out[0]["mean_entropy"] == 0.0
    assert out[2]["n_users"] == 1 and out[2]["mean_entropy"] == 1.0


def test_stickiness_sketch_tracks_exact(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_stickiness,
        q_events_stickiness_sketch,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        r["day_epoch"]: (r["dau"], r["wau"])
        for r in q_events_stickiness(spark, sf).collect()
    }
    est = {
        r["day_epoch"]: (r["dau_est"], r["wau_est"])
        for r in q_events_stickiness_sketch(spark, sf).collect()
    }
    assert set(exact) == set(est)
    for day, (dau, wau) in exact.items():
        edau, ewau = est[day]
        assert abs(edau - dau) <= max(2, 0.05 * dau)
        assert abs(ewau - wau) <= max(2, 0.05 * wau)


def test_autocorr_detects_trend_vs_noise(spark, tmp_path):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_autocorr,
    )

    rows = []
    eid = 0
    # type "trend": hourly volume ramps 1,2,...,24 → r1 near 1
    for h in range(24):
        for k in range(h + 1):
            rows.append((eid := eid + 1, h * 3600 + k, 1, "trend", 0))
    # type "alt": volumes alternate 1,9,1,9 → r1 strongly negative
    for h in range(24):
        for k in range(9 if h % 2 else 1):
            rows.append((eid := eid + 1, h * 3600 + k, 2, "alt", 0))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r["lag1_autocorr"] for r in q_events_autocorr(spark, sf).collect()}
    assert out["trend"] > 0.9
    assert out["alt"] < -0.9
