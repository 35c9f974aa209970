"""CUPED / time-decay / SCD2 semantics on crafted events
(operators/experiments.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
    HALF_LIFE_SEC,
    q_events_cuped,
    q_events_scd2,
    q_events_time_decay,
)


def _write_events(tmp_path, rows, name="ev"):
    """rows: (event_id, epoch_sec, user_id, event_type, value)."""
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


def test_cuped_theta_adjustment_exact(spark, tmp_path):
    # pre at s=0, post at s=1000 (cut = midpoint 500).  pre per user
    # (10, 30, 20, 40), post = 2*pre + 5*variant →
    # theta = cov/var = 275/125 = 2.2, mean_pre = 25.
    # adj v0: 20-2.2*(10-25)=53, 40-2.2*(20-25)=51 → mean 52.0
    # adj v1: 65-2.2*(30-25)=54, 85-2.2*(40-25)=52 → mean 53.0
    pre = {0: 10.0, 1: 30.0, 2: 20.0, 3: 40.0}
    rows, eid = [], 0
    for u, p in pre.items():
        post = 2.0 * p + 5.0 * (u % 2)
        rows.append((eid, 0, u, "view", p))
        rows.append((eid + 1, 1000, u, "view", post))
        eid += 2
    sf = _write_events(tmp_path, rows)
    out = {r["variant"]: r for r in q_events_cuped(spark, sf).collect()}
    assert out[0]["n_users"] == 2 and out[1]["n_users"] == 2
    assert abs(out[0]["mean_cuped"] - 52.0) < 1e-6
    assert abs(out[1]["mean_cuped"] - 53.0) < 1e-6
    assert abs(out[0]["mean_post"] - 30.0) < 1e-6
    assert abs(out[1]["mean_post"] - 75.0) < 1e-6


def test_time_decay_half_life_exact(spark, tmp_path):
    # one event at the anchor (weight 1) and one exactly a half-life
    # earlier (weight 1/2): score = 8 + 4/2 = 10
    rows = [
        (0, HALF_LIFE_SEC, 7, "view", 8.0),
        (1, 0, 7, "view", 4.0),
    ]
    sf = _write_events(tmp_path, rows)
    row = q_events_time_decay(spark, sf).collect()[0]
    assert row["user_id"] == 7 and row["n_events"] == 2
    assert abs(row["decayed_score"] - 10.0) < 1e-6


def test_scd2_intervals_and_sample(spark, tmp_path):
    # user 0 is in the 5% sample (0 % 20 == 0); user 5 is not
    rows = [
        (0, 10, 0, "view", 1.0),
        (1, 20, 0, "click", 1.0),
        (2, 30, 5, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = sorted(
        q_events_scd2(spark, sf).collect(), key=lambda r: r["valid_from"]
    )
    assert [r["user_id"] for r in out] == [0, 0]
    assert out[0]["state"] == "view" and out[0]["valid_to"] == 20
    assert out[0]["is_current"] == 0
    assert out[1]["state"] == "click" and out[1]["valid_to"] is None
    assert out[1]["is_current"] == 1


# --- events_srm_check / events_attribution_models --------------------

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
    SRM_CHI2_CRIT,
    q_events_attribution_models,
    q_events_srm_check,
)


def test_srm_statistic_and_flag_are_consistent(spark):
    from conftest import SF_DIR

    r = q_events_srm_check(spark, SF_DIR).collect()[0]
    a, b = r["n_a"], r["n_b"]
    assert a > 0 and b > 0
    expect = round((a - b) ** 2 / (a + b), 6)
    assert abs(r["chi2"] - expect) < 1e-9
    assert r["srm_flag"] == int(r["chi2"] > SRM_CHI2_CRIT)
    ev = spark.read.parquet(SF_DIR + "/events.parquet")
    assert a + b == ev.select("user_id").distinct().count()


def test_attribution_models_conserve_total_credit(spark):
    from conftest import SF_DIR

    rows = q_events_attribution_models(spark, SF_DIR).collect()
    by_model = {}
    for r in rows:
        by_model.setdefault(r["model"], 0.0)
        by_model[r["model"]] += r["credit"]
    assert set(by_model) == {"first_touch", "last_touch", "linear"}
    totals = list(by_model.values())
    # each model allocates exactly one credit per attributed purchase
    assert abs(totals[0] - totals[1]) < 1e-3
    assert abs(totals[0] - totals[2]) < 1e-3
    for r in rows:
        if r["model"] in ("first_touch", "last_touch"):
            assert abs(r["credit"] - round(r["credit"])) < 1e-9, r
        assert r["channel"] in ("view", "click", "signup")


def test_attribution_models_match_python_recomputation(spark):
    """All three models recomputed journey-by-journey in plain Python
    from the raw events must equal the distributed result."""
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        TOUCH_TYPES,
        TOUCH_WINDOW_SEC,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        load_events,
    )

    ev = load_events(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", "epoch_sec"
    ).collect()
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    touches = [r for r in ev if r["event_type"] in TOUCH_TYPES]
    by_user = {}
    for t in touches:
        by_user.setdefault(t["user_id"], []).append(t)
    first, last, linear = {}, {}, {}
    for p in purchases:
        js = [
            t
            for t in by_user.get(p["user_id"], [])
            if p["epoch_sec"] - TOUCH_WINDOW_SEC
            <= t["epoch_sec"]
            <= p["epoch_sec"]
        ]
        if not js:
            continue
        fk = min(js, key=lambda t: (t["epoch_sec"], t["event_id"]))
        lk = max(js, key=lambda t: (t["epoch_sec"], t["event_id"]))
        first[fk["event_type"]] = first.get(fk["event_type"], 0.0) + 1
        last[lk["event_type"]] = last.get(lk["event_type"], 0.0) + 1
        for t in js:
            linear[t["event_type"]] = linear.get(
                t["event_type"], 0.0
            ) + 1.0 / len(js)
    expect = {
        ("first_touch", c): v for c, v in first.items()
    }
    expect.update({("last_touch", c): v for c, v in last.items()})
    expect.update(
        {("linear", c): round(v, 6) for c, v in linear.items()}
    )
    got = {
        (r["model"], r["channel"]): r["credit"]
        for r in q_events_attribution_models(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-5, k


def test_mwu_test_matches_numpy_ranks(spark):
    """Independent recomputation: numpy midranks over the raw collected
    values (a different algorithm than the histogram-window plan)."""
    import numpy as np

    from text_sentiment_analysis_in_hadoop_and_spark_spark.functions.hashing import hex32
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_events_mwu_test,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events
    from conftest import SF_DIR

    row = q_events_mwu_test(spark, SF_DIR).collect()[0]
    ev = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.pmod(hex32(F.col("user_id").cast("string")), 2).alias("arm"),
            "value",
        )
        .collect()
    )
    vals = np.array([r["value"] for r in ev])
    arms = np.array([r["arm"] for r in ev])
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals))
    sv = vals[order]
    i = 0
    pos = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
        pos += j - i
        i = j
    n_a = int((arms == 0).sum())
    n_b = int((arms == 1).sum())
    r_b = ranks[arms == 1].sum()
    u_b = r_b - n_b * (n_b + 1) / 2.0
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert abs(row["u_stat"] - u_b) < 1e-6
    # z recomputed with tie correction
    _, counts = np.unique(vals, return_counts=True)
    tie3 = float((counts**3 - counts).sum())
    n = n_a + n_b
    sigma = np.sqrt(
        n_a * n_b / 12.0 * ((n + 1) - tie3 / (n * (n - 1.0)))
    )
    z = (u_b - n_a * n_b / 2.0) / sigma
    assert abs(row["z_score"] - z) < 1e-5


def test_ks_drift_matches_numpy_cdfs(spark):
    import numpy as np

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_events_ks_drift,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events
    from conftest import SF_DIR

    row = q_events_ks_drift(spark, SF_DIR).collect()[0]
    ev = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .select("epoch_sec", "value")
        .collect()
    )
    es = np.array([r["epoch_sec"] for r in ev])
    vals = np.array([r["value"] for r in ev])
    t_mid = (es.min() + es.max()) // 2
    a = np.sort(vals[es < t_mid])
    b = np.sort(vals[es >= t_mid])
    grid = np.unique(vals)
    cdf_a = np.searchsorted(a, grid, side="right") / len(a)
    cdf_b = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(cdf_a - cdf_b)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["ks_stat"] - d.max()) < 1e-6
    assert abs(
        np.abs(
            (a <= row["ks_value"]).mean() - (b <= row["ks_value"]).mean()
        )
        - d.max()
    ) < 1e-9


def test_bootstrap_ci_properties(spark):
    """CI must bracket the point estimate (Poisson bootstrap is
    centered), be reproducible run-to-run, and use all replicates."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        BOOT_B,
        q_events_bootstrap_ci,
    )
    from conftest import SF_DIR

    r1 = q_events_bootstrap_ci(spark, SF_DIR).collect()[0]
    r2 = q_events_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert r1 == r2  # hash-derived weights: exactly reproducible
    assert r1["n_replicates"] == BOOT_B
    assert r1["ci_lo"] <= r1["lift"] <= r1["ci_hi"]
    assert r1["ci_hi"] > r1["ci_lo"]


def test_rate_ratio_and_cvar_sanity(spark):
    import numpy as np

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_events_cvar,
        q_events_rate_ratio_test,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events
    from conftest import SF_DIR

    rr = q_events_rate_ratio_test(spark, SF_DIR).collect()[0]
    ev = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .select("epoch_sec", "value")
        .collect()
    )
    es = np.array([r["epoch_sec"] for r in ev])
    mid = (es.min() + es.max()) / 2
    x1, x2 = int((es < mid).sum()), int((es >= mid).sum())
    assert (rr["x1"], rr["x2"]) == (x1, x2)
    z = (x1 - (x1 + x2) * 0.5) / np.sqrt((x1 + x2) * 0.25)
    assert abs(rr["z_score"] - z) < 1e-6

    cv = q_events_cvar(spark, SF_DIR).collect()[0]
    vals = np.sort(np.array([r["value"] for r in ev]))
    var95 = np.quantile(vals, 0.95, method="linear")
    tail = vals[vals >= var95]
    assert abs(cv["var95"] - var95) < 1e-6
    assert cv["n_tail"] == len(tail)
    assert cv["cvar95"] >= cv["var95"]  # shortfall dominates VaR
    assert abs(cv["cvar95"] - np.round(tail * 100).sum() / len(tail) / 100) < 1e-6


def test_wilson_and_power_properties(spark):
    import math

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        MDE_GRID_PCT,
        Z80_POWER,
        Z95,
        q_events_power_analysis,
        q_events_wilson_ci,
    )
    from conftest import SF_DIR

    w = q_events_wilson_ci(spark, SF_DIR).collect()[0]
    assert 0 < w["k"] <= w["n"]
    assert 0.0 <= w["wilson_lo"] <= w["p_hat"] <= w["wilson_hi"] <= 1.0
    # Wilson never collapses: strictly positive width
    assert w["wilson_hi"] > w["wilson_lo"]
    # python recompute
    n, k = w["n"], w["k"]
    p = k / n
    z2 = Z95 * Z95
    centre = (p + z2 / (2 * n)) / (1 + z2 / n)
    half = Z95 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n)
    assert abs(w["wilson_lo"] - (centre - half)) < 1e-6
    assert abs(w["wilson_hi"] - (centre + half)) < 1e-6

    rows = {
        r["mde_pct"]: r["n_per_arm"]
        for r in q_events_power_analysis(spark, SF_DIR).collect()
    }
    assert set(rows) == set(MDE_GRID_PCT)
    # quadratic law: halving the MDE ~quadruples the sample size
    assert rows[1] > rows[2] > rows[5] > rows[10]
    assert 3.5 <= rows[1] / rows[2] <= 4.5
    assert 3.5 <= rows[5] / rows[10] <= 4.5


def test_mcnemar_marginals_match_the_accuracy_counts(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        nb as nb_mod,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        tfidf as tfidf_mod,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_nb_mcnemar_test,
    )

    r = q_nb_mcnemar_test(spark, SF_DIR).collect()[0]
    cells = [
        r["n_both_right"],
        r["n_both_wrong"],
        r["n_only_plain"],
        r["n_only_featsel"],
    ]
    assert all(c >= 0 for c in cells)
    # 2x2 marginals must reproduce each classifier's solo right-count
    plain = nb_mod.q_nb_predictions(spark, SF_DIR).collect()
    feats = {
        row["doc_id"]: row["prediction"]
        for row in tfidf_mod.q_predictions(spark, SF_DIR).collect()
    }
    n_plain_right = sum(1 for p in plain if p["prediction"] == p["label"])
    n_feats_right = sum(
        1 for p in plain if feats[p["doc_id"]] == p["label"]
    )
    assert r["n_both_right"] + r["n_only_plain"] == n_plain_right
    assert r["n_both_right"] + r["n_only_featsel"] == n_feats_right
    assert sum(cells) == len(plain)
    # continuity-corrected statistic recomputed from the exposed cells
    b, c = r["n_only_plain"], r["n_only_featsel"]
    if b + c > 0:
        want = round(max(abs(b - c) - 1.0, 0.0) ** 2 / (b + c), 6)
        assert abs(r["mcnemar_chi2"] - want) <= 1e-9
        assert r["reject_5pct"] == (want > 3.841459)
    else:
        assert r["mcnemar_chi2"] is None
        assert r["reject_5pct"] is False


def test_variant_funnel_reconciles_with_the_global_funnel(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_events_variant_funnel,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        q_events_funnel,
    )

    rows = {r["variant"]: r for r in q_events_variant_funnel(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    g = q_events_funnel(spark, SF_DIR).collect()[0]
    # variant slices tile the global funnel exactly
    for col in ("n_users", "n_viewed", "n_clicked", "n_purchased"):
        assert rows[0][col] + rows[1][col] == g[col], col
    for r in rows.values():
        assert r["n_users"] >= r["n_viewed"] >= r["n_clicked"] >= r["n_purchased"]
        assert abs(r["conversion"] - round(r["n_purchased"] / r["n_users"], 6)) <= 1e-9


def test_funnel_significance_recomputes_from_the_funnel(spark):
    import math

    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_events_funnel_significance,
        q_events_variant_funnel,
    )

    r = q_events_funnel_significance(spark, SF_DIR).collect()[0]
    f = {row["variant"]: row for row in q_events_variant_funnel(spark, SF_DIR).collect()}
    n0, c0 = f[0]["n_users"], f[0]["n_purchased"]
    n1, c1 = f[1]["n_users"], f[1]["n_purchased"]
    assert (r["n_control"], r["conv_control"]) == (n0, c0)
    assert (r["n_treatment"], r["conv_treatment"]) == (n1, c1)
    p0, p1 = c0 / n0, c1 / n1
    assert abs(r["abs_lift"] - round(p1 - p0, 6)) <= 1e-9
    if c0 + c1 in (0, n0 + n1):
        assert r["z_score"] is None and r["significant_5pct"] is False
    else:
        pbar = (c0 + c1) / (n0 + n1)
        z = (p1 - p0) / math.sqrt(pbar * (1 - pbar) * (1 / n0 + 1 / n1))
        assert abs(r["z_score"] - round(z, 6)) <= 1e-9
        assert r["significant_5pct"] == (abs(round(z, 6)) > 1.959964)


def test_cohens_kappa_recomputes_from_the_paired_predictions(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        nb as nb_mod,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        tfidf as tfidf_mod,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.experiments import (
        q_nb_cohens_kappa,
    )

    r = q_nb_cohens_kappa(spark, SF_DIR).collect()[0]
    pa = {p["doc_id"]: p["prediction"] for p in nb_mod.q_nb_predictions(spark, SF_DIR).collect()}
    pb = {p["doc_id"]: p["prediction"] for p in tfidf_mod.q_predictions(spark, SF_DIR).collect()}
    ids = sorted(set(pa) & set(pb))
    n = len(ids)
    agree = sum(1 for d in ids if pa[d] == pb[d])
    apos = sum(pa[d] for d in ids)
    bpos = sum(pb[d] for d in ids)
    assert (r["n"], r["n_agree"]) == (n, agree)
    po = agree / n
    pe = (apos / n) * (bpos / n) + ((n - apos) / n) * ((n - bpos) / n)
    assert abs(r["p_observed"] - round(po, 6)) <= 1e-9
    assert abs(r["p_expected"] - round(pe, 6)) <= 1e-9
    if pe < 1.0:
        assert abs(r["kappa"] - round((po - pe) / (1 - pe), 6)) <= 2e-6
        assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
