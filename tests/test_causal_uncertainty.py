"""Invariant pins for the r6 causal/uncertainty additions:
diff-in-differences, mSPRT always-valid p-values, IPS off-policy
value, the portable count-min sketch, WOE/IV, and split-conformal
prediction sets.  Each also has a DuckDB oracle (parity-checked at
two scale factors); these tests pin the MATH the oracle can't see —
one-sidedness, monotonicity, coverage guarantees."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    experiments,
    nb,
    sketches,
    textstats,
)


def test_did_cells_partition_the_events(spark):
    row = experiments.q_events_diff_in_diff(spark, SF_DIR).collect()[0]
    n_cells = sum(row[f"n_{t}{p}"] for t in (0, 1) for p in (0, 1))
    n_events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    )
    assert n_cells == n_events
    # DiD recomputes from the exposed cell means
    did = (row["mean_11"] - row["mean_10"]) - (
        row["mean_01"] - row["mean_00"]
    )
    assert abs(did - row["did"]) < 5e-6
    assert row["se"] > 0


def test_msprt_p_value_is_always_valid_shaped(spark):
    rows = sorted(
        experiments.q_events_msprt(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 < r["p_always_valid"] <= 1.0
        # running min ⇒ monotone non-increasing over days
        assert r["p_always_valid"] <= prev + 1e-9
        prev = r["p_always_valid"]
        assert r["inv_lambda"] > 0
        # cumulative arm counts are monotone by construction
    for a, b in zip(rows, rows[1:]):
        assert b["n_t"] >= a["n_t"] and b["n_c"] >= a["n_c"]


def test_ips_estimator_relations(spark):
    row = experiments.q_events_ips_value(spark, SF_DIR).collect()[0]
    # Kish ESS is at most the number of nonzero-weight rows ≤ n
    assert 0 < row["effective_n"] <= row["n"]
    assert row["ips_value"] > 0 and row["snips_value"] > 0
    # contextual propensities make IPS ≠ naive mean (and ≠ SNIPS)
    assert abs(row["ips_value"] - row["naive_mean"]) > 1e-9


def test_cms_estimates_are_one_sided(spark):
    rows = sketches.q_text_cms_top_tokens(spark, SF_DIR).collect()
    # the synthetic sf0.001 vocabulary is smaller than the probe K
    assert 0 < len(rows) <= sketches.CMS_PROBE_K
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["n_cms"] == r["n_exact"] + r["overestimate"] for r in rows)
    # ε·N bound with ε = e/w holds for the vast majority (Markov)
    total = sum(r["n_exact"] for r in rows)
    eps_n = 2.7182818 / sketches.CMS_WIDTH * total * 4
    assert sum(r["overestimate"] > eps_n for r in rows) < len(rows) * 0.1


def test_woe_iv_accounting(spark):
    rows = textstats.q_woe_iv(spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == docs
    for r in rows:
        assert r["n_pos"] + r["n_neg"] == r["n"]
        # each IV term is non-negative by construction ((p−q)·ln(p/q))
        assert r["iv_term"] >= -1e-9


def test_conformal_coverage_and_set_accounting(spark):
    row = nb.q_nb_conformal(spark, SF_DIR).collect()[0]
    assert row["n_calib_pos"] > 0 and row["n_calib_neg"] > 0
    # marginal coverage ≥ 1−α up to finite-sample noise on the
    # fixed eval split
    assert row["coverage"] >= 1.0 - nb.CONF_ALPHA - 0.08
    assert 0.0 <= row["avg_set_size"] <= 2.0
    assert row["frac_empty"] + row["frac_both"] <= 1.0
    # set-size identity: avg_set = 2·frac_both + 1·frac_single
    frac_single = 1.0 - row["frac_empty"] - row["frac_both"]
    assert (
        abs(row["avg_set_size"] - (2 * row["frac_both"] + frac_single))
        < 5e-6
    )


@pytest.mark.slow
def test_conformal_coverage_at_bench_scale(spark):
    row = nb.q_nb_conformal(spark, "/root/testdata/sf0.1").collect()[0]
    assert row["coverage"] >= 1.0 - nb.CONF_ALPHA - 0.03


def test_qi_subset_audit_monotone_risk(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        privacy,
    )

    rows = {
        r["qi_subset"]: r
        for r in privacy.q_qi_subset_audit(spark, SF_DIR).collect()
    }
    assert len(rows) == 7  # 2^3 - 1 subsets
    full = rows["nation+segment+bal_band"]
    for name, r in rows.items():
        # adding QI columns can only refine classes: the full subset
        # has the most classes and the highest identifiable share
        assert r["n_classes"] <= full["n_classes"]
        assert (
            r["identifiable_share"]
            <= full["identifiable_share"] + 1e-9
        )
        assert r["min_k"] >= 1


def test_adstock_fit_shape(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        experiments,
    )

    row = experiments.q_events_adstock_mmm(spark, SF_DIR).collect()[0]
    assert row["n_days"] > 1
    assert row["lam"] == experiments.ADSTOCK_LAMBDA
    assert 0.0 <= row["r2"] <= 1.0


def test_newsvendor_service_level_meets_critical_ratio(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        relational2,
    )

    rows = relational2.q_newsvendor_stock(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # stocking at the CR-quantile serves at least CR of days
        assert (
            r["service_level"] >= relational2.NEWSVENDOR_CR - 1e-9
        ), r
        assert r["q_star"] > 0 and r["n_days"] > 0


def test_corpus_health_fractions(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        pipeline,
    )

    row = pipeline.q_corpus_health(spark, SF_DIR).collect()[0]
    assert row["n_docs"] > 0 and row["total_tokens"] > 0
    assert 0 < row["n_kept"] <= row["n_exact_unique"] <= row["n_docs"]
    assert 0 < row["kept_frac"] <= row["exact_unique_frac"] <= 1.0
    assert row["lang_entropy_bits"] >= 0.0


def test_bass_fit_recovers_meaningful_params(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        relational2,
    )

    row = relational2.q_bass_diffusion(spark, SF_DIR).collect()[0]
    assert row["n_days"] > 10
    if row["m_hat"] is not None:
        # recovered market size must cover the observed adopters and
        # the innovation/imitation rates must be positive
        assert row["m_hat"] > 0
        assert row["p_hat"] > 0 and row["q_hat"] > 0

    # Independent cross-check (r6 advice): the Cramer-rule coefficients
    # must match numpy.linalg.lstsq on the same (y, N, N²) day table —
    # a wrong cofactor copied into both the query and its oracle would
    # pass parity but fail here.
    import numpy as np

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            "o_custkey",
            F.expr(
                "CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)"
            ).alias("d"),
        )
    )
    daily = (
        orders.groupBy("o_custkey")
        .agg(F.min("d").alias("fd"))
        .groupBy("fd")
        .agg(F.count("*").cast("long").alias("y"))
    )
    wcum = Window.orderBy("fd").rowsBetween(Window.unboundedPreceding, -1)
    pts = (
        daily.select(
            "y",
            F.coalesce(F.sum("y").over(wcum), F.lit(0)).alias("n_prev"),
        )
        .orderBy("n_prev")
        .collect()
    )
    n_prev = np.array([r["n_prev"] for r in pts], dtype=float)
    y = np.array([r["y"] for r in pts], dtype=float)
    X = np.column_stack([np.ones_like(n_prev), n_prev, n_prev * n_prev])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(row["coef_a"] - coef[0]) < 1e-4 * max(1.0, abs(coef[0]))
    assert abs(row["coef_b"] - coef[1]) < 1e-4 * max(1.0, abs(coef[1]))
    assert abs(row["coef_c"] - coef[2]) < 1e-4 * max(1.0, abs(coef[2]))


def test_pot_return_levels_ordered(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        timeseries,
    )

    row = timeseries.q_events_pot_tail(spark, SF_DIR).collect()[0]
    assert row["n_exceed"] > 0 and row["mean_excess"] > 0
    # longer return periods extrapolate to higher levels, all above u
    rls = [row[f"return_level_{m}d"] for m in timeseries.POT_RETURN_DAYS]
    assert rls == sorted(rls)
    assert rls[-1] > row["u_threshold"]
