"""Invariant pins for the r6 Holt forecaster and the k-NN hubness
audit (both also oracle-checked via tools/parity.py)."""

from __future__ import annotations

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
    similarity,
    timeseries,
)


def test_holt_matches_independent_recursion(spark):
    from pyspark.sql import functions as F

    got = {
        (r["seg"], r["day"]): r
        for r in timeseries.q_events_holt_forecast(
            spark, SF_DIR
        ).collect()
    }
    daily = (
        timeseries.load_events(spark, SF_DIR)
        .select(
            (F.col("user_id") % timeseries.HOLT_SEG_MOD)
            .cast("int")
            .alias("seg"),
            F.expr("epoch_sec DIV 86400").cast("long").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("seg", "day")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    import collections

    series = collections.defaultdict(list)
    for r in daily:
        series[r["seg"]].append((r["day"], r["cents"]))
    assert set(series) == {0, 1, 2, 3}
    for seg, pts in series.items():
        pts.sort()
        lvl = trd = 0.0
        for i, (day, cents) in enumerate(pts):
            y = cents / 100.0
            if i == 0:
                lvl, trd = y, 0.0
            else:
                prev = lvl
                lvl = 0.5 * y + 0.5 * (lvl + trd)
                trd = 0.3 * (lvl - prev) + 0.7 * trd
            row = got[(seg, day)]
            assert abs(row["level"] - lvl) < 5e-6
            assert abs(row["trend"] - trd) < 5e-6
            assert (
                abs(row["forecast_next"] - (lvl + trd)) < 5e-6
            )
    assert len(got) == sum(len(p) for p in series.values())


def test_hubness_histogram_accounting(spark):
    rows = similarity.q_sim_knn_hubness(spark, SF_DIR).collect()
    n_vec = spark.read.parquet(
        f"{SF_DIR}/embeddings.parquet"
    ).count()
    assert sum(r["n_vectors"] for r in rows) == n_vec
    edges = sum(r["in_degree"] * r["n_vectors"] for r in rows)
    # every source contributes at most TOP_K edges
    assert 0 < edges <= n_vec * similarity.TOP_K
    assert all(r["in_degree"] >= 0 for r in rows)


def test_absorption_probabilities_are_probabilities(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming import (
        windowed,
    )

    rows = {
        r["state"]: r["p_absorb"]
        for r in windowed.q_events_absorption_prob(
            spark, SF_DIR
        ).collect()
    }
    assert rows[windowed.ABSORB_TARGET] == 1.0
    # every state observed before another event is a from-state here
    assert len(rows) >= 2
    for s, p in rows.items():
        assert 0.0 <= p <= 1.0 + 1e-6, (s, p)
    # with a dense chain every state eventually converts with
    # probability ~1-ish > 0
    assert all(p > 0 for p in rows.values())


def test_price_index_fisher_between_bounds(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        relational2,
    )

    rows = relational2.q_price_index(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_parts"] > 0
        lo, hi = sorted((r["laspeyres"], r["paasche"]))
        assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
        assert r["laspeyres"] > 0 and r["paasche"] > 0


def test_entropy_rate_accounting(spark):
    import math

    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming import (
        windowed,
    )

    rows = windowed.q_events_entropy_rate(spark, SF_DIR).collect()
    n_types = len(rows)
    assert n_types >= 2
    pi_sum = sum(r["pi"] for r in rows)
    # stationary distribution sums to 1 up to the per-iteration
    # rounding the determinism contract applies
    assert abs(pi_sum - 1.0) < 1e-3
    for r in rows:
        # conditional entropy bounded by log2(#states)
        assert 0.0 <= r["h_cond_bits"] <= math.log2(n_types) + 1e-6
        assert abs(r["h_contrib_bits"] - round(r["pi"] * r["h_cond_bits"], 5)) < 1e-4


def test_fano_factor_positive_and_counts_consistent(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming import (
        windowed,
    )

    rows = windowed.q_events_fano_factor(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["h_obs"] <= r["n_hours"]
        assert r["mean_per_hour"] > 0
        assert r["fano_factor"] >= 0
