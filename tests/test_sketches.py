"""Estimate-vs-exact bounds for the theta / KLL sketch surfaces
(operators/sketches.py) — the rows-only pin SURVEY §5 prescribes for
engine-specific sketch families.

Error model: theta with lgNomEntries=12 has ~1.6% relative standard
error on union-sized quantities, and intersection/difference error
scales with the UNION of the operands (Datasketches docs), so the
set-algebra assertions bound absolute error by a fraction of the
union.  KLL with k=200 has ~1.65% normalized rank error; quantiles
are asserted by the RANK of the estimate in the exact distribution,
not by value distance (value distance is meaningless for heavy-tailed
data)."""

from __future__ import annotations

import bisect

import pytest
from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import sketches
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import doc_shingles
from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def lang_shingles(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sh = (
        doc_shingles(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("lang", "shingle")
        .distinct()
        .cache()
    )
    sh.count()
    yield sh
    sh.unpersist()


def test_theta_lang_overlap_bounds(spark, lang_shingles):
    est = {
        (r["lang_a"], r["lang_b"]): r
        for r in sketches.q_lang_overlap_theta(spark, SF_DIR).collect()
    }
    exact_sizes = {
        r["lang"]: r["n"]
        for r in lang_shingles.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    a = lang_shingles.select(
        F.col("lang").alias("lang_a"), "shingle"
    )
    b = lang_shingles.select(
        F.col("lang").alias("lang_b"), "shingle"
    )
    exact_inter = {
        (r["lang_a"], r["lang_b"]): r["n"]
        for r in a.join(b, "shingle")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(est) == len(exact_sizes) * (len(exact_sizes) - 1) // 2
    for (la, lb), r in est.items():
        ea, eb = exact_sizes[la], exact_sizes[lb]
        inter = exact_inter.get((la, lb), 0)
        union = ea + eb - inter
        assert abs(r["est_a"] - ea) <= 0.05 * ea
        assert abs(r["est_b"] - eb) <= 0.05 * eb
        # set-algebra error scales with the union of the operands
        assert abs(r["est_intersection"] - inter) <= 0.04 * union
        assert abs(r["est_union"] - union) <= 0.04 * union
        assert abs(r["jaccard_est"] - inter / union) <= 0.05


def test_theta_source_novelty_bounds(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sh = (
        doc_shingles(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        .cache()
    )
    n_sources = sh.select("source").distinct().count()
    corpus_union = sh.select("shingle").distinct().count()
    exact_unique = {
        r["source"]: r["n"]
        for r in sh.groupBy("shingle")
        .agg(
            F.count("*").alias("deg"), F.min("source").alias("source")
        )
        .filter(F.col("deg") == 1)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    exact_total = {
        r["source"]: r["n"]
        for r in sh.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = sketches.q_source_novelty_theta(spark, SF_DIR).collect()
    sh.unpersist()
    assert len(rows) == n_sources
    for r in rows:
        src = r["source"]
        assert (
            abs(r["est_total"] - exact_total[src])
            <= 0.05 * exact_total[src]
        )
        # difference error scales with the union of ALL operands,
        # i.e. the whole corpus shingle universe
        assert (
            abs(r["est_unique"] - exact_unique.get(src, 0))
            <= 0.05 * corpus_union
        )
        assert 0.0 <= r["unique_share"] <= 1.0


def test_kll_quantile_rank_bounds(spark):
    out = {
        r["day_epoch"]: r
        for r in sketches.q_value_quantiles_kll(spark, SF_DIR).collect()
    }
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import load_events

    pur = (
        load_events(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .select(
            (
                (F.expr(f"epoch_sec DIV {sketches.DAY_SEC}"))
                * sketches.DAY_SEC
            )
            .cast("long")
            .alias("day_epoch"),
            "value",
        )
        .collect()
    )
    by_day: dict[int, list[float]] = {}
    for r in pur:
        by_day.setdefault(r["day_epoch"], []).append(r["value"])
    by_day[-1] = [v for vs in by_day.values() for v in vs]
    assert set(out) == set(by_day)
    for day, vals in by_day.items():
        vals.sort()
        n = len(vals)
        for q in sketches.QUANTILES:
            est = out[day][f"p{int(q * 100)}"]
            # normalized rank of the estimated value in the exact
            # distribution must be within the sketch's rank error
            # (plus discretization slack for small days)
            lo = bisect.bisect_left(vals, est) / n
            hi = bisect.bisect_right(vals, est) / n
            slack = 0.035 + 1.0 / n
            assert lo - slack <= q <= hi + slack, (
                day,
                q,
                est,
                lo,
                hi,
                n,
            )
        # the merged row must be a real value from the distribution
        assert min(vals) <= out[day]["p50"] <= max(vals)
