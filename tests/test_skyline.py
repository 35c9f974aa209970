"""Pareto-frontier (skyline) semantics — rel_pareto_frontier
(operators/relational2.py): exact dominance against a brute-force
python recomputation, tie handling, and the bucket-prefilter
soundness on planted corners."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
    q_pareto_frontier,
)


def _write_parts(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_size": pa.array([r[2] for r in rows], pa.int32()),
                "p_retailprice": pa.array(
                    [float(r[1]) for r in rows], pa.float64()
                ),
            }
        ),
        f"{d}/part.parquet",
    )
    return str(d)


def _brute_skyline(rows):
    out = set()
    for k, p, s in rows:
        dominated = any(
            (q <= p and t >= s and (q < p or t > s))
            for _, q, t in rows
        )
        if not dominated:
            out.add(k)
    return out


def test_skyline_matches_brute_force_on_planted_grid(spark, tmp_path):
    """Mixed grid spanning several $5 prefilter buckets, including a
    point dominated only WITHIN its own bucket and one dominated only
    by an equal-price larger part — the two cases the exact finish
    (not the prefilter) must catch."""
    rows = [
        (1, 900.00, 10),   # frontier: cheapest overall
        (2, 900.00, 10),   # exact duplicate — both survive (no strict dom)
        (3, 900.00, 7),    # equal price, smaller size → dominated by 1
        (4, 901.00, 9),    # same bucket as 1, pricier and smaller → dominated
        (5, 902.00, 15),   # frontier: bigger than anything cheaper
        (6, 907.00, 15),   # later bucket, ties size 15 at higher price → dominated
        (7, 911.00, 40),   # frontier
        (8, 911.00, 41),   # frontier (equal price, larger — dominates nothing of 7? no: dominates 7)
        (9, 919.00, 41),   # pricier, same size as 8 → dominated
        (10, 919.00, 50),  # frontier: max size
    ]
    d = _write_parts(tmp_path, "sky", rows)
    got = {r["p_partkey"] for r in q_pareto_frontier(spark, d).collect()}
    assert got == _brute_skyline(rows)
    # spot-pin the hand-derived set (7 IS dominated by 8: same price,
    # strictly larger size)
    assert got == {1, 2, 5, 8, 10}


def test_skyline_anticorrelated_keeps_everything(spark, tmp_path):
    """Perfectly anti-correlated data (cheaper ⇒ smaller): nothing
    dominates anything; all points are the skyline — the worst case
    the docstring promises survives."""
    rows = [(k, 900.0 + k * 7.0, 5 + k * 3) for k in range(12)]
    d = _write_parts(tmp_path, "anti", rows)
    got = {r["p_partkey"] for r in q_pareto_frontier(spark, d).collect()}
    assert got == {r[0] for r in rows}


def test_skyline_correlated_keeps_single_point(spark, tmp_path):
    """Perfectly correlated data (cheapest is also biggest): the
    skyline collapses to the single best part."""
    rows = [(k, 900.0 + k * 5.0, 50 - k) for k in range(10)]
    d = _write_parts(tmp_path, "corr", rows)
    got = {r["p_partkey"] for r in q_pareto_frontier(spark, d).collect()}
    assert got == {0}
