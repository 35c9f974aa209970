"""k-anonymity / l-diversity semantics on a crafted customer table
(operators/privacy.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.privacy import (
    q_t_closeness,
    q_k_anonymity,
    q_l_diversity,
    q_risk_by_nation,
)


def _write_customers(tmp_path, rows):
    """rows: (custkey, nationkey, acctbal, segment)."""
    d = tmp_path / "cust"
    d.mkdir()
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([f"Customer#{r[0]:09d}" for r in rows]),
            "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
            "c_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(tbl, f"{d}/customer.parquet")
    return str(d)


def test_k_anonymity_classes_and_risk(spark, tmp_path):
    # nation 0: 5 identical-QI records (safe, k=5) + 1 singleton (risky)
    # nation 1: 2 records in one class (risky, k=2)
    rows = [(i, 0, 1500.0, "AUTO") for i in range(5)]
    rows += [(5, 0, 2500.0, "AUTO")]
    rows += [(6, 1, 500.0, "RAIL"), (7, 1, 500.0, "RAIL")]
    sf = _write_customers(tmp_path, rows)

    cls = {
        (r["nationkey"], r["bal_bucket"]): r
        for r in q_k_anonymity(spark, sf).collect()
    }
    assert cls[(0, 1)]["class_size"] == 5 and cls[(0, 1)]["is_risky"] == 0
    assert cls[(0, 2)]["class_size"] == 1 and cls[(0, 2)]["is_risky"] == 1
    assert cls[(1, 0)]["class_size"] == 2 and cls[(1, 0)]["is_risky"] == 1

    risk = {r["nationkey"]: r for r in q_risk_by_nation(spark, sf).collect()}
    assert risk[0]["n_customers"] == 6 and risk[0]["n_risky"] == 1
    assert abs(risk[0]["risk_share"] - 1 / 6) < 1e-5
    assert risk[1]["n_risky"] == 2 and risk[1]["risk_share"] == 1.0


def test_l_diversity_min_and_share(spark, tmp_path):
    # nation 0, bucket 1: segments {AUTO, RAIL, SHIP} → l=3 (diverse)
    # nation 0, bucket 2: segments {AUTO} → l=1 (not diverse)
    rows = [
        (0, 0, 1100.0, "AUTO"),
        (1, 0, 1200.0, "RAIL"),
        (2, 0, 1300.0, "SHIP"),
        (3, 0, 2100.0, "AUTO"),
        (4, 0, 2200.0, "AUTO"),
    ]
    sf = _write_customers(tmp_path, rows)
    out = {r["nationkey"]: r for r in q_l_diversity(spark, sf).collect()}
    assert out[0]["n_classes"] == 2
    assert out[0]["min_l"] == 1
    assert abs(out[0]["diverse_share"] - 0.5) < 1e-9


def test_t_closeness_fixture(spark, tmp_path):
    """Expected distances recomputed exactly in-test from the raw
    rows (total-variation against the GLOBAL marginal, absent
    segments contributing their full global mass)."""
    rows = [
        (0, 0, 1100.0, "AUTO"),
        (1, 0, 1200.0, "AUTO"),
        (2, 0, 1300.0, "RAIL"),
        (3, 0, 1400.0, "SHIP"),
        (4, 1, 1100.0, "RAIL"),
        (5, 1, 1200.0, "RAIL"),
        (6, 1, 1300.0, "AUTO"),
        (7, 1, 1400.0, "SHIP"),
        (8, 2, 1100.0, "BLDG"),
        (9, 2, 1200.0, "BLDG"),
    ]
    from collections import Counter

    glob = Counter(r[3] for r in rows)
    n = len(rows)
    expected = {}
    for nat in {r[1] for r in rows}:
        cls = Counter(r[3] for r in rows if r[1] == nat)
        cn = sum(cls.values())
        expected[nat] = 0.5 * sum(
            abs(cls.get(s_, 0) / cn - glob[s_] / n) for s_ in glob
        )
    sf = _write_customers(tmp_path, rows)
    out = {
        (r["nationkey"], r["bal_bucket"]): r
        for r in q_t_closeness(spark, sf).collect()
    }
    assert set(out) == {(0, 1), (1, 1), (2, 1)}
    for nat, exp in expected.items():
        assert abs(out[(nat, 1)]["t_distance"] - exp) < 1e-6, (nat, exp)
    # the single-segment class must be the farthest from global
    assert out[(2, 1)]["t_distance"] == max(
        r["t_distance"] for r in out.values()
    )


def test_t_closeness_bounds(spark):
    from conftest import SF_DIR

    for r in q_t_closeness(spark, SF_DIR).collect():
        assert -1e-9 <= r["t_distance"] <= 1.0 + 1e-9


def test_erasure_audit_is_complete_and_idempotent(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.privacy import (
        ERASE_MOD,
        q_erasure_audit,
    )

    rows = {r["artifact"]: r for r in q_erasure_audit(spark, SF_DIR).collect()}
    assert set(rows) == {
        "events_log",
        "latest_state_view",
        "user_lifetime_rollup",
    }
    ev = spark.read.parquet(SF_DIR + "/events.parquet")
    n_events = ev.count()
    users = [r["user_id"] for r in ev.select("user_id").distinct().collect()]
    del_users = {u for u in users if u % ERASE_MOD == 0}
    assert del_users  # the audit exercises a nonempty delete list
    r = rows["events_log"]
    assert r["n_rows"] == n_events
    assert r["n_affected_users"] == len(del_users)
    assert r["post_scrub_remaining"] == 0  # completeness proof
    for name in ("latest_state_view", "user_lifetime_rollup"):
        d = rows[name]
        assert d["n_rows"] == len(users)  # one row per user
        assert d["n_affected_rows"] == d["n_affected_users"] == len(del_users)
        assert d["post_scrub_remaining"] == 0


def test_dp_error_budget_calibration(spark):
    """Laplace calibration (r7): noise scale is exactly 1/ε for a
    sensitivity-1 count; the release bar flips monotonically in both
    ε and the cell count."""
    from tests.conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.privacy import (
        DP_EPSILONS,
        DP_REL_ERR_BAR,
        q_dp_error_budget,
    )

    rows = q_dp_error_budget(spark, SF_DIR).collect()
    assert rows
    by_cell = {}
    for r in rows:
        assert abs(r["noise_scale"] - 1.0 / r["epsilon"]) < 1e-9
        assert (
            r["releasable"] == 1
        ) == (r["expected_rel_err"] <= DP_REL_ERR_BAR)
        by_cell.setdefault((r["nationkey"], r["segment"]), []).append(
            (r["epsilon"], r["releasable"])
        )
    # every cell covers the full ε grid; releasability is monotone in ε
    for v in by_cell.values():
        assert sorted(e for e, _ in v) == sorted(DP_EPSILONS)
        flags = [rel for _, rel in sorted(v)]
        assert flags == sorted(flags)
