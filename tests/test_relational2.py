

def test_referential_audit_clean_and_injected_orphans(spark, tmp_path):
    """r7 data-contract audit: the shipped TPC-H-ish testdata is
    referentially clean (all 7 edges, zero orphans); dropping one
    nation from a doctored copy surfaces orphans on exactly the two
    nation edges, with exact counts."""
    import os
    import shutil

    from tests.conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        _FK_EDGES,
        q_referential_audit,
    )

    rows = {r["edge"]: r for r in q_referential_audit(spark, SF_DIR).collect()}
    assert set(rows) == {e[0] for e in _FK_EDGES}
    assert all(r["n_orphans"] == 0 and r["orphan_rate"] == 0.0 for r in rows.values())
    assert all(r["n_child"] > 0 for r in rows.values())

    # doctored copy: drop nationkey 0 from the nation dimension
    d = tmp_path / "doctored"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if t == "nation":
            (
                spark.read.parquet(src)
                .filter("n_nationkey <> 0")
                .write.mode("overwrite")
                .parquet(str(d / "nation.parquet"))
            )
        else:
            os.symlink(src, str(d / f"{t}.parquet"))
    doctored = {
        r["edge"]: r
        for r in q_referential_audit(spark, str(d)).collect()
    }
    cust0 = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter("c_nationkey = 0")
        .count()
    )
    supp0 = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .filter("s_nationkey = 0")
        .count()
    )
    assert doctored["customer->nation"]["n_orphans"] == cust0 > 0
    # the tiny sf may have no supplier in the dropped nation — the
    # audit must agree with the exact count either way
    assert doctored["supplier->nation"]["n_orphans"] == supp0
    clean_edges = set(doctored) - {"customer->nation", "supplier->nation"}
    assert all(doctored[e]["n_orphans"] == 0 for e in clean_edges)


def test_release_gate_composes_its_audits(spark):
    """r7 capstone: the gate's evidence numbers must agree with the
    underlying audits, and release_ok must be the AND of the three
    per-gate flags."""
    from tests.conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_referential_audit,
        q_release_gate,
    )

    g = q_release_gate(spark, SF_DIR).collect()[0]
    orphans = sum(
        r["n_orphans"]
        for r in q_referential_audit(spark, SF_DIR).collect()
    )
    assert g["n_orphans"] == orphans
    assert g["release_ok"] == int(
        g["referential_ok"] and g["fd_ok"] and g["kanon_ok"]
    )
    assert g["referential_ok"] == int(g["n_orphans"] == 0)
    assert g["fd_ok"] == int(g["n_fd_violations"] == 0)
    # the shipped testdata must clear the structural gates
    assert g["referential_ok"] == 1 and g["fd_ok"] == 1


def test_referential_audit_plans_broadcast_left_probes(spark):
    """Scale pin, r12 shape: each child table is scanned ONCE and
    probed with LEFT OUTER joins against the parents' DISTINCT keys
    (orphan = unmatched — the anti-join membership without the
    second per-edge count pass), and at bench scale every probe is a
    BroadcastHashJoin — the orphan check must never shuffle a fact
    table against a tiny dimension.  (A parent that outgrows the
    broadcast threshold may legitimately fall back to a shuffle at
    production scale; the pin here is the bench-scale plan.)"""
    from tests.conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        _FK_EDGES,
        q_referential_audit,
    )

    plan = (
        q_referential_audit(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LeftOuter, BuildRight") == len(_FK_EDGES)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # one scan per distinct child + one per parent reference — the old
    # per-edge anti+count shape paid two child scans per edge
    n_children = len({e[1] for e in _FK_EDGES})
    assert plan.count("FileScan parquet") == n_children + len(_FK_EDGES)
