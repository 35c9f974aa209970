"""Debounce / k-fold / ABC semantics on crafted data
(streaming/windowed.py, operators/pipeline.py, operators/relational2.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
    KFOLDS,
    q_kfold_manifest,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
    q_abc_classification,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    q_events_debounce,
)


def test_debounce_drops_rapid_refire_only(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    # user 1 'click' at 0, 30 (dropped: ≤60s), 200 (kept);
    # user 2 'click' at 10 (kept: different user)
    rows = [
        (1, 0, 1, "click"),
        (2, 30, 1, "click"),
        (3, 200, 1, "click"),
        (4, 10, 2, "click"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * 10**9 for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{d}/events.parquet",
    )
    row = q_events_debounce(spark, str(d)).collect()[0]
    assert row["n_events"] == 4
    assert row["n_kept"] == 3 and row["n_dropped"] == 1


def test_kfold_duplicate_consistency(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    # byte-identical texts must land in ONE fold
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(["same text"] * 10),
                "lang": pa.array(["en"] * 10),
                "source": pa.array(["s0"] * 10),
                "n_chars": pa.array([9] * 10, pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    rows = q_kfold_manifest(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 10
    assert 0 <= rows[0]["fold"] < KFOLDS


def test_abc_classes_split_by_share(spark, tmp_path):
    d = tmp_path / "rel"
    d.mkdir()
    # one nation, 4 customers with revenue 80/10/6/4 (cents-scaled):
    # cum-before shares: 0 (<0.8 → A), .8 (<0.95 → B), .9 (<0.95 → B),
    # .96 (→ C)
    revs = {1: 8000, 2: 1000, 3: 600, 4: 400}
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(list(revs), pa.int64()),
                # price r, no discount → rev_cents = r*100*100
                "l_extendedprice": pa.array(
                    [float(v) for v in revs.values()], pa.float64()
                ),
                "l_discount": pa.array([0.0] * 4, pa.float64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(revs), pa.int64()),
                "o_custkey": pa.array(list(revs), pa.int64()),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(revs), pa.int64()),
                "c_nationkey": pa.array([0] * 4, pa.int32()),
            }
        ),
        f"{d}/customer.parquet",
    )
    out = {r["abc"]: r for r in q_abc_classification(spark, str(d)).collect()}
    assert out["A"]["n_customers"] == 1
    assert out["B"]["n_customers"] == 2
    assert out["C"]["n_customers"] == 1
