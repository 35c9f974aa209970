"""Benford / functional-dependency audit semantics on crafted tables
(operators/relational2.py)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
    q_benford_audit,
    q_fd_audit,
)


def _write(tmp_path, orders, customers, lineitems):
    d = tmp_path / "rel"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_totalprice": pa.array(
                    [float(r[2]) for r in orders], pa.float64()
                ),
                "o_orderpriority": pa.array([r[3] for r in orders]),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customers], pa.int64()),
                "c_nationkey": pa.array(
                    [r[1] for r in customers], pa.int32()
                ),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lineitems], pa.int64()),
                "l_returnflag": pa.array([r[1] for r in lineitems]),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    return str(d)


def test_benford_digit_extraction_and_shares(spark, tmp_path):
    # totals 1.00, 19.99, 250.00, 2.50 → cents 100, 1999, 25000, 250
    # → first digits 1, 1, 2, 2
    orders = [
        (1, 1, 1.00, "P"),
        (2, 1, 19.99, "P"),
        (3, 1, 250.00, "P"),
        (4, 1, 2.50, "P"),
    ]
    sf = _write(tmp_path, orders, [(1, 0)], [(1, "N")])
    out = {r["digit"]: r for r in q_benford_audit(spark, sf).collect()}
    assert out[1]["n"] == 2 and out[2]["n"] == 2
    assert abs(out[1]["observed_share"] - 0.5) < 1e-9
    assert abs(out[1]["benford_share"] - round(math.log10(2), 6)) < 1e-9


def test_fd_audit_holds_and_violations(spark, tmp_path):
    # o_orderkey→o_custkey holds (unique keys);
    # o_custkey→o_orderpriority violated by cust 1 (P then Q)
    orders = [
        (1, 1, 10.0, "P"),
        (2, 1, 10.0, "Q"),
        (3, 2, 10.0, "P"),
    ]
    # l_orderkey→l_returnflag violated for order 1 (A and R)
    lineitems = [(1, "A"), (1, "R"), (2, "A")]
    sf = _write(tmp_path, orders, [(1, 0), (2, 0)], lineitems)
    out = {r["fd"]: r for r in q_fd_audit(spark, sf).collect()}
    assert out["orders.o_orderkey->o_custkey"]["holds"] == 1
    fd2 = out["orders.o_custkey->o_orderpriority"]
    assert fd2["holds"] == 0 and fd2["n_violating_keys"] == 1
    fd3 = out["lineitem.l_orderkey->l_returnflag"]
    assert fd3["n_keys"] == 2 and fd3["n_violating_keys"] == 1


def test_mix_shift_decomposition_sums_to_delta_aov(spark):
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        MIX_YEAR0,
        MIX_YEAR1,
        q_mix_shift,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    rows = q_mix_shift(spark, SF_DIR).collect()
    assert rows
    # Kitagawa identity: Σ(mix + rate) == AOV₁ − AOV₀ (global)
    orders = load_table(spark, SF_DIR, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    aov = {
        r["yr"]: r["s"] / (100.0 * r["n"])
        for r in orders.filter(F.col("yr").isin(MIX_YEAR0, MIX_YEAR1))
        .groupBy("yr")
        .agg(F.sum("cents").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    delta = aov[MIX_YEAR1] - aov[MIX_YEAR0]
    total = sum(r["mix_effect"] + r["rate_effect"] for r in rows)
    assert abs(total - delta) <= 1e-3 + 5e-6 * len(rows)
    # shares per year sum to 1
    assert abs(sum(r["share0"] for r in rows) - 1.0) <= 1e-4
    assert abs(sum(r["share1"] for r in rows) - 1.0) <= 1e-4


def test_order_velocity_audit_matches_serial_gaps(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        RAPID_DAYS,
        q_order_velocity_audit,
    )

    rows = {r["custkey"]: r for r in q_order_velocity_audit(spark, SF_DIR).collect()}
    assert rows
    import collections

    orders = spark.read.parquet(SF_DIR + "/orders.parquet").collect()
    by_cust = collections.defaultdict(list)
    import datetime

    for o in orders:
        d = int(
            o["o_orderdate"].replace(tzinfo=datetime.timezone.utc).timestamp()
        ) // 86400
        by_cust[o["o_custkey"]].append((d, o["o_orderkey"]))
    for ck, os_ in by_cust.items():
        if len(os_) < 2:
            assert ck not in rows  # singles have no gaps to audit
            continue
        os_.sort()
        gaps = [b[0] - a[0] for a, b in zip(os_, os_[1:])]
        r = rows[ck]
        assert r["n_orders"] == len(os_)
        assert r["min_gap_days"] == min(gaps)
        assert r["n_rapid"] == sum(1 for g in gaps if g <= RAPID_DAYS)
        assert r["velocity_flag"] == (r["n_rapid"] > 0)
    # the flag fires somewhere on a 10-order-per-customer corpus
    assert any(r["velocity_flag"] for r in rows.values())


def test_p_chart_limits_and_center_reconcile(spark):
    import math

    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_returns_p_chart,
    )

    rows = q_returns_p_chart(spark, SF_DIR).collect()
    assert rows
    tot_n = sum(r["n_items"] for r in rows)
    tot_r = sum(r["n_returned"] for r in rows)
    p_bar = tot_r / tot_n
    for r in rows:
        assert abs(r["center_line"] - round(p_bar, 6)) <= 1e-9
        sig = math.sqrt(p_bar * (1 - p_bar) / r["n_items"])
        assert abs(r["ucl"] - round(p_bar + 3 * sig, 6)) <= 1e-9
        assert abs(r["lcl"] - round(max(0.0, p_bar - 3 * sig), 6)) <= 1e-9
        assert 0.0 <= r["lcl"] <= r["center_line"] <= r["ucl"]
        assert r["out_of_control"] == (
            r["p_hat"] > r["ucl"] or r["p_hat"] < r["lcl"]
        )
    # wider limits for thinner months (n-dependence is the point)
    by_n = sorted(rows, key=lambda r: r["n_items"])
    if by_n[0]["n_items"] < by_n[-1]["n_items"]:
        assert (by_n[0]["ucl"] - by_n[0]["lcl"]) >= (
            by_n[-1]["ucl"] - by_n[-1]["lcl"]
        ) - 1e-9


def test_join_cardinality_actual_matches_the_real_join(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_join_cardinality_estimate,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    r = q_join_cardinality_estimate(spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    true_join = o.join(
        li, o.o_orderkey == li.l_orderkey
    ).count()
    assert r["actual_rows"] == true_join  # count-table product identity
    assert r["rows_a"] == o.count() and r["rows_b"] == li.count()
    # PK-FK uniform case: the textbook estimate lands within 2x
    assert 0.5 <= r["est_over_actual"] <= 2.0
    assert r["hot_key_bound"] >= 1


def test_order_aging_tiles_open_orders_and_buckets_correctly(spark):
    import datetime

    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_order_aging,
    )

    rows = {r["age_bucket"]: r for r in q_order_aging(spark, SF_DIR).collect()}
    orders = spark.read.parquet(SF_DIR + "/orders.parquet").collect()

    def day(o):
        return int(
            o["o_orderdate"].replace(tzinfo=datetime.timezone.utc).timestamp()
        ) // 86400

    asof = max(day(o) for o in orders)
    open_orders = [o for o in orders if o["o_orderstatus"] == "O"]
    assert sum(r["n_orders"] for r in rows.values()) == len(open_orders)
    import collections

    want = collections.Counter()
    for o in open_orders:
        age = asof - day(o)
        cls = "0-30" if age <= 30 else "31-60" if age <= 60 else "61-90" if age <= 90 else "90+"
        want[cls] += 1
    for cls, n in want.items():
        assert rows[cls]["n_orders"] == n
        assert rows[cls]["min_age_days"] <= rows[cls]["max_age_days"]


def test_price_dispersion_queue_is_widest_first_multi_supplier_only(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        PRICE_DISP_K,
        q_unit_price_dispersion,
    )

    rows = sorted(
        q_unit_price_dispersion(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert 0 < len(rows) <= PRICE_DISP_K
    for r in rows:
        assert r["n_suppliers"] >= 2
        assert r["min_unit_price"] <= r["max_unit_price"]
        want = round(
            (r["max_unit_price"] - r["min_unit_price"]) / r["min_unit_price"],
            6,
        )
        # spread recomputed from the exposed (rounded) prices — allow
        # the milli-unit quantization of the two price roundings
        assert abs(r["spread_frac"] - want) <= 1e-4
    for a, b in zip(rows, rows[1:]):
        assert a["spread_frac"] >= b["spread_frac"] - 1e-9


def test_fill_rate_reconciles_with_raw_lineitems(spark):
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.relational2 import (
        q_fill_rate,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    rows = {r["priority"]: r for r in q_fill_rate(spark, SF_DIR).collect()}
    assert rows
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n_lines"] for r in rows.values()) == li_n
    filled = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_linestatus") == "F")
        .count()
    )
    assert sum(r["n_filled"] for r in rows.values()) == filled
    for r in rows.values():
        assert 0.0 <= r["line_fill_rate"] <= 1.0
        assert 0.0 <= r["value_fill_rate"] <= 1.0
        assert abs(
            r["line_fill_rate"] - round(r["n_filled"] / r["n_lines"], 6)
        ) <= 1e-9
