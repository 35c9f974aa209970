"""Regression pin for the r10 escape class: the driver's value-hash is
TYPED, so a DuckDB oracle exposing an uncast HUGEINT (what sum(BIGINT)
returns) or DECIMAL hash-mismatches an integer-equal Spark BIGINT even
though a value-tolerant compare passes.  Two r10 window queries
(events_changepoint, sql_script_median_search) shipped exactly this way
— tools/parity.py now compares DECLARED column types before fetching a
single row, and this test pins that the check (a) catches each known
divergence class and (b) accepts the matching pairs.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.parity import _canon_duck_type, _canon_spark_type, type_errors


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _duck(con, sql):
    return con.sql(sql)


def test_uncast_window_sum_is_flagged(spark, con):
    # the events_changepoint shape: a window sum exposed raw is HUGEINT
    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS n_before")
    rel = _duck(
        con,
        "SELECT sum(x) OVER () AS n_before FROM (VALUES (1), (2)) t(x) "
        "LIMIT 1",
    )
    errs = type_errors(sdf, rel)
    assert errs and "n_before" in errs[0] and "i128" in errs[0]


def test_uncast_scalar_sum_is_flagged(spark, con):
    # the sql_script_median_search shape: correlated sum() exposed raw
    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS covered_rows")
    rel = _duck(con, "SELECT sum(x) AS covered_rows FROM (VALUES (1)) t(x)")
    assert type_errors(sdf, rel)


def test_decimal_vs_double_is_flagged(spark, con):
    sdf = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS v")
    rel = _duck(con, "SELECT CAST(1.5 AS DECIMAL(10, 2)) AS v")
    assert type_errors(sdf, rel)


def test_int32_vs_bigint_is_driver_proven_equivalent(spark, con):
    # i32↔i64 hashes identically in the driver (rel_revenue_grouping_sets
    # r05, text_heaps_curve r08) — only the 64↔128 HUGEINT step diverges
    sdf = spark.sql("SELECT CAST(1 AS INT) AS v")
    rel = _duck(con, "SELECT CAST(1 AS BIGINT) AS v")
    assert type_errors(sdf, rel) == []


def test_collated_string_is_equivalent(spark, con):
    # collation is comparison metadata, not a value representation
    # (sql_collated_priority r09)
    sdf = spark.sql("SELECT 'x' COLLATE UTF8_LCASE AS v")
    rel = _duck(con, "SELECT 'x' AS v")
    assert type_errors(sdf, rel) == []


def test_column_set_mismatch_is_flagged(spark, con):
    # --typecheck has no downstream schema compare, so a misnamed /
    # dropped / extra oracle column must fail HERE (r11 self-review)
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS change_day_epoch")
    rel = _duck(con, "SELECT CAST(1 AS BIGINT) AS change_day")
    errs = type_errors(sdf, rel)
    assert errs and "column set mismatch" in errs[0]
    rel2 = _duck(
        con,
        "SELECT CAST(1 AS BIGINT) AS change_day_epoch, 2 AS extra",
    )
    assert any("extra" in e for e in type_errors(sdf, rel2))


def test_matching_types_pass(spark, con):
    sdf = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b, "
        "'x' AS c, CAST(1 AS INT) AS d, true AS e, "
        "CAST(1.5 AS DECIMAL(38, 0)) AS f, array(1, 2) AS g"
    )
    rel = _duck(
        con,
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b, "
        "'x' AS c, CAST(1 AS INTEGER) AS d, true AS e, "
        "CAST(1.5 AS DECIMAL(38, 0)) AS f, [1, 2] AS g",
    )
    assert type_errors(sdf, rel) == []


def test_canonical_tokens():
    assert _canon_spark_type("bigint") == _canon_duck_type("BIGINT") == "i64"
    assert _canon_duck_type("HUGEINT") == "i128"
    assert (
        _canon_spark_type("array<double>")
        == _canon_duck_type("DOUBLE[]")
        == "list<f64>"
    )
    assert (
        _canon_spark_type("decimal(38,0)")
        == _canon_duck_type("DECIMAL(38,0)")
        == "dec(38,0)"
    )


def test_fixed_r10_oracles_are_now_cast(spark, con):
    """The two r10 hash-fails: their oracles must now declare BIGINT on
    every integer output column (the fix this round) — checked against
    the real oracle strings, bind-only, no execution."""
    import __spark_entry__ as entrymod
    from tools.parity import duck_connection

    from conftest import SF_DIR

    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    tcon = duck_connection(SF_DIR)
    try:
        for name in ("events_changepoint", "sql_script_median_search"):
            df = queries[name](spark, SF_DIR)
            rel = tcon.sql(oracles[name])
            assert type_errors(df, rel) == [], name
    finally:
        tcon.close()
