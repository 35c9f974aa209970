"""The events ``ts`` column has shipped in two physical parquet types
across driver rounds: TIMESTAMP(NANOS) (readable only as long via
``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS) (a
real Spark timestamp).  ``epoch_sec_col`` / ``epoch_us_col`` must
yield the SAME exact integers for the same instant from either
physical layout — otherwise every window/session/as-of boundary
silently shifts when the dataset is regenerated.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    epoch_sec_col,
    epoch_us_col,
)

# instants straddling second boundaries (µs precision)
_INSTANTS_US = [
    1704067207179575,  # 2024-01-01 00:00:07.179575
    1704067432824425,
    1704070800000000,  # exact hour edge
    1704070799999999,  # 1 µs before the hour edge
]


def _write(tmpdir, unit: str) -> str:
    ts = pa.array(_INSTANTS_US, type=pa.int64()).cast(
        pa.timestamp("us")
    ).cast(pa.timestamp(unit))
    table = pa.table({"event_id": list(range(len(_INSTANTS_US))), "ts": ts})
    path = f"{tmpdir}/events_{unit}.parquet"
    pq.write_table(table, path, store_schema=False)
    return path


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_epoch_cols_same_integers_both_physical_types(spark, tmp_path, unit):
    path = _write(tmp_path, unit)
    df = spark.read.parquet(path)
    got = {
        r["event_id"]: (r["sec"], r["us"])
        for r in df.select(
            "event_id",
            epoch_sec_col(df).alias("sec"),
            epoch_us_col(df).alias("us"),
        ).collect()
    }
    for i, us in enumerate(_INSTANTS_US):
        assert got[i] == (us // 1_000_000, us)


def test_epoch_sec_matches_python_utc(spark, tmp_path):
    """The NTZ column is interpreted as UTC (session tz pinned in
    session.py) — the same convention DuckDB's epoch_ns applies."""
    path = _write(tmp_path, "us")
    df = spark.read.parquet(path)
    row = df.select(epoch_sec_col(df).alias("sec")).orderBy("sec").first()
    expect = int(
        datetime.datetime(
            2024, 1, 1, 0, 0, 7, tzinfo=datetime.timezone.utc
        ).timestamp()
    )
    assert row["sec"] == expect


def test_journey_sample_orders_by_time_then_id(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
        JOURNEY_MOD,
        load_events,
        q_events_journey_sample,
    )

    from pyspark.sql import functions as F

    rows = {r["user_id"]: r for r in q_events_journey_sample(spark, SF_DIR).collect()}
    assert rows and all(u % JOURNEY_MOD == 0 for u in rows)
    ev = (
        load_events(spark, SF_DIR)
        .filter(F.col("user_id") % JOURNEY_MOD == 0)
        .select("user_id", "event_id", "event_type", "epoch_sec")
        .collect()
    )
    import collections

    by_user = collections.defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(
            (e["epoch_sec"], e["event_id"], e["event_type"])
        )
    assert set(by_user) == set(rows)
    for u, evs in by_user.items():
        evs.sort()
        # journey is now the '>'-joined string (scalar columns only —
        # the driver canonicalizer can't hash list cells)
        assert rows[u]["journey"] == ">".join(t for _, _, t in evs)
        assert rows[u]["n_events"] == len(evs)
        assert rows[u]["span_sec"] == evs[-1][0] - evs[0][0]
