"""Z-order layout semantics (operators/layout.py): interleave
correctness and the measured pruning win over a hash layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.layout import (
    N_SHARDS,
    _interleave,
    zorder_stats,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.windowed import (
    load_events,
)


def test_interleave_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023)], "x LONG, y LONG"
    )
    out = [
        r["z"]
        for r in df.select(
            _interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    # morton codes: z(1,0)=2 (x odd positions), z(0,1)=1,
    # z(3,5)= x bits {0,1}→{1,3}, y bits {0,2}→{0,4}: 2+8+1+16=27
    assert out == [0, 2, 1, 27, (1 << 20) - 1]


def test_zorder_prunes_more_shards_than_hash_layout(spark):
    """A box predicate covering ~1/16 of the key space must overlap
    only a minority of z-ordered shard bounding boxes; under a hash
    layout virtually every shard's box spans the whole space."""
    ev = load_events(spark, "/root/testdata/sf0.01")
    z = zorder_stats(ev).collect()
    assert len(z) == N_SHARDS

    # box: first quarter of both axes (1/16 of the grid area)
    x0, x1, y0, y1 = 0, 255, 0, 255
    z_overlap = [
        r
        for r in z
        if r["min_gx"] <= x1
        and r["max_gx"] >= x0
        and r["min_gy"] <= y1
        and r["max_gy"] >= y0
    ]
    z_frac = len(z_overlap) / len(z)

    # hash layout: same stats grouped by a key-hash shard
    bounds = ev.agg(
        F.min("user_id").alias("xlo"),
        F.max("user_id").alias("xhi"),
        F.min("epoch_sec").alias("ylo"),
        F.max("epoch_sec").alias("yhi"),
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.layout import (
        _grid,
    )

    h = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.pmod(F.xxhash64("event_id"), N_SHARDS).alias("shard"),
            _grid(F.col("user_id"), F.col("xlo"), F.col("xhi")).alias("gx"),
            _grid(F.col("epoch_sec"), F.col("ylo"), F.col("yhi")).alias("gy"),
        )
        .groupBy("shard")
        .agg(
            F.min("gx").alias("min_gx"),
            F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"),
            F.max("gy").alias("max_gy"),
        )
        .collect()
    )
    h_overlap = [
        r
        for r in h
        if r["min_gx"] <= x1
        and r["max_gx"] >= x0
        and r["min_gy"] <= y1
        and r["max_gy"] >= y0
    ]
    h_frac = len(h_overlap) / len(h)

    # the whole point: z-layout reads a small fraction, hash reads ~all
    assert z_frac <= 0.35
    assert h_frac >= 0.9
    assert z_frac < h_frac / 2
