"""Z-order data layout — multi-column clustering for scan pruning
(engine extension; the lakehouse OPTIMIZE ZORDER BY feature rebuilt
Spark-first).

A single-column sort gives parquet tight min/max zone maps on that
column only; a predicate on the OTHER column prunes nothing.  Z-order
interleaves the bits of both keys so that consecutive z-values are
close in BOTH dimensions — every shard's bounding box is small on
both axes, and a box predicate overlaps only the shards near it.

Everything here is a closed form, so the layout is oracle-checkable:
keys normalize to Z_BITS-bit grid cells via broadcast min/max bounds
(identical operation order both engines), the z-value interleaves
bits with plain shift/mask arithmetic, and shard assignment is
value-based (z DIV cell width) rather than rank-based, so no global
sort participates.  At 100 TB the same column feeds
``repartitionByRange(zvalue).sortWithinPartitions`` before the
parquet write; the min/max tightness this query REPORTS is exactly
what the parquet footer stats would hold — the pruning win is
asserted as a measured shard-overlap ratio in tests, z-layout vs
hash layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windowed import load_events

Z_BITS = 10                  # grid resolution per axis (1024 cells)
N_SHARDS = 64                # value-banded z shards
Z_CELLS = 1 << (2 * Z_BITS)  # total z-space size
SHARD_W = Z_CELLS // N_SHARDS


def _grid(v: Column, lo: Column, hi: Column) -> Column:
    """Closed-form normalization to [0, 2^Z_BITS): floor(n·(v−lo)/
    (hi−lo+1)) — integer inputs, same order both engines."""
    return F.floor(
        F.lit(1 << Z_BITS) * (v - lo) / (hi - lo + 1)
    ).cast("long")


def _interleave(x: Column, y: Column) -> Column:
    """z = bit-interleave(x, y), x in odd positions."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i)
        )
    return z


def zorder_stats(ev: DataFrame) -> DataFrame:
    """events → per-shard bounding-box stats of the z-ordered layout
    over (user_id, epoch_sec)."""
    bounds = ev.agg(
        F.min("user_id").alias("xlo"),
        F.max("user_id").alias("xhi"),
        F.min("epoch_sec").alias("ylo"),
        F.max("epoch_sec").alias("yhi"),
    )
    g = ev.crossJoin(F.broadcast(bounds)).select(
        _grid(F.col("user_id"), F.col("xlo"), F.col("xhi")).alias("gx"),
        _grid(F.col("epoch_sec"), F.col("ylo"), F.col("yhi")).alias("gy"),
    )
    z = g.select("gx", "gy", _interleave(F.col("gx"), F.col("gy")).alias("z"))
    return (
        z.groupBy((F.col("z") / SHARD_W).cast("int").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("gx").alias("min_gx"),
            F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"),
            F.max("gy").alias("max_gy"),
        )
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zorder_stats(load_events(spark, sf_dir))


_GRID_SQL_X = (
    f"CAST(floor({1 << Z_BITS} * (user_id - b.xlo) / (b.xhi - b.xlo + 1)) "
    "AS BIGINT)"
)
_GRID_SQL_Y = (
    f"CAST(floor({1 << Z_BITS} * (s - b.ylo) / (b.yhi - b.ylo + 1)) "
    "AS BIGINT)"
)
_Z_SQL = " + ".join(
    f"(((gx >> {i}) & 1) * {1 << (2 * i + 1)}) + "
    f"(((gy >> {i}) & 1) * {1 << (2 * i)})"
    for i in range(Z_BITS)
)

ORACLES: dict[str, str] = {
    "pipe_zorder_layout": (
        "WITH e AS (SELECT user_id, "
        "CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s FROM events), "
        "b AS (SELECT min(user_id) AS xlo, max(user_id) AS xhi, "
        "min(s) AS ylo, max(s) AS yhi FROM e), "
        f"g AS (SELECT {_GRID_SQL_X} AS gx, {_GRID_SQL_Y} AS gy "
        "FROM e CROSS JOIN b), "
        f"z AS (SELECT gx, gy, {_Z_SQL} AS z FROM g) "
        f"SELECT CAST(z // {SHARD_W} AS INTEGER) AS shard, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "min(gx) AS min_gx, max(gx) AS max_gx, "
        "min(gy) AS min_gy, max(gy) AS max_gy "
        "FROM z GROUP BY 1"
    ),
}

QUERIES = {
    "pipe_zorder_layout": q_zorder_layout,
}
