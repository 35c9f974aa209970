"""Skew-mitigation helpers — the 100 TB posture for hot keys.

Plain ``groupBy().count()/sum()`` is already skew-safe in Spark
(partial aggregation combines map-side before the shuffle), and AQE
splits skewed JOIN partitions at runtime (enabled in session.py).
The remaining gap is **count(DISTINCT x) on skewed group keys**: the
distinct set of a hot key must normally be co-located in one task.

:func:`salted_count_distinct` shards each group's distinct set by
``hash(value) % buckets``: every distinct value lands in exactly one
(key, salt) bucket, so per-bucket distinct counts SUM exactly — a
two-shuffle plan whose biggest task is ~1/buckets of the hot key's
set.  Exact, deterministic, no sampling.

Use ``approx_count_distinct`` instead when ±2% error is acceptable —
it is one pass and mergeable (HLL sketches combine map-side), which
is cheaper than either exact plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact countDistinct(value) per key, skew-sharded.

    Stage 1 dedups (key, salt, value) — the shuffle is spread over
    ``buckets`` partitions per key; stage 2 counts per (key, salt)
    and sums the disjoint bucket counts per key."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("_salt")
    per_bucket = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_bucket_distinct"))
    )
    return per_bucket.groupBy(*key_cols).agg(
        F.sum("_bucket_distinct").cast("long").alias(out_col)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    spread_duplicates: bool = False,
) -> DataFrame:
    """Skew-sharded equi-join: use when one join key in ``left`` is hot
    enough that its single shuffle partition dominates the stage and
    the ``right`` side is too big to broadcast.

    Each left row gets a salt in [0, n_salts); the right side is
    replicated ``n_salts`` times via an exploded sequence.  Joining on
    (keys..., salt) spreads the hot key over ``n_salts`` tasks at the
    cost of an n_salts× right-side shuffle — the classic trade, so
    keep ``right`` the smaller input.  Valid for ``inner`` and
    ``left`` joins (each left row carries exactly one salt, so it
    meets every right row of its key exactly once); NOT for right or
    full outer (right rows are replicated).

    Salt derivation (ADVICE r3): the default hashes the whole left row
    — deterministic under retries (safe to feed a shuffle), but
    EXACT-DUPLICATE left rows share a salt, so a hot key made of
    identical rows stays in one task.  For that duplicate-heavy shape
    pass ``spread_duplicates=True``: the salt mixes in
    ``monotonically_increasing_id()``, which spreads copies evenly at
    the cost of nondeterministic row→salt placement — join RESULTS are
    unchanged (every left row still meets its key's right rows exactly
    once under any salt), but a partial map-stage retry may redistribute
    rows across salt partitions, re-running more reduce tasks than a
    deterministic salt would.

    AQE skew-join splitting (on in session.py) handles moderate skew
    without this; salting is for the pathological key AQE can't split
    because a single key-group can't be divided.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salt = F.xxhash64(*[F.col(c) for c in left.columns])
    if spread_duplicates:
        salt = salt + F.monotonically_increasing_id()
    l_salted = left.withColumn("_salt", F.pmod(salt, F.lit(n_salts)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")
