"""Engine-portable deterministic hashing.

The dedup/similarity extension operators need a numeric hash that the
DuckDB oracle can recompute exactly.  Spark's native hash functions
(murmur3 `hash`, `xxhash64`) are not portable, so we derive a uniform
32-bit integer from the first 8 hex chars of ``md5`` — both engines
produce identical lowercase-hex md5.

Spark side converts hex→long with the built-in ``conv`` (JVM,
codegen'd); DuckDB lacks ``conv`` so the SQL builder emits positional
nibble arithmetic.  Values are identical in [0, 2^32).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1, modulus for minhash permutations


def md5_fingerprint(col: Column) -> Column:
    """Full 128-bit content fingerprint as lowercase hex (document
    fingerprinting; also the exact-dedup key)."""
    return F.md5(col)


def hex32(col: Column) -> Column:
    """Uniform 32-bit integer hash of a string column (as LongType)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hex32_sql(expr: str) -> str:
    """DuckDB SQL computing the same 32-bit integer as :func:`hex32`."""
    terms = []
    for i in range(8):
        mult = 16 ** (7 - i)
        terms.append(
            f"(instr('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f"::BIGINT * {mult}"
        )
    return "(" + " + ".join(terms) + ")"


def minhash(col_hash: Column, k: int) -> Column:
    """k-th universal-hash permutation of a 32-bit hash:
    ``(a_k * h + b_k) mod (2^31-1)`` with fixed odd multipliers.
    Matches :func:`minhash_sql`."""
    a = 2 * k + 1
    b = 7919 * k + 1
    return (col_hash * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def minhash_sql(expr: str, k: int) -> str:
    a = 2 * k + 1
    b = 7919 * k + 1
    return f"(({expr}) * {a} + {b}) % {MERSENNE31}"
