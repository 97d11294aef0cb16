"""Engine-portable hashing expressions.

Spark's xxhash64/hash and DuckDB's hash() are different functions, so any
dedup operator whose output must be oracle-checkable builds on MD5 — the one
hash both engines implement identically. A 15-hex-digit prefix (60 bits)
fits a signed int64 in both.

The MinHash family h_i(x) = (a_i * x + b_i) mod P uses P = 1e9+7 so that
a*x stays under 2^63 (DuckDB errors on BIGINT overflow; Spark would wrap
silently and diverge).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
N_MINHASH = 16
LSH_BANDS = 4
LSH_ROWS = N_MINHASH // LSH_BANDS

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, P) for _ in range(N_MINHASH)]
MINHASH_B = [_rng.randrange(0, P) for _ in range(N_MINHASH)]

# 60-bit simhash built from the same portable hash
SIMHASH_BITS = 60


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_expr(h_mod_p: Column, i: int) -> Column:
    """i-th permutation hash (input already reduced mod P)."""
    return (F.lit(MINHASH_A[i]) * h_mod_p + F.lit(MINHASH_B[i])) % F.lit(P)


def minhash_sql(h_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {h_expr} + {MINHASH_B[i]}) % {P})"


# --- Bloom / Count-Min sketch hashing (Kirsch-Mitzenmacher double hashing) --
#
# Both sketches need k independent hash functions per key. One md5 yields two
# independent 60-bit windows (hex chars 1-15 and 16-30); position j is
# (h1 + j*h2) mod m — k positions from one hash evaluation, identical
# arithmetic in both engines (h1 + j*h2 <= (j+1)*2^60 stays under 2^63 for
# j <= 6). Words are 32-bit (mask = 1 << (pos & 31), max 2^31) so no shift
# ever touches the BIGINT sign bit in either engine.

BLOOM_BITS = 65_536  # m: 2^16 bits = 2048 x 32-bit words (8 KiB broadcast)
BLOOM_K = 5


def hash60b(col: Column) -> Column:
    """Second independent 60-bit window of the same md5 (chars 16..30)."""
    return F.conv(F.substring(F.md5(col), 16, 15), 16, 10).cast("long")


def hash60b_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT)"


def double_hash_pos(col: Column, j: int, m: int) -> Column:
    """j-th double-hash position of a string key, in [0, m).

    PERF NOTE (round 12): this inlines TWO md5 evaluations per call, so
    building k positions inline costs 2k md5s per row. Whole-stage
    codegen CSE collapses duplicates inside a single Project, but NOT
    inside a Generate (explode): CollapseProject inlines single-use
    aliases into the generator and the md5s are re-duplicated (measured
    3.9x slower on a 2M-row explode). Hot paths that explode k positions
    must pre-project the two windows ONCE via ``md5_window1/2(F.md5(c))``
    in their own select (multi-referenced aliases are protected from
    inlining by the SPARK-36718 cheap-expression guard) and then build
    positions with :func:`double_hash_pos_from`. Values are identical by
    construction: ``hash60(c) == md5_window1(F.md5(c))``.
    """
    return (hash60(col) + F.lit(j) * hash60b(col)) % F.lit(m)


def md5_window1(md5_hex: Column) -> Column:
    """First 60-bit window of an already-computed md5 hex column
    (== :func:`hash60` of the original key)."""
    return F.conv(F.substring(md5_hex, 1, 15), 16, 10).cast("long")


def md5_window2(md5_hex: Column) -> Column:
    """Second 60-bit window of an already-computed md5 hex column
    (== :func:`hash60b` of the original key)."""
    return F.conv(F.substring(md5_hex, 16, 15), 16, 10).cast("long")


def double_hash_pos_from(h1: Column, h2: Column, j: int, m: int) -> Column:
    """j-th double-hash position from pre-projected hash windows —
    value-identical to :func:`double_hash_pos` on the original key."""
    return (h1 + F.lit(j) * h2) % F.lit(m)


def double_hash_pos_sql(expr: str, j: int, m: int) -> str:
    return f"(({hash60_sql(expr)} + {j} * {hash60b_sql(expr)}) % {m})"


# --- HyperLogLog primitives (shared by the batch query and streaming) ------

HLL_M = 256
HLL_H52 = 4_503_599_627_370_496  # 2^52


def hll_register(key: Column) -> Column:
    """Register index in [0, HLL_M) from the second md5 window."""
    return hash60b(key) % F.lit(HLL_M)


def hll_rank(key: Column) -> Column:
    """Rank = leading-zero count + 1 of the 52-bit first-window hash,
    via integer bin-length — engine-portable (no float log2)."""
    h52 = hash60(key) % F.lit(HLL_H52)
    return F.when(h52 > 0, F.lit(53) - F.length(F.bin(h52))).otherwise(53)
