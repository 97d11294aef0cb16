"""Deterministic sampling operators for training-data curation.

Random sampling (`df.sample`, `TABLESAMPLE`) is seed- and partition-
dependent — reruns and engines disagree, which breaks both oracle checks
and reproducible dataset releases. A 100 TB curation pipeline wants
*hash-based* sampling instead: membership is a pure function of the row
key, so the sample is stable under reruns, repartitioning, engine changes,
and incremental appends (a row's fate never changes when its neighbors
do). Built on the md5-derived 60-bit hash (functions/hashing.py) that both
engines compute identically.

- `bernoulli_sample`: keep rows whose salted hash bucket (of 10000) falls
  below the rate. Pure filter — pushes into the scan, no shuffle at all.
- `stratified_fixed_n`: exactly n rows per stratum, chosen by hash order —
  one shuffle on the stratum key, per-stratum top-n via row_number (heap-
  friendly; no global sort). The salt gives independent redraws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql

BUCKETS = 10_000


def sample_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000) from a salted key hash."""
    return hash60(F.concat(F.lit(salt), key.cast("string"))) % F.lit(BUCKETS)


def sample_bucket_sql(key_expr: str, salt: str) -> str:
    h = hash60_sql(f"'{salt}' || CAST({key_expr} AS VARCHAR)")
    return f"({h} % {BUCKETS})"


def bernoulli_sample(
    df: DataFrame, key_col: str, rate_bp: int, salt: str = "s0"
) -> DataFrame:
    """Keep ~rate_bp/10000 of rows, decided per-row by key hash."""
    return df.where(sample_bucket(F.col(key_col), salt) < F.lit(rate_bp))


def stratified_fixed_n(
    df: DataFrame,
    stratum_col: str,
    n: int,
    key_col: str,
    salt: str = "s0",
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, in hash order.

    Hash order makes the quota a uniform draw; (bucket-ish hash, key)
    ordering is total so the result is unique. Adds `sample_rank`.
    """
    h = hash60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    boundaries_bp: dict[str, int],
    salt: str = "split",
) -> DataFrame:
    """Assign each row to a named dataset split by key hash.

    ``boundaries_bp`` maps split name -> exclusive upper bucket bound (of
    10000), in ascending order — e.g. ``{"train": 8000, "valid": 9000,
    "test": 10000}`` for an 80/10/10 split. Membership is a pure function
    of (salt, key): stable under reruns, repartitioning, and appends, and
    rows never migrate between splits when the corpus grows — the property
    a reproducible training-data release needs. Adds a ``split`` column;
    no shuffle (pure projection).
    """
    bucket = sample_bucket(F.col(key_col), salt)
    expr = None
    # CASE arms must go lowest-bound-first or an early wide arm swallows
    # every row — sort by bound so dict insertion order can't matter.
    for name, upper in sorted(boundaries_bp.items(), key=lambda kv: kv[1]):
        cond = bucket < F.lit(upper)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def hash_split_sql(key_expr: str, boundaries_bp: dict[str, int], salt: str = "split") -> str:
    """DuckDB CASE expression twin of :func:`hash_split`."""
    b = sample_bucket_sql(key_expr, salt)
    arms = " ".join(
        f"WHEN {b} < {upper} THEN '{name}'"
        for name, upper in sorted(boundaries_bp.items(), key=lambda kv: kv[1])
    )
    return f"CASE {arms} END"
