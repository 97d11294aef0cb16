"""Skew-mitigation operators: salted two-stage aggregation and bucketed
co-located joins (SURVEY.md §4 / the 100 TB checklist).

AQE's skew-join splitting handles joins automatically; *aggregation* skew
on pathological keys (one token = 10% of the corpus) still funnels every
pre-aggregated partial for that key to one reducer. Salting splits each
hot key across `n_salts` reducers and re-combines — exact for any
decomposable aggregate (sum/count/min/max), two shuffles of strictly
smaller data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _row_salt(
    df: DataFrame,
    n_salts: int,
    salt_on: list[str] | None,
    hot_keys: list[str] | None = None,
) -> Column:
    """Deterministic per-row salt: pmod(xxhash64(cols), n_salts).

    Derived from row CONTENT, never monotonically_increasing_id():
    content hashes are stable across stage retries / recomputations /
    separate evaluations of the same DataFrame, so salt assignment is
    reproducible and the plan stays deterministic. Rows identical on
    the salt columns share a cell — pass `salt_on` naming a stable
    row identifier (a key column, or (doc_id, pos) for exploded
    tokens) when the projection alone doesn't distinguish rows.

    ``hot_keys`` names the grouping/join keys the salt exists to spread
    BEYOND. If the resolved salt columns are a subset of those keys,
    every row of a hot key hashes to the same salt cell and the
    operator silently degenerates to the unsalted plan — raise instead
    of letting the skew it exists to remove reappear unobserved
    (round-7 ADVICE).
    """
    cols = salt_on if salt_on else df.columns
    if hot_keys is not None and set(cols) <= set(hot_keys):
        raise ValueError(
            "salt columns "
            f"{cols!r} are a subset of the grouping/join keys "
            f"{hot_keys!r}: every row of a hot key would land in one "
            "salt cell and the salting would be a no-op. Pass salt_on "
            "naming at least one column that varies within a key "
            "(a row id, or (doc_id, pos) for exploded tokens)."
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str | None = None,
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation: count(*) (+ sum(value_col)) per key.

    Stage 1 groups by (keys, salt) — a hot key's rows spread over
    `n_salts` reducers; stage 2 re-combines the ≤ n_salts partials per
    key. Exact: sum and count are associative-commutative monoids.
    `salt_on` picks the columns the deterministic salt hashes (see
    :func:`_row_salt`); they need not survive into the output.
    """
    salt = _row_salt(df, n_salts, salt_on, hot_keys=keys).alias("_salt")
    aggs1 = [F.count(F.lit(1)).alias("_cnt")]
    aggs2 = [F.sum("_cnt").alias("cnt")]
    if value_col is not None:
        aggs1.append(F.sum(value_col).alias("_sum"))
        aggs2.append(F.sum("_sum").alias(f"sum_{value_col}"))
    partial = df.select(*keys, salt, *( [value_col] if value_col else [] )).groupBy(
        *keys, "_salt"
    ).agg(*aggs1)
    return partial.groupBy(*keys).agg(*aggs2)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by join key.

    Two tables bucketed identically on their join key join with ZERO
    exchanges — the co-location is established once at write time and
    amortized over every subsequent join. This is the Spark analog of
    co-partitioned MergeTree shards, and the standard answer to
    "fact-to-fact join at 100 TB".

    Thin wrapper over :func:`plans.layout.write_bucketed` (the single
    implementation: one file per bucket, per-process external path so
    concurrent processes never race on bucket files).
    """
    from ..plans.layout import write_bucketed as _write

    _write(
        df,
        table,
        n_buckets,
        tuple(bucket_cols),
        sort_cols=tuple(sort_cols) if sort_cols else None,
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables; with matching bucketing the plan shows
    no Exchange on either side (asserted in tests/test_skew.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    force: str | None = "merge",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Explicit skew-join mitigation: salt the hot side, replicate the
    other.

    AQE's skew split (asserted live in tests/test_skew.py) is the
    no-code-change path, but it only acts AFTER a skewed shuffle
    partition has been written; explicit salting prevents the hot
    partition from ever existing — the right choice when the hot keys
    are known (a planted boilerplate user, a null-key default) or the
    join sits under an operator AQE can't rewrite. Each left row gets a
    deterministic content-derived salt (see :func:`_row_salt` —
    stable across retries, unlike monotonically_increasing_id);
    `salt_on` names the columns to hash when the row needs a stable
    identifier beyond the join key. The right side is
    replicated n_salts× via one explode, so the join key becomes
    (key, salt) and a key that filled one reducer now fills n_salts.
    Exact for inner joins: every (l, r) match survives under exactly
    one salt. Cost: right side shuffles n_salts× its size — use where
    right is the small-but-not-broadcastable side.

    ``force="merge"`` hints SMJ so the demonstration cannot silently
    degrade to a broadcast (where salting would be a no-op); pass None
    to let the planner choose.
    """
    salt = _row_salt(left, n_salts, salt_on, hot_keys=[on])
    l = left.withColumn("_salt", salt.cast("int"))
    salts = F.array([F.lit(i) for i in range(n_salts)])
    r = right.withColumn("_salt", F.explode(salts))
    if force:
        r = r.hint(force)
    return l.join(r, [on, "_salt"]).drop("_salt")
