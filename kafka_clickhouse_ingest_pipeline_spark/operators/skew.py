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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: count(*) (+ sum(value_col)) per key.

    Stage 1 groups by (keys, salt) — a hot key's rows spread over
    `n_salts` reducers; stage 2 re-combines the ≤ n_salts partials per
    key. Exact: sum and count are associative-commutative monoids.
    """
    # per-row salt (monotonic id is unique per row, so consecutive rows of
    # a hot key land in different salt cells even inside one input
    # partition; spark_partition_id would collapse to one cell per task)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")
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
) -> DataFrame:
    """Explicit skew-join mitigation: salt the hot side, replicate the
    other.

    AQE's skew split (asserted live in tests/test_skew.py) is the
    no-code-change path, but it only acts AFTER a skewed shuffle
    partition has been written; explicit salting prevents the hot
    partition from ever existing — the right choice when the hot keys
    are known (a planted boilerplate user, a null-key default) or the
    join sits under an operator AQE can't rewrite. Each left row gets a
    per-row salt (monotonic id mod n_salts — consecutive rows of a hot
    key spread even within one input partition); the right side is
    replicated n_salts× via one explode, so the join key becomes
    (key, salt) and a key that filled one reducer now fills n_salts.
    Exact for inner joins: every (l, r) match survives under exactly
    one salt. Cost: right side shuffles n_salts× its size — use where
    right is the small-but-not-broadcastable side.

    ``force="merge"`` hints SMJ so the demonstration cannot silently
    degrade to a broadcast (where salting would be a no-op); pass None
    to let the planner choose.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    l = left.withColumn("_salt", salt.cast("int"))
    salts = F.array([F.lit(i) for i in range(n_salts)])
    r = right.withColumn("_salt", F.explode(salts))
    if force:
        r = r.hint(force)
    return l.join(r, [on, "_salt"]).drop("_salt")
