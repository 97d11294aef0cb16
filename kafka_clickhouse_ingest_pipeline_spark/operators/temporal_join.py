"""Temporal join operators: as-of join and binned range (interval) join.

The reference has no temporal joins (its only join is the auth point
lookup, `publisher/internal/auth/auth.go:33-59`); these are the standard
time-series operators a 100 TB analytics engine needs and are built here
as compositions of shuffle-lean DataFrame primitives:

- **as-of join** (`asof_join`): for each probe row, the most recent build
  row with ``build_ts <= probe_ts`` for the same key. Implemented with the
  union-sentinel trick: union both sides on (key, ts), sort within key,
  carry the last-seen build payload forward with ``last(..., ignorenulls)``
  over a running ROWS frame, keep probe rows. ONE shuffle (the window
  partitionBy), no join node at all — vs. the naive inequality join which
  is O(probe × build) per key. At 1000 executors the shuffle is keyed on
  the join key, so it scales exactly like a groupBy on that key; skewed
  keys can be salted upstream the same way (operators/skew.py).

- **binned range join** (`range_join_binned`): probe timestamps against
  build intervals ``[start, start + width)`` with NO equi-key. Equi-joins
  on the time bin (bin width = interval width, so every interval covers at
  most 2 bins → build side exploded ≤ 2×), then applies the exact range
  predicate. Turns a cartesian/inequality join into a hash join whose
  fan-out is the true match density — the classic interval-join strategy
  (cf. Spark's own stream-stream join time-bucketing). Bin ids are epoch
  days, so partition pruning applies if either side is date-partitioned.

Tie discipline (for oracle determinism): among build rows sharing the
maximal ``build_ts``, the one with the greatest ``tiebreak_col`` wins —
both engines order on (ts, tiebreak) explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Left as-of join: latest build row at-or-before each probe row's ts.

    Returns the probe rows with a ``matched`` struct column holding the
    build payload (null when no build row precedes the probe). Both inputs
    must share the key column name ``key``.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    b = build.select(
        F.col(key),
        F.col(build_ts).alias("_t"),
        F.lit(0).alias("_is_probe"),
        F.col(tiebreak_col).alias("_tie"),
        payload.alias("_payload"),
    )
    probe_cols = [c for c in probe.columns]
    p = probe.select(
        *probe_cols,
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(b.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
    )
    # Build rows sort before probe rows at the same instant (<= semantics);
    # equal-ts build rows resolve by the tiebreak column, ascending, so the
    # running last() lands on the greatest tiebreak value.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_is_probe"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = b.unionByName(p, allowMissingColumns=True).withColumn(
        "matched", F.last("_payload", ignorenulls=True).over(w)
    )
    return matched.where(F.col("_is_probe") == 1).select(*probe_cols, "matched")


def range_join_binned(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    interval_start: str,
    width_days: int,
    broadcast_probe: bool = False,
) -> DataFrame:
    """Inner range join: probe rows whose ts lies in any build interval
    ``[interval_start, interval_start + width_days)``. No equi-key.

    Bin width equals the interval width, so each interval spans at most
    two bins; the build side is exploded into its covered bins and the
    join runs as a plain equi-join on the bin id plus the exact predicate.
    Returns probe ⨝ build columns (both sides' columns, probe ts retained).

    ``broadcast_probe``: set True ONLY when the caller KNOWS the probe
    side is bounded — the contract is a side that stays well under the
    default 10 MB auto-broadcast threshold at ANY data size, i.e. rows
    bounded by a calendar/era/config constant (≤ ~100k narrow rows),
    never by table cardinality. A caller passing an events-scaled probe
    gets a driver-fatal broadcast at scale with no diagnostic (the flag
    is the caller's assertion of boundedness; there is no runtime
    count() guard because the check itself would cost a pass). Catalyst
    sees only size estimates and will otherwise happily broadcast the
    interval side, which scales with the build table (measured on
    range_join_order_windows: the 2400-row per-day probe streamed while
    orders × bins was collected and shipped).
    """
    day = 86400
    pbin = (F.unix_timestamp(F.col(probe_ts)) / F.lit(day * width_days)).cast("long")
    b = build.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(interval_start)) / F.lit(day * width_days))
                .cast("long"),
                (
                    (
                        F.unix_timestamp(F.col(interval_start))
                        + F.lit(day * width_days - 1)
                    )
                    / F.lit(day * width_days)
                ).cast("long"),
            )
        ),
    )
    p = probe.withColumn("_bin", pbin)
    if broadcast_probe:
        p = F.broadcast(p)
    joined = p.join(b, "_bin").where(
        (F.col(probe_ts) >= F.col(interval_start))
        & (
            F.col(probe_ts)
            < F.col(interval_start) + F.expr(f"INTERVAL {width_days} DAY")
        )
    )
    return joined.drop("_bin")


def probe_timestamp(event_id: Column) -> Column:
    """Deterministic probe timestamp inside the orders era (1995–2001).

    The synthetic `events.ts` values all live in 2024-01 while `orders`
    spans 1995–2001, which would make any events↔orders temporal join
    degenerate (every event after every order). Deriving the probe instant
    from the event id — day ``event_id mod 2400`` after 1995-01-01 —
    spreads probes uniformly across the orders era and is integer-exact on
    both engines. Midnight-aligned, so probes collide with order dates and
    exercise the <=-inclusive tie path.
    """
    return F.date_add(
        F.to_date(F.lit("1995-01-01")), (event_id % 2400).cast("int")
    ).cast("timestamp")


# DuckDB-side equivalent for oracle SQL strings.
ORACLE_PROBE_TS = (
    "CAST(DATE '1995-01-01' + INTERVAL (({col}) % 2400) DAY AS TIMESTAMP)"
)
