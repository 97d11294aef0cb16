"""Streaming temporal joins: the enrich-in-flight shape at scale.

The reference enriches in flight by point lookup (API-key auth,
publisher/internal/auth/auth.go:33-59) because its streams are
unbounded queues with no event-time discipline. The scale analog —
join a probe stream to a build stream on a key AND a time-range
condition — is Structured Streaming's watermarked stream-stream join:

- both sides declare watermarks, so the join state is BOUNDED: a build
  row can be dropped from state once the probe watermark passes
  ``build_ts + lookback`` (Spark derives the state TTL from the range
  condition — this is what makes the operator runnable forever on a
  1000-executor cluster);
- the equi-key shuffles both streams to the same tasks, exactly like a
  batch hash join on the key, so skew/salting reasoning carries over;
- the time-range predicate makes each probe row match only build rows
  in ``[probe_ts - lookback, probe_ts]`` — Flink's interval join, the
  batch `range_join_binned`'s streaming twin.

Semantics are batch-equivalent by construction (a watermarked
stream-stream inner join emits exactly the rows the same join emits
over the full batch inputs, as long as data respects the watermark) —
pinned by the stream-vs-batch equivalence test per the CLAUDE.md
streaming-stateful oracle exemption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_condition(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lookback: str,
):
    """The equi-key + time-range join condition shared by the streaming
    operator and its batch twin. ``lookback`` is a SQL interval string
    (e.g. ``'1 hour'``): build rows are eligible while
    ``probe_ts - lookback <= build_ts <= probe_ts``."""
    return (
        (probe[key] == build[key])
        & (build[build_ts] <= probe[probe_ts])
        & (build[build_ts] >= probe[probe_ts] - F.expr(f"INTERVAL {lookback}"))
    )


def streaming_interval_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner interval join (enrich in flight).

    Each probe event joins every build event with the same ``key`` whose
    timestamp falls in ``[probe_ts - lookback, probe_ts]``. Both sides
    get a ``watermark`` for late data; the range condition bounds the
    join state (Spark evicts build rows once
    ``watermark(probe) > build_ts + lookback``), so state size is
    O(key-rate × lookback), independent of stream age.

    For as-of (latest-only) enrichment, compose this with a downstream
    latest-wins reduction keyed on the probe row identity — the batch
    `operators/temporal_join.asof_join` is the exact-batch twin.

    Column-name discipline: the two inputs must not share column names
    other than ``key`` (rename upstream), mirroring the batch join API.
    """
    p = probe.withWatermark(probe_ts, watermark)
    b = build.withWatermark(build_ts, watermark)
    cond = interval_join_condition(p, b, key, probe_ts, build_ts, lookback)
    return p.join(b, cond, "inner").drop(b[key])


def streaming_interval_join_left(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT-OUTER watermarked interval join: matched rows stream out with
    inner-join timing; an UNMATCHED probe row is emitted with NULL build
    columns once the watermark proves no match can still arrive (its
    whole ``[probe_ts - lookback, probe_ts]`` window has passed both
    watermarks). This is the contract a batch LEFT JOIN gives and naive
    streaming enrichment silently loses: every probe event survives,
    enriched or explicitly un-enriched — the shape for "deliver the
    event even if the calibration/auth/dimension row never showed up".
    State bounds are identical to the inner join (the range condition
    derives the eviction); the only cost is null-row emission latency =
    watermark delay."""
    p = probe.withWatermark(probe_ts, watermark)
    b = build.withWatermark(build_ts, watermark)
    cond = interval_join_condition(p, b, key, probe_ts, build_ts, lookback)
    return p.join(b, cond, "left_outer").drop(b[key])


def batch_interval_join_left(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lookback: str = "1 hour",
) -> DataFrame:
    """Batch twin of `streaming_interval_join_left` for the equivalence
    test — identical condition and join type, no watermarks."""
    cond = interval_join_condition(probe, build, key, probe_ts, build_ts, lookback)
    return probe.join(build, cond, "left_outer").drop(build[key])


def batch_interval_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    lookback: str = "1 hour",
) -> DataFrame:
    """Batch twin of `streaming_interval_join` — identical condition, no
    watermarks. The equivalence test runs both over the same rows."""
    cond = interval_join_condition(probe, build, key, probe_ts, build_ts, lookback)
    return probe.join(build, cond, "inner").drop(build[key])


def streaming_asof_enrich(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    probe_cols: list[str],
    payload_cols: list[str],
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming as-of enrichment: each probe row gets the LATEST build
    row within the lookback — `operators/temporal_join.asof_join`'s
    streaming twin (bounded to the lookback, as unbounded as-of state
    cannot be evicted on a stream).

    Chained stateful operators (Spark 3.5.1+): the watermarked interval
    join feeds a streaming max_by aggregation keyed on the probe row
    identity (``key``, ``probe_ts``, ``probe_cols``). Append-mode
    discipline applies — a probe row's enrichment is emitted once its
    event time falls behind the watermark, i.e. results finalize with
    watermark delay, the price of exact latest-wins on a stream.
    """
    joined = streaming_interval_join(
        probe, build, key, probe_ts, build_ts, lookback, watermark
    )
    payload = F.struct(F.col(build_ts), *[F.col(c) for c in payload_cols])
    return joined.groupBy(key, probe_ts, *probe_cols).agg(
        F.max_by(payload, F.col(build_ts)).alias("matched")
    )
