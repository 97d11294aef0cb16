"""Custom stateful streaming operators via applyInPandasWithState (C12/C13).

Structured Streaming's built-ins cover windows/dedup/joins; anything with
bespoke per-key state (running counters with custom expiry, fraud
heuristics, per-sensor calibration) uses the arbitrary-state API. This
module implements the canonical one: a per-key running aggregate with
timeout-based eviction — per-sensor event count + running mean that emits
an update per batch and drops state for keys idle past the timeout.

State is one tuple per key (bounded by live-key cardinality, not stream
length); Arrow moves each key-group as pandas DataFrames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("mean_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = "count LONG, total DOUBLE"


def _make_update_fn(timeout_ms: int | None):
    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key: emit nothing, drop state (bounded-state guarantee)
            state.remove()
            return
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf["value"].dropna()
            count += len(pdf)
            total += float(vals.sum())
        state.update((count, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [count],
                "mean_value": [total / count if count else None],
            }
        )

    return update


BAND_FLAGS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("band_idx", IntegerType(), False),
        StructField("is_dup", IntegerType(), False),
    ]
)


def _band_update_fn(ttl_ms: int):
    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()  # band value idle past the TTL: forget it
            return
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "doc_id"])
        seen = state.exists
        out_ids, out_band, out_dup = [], [], []
        max_ts_ms = 0
        for row in pdf.itertuples():
            out_ids.append(int(row.doc_id))
            out_band.append(int(row.band_idx))
            out_dup.append(int(seen))
            seen = True  # later rows of this batch dup against the first
            max_ts_ms = max(max_ts_ms, int(row.ts.value // 10**6))
        # last-seen must be MONOTONIC: a late batch carrying only older
        # events (still inside the watermark) must not shrink the TTL
        # below what the previous sighting already earned, or a genuine
        # near-dup inside the window would be forgotten early
        if state.exists:
            max_ts_ms = max(max_ts_ms, int(state.get[0]))
        state.update((max_ts_ms,))
        # event-time TTL: drop this band's state once the watermark
        # passes last-seen + ttl (must stay above the current watermark)
        state.setTimeoutTimestamp(
            max(max_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {"doc_id": out_ids, "band_idx": out_band, "is_dup": out_dup}
        )

    return update


def band_lsh_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    ttl_ms: int = 3_600_000,
    n: int = 3,
) -> DataFrame:
    """Streaming LSH near-dedup with band OR-semantics (VERDICT r2 #5).

    The batch LSH pair generator treats two docs as candidates when ANY
    of the 4 signature bands matches (band OR); `streaming_near_dedup`
    only matches on the FULL signature. This operator closes that gap
    with arbitrary state: each doc explodes into its 4 (band_idx,
    band_hash) keys, and per band-key state remembers whether the value
    was ever seen inside the TTL. Output is one row per (doc, band) with
    an `is_dup` flag; a doc is a near-duplicate iff ANY of its band rows
    is flagged — collapse with :func:`collapse_band_flags` (in
    foreachBatch or on the sink table).

    Scale: state is one timestamp per live band value, bounded by the
    event-time TTL (EventTimeTimeout keyed off the stream's watermark) —
    the same O(values-per-window) bound as the built-in streaming dedup;
    Arrow moves each band group as a pandas frame. The doc-level OR is a
    key-grain aggregate downstream, not more state.
    """
    from .pipeline import attach_minhash_sig

    with_sig, sig_cols = attach_minhash_sig(docs, text_col, n)
    n_bands = 4
    rows_per_band = len(sig_cols) // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    *[
                        F.col(sig_cols[b * rows_per_band + r])
                        for r in range(rows_per_band)
                    ]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = (
        with_sig.select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ts"),
            F.explode(bands).alias("bd"),
        )
        .select("doc_id", "ts", "bd.band_idx", "bd.band_hash")
    )
    return (
        exploded.withWatermark("ts", watermark)
        .groupBy("band_idx", "band_hash")
        .applyInPandasWithState(
            _band_update_fn(ttl_ms),
            outputStructType=BAND_FLAGS_SCHEMA,
            stateStructType="last_seen_ms LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def collapse_band_flags(flags: DataFrame) -> DataFrame:
    """Doc-grain OR over band flags: (doc_id, is_near_dup). Batch-side
    helper for the sink table / foreachBatch — one partial-aggregable
    groupBy, no extra streaming state."""
    return flags.groupBy("doc_id").agg(
        F.max("is_dup").cast("int").alias("is_near_dup")
    )


def running_stats(
    events: DataFrame,
    key_col: str = "sensorId",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running count/mean over a stream.

    ``timeout_ms`` enables ProcessingTimeTimeout idle-key eviction — the
    bounded-state knob for high-cardinality keys. It is opt-in because the
    timeout machinery adds a full state-partition sweep with Python
    round-trips per micro-batch (measured ~90 s/batch vs 3 s with
    NoTimeout on local[8]); enable it when key cardinality actually grows
    unboundedly, which is exactly when the sweep pays for itself.

    Usage: stream.groupBy(key) → applyInPandasWithState → update sink.
    Each micro-batch emits the updated totals for keys seen in that batch.
    """
    # rename before grouping: an alias inside groupBy() leaves the grouping
    # attribute unresolvable for FlatMapGroupsInPandasWithState
    return (
        events.withColumnRenamed(key_col, "key")
        .groupBy("key")
        .applyInPandasWithState(
            _make_update_fn(timeout_ms),
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
