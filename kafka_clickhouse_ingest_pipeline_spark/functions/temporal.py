"""Temporal helper expressions shared across queries.

Timestamps never leave a comparable query as raw timestamp values (oracle
engines disagree on sub-second python types); they are exported as epoch
milliseconds computed with *integer* division — `unix_micros(ts)/1000`
through double division rounds differently than DuckDB's integer
`epoch_us(ts)//1000` for a handful of values per 10k rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    """Epoch milliseconds as bigint, truncating (exact integer division).

    floor(µs/1000) is exact: when µs/1000 is an integer it is < 2^53 and
    representable, so the double division cannot round across the floor.

    WALL-CLOCK based, i.e. TZ-invariant (round-6 hardening): testdata
    timestamps are TZ-naive walls that DuckDB's epoch_us reads as-is,
    but Spark's ntz→timestamp load shifts the instant by the session
    offset. from_utc_timestamp(ts, current_timezone()) adds that offset
    back, so the exported epoch equals the oracle's naive epoch for
    every wall clock that EXISTS in the session zone — and is the
    identity (bit-for-bit, same value) under the pinned-UTC session the
    hash contract uses. Caveat: a wall inside a DST spring-forward gap
    (e.g. 02:30 on the America/New_York switch day) does not exist in
    that zone; the ntz load maps it an hour forward and this recovery
    keeps that shifted wall, diverging from the naive epoch by the gap
    width. Data carrying such walls needs the UTC session (the pinned
    contract) or a TIMESTAMP_NTZ pipeline end-to-end; the testdata
    (January 2024) contains none.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.from_utc_timestamp(c, F.current_timezone())
    return F.floor(F.unix_micros(c) / F.lit(1000)).cast("long")


def epoch_ms_instant(col: Column | str) -> Column:
    """Epoch milliseconds of the TRUE INSTANT (no wall-clock recovery).

    :func:`epoch_ms` deliberately re-derives the *wall clock* so the
    DuckDB oracle (which reads the testdata's TZ-naive walls as-is)
    hashes identically under any session zone. That is the right export
    for the oracle contract, but the wrong one for consumers that need
    the actual point on the timeline — external exports, cross-system
    joins against another store's UTC epochs, TTL math. This variant
    keeps instant semantics: identical to epoch_ms under the pinned-UTC
    session, diverging by exactly the session offset elsewhere. Pick
    per call site and say which in the docstring — the two only agree
    when the session zone is UTC.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.unix_micros(c) / F.lit(1000)).cast("long")


# DuckDB-side equivalent, for oracle SQL strings.
ORACLE_EPOCH_MS = "CAST(epoch_us({col}) // 1000 AS BIGINT)"
