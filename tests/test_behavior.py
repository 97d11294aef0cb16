"""Behavioral analytics (argMax / windowFunnel / retention analogs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.queries.behavior import (
    argmax_last_event,
    funnel_view_click_purchase,
    retention_weekly,
)
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def test_argmax_one_row_per_user_at_max_ts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = argmax_last_event(spark, sf_dir)
    assert out.count() == ev.select("user_id").distinct().count()
    maxes = ev.groupBy("user_id").agg(F.max("ts").alias("mx"))
    joined = out.join(maxes, "user_id").where(
        F.col("last_ts_ms") != F.floor(F.unix_micros("mx") / 1000).cast("long")
    )
    assert joined.count() == 0


def test_funnel_levels_monotone_and_exercised(spark):
    from conftest import SF_ORACLE

    # sf0.001 is too sparse for 3-step funnels; the denser sf0.01 stream
    # exercises every level
    out = funnel_view_click_purchase(spark, SF_ORACLE)
    counts = {
        r.funnel_level: r.n
        for r in out.groupBy("funnel_level").agg(F.count("*").alias("n")).collect()
    }
    at_least = lambda k: sum(v for lvl, v in counts.items() if lvl >= k)
    assert at_least(1) >= at_least(2) >= at_least(3)
    # the synthetic stream is dense enough that full funnels occur
    assert at_least(3) > 0
    # and sparse enough that not everyone converts
    assert at_least(3) < at_least(1)


def test_retention_bounded_by_cohort(spark, sf_dir):
    row = retention_weekly(spark, sf_dir).collect()[0]
    assert row.cohort >= row.retained_w2
    assert row.cohort >= row.retained_w3
    assert row.cohort >= row.retained_w4
    assert row.cohort > 0


def test_transition_matrix_rows_normalize(spark, sf_dir):
    """Per prev_type, transition probabilities sum to ~1 and counts match
    the total number of adjacent pairs (n_events - n_users)."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.behavior import (
        event_transition_matrix,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    out = event_transition_matrix(spark, sf_dir)
    rows = out.collect()
    by_prev = {}
    total = 0
    for r in rows:
        by_prev.setdefault(r.prev_type, 0.0)
        by_prev[r.prev_type] += r.p_transition
        total += r.n_transitions
    assert all(abs(s - 1.0) < 0.01 for s in by_prev.values())
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_lttb_keeps_endpoints_and_picks_the_spike(spark, sf_dir):
    """LTTB guarantees: first/last points survive verbatim, exactly k
    points come back in x order, and a pronounced spike is never
    smoothed away (the visual-fidelity property the algorithm exists
    for — a plain per-bucket mean would flatten it)."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.timeseries import (
        lttb_downsample_hourly,
        _LTTB_K,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    out = lttb_downsample_hourly(spark, sf_dir).collect()
    assert len(out) == _LTTB_K
    assert [r.sel_idx for r in out] == list(range(_LTTB_K))
    xs = [r.x_ms for r in out]
    assert xs == sorted(xs)

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hb")).agg(
        F.avg("value").alias("y")
    )
    lo = hourly.agg(F.min("hb")).first()[0]
    hi = hourly.agg(F.max("hb")).first()[0]
    first_ms = int(lo.timestamp() * 1000)
    last_ms = int(hi.timestamp() * 1000)
    assert out[0].x_ms == first_ms
    assert out[-1].x_ms == last_ms


def test_epoch_ms_is_wall_clock_invariant_across_session_tz(spark, sf_dir):
    """Round-6 hardening pin: epoch_ms must export the oracle's naive
    epoch (DuckDB epoch_us // 1000 of the parquet wall clock) under a
    non-UTC session timezone, not drift by the session offset — the
    regression that made every epoch-exporting query fail the
    America/New_York variant gate before the from_utc_timestamp fix.
    session.timeZone is runtime-settable, so this runs in-suite."""
    import duckdb

    from kafka_clickhouse_ingest_pipeline_spark.functions.temporal import (
        epoch_ms,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    want = dict(
        duckdb.sql(
            f"SELECT event_id, CAST(epoch_us(ts) // 1000 AS BIGINT) "
            f"FROM read_parquet('{sf_dir}/events.parquet') "
            f"ORDER BY event_id LIMIT 50"
        ).fetchall()
    )
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {
                r.event_id: r.ms
                for r in load_table(spark, sf_dir, "events")
                .select("event_id", epoch_ms("ts").alias("ms"))
                .orderBy("event_id")
                .limit(50)
                .collect()
            }
            assert got == want, f"epoch drift under {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_epoch_ms_instant_keeps_true_instants(spark, sf_dir):
    """epoch_ms_instant is the export for true-timeline consumers: it
    agrees with epoch_ms under the pinned-UTC session bit-for-bit, and
    under a non-UTC session it diverges from the wall-clock export by
    EXACTLY the session offset (here America/New_York in January =
    UTC-5), proving the instant is preserved while the wall is not."""
    from kafka_clickhouse_ingest_pipeline_spark.functions.temporal import (
        epoch_ms,
        epoch_ms_instant,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = (
            load_table(spark, sf_dir, "events")
            .select(
                "event_id",
                epoch_ms("ts").alias("wall"),
                epoch_ms_instant("ts").alias("inst"),
            )
            .orderBy("event_id")
            .limit(50)
            .collect()
        )
        assert all(r.wall == r.inst for r in utc)

        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = (
            load_table(spark, sf_dir, "events")
            .select(
                "event_id",
                epoch_ms("ts").alias("wall"),
                epoch_ms_instant("ts").alias("inst"),
            )
            .orderBy("event_id")
            .limit(50)
            .collect()
        )
        # NY in January is UTC-5: wall w read as NY-local is the
        # instant w+5h, so the instant export exceeds the wall export
        # by exactly the offset.
        five_h_ms = 5 * 3600 * 1000
        assert all(r.inst - r.wall == five_h_ms for r in ny)
        # the instant itself moved with the session (ntz walls re-read
        # as NY local), but wall-vs-instant spacing is the offset —
        # which is the contract each variant's consumers rely on.
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
