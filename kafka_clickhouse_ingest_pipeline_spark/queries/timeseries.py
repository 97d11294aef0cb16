"""Tier-C12 time-series queries over `events` with DuckDB oracles.

Batch twins of the streaming-window operators (streaming/windows.py runs
the same shapes under watermarks): tumbling / sliding / session windows,
plus the stream-dedup batch analog. Window starts are exported as epoch-ms
bigints.

Alignment note: Spark tumbling windows anchor at the epoch, DuckDB
time_bucket at 2000-01-01; both anchors are midnight-aligned so any
interval dividing 24h produces identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..functions.temporal import epoch_ms
from ..registry import query
from ..tables import load_table

SESSION_GAP_MIN = 30


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT
      CAST(epoch_us(time_bucket(INTERVAL '10 minutes', ts)) // 1000 AS BIGINT)
        AS window_start_ms,
      event_type,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="C12: 10-minute tumbling windows per event type — the "
    "batch twin of the streaming windowed aggregation.",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            epoch_ms(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "sliding_window_agg",
    oracle="""
    SELECT
      CAST(epoch_us(ws) // 1000 AS BIGINT) AS window_start_ms,
      COUNT(*) AS n_events,
      (FLOOR(AVG(value) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS avg_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
               AS ws,
             value
      FROM events
    )
    GROUP BY ws
    """,
    description="C12: 10-minute windows sliding every 5 — each event lands "
    "in two windows (explode of the phase-shifted bucket pair).",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.avg("value")).alias("avg_value"),
        )
        .select(
            epoch_ms(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "avg_value",
        )
    )


@query(
    "session_window_agg",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '{SESSION_GAP_MIN} minutes'
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) // 1000 AS BIGINT) AS session_start_ms,
           CAST(epoch_us(MAX(ts)) // 1000 AS BIGINT) AS last_event_ms,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="C12: gap-based session windows (30-min inactivity) via "
    "Spark's native session_window; oracle rebuilds sessions with "
    "lag + running sum.",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            epoch_ms(F.col("w.start")).alias("session_start_ms"),
            epoch_ms(F.col("last_ts")).alias("last_event_ms"),
            "n_events",
        )
    )


@query(
    "events_dedup_exact",
    oracle="""
    SELECT user_id, event_type,
           CAST(epoch_us(ts) // 1000 AS BIGINT) AS ts_ms,
           MIN(event_id) AS event_id
    FROM events
    GROUP BY user_id, event_type, ts
    """,
    description="C9/C12: stream-dedup batch analog — deterministic "
    "representative per (user, type, ts); the streaming twin is "
    "withWatermark + dropDuplicates (streaming/pipeline.py).",
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type", "ts").agg(
        F.min("event_id").alias("event_id")
    ).select(
        "user_id",
        "event_type",
        epoch_ms("ts").alias("ts_ms"),
        "event_id",
    )


@query(
    "hourly_rates_by_type",
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_bucket,
      event_type,
      COUNT(*) AS n_events,
      (FLOOR(AVG(value) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS avg_value,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    description="C12/C8: hourly event rates per type with distinct users — "
    "date_trunc bucketing.",
)
def hourly_rates_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.avg("value")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


from ..operators import temporal_join as TJ  # noqa: E402


@query(
    "asof_join_latest_order",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id,
             {TJ.ORACLE_PROBE_TS.format(col="event_id")} AS pts
      FROM events
    )
    SELECT event_id, user_id,
           CAST(epoch_us(pts) // 1000 AS BIGINT) AS probe_ms,
           o_orderkey AS matched_orderkey,
           o_totalprice AS matched_totalprice,
           CAST(epoch_us(o_orderdate) // 1000 AS BIGINT) AS matched_orderdate_ms
    FROM p LEFT JOIN orders o
      ON o.o_custkey = p.user_id AND o.o_orderdate <= p.pts
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY p.event_id
      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC
    ) = 1
    """,
    description="As-of join: each event probe matched to the latest order "
    "of that customer at-or-before the probe instant (left semantics — "
    "probes before the customer's first order get nulls). Union-sentinel "
    "implementation: ONE shuffle on the key, no join node "
    "(operators/temporal_join.py), vs the oracle's O(n·m)-per-key "
    "inequality join.",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        TJ.probe_timestamp(F.col("event_id")).alias("pts"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        # parquet TIMESTAMP(ms) loads as NTZ; session tz is pinned UTC so
        # the cast is a pure type change (epoch_ms needs TIMESTAMP_LTZ).
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    out = TJ.asof_join(
        ev,
        orders,
        key="user_id",
        probe_ts="pts",
        build_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice", "o_orderdate"],
        tiebreak_col="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        epoch_ms(F.col("pts")).alias("probe_ms"),
        F.col("matched.o_orderkey").alias("matched_orderkey"),
        F.col("matched.o_totalprice").alias("matched_totalprice"),
        epoch_ms(F.col("matched.o_orderdate")).alias("matched_orderdate_ms"),
    )


@query(
    "range_join_order_windows",
    oracle=f"""
    WITH p AS (
      SELECT value,
             {TJ.ORACLE_PROBE_TS.format(col="event_id")} AS pts
      FROM events
    )
    SELECT o.o_orderkey,
           COUNT(*) AS n_events,
           (FLOOR(SUM(p.value) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS sum_value
    FROM p JOIN orders o
      ON p.pts >= o.o_orderdate
     AND p.pts < o.o_orderdate + INTERVAL 3 DAY
    GROUP BY o.o_orderkey
    """,
    description="Range (interval) join with NO equi-key: events whose probe "
    "instant falls in each order's 3-day window, aggregated per order. "
    "Binned implementation (operators/temporal_join.py): probes "
    "pre-aggregated to their (midnight) instant, intervals exploded into "
    "≤2 width-sized bins, equi-join on bin + exact range filter — a hash "
    "join sized by true match density instead of a cartesian product.",
)
def range_join_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        TJ.probe_timestamp(F.col("event_id")).alias("pts"), "value"
    )
    # Probe instants are midnight-aligned by construction, so pre-reduce
    # the probe side to one row per distinct instant before the range join:
    # the join fan-out then scales with distinct days, not raw events.
    per_day = ev.groupBy("pts").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_sum")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # per_day is bounded by distinct calendar days (<= 2400 by
    # construction of the probe instants) — broadcast it so the
    # orders-scaled interval side streams instead of being collected
    # and shipped (guide §3.1; pre-fix plan broadcast orders x bins).
    joined = TJ.range_join_binned(
        per_day,
        orders,
        probe_ts="pts",
        interval_start="o_orderdate",
        width_days=3,
        broadcast_probe=True,
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("_n").alias("n_events"),
        round4(F.sum("_sum")).alias("sum_value"),
    )


@query(
    "events_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hb,
             COUNT(*) AS n,
             (FLOOR(AVG(value) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS raw_avg
      FROM events
      WHERE event_type = 'purchase' AND value > 90
      GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(hb) FROM hourly),
                                    (SELECT MAX(hb) FROM hourly),
                                    INTERVAL 1 HOUR)) AS hb
    )
    SELECT CAST(epoch_us(s.hb) // 1000 AS BIGINT) AS hour_ms,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           last_value(h.raw_avg IGNORE NULLS) OVER (
             ORDER BY s.hb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_locf
    FROM spine s LEFT JOIN hourly h ON s.hb = h.hb
    """,
    description="C12: gap-filled hourly series (ClickHouse ORDER BY ... "
    "WITH FILL + INTERPOLATE analog): sparse purchase events bucketed "
    "per hour, missing hours materialized from a sequence-exploded dense "
    "spine, counts zero-filled, average carried forward (LOCF) with "
    "last(ignorenulls). Scale shape: raw events reduce to per-hour rows "
    "FIRST (partial+final hash agg), so the spine join and the single "
    "ordered window touch only O(hours) rows — ~9k rows/year no matter "
    "whether the input is 1 GB or 100 TB.",
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hb")).agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.avg("value")).alias("raw_avg"),
    )
    rng = hourly.agg(F.min("hb").alias("lo"), F.max("hb").alias("hi"))
    spine = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hb")
    )
    # The window is a global sort over the hour spine — bounded O(hours)
    # rows by construction, so a single partition is semantically what we
    # want; the constant-valued partition key (attr % 1 == 0 — a bare
    # literal gets constant-folded out of the spec) states that intent
    # explicitly and keeps WindowExec from warning about a frame that
    # cannot grow with the data (it grows with wall-clock hours).
    w = (
        Window.partitionBy(F.unix_timestamp("hb") % F.lit(1))
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, "hb", "left")
        .select(
            epoch_ms(F.col("hb")).alias("hour_ms"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("raw_avg", ignorenulls=True).over(w).alias("avg_value_locf"),
        )
    )


@query(
    "hourly_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hb, COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, hb, n,
             AVG(CAST(n AS DOUBLE)) OVER w AS mu,
             stddev_samp(CAST(n AS DOUBLE)) OVER w AS sigma,
             COUNT(*) OVER w AS n_baseline
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hb
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(epoch_us(hb) // 1000 AS BIGINT) AS hour_ms,
           n,
           (FLOOR(((n - mu) / sigma) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS zscore
    FROM scored
    WHERE n_baseline >= 12
      AND (FLOOR(sigma * 10000.0 + 0.5 + 0.000001) / 10000.0) > 0.5
      AND abs(FLOOR(((n - mu) / sigma) * 10000.0 + 0.5 + 0.000001) / 10000.0)
          > 2.0
    ORDER BY event_type, hour_ms
    """,
    description="C12: trailing-window anomaly detection — each hour's "
    "event count scored against the mean/stddev of its type's previous "
    "24 hours (self-excluded frame); hours beyond |z| > 2 with a "
    "settled baseline flagged. Two-level shape: the raw stream reduces "
    "to O(types x hours) rows BEFORE any window runs, so the ordered "
    "frame is cheap at any input scale — the streaming twin is the "
    "same arithmetic over a sliding watermark window.",
)
def hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hb")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hb")
        .rowsBetween(-24, -1)
    )
    nd = F.col("n").cast("double")
    scored = hourly.select(
        "event_type",
        "hb",
        "n",
        F.avg(nd).over(w).alias("mu"),
        F.stddev_samp(nd).over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_baseline"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    # Threshold on round4-ed values (repo convention): a last-ulp stddev
    # divergence between engines at the boundary must not change row
    # membership — the driver hashes exactly.
    return (
        scored.where(
            (F.col("n_baseline") >= 12)
            & (round4(F.col("sigma")) > 0.5)
            & (F.abs(round4(z)) > 2.0)
        )
        .select(
            "event_type",
            epoch_ms(F.col("hb")).alias("hour_ms"),
            "n",
            round4(z).alias("zscore"),
        )
        .orderBy("event_type", "hour_ms")
    )


@query(
    "dau_wau_rolling",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(epoch_us(CAST(d.day AS TIMESTAMP)) // 1000 AS BIGINT) AS day_ms,
           CAST((SELECT COUNT(*) FROM du WHERE du.day = d.day) AS BIGINT)
             AS dau,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY day_ms
    """,
    description="C12/engagement: DAU + trailing-7-day WAU per day. Exact "
    "rolling distinct counts don't fit a window frame, so the classic "
    "two-level shape: reduce the stream to the distinct (day, user) "
    "table FIRST (shuffle ∝ active users/day, not events), then a 7-wide "
    "day-range join against the day spine + countDistinct. The fan-out "
    "is exactly 7x the reduced table regardless of event volume.",
)
def dau_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        days.alias("d")
        .join(
            du.alias("u"),
            F.col("u.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            epoch_ms(F.col("day").cast("timestamp")).alias("day_ms"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
        .orderBy("day_ms")
    )


@query(
    "events_gap_fill_interp",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hb,
             COUNT(*) AS n,
             (FLOOR(AVG(value) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS raw_avg
      FROM events
      WHERE event_type = 'purchase' AND value > 90
      GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(hb) FROM hourly),
                                    (SELECT MAX(hb) FROM hourly),
                                    INTERVAL 1 HOUR)) AS hb
    ),
    nb AS (
      SELECT s.hb, h.n, h.raw_avg,
             last_value(h.raw_avg IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN h.raw_avg IS NOT NULL THEN s.hb END
                        IGNORE NULLS) OVER wp AS pt,
             first_value(h.raw_avg IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN h.raw_avg IS NOT NULL THEN s.hb END
                         IGNORE NULLS) OVER wn AS nt
      FROM spine s LEFT JOIN hourly h ON s.hb = h.hb
      WINDOW wp AS (ORDER BY s.hb
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (ORDER BY s.hb
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT CAST(epoch_us(hb) // 1000 AS BIGINT) AS hour_ms,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           (FLOOR((CASE
              WHEN pv IS NULL THEN nv
              WHEN nv IS NULL THEN pv
              WHEN nt = pt THEN pv
              ELSE pv + (nv - pv) *
                   (CAST(epoch(hb) - epoch(pt) AS DOUBLE)
                    / CAST(epoch(nt) - epoch(pt) AS DOUBLE))
            END) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS avg_value_interp
    FROM nb
    """,
    description="C12: gap-filled hourly series with LINEAR interpolation "
    "— the INTERPOLATE twin of events_gap_fill_locf (ClickHouse ORDER BY "
    "... WITH FILL INTERPOLATE). Missing hours get "
    "prev + (next-prev) * elapsed-fraction between their flanking known "
    "hours (two bounded windows: last-ignore-nulls forward, "
    "first-ignore-nulls backward); edge gaps take the nearest known "
    "value. Same two-level scale shape as LOCF: the raw stream reduces "
    "to O(hours) rows before the spine join and windows, so 100 TB of "
    "events still interpolates over ~9k rows/year.",
)
def events_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hb")).agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.avg("value")).alias("raw_avg"),
    )
    rng = hourly.agg(F.min("hb").alias("lo"), F.max("hb").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hb")
    )
    # bounded O(hours) frame; constant partition key states that intent
    # (see events_gap_fill_locf)
    base = (
        Window.partitionBy(F.unix_timestamp("hb") % F.lit(1)).orderBy("hb")
    )
    wp = base.rowsBetween(Window.unboundedPreceding, 0)
    wn = base.rowsBetween(0, Window.unboundedFollowing)
    known_ts = F.when(F.col("raw_avg").isNotNull(), F.col("hb"))
    joined = spine.join(hourly, "hb", "left").select(
        "hb",
        "n",
        F.last("raw_avg", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_ts, ignorenulls=True).over(wp).alias("pt"),
        F.first("raw_avg", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_ts, ignorenulls=True).over(wn).alias("nt"),
    )
    elapsed = (
        (F.unix_timestamp("hb") - F.unix_timestamp("pt")).cast("double")
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt")).cast("double")
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * elapsed)
    )
    return joined.select(
        epoch_ms(F.col("hb")).alias("hour_ms"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        round4(interp).alias("avg_value_interp"),
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts, event_id,
             ts + CASE event_type
                    WHEN 'purchase' THEN INTERVAL '45 minutes'
                    WHEN 'click'    THEN INTERVAL '30 minutes'
                    ELSE                 INTERVAL '15 minutes'
                  END AS ev_end
      FROM events
    ),
    marked AS (
      -- >= is load-bearing: Spark's session_window MERGES an event at
      -- exactly prev_ts + gap (boundary pinned for all three gap
      -- branches in tests/test_streaming.py::
      -- test_session_window_exact_gap_boundary_merges); > would split
      SELECT *, CASE WHEN MAX(ev_end) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) >= ts THEN 0 ELSE 1 END AS new_session
      FROM gapped
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) // 1000 AS BIGINT) AS session_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="C12: DYNAMIC-gap session windows — the inactivity "
    "timeout depends on the event (purchases hold a session open 45 "
    "min, clicks 30, views 15), Spark's session_window taking a CASE "
    "column as the gap. The oracle rebuilds sessions with the "
    "running-max island trick: an event joins the session iff the max "
    "event-end (ts + its gap) over all previous events reaches it. The "
    "engagement-dependent sessionization real clickstream pipelines "
    "want; same streaming-ready shape as the fixed-gap query.",
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", "45 minutes")
        .when(F.col("event_type") == "click", "30 minutes")
        .otherwise("15 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            epoch_ms(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


@query(
    "time_weighted_avg_value",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             CAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS DOUBLE)
               / 1000000.0 AS dur_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(dur_s) AS BIGINT) AS n_intervals,
           (FLOOR((SUM(value * dur_s) / SUM(dur_s)) * 10000.0 + 0.5
                  + 0.000001) / 10000.0) AS tw_avg_value,
           (FLOOR(SUM(dur_s) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS observed_s
    FROM d
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="C12: TIME-WEIGHTED average (TimescaleDB time_weight, "
    "LOCF weighting) — each observation's value counts for the seconds "
    "it was the latest known state (duration to the next event), so "
    "irregular sampling can't bias the mean toward chatty periods the "
    "way a plain AVG does. One window pass for the durations (single "
    "shuffle on user_id), then an ordinary two-stage aggregate; the "
    "final open-ended observation carries no weight. The metric every "
    "sensor/billing pipeline wants from the reference's event stream.",
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")))
        .cast("double")
        / F.lit(1000000.0)
    )
    d = ev.select("user_id", "value", dur.alias("dur_s")).where(
        F.col("dur_s").isNotNull()
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count("dur_s").cast("long").alias("n_intervals"),
            # try_divide: a series whose observations all share one
            # timestamp has zero observed time — undefined mean, not an
            # ANSI crash (NULL here, and the oracle never sees such data)
            round4(
                F.try_divide(
                    F.sum(F.col("value") * F.col("dur_s")), F.sum("dur_s")
                )
            ).alias("tw_avg_value"),
            round4(F.sum("dur_s")).alias("observed_s"),
        )
        .orderBy("user_id")
    )


@query(
    "ohlc_hourly_bars",
    oracle="""
    SELECT CAST(epoch_us(date_trunc('hour', ts)) // 1000 AS BIGINT)
             AS hour_ms,
           CAST(arg_min(value, ts) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(arg_max(value, ts) AS DOUBLE) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY hour_ms
    """,
    description="C12: OHLC candlestick bars — open/high/low/close per "
    "hour via min_by/max_by(value, ts) + plain min/max, all mergeable "
    "aggregates (partial+final hash agg, single shuffle on the hour "
    "key), never a per-bucket sort or collect. The financial/sensor "
    "downsampling shape (ClickHouse argMin/argMax, kdb xbar). Ties on "
    "ts within a bucket are broken identically in both engines only if "
    "at most one tick per (bucket, ts) exists — checked true for the "
    "purchase stream at every SF; a production variant would tie-break "
    "on a struct(ts, event_id) ordering key.",
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hb"))
        .agg(
            F.min_by("value", "ts").cast("double").alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.max_by("value", "ts").cast("double").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
        )
        .select(
            epoch_ms(F.col("hb")).alias("hour_ms"),
            "open", "high", "low", "close", "n_ticks",
        )
        .orderBy("hour_ms")
    )


@query(
    "counter_rate_with_resets",
    oracle="""
    WITH d AS (
      SELECT user_id,
             value - LAG(value) OVER w AS delta,
             CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS DOUBLE)
               / 1000000.0 AS dur_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resets,
           (FLOOR((SUM(CASE WHEN delta >= 0 THEN delta ELSE 0 END)
                   / SUM(dur_s)) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS rate_per_s
    FROM d WHERE delta IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="C12: counter rate with reset handling (PromQL rate()): "
    "per-series deltas via one lag window; negative deltas mark counter "
    "resets and contribute zero increase (the post-reset absolute value "
    "would double-count, so like PromQL we drop it rather than guess "
    "the pre-reset peak); rate = positive increase / covered seconds. "
    "The monitoring-pipeline shape for cumulative counters that restart "
    "with their process — one shuffle on the series key, then a plain "
    "mergeable aggregate.",
)
def counter_rate_with_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    dur = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
        .cast("double")
        / F.lit(1000000.0)
    )
    d = ev.select(
        "user_id", delta.alias("delta"), dur.alias("dur_s")
    ).where(F.col("delta").isNotNull())
    return (
        d.groupBy("user_id")
        .agg(
            F.sum((F.col("delta") < 0).cast("long")).alias("n_resets"),
            # try_divide: same zero-covered-time guard as the
            # time-weighted average
            round4(
                F.try_divide(
                    F.sum(
                        F.when(F.col("delta") >= 0, F.col("delta")).otherwise(
                            0.0
                        )
                    ),
                    F.sum("dur_s"),
                )
            ).alias("rate_per_s"),
        )
        .orderBy("user_id")
    )


@query(
    "seasonal_hod_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hb,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT event_type, hb, n,
             CAST(EXTRACT(hour FROM hb) AS BIGINT) AS hod
      FROM hourly
    ),
    stats AS (
      SELECT event_type, hod,
             SUM(n) AS s, SUM(n * n) AS ss, COUNT(*) AS cnt
      FROM keyed GROUP BY 1, 2
    ),
    scored AS (
      SELECT k.event_type, k.hb, k.n, k.hod,
             (st.s - k.n) / (st.cnt - 1) AS mu,
             ((st.ss - k.n * k.n)
              - (st.cnt - 1) * ((st.s - k.n) / (st.cnt - 1))
                             * ((st.s - k.n) / (st.cnt - 1)))
               / (st.cnt - 2) AS var_loo,
             st.cnt AS n_baseline
      FROM keyed k
      JOIN stats st ON st.event_type = k.event_type AND st.hod = k.hod
      WHERE st.cnt >= 8
    )
    SELECT event_type,
           CAST(epoch_us(hb) // 1000 AS BIGINT) AS hour_ms,
           hod,
           CAST(n AS BIGINT) AS n,
           (FLOOR(((n - mu) / sqrt(var_loo)) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS zscore
    FROM scored
    WHERE (FLOOR(sqrt(var_loo) * 10000.0 + 0.5 + 0.000001) / 10000.0) > 0.5
      AND abs(FLOOR(((n - mu) / sqrt(var_loo)) * 10000.0 + 0.5 + 0.000001)
              / 10000.0) > 2.0
    ORDER BY event_type, hour_ms
    """,
    description="C12: SEASONAL anomaly detection — each hour's event "
    "count scored against its type's baseline for the SAME hour of day "
    "across all days (diurnal seasonality, which the trailing-24h "
    "window in hourly_anomaly_zscore cannot separate from trend). "
    "Leave-one-out mean/variance from per-(type, hour-of-day) "
    "sum/sumsq/count aggregates, so the scored hour never contaminates "
    "its own baseline and no window function touches row-level data: "
    "two linear aggregates and a broadcast-sized (type x 24) stats "
    "join, the same shape at 100 TB. Sums of integer counts are exact "
    "doubles, so the LOO algebra is portable across engines.",
)
def seasonal_hod_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hb")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    keyed = hourly.select(
        "event_type", "hb", "n", F.hour("hb").cast("long").alias("hod")
    )
    stats = keyed.groupBy("event_type", "hod").agg(
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
        F.count(F.lit(1)).alias("cnt"),
    )
    mu = (F.col("s") - F.col("n")) / (F.col("cnt") - 1)
    var_loo = (
        (F.col("ss") - F.col("n") * F.col("n"))
        - (F.col("cnt") - 1) * mu * mu
    ) / (F.col("cnt") - 2)
    sigma = F.sqrt(var_loo)
    z = (F.col("n") - mu) / sigma
    return (
        keyed.join(F.broadcast(stats), ["event_type", "hod"])
        .where(F.col("cnt") >= 8)
        .where(round4(sigma) > 0.5)
        .where(F.abs(round4(z)) > 2.0)
        .select(
            "event_type",
            epoch_ms(F.col("hb")).alias("hour_ms"),
            "hod",
            F.col("n").cast("long").alias("n"),
            round4(z).alias("zscore"),
        )
        .orderBy("event_type", "hour_ms")
    )


# --- LTTB downsampling (ClickHouse largestTriangleThreeBuckets) ---------

_LTTB_K = 12  # output points: first + 10 middle buckets + last


def _lttb_oracle(k: int = _LTTB_K) -> str:
    """Chained-CTE replay of the sequential LTTB selection (the MMR/BPE/
    PageRank oracle technique): sel_b depends on sel_{b-1}, so each
    middle bucket is one CTE. Geometry runs on hours-since-start (small
    exact integers) — epoch-ms magnitudes would overflow the round4
    snap's precision."""
    m = k - 2
    r4 = lambda e: f"(FLOOR(({e}) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
    area = (
        "abs((p.px - nx.ax) * (m.y - p.py) - (p.px - m.xr) * (nx.ay - p.py))"
    )
    parts = [
        f"""
    hourly AS (
      SELECT date_trunc('hour', ts) AS hb,
             {r4("AVG(value)")} AS y
      FROM events GROUP BY 1
    ),
    base AS (SELECT MIN(hb) AS h0, COUNT(*) AS n FROM hourly),
    ranked AS (
      SELECT CAST(epoch_us(hb) // 1000 AS BIGINT) AS x_ms,
             CAST(epoch(hb) - epoch(b.h0) AS DOUBLE) / 3600.0 AS xr,
             y,
             ROW_NUMBER() OVER (ORDER BY hb) AS rn
      FROM hourly, base b
    ),
    pfirst AS (SELECT x_ms, xr, y FROM ranked WHERE rn = 1),
    plast AS (SELECT r.x_ms, r.xr, r.y FROM ranked r, base WHERE r.rn = n),
    mid AS (
      SELECT r.x_ms, r.xr, r.y, r.rn,
             CAST(FLOOR((r.rn - 2) * {m}.0 / (n - 2)) AS BIGINT) AS b
      FROM ranked r, base WHERE r.rn >= 2 AND r.rn <= n - 1
    ),
    avgs AS (
      SELECT b, {r4("AVG(xr)")} AS ax, {r4("AVG(y)")} AS ay
      FROM mid GROUP BY b
    ),
    nxt AS (
      SELECT b - 1 AS nb, ax, ay FROM avgs WHERE b >= 1
      UNION ALL
      SELECT {m - 1} AS nb, xr AS ax, y AS ay FROM plast
    )"""
    ]
    for b in range(m):
        prev = "pfirst" if b == 0 else f"sel_{b - 1}"
        parts.append(f"""
    sel_{b} AS (
      SELECT m.x_ms, m.xr, m.y
      FROM mid m
      CROSS JOIN (SELECT xr AS px, y AS py FROM {prev}) p
      JOIN nxt nx ON nx.nb = {b}
      WHERE m.b = {b}
      ORDER BY {r4(area)} DESC, m.rn LIMIT 1
    )""")
    union = "\n      UNION ALL\n      ".join(
        [f"SELECT 0 AS sel_idx, x_ms, y FROM pfirst"]
        + [f"SELECT {b + 1} AS sel_idx, x_ms, y FROM sel_{b}" for b in range(m)]
        + [f"SELECT {k - 1} AS sel_idx, x_ms, y FROM plast"]
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(sel_idx AS BIGINT) AS sel_idx, x_ms, y AS y_val
    FROM ({union}) ORDER BY sel_idx
    """
    )


@query(
    "lttb_downsample_hourly",
    oracle=_lttb_oracle(),
    description="C12: LTTB downsampling (ClickHouse "
    "largestTriangleThreeBuckets parity) — the hourly value series "
    "reduced to 12 visually-faithful points: first and last kept, each "
    "middle bucket contributing the point that maximizes triangle area "
    "with the PREVIOUSLY SELECTED point and the next bucket's average "
    "(the sequential dependency that distinguishes LTTB from per-bucket "
    "argmax). Scale shape: the raw stream reduces to O(hours) rows "
    "first; the 10 greedy rounds are TakeOrdered-1 + broadcast-1-row "
    "joins over that bounded series, replayed CTE-for-round by the "
    "oracle. Geometry runs on hours-since-start and round4-snapped "
    "bucket means so the argmax is engine-portable.",
)
def lttb_downsample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.materialize import materialize

    k, m = _LTTB_K, _LTTB_K - 2
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hb")).agg(
        round4(F.avg("value")).alias("y")
    )
    base = hourly.agg(
        F.min("hb").alias("h0"), F.count(F.lit(1)).alias("n")
    )
    wrk = Window.partitionBy(F.unix_timestamp("hb") % F.lit(1)).orderBy("hb")
    ranked = (
        hourly.crossJoin(F.broadcast(base))
        .select(
            epoch_ms(F.col("hb")).alias("x_ms"),
            (
                (
                    F.unix_timestamp("hb") - F.unix_timestamp("h0")
                ).cast("double")
                / 3600.0
            ).alias("xr"),
            "y",
            F.row_number().over(wrk).alias("rn"),
            "n",
        )
    )
    ranked = materialize(ranked, "lttb_ranked")
    pfirst = ranked.where(F.col("rn") == 1).select("x_ms", "xr", "y")
    plast = ranked.where(F.col("rn") == F.col("n")).select(
        "x_ms", "xr", "y"
    )
    mid = ranked.where(
        (F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 1)
    ).select(
        "x_ms",
        "xr",
        "y",
        "rn",
        F.floor((F.col("rn") - 2) * float(m) / (F.col("n") - 2))
        .cast("long")
        .alias("b"),
    )
    mid = materialize(mid, "lttb_mid")
    avgs = mid.groupBy("b").agg(
        round4(F.avg("xr")).alias("ax"), round4(F.avg("y")).alias("ay")
    )
    nxt = (
        avgs.where(F.col("b") >= 1)
        .select((F.col("b") - 1).alias("nb"), "ax", "ay")
        .unionByName(
            plast.select(
                F.lit(m - 1).alias("nb"),
                F.col("xr").alias("ax"),
                F.col("y").alias("ay"),
            )
        )
    )
    nxt = materialize(nxt, "lttb_nxt")
    area = F.abs(
        (F.col("px") - F.col("ax")) * (F.col("y") - F.col("py"))
        - (F.col("px") - F.col("xr")) * (F.col("ay") - F.col("py"))
    )
    prev = pfirst
    picks = [pfirst.select(F.lit(0).alias("sel_idx"), "x_ms", "y")]
    for b in range(m):
        p = prev.select(F.col("xr").alias("px"), F.col("y").alias("py"))
        nb = nxt.where(F.col("nb") == b).select("ax", "ay")
        sel = materialize(
            mid.where(F.col("b") == b)
            .crossJoin(F.broadcast(p))
            .crossJoin(F.broadcast(nb))
            .orderBy(round4(area).desc(), "rn")
            .limit(1)
            .select("x_ms", "xr", "y"),
            f"lttb_sel_{b}",
        )
        picks.append(sel.select(F.lit(b + 1).alias("sel_idx"), "x_ms", "y"))
        prev = sel
    picks.append(plast.select(F.lit(k - 1).alias("sel_idx"), "x_ms", "y"))
    out = picks[0]
    for pc in picks[1:]:
        out = out.unionByName(pc)
    return out.select(
        F.col("sel_idx").cast("long").alias("sel_idx"),
        "x_ms",
        F.col("y").alias("y_val"),
    ).orderBy("sel_idx")
