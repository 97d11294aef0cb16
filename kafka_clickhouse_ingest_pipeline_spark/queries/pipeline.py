"""Tier-A queries: the reference's ingest dataflow replayed in batch mode.

The `events` table stands in for the Kafka topic (FIXTURES.md §4): `props`
is the raw JSON payload, `user_id` the API-key analog, `ts` the event time.
Every query here exercises an operator from SURVEY.md §2 tier A against the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.temporal import epoch_ms
from ..operators import ingest
from ..plans import layout as ZL
from ..registry import query
from ..tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "pipeline_flagship",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      ROUND(SUM(value), 4) AS sum_value,
      ROUND(AVG(value), 4) AS avg_value,
      ROUND(AVG(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
    FROM events
    WHERE props IS NOT NULL AND json_valid(props)
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="End-to-end pipeline slice: validate -> parse -> project -> "
    "aggregate -> sort (SURVEY.md §7 step 1).",
)
def pipeline_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ev = ingest.filter_nonempty(ev, "props")  # A2
    ev = ingest.json_validity_gate(ev, "props")  # A3
    # A9-lenient parse + A11 projection of the one real payload field.
    # Carrying the gate's parsed variant through the aggregate was probed
    # both ways (r12): on these event-sized payloads the extra
    # get_json_object re-parse is CHEAPER than materializing the variant
    # column (interleaved quiet-box A/B 0.78-0.86 s vs 1.07-1.66 s), so
    # the gate drops its parse and k re-extracts; value-identical — both
    # paths yield the field's text then cast (oracle-pinned).
    ev = ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    # Final sort without a range exchange (r13, guide §2.4): one row per
    # event_type — a domain-bounded enum at ANY corpus size (interleaved
    # A/B/A: 0.78/0.65 -> 0.66/0.56, one bounds-sampling job off the
    # floor; invariant documented on plans/layout.bounded_sort).
    return ZL.bounded_sort(
        ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        ),
        "event_type",
    )


@query(
    "ingest_parse_project",
    oracle="""
    SELECT
      event_id,
      TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      json_extract_string(props, '$.missing_field') AS missing_field
    FROM events
    """,
    description="A9/A11: lenient from_json — unknown keys ignored, missing "
    "keys null (MessageProcessor.kt:22, IngestedData.kt:7-16).",
)
def ingest_parse_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k int, missing_field string")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.getField("missing_field").alias("missing_field"),
    )


@query(
    "ingest_validity_gate",
    oracle="""
    WITH corrupted AS (
      SELECT CASE WHEN event_id % 10 = 0 THEN '{' || props ELSE props END AS payload
      FROM events
    )
    SELECT
      COUNT(*) AS total,
      CAST(SUM(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END) AS BIGINT) AS valid,
      CAST(SUM(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT) AS invalid
    FROM corrupted
    """,
    description="A3/A16: malformed payloads are counted and dropped, never "
    "fail the batch (handler.go:74-78, MessageProcessor.kt:33-52). A tenth "
    "of payloads are synthetically corrupted to exercise the gate.",
)
def ingest_validity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # NB: corruption must be a *prefix* — Spark's try_parse_json stops at the
    # first complete JSON document and tolerates trailing garbage, DuckDB's
    # json_valid does not.
    payload = F.when(
        F.col("event_id") % 10 == 0, F.concat(F.lit("{"), F.col("props"))
    ).otherwise(F.col("props"))
    valid = F.try_parse_json(payload).isNotNull()
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("valid"),
        F.sum(F.when(valid, 0).otherwise(1)).alias("invalid"),
    )


@query(
    "ingest_dynamic_map_parse",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_text
    FROM events
    WHERE json_valid(props)
    """,
    description="A10: schema-free map<string,string> parse "
    "(ClickHouseWriterService.kt:78-87).",
)
def ingest_dynamic_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    parsed = ingest.parse_dynamic(ev, "props")
    return parsed.select(
        "event_id", F.col("_map").getItem("k").alias("k_text")
    )


@query(
    "auth_semi_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE e.user_id IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
    )
    """,
    description="A4/A5: API-key auth gate = broadcast left-semi join against "
    "the active-keys dimension (auth.go:38; customer stands in for api_keys, "
    "c_acctbal>0 for is_active).",
)
def auth_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "is_active", F.col("c_acctbal") > 0
    )
    gated = ingest.auth_gate(
        ev, cust, event_key="user_id", dim_key="c_custkey", active_col="is_active"
    )
    return gated.select("event_id", "user_id", "event_type")


@query(
    "auth_anti_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE e.user_id NOT IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
    )
    """,
    description="A4 reject path (401): left-anti join complement "
    "(handler.go:41-56).",
)
def auth_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "is_active", F.col("c_acctbal") > 0
    )
    rejected = ingest.auth_rejects(
        ev, cust, event_key="user_id", dim_key="c_custkey", active_col="is_active"
    )
    return rejected.select("event_id", "user_id", "event_type")


@query(
    "ingest_projection_enrich",
    oracle="""
    SELECT
      event_id,
      event_type AS sensor_id,
      value AS temperature,
      CAST(epoch_us(ts) // 1000 AS BIGINT) AS ts_ms,
      props AS _raw_data
    FROM events
    """,
    description="A11/A12/A13: fixed-list projection + raw-payload retention "
    "(received_at enrichment excluded from oracle output because now() is "
    "nondeterministic; see test_ingest.py for its unit test).",
)
def ingest_projection_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = ev.select(
        "event_id",
        F.col("event_type").alias("sensor_id"),
        F.col("value").alias("temperature"),
        epoch_ms("ts").alias("ts_ms"),
        F.col("props").alias("_raw_data"),
    )
    # A12 enrichment happens here in the real sink path; dropped from the
    # comparable output because current_timestamp() can't hash-match.
    return out


# --- ops dashboard over a COMMITTED soak run (VERDICT r8 #7) ---------------
# tools/soak.py drives the full HTTP->spool->two-sink pipeline under load
# with a mid-run crash injection; its per-batch metrics JSONL and the
# parquet sink output are committed as fixtures so the ops story is
# oracle-checkable like the dedup/retrieval dashboards. The fixtures are
# REAL soak output (not synthesized): tests/fixtures/soak_metrics.jsonl +
# soak_sink.parquet from a --short run whose summary recorded
# injected_crash_fired=true and 300 observed replay rows.
import os as _os

_FIXTURES = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)
_SOAK_METRICS = _os.path.join(_FIXTURES, "soak_metrics.jsonl")
_SOAK_SINK = _os.path.join(_FIXTURES, "soak_sink.parquet")

_SOAK_METRICS_SCHEMA = (
    "query_id string, batch_id long, num_input_rows long, "
    "processed_rows_per_sec double, duration_ms long"
)


@query(
    "pipeline_throughput_profile",
    oracle=f"""
    WITH m AS (
      SELECT query_id, batch_id, num_input_rows, duration_ms
      FROM read_json('{_SOAK_METRICS}', columns={{
        'query_id': 'VARCHAR', 'batch_id': 'BIGINT',
        'num_input_rows': 'BIGINT',
        'processed_rows_per_sec': 'DOUBLE', 'duration_ms': 'BIGINT'}})
      WHERE duration_ms IS NOT NULL
    ),
    ranked AS (
      SELECT query_id, num_input_rows, duration_ms,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY duration_ms, batch_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY query_id) AS n
      FROM m
    ),
    prof AS (
      SELECT query_id,
             CAST(MAX(n) AS BIGINT) AS n_batches,
             CAST(SUM(num_input_rows) AS BIGINT) AS total_rows,
             (FLOOR((SUM(num_input_rows) * 1.0 / MAX(n))
                    * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS rows_per_batch_avg,
             CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT)
                           THEN duration_ms END) AS BIGINT) AS p50_ms,
             CAST(MAX(CASE WHEN rn = CAST(CEIL(n * 0.95) AS BIGINT)
                           THEN duration_ms END) AS BIGINT) AS p95_ms
      FROM ranked GROUP BY query_id
    ),
    sink AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS sink_rows,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS sink_distinct,
             CAST(COUNT(*) - COUNT(DISTINCT value) AS BIGINT)
               AS sink_replay_dupes
      FROM '{_SOAK_SINK}'
    )
    SELECT prof.*, sink.* FROM prof CROSS JOIN sink
    ORDER BY query_id
    """,
    description="Ops dashboard (VERDICT r8 #7): throughput profile of a "
    "COMMITTED soak run — per streaming query: batch count, total rows, "
    "rows/batch, p50/p95 trigger-execution ms (exact ceil-rank order "
    "statistics, engine-portable unlike interpolated percentiles); plus "
    "the sink-level at-least-once evidence (rows vs distinct payloads = "
    "observed replay duplicates after the injected mid-run crash). The "
    "fixtures are real tools/soak.py output; the oracle recomputes the "
    "profile from the same files, so the dashboard arithmetic is "
    "hash-gated like every other query. sf_dir is unused by design: the "
    "subject is the committed run, identical at every SF.",
)
def pipeline_throughput_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import round4 as _round4

    m = (
        spark.read.schema(_SOAK_METRICS_SCHEMA)
        .json(_SOAK_METRICS)
        .where(F.col("duration_ms").isNotNull())
    )
    w_rank = Window.partitionBy("query_id").orderBy("duration_ms", "batch_id")
    w_all = Window.partitionBy("query_id")
    ranked = m.select(
        "query_id",
        "num_input_rows",
        "duration_ms",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    prof = ranked.groupBy("query_id").agg(
        F.max("n").cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("total_rows"),
        _round4(F.sum("num_input_rows") * 1.0 / F.max("n")).alias(
            "rows_per_batch_avg"
        ),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.5).cast("long"),
                F.col("duration_ms"),
            )
        )
        .cast("long")
        .alias("p50_ms"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.95).cast("long"),
                F.col("duration_ms"),
            )
        )
        .cast("long")
        .alias("p95_ms"),
    )
    sink = spark.read.parquet(_SOAK_SINK).agg(
        F.count(F.lit(1)).cast("long").alias("sink_rows"),
        F.countDistinct("value").cast("long").alias("sink_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("value"))
        .cast("long")
        .alias("sink_replay_dupes"),
    )
    return prof.crossJoin(F.broadcast(sink)).orderBy("query_id")
