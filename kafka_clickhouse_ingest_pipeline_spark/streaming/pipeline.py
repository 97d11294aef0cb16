"""The reference's streaming ETL path as one Structured Streaming query
(SURVEY.md §2 tier A, §3.2).

Reference dataflow (consumer2, /root/reference/consumer2/src/main/kotlin/
com/yourcompany/kafka/clickhouse/):

  KafkaConsumer.poll → buffer (100 msgs / 5 s)   KafkaMessageConsumer.kt:30-83
  → lenient typed parse, drop-bad               processing/MessageProcessor.kt:22-46
  → batched JDBC INSERT                          persistence/ClickHouseRepository.kt:55-97
  → commit offsets only after successful write   KafkaMessageConsumer.kt:93-129

Spark mapping: each micro-batch IS the reference's hand-rolled
size-or-time buffer (A8); checkpointing replaces group-offset commits and
gives the same at-least-once contract (A15) — a failed batch is replayed,
and like the reference, replays can duplicate rows in the sink. The
optional `dedupe_replays` flag upgrades to effectively-once by dropping
batch-ids that already committed (the §4 "custom work #1" improvement the
reference lacks).

The transform chain reuses the batch operators (operators/ingest.py)
verbatim — one definition of the semantics for both execution modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators import ingest
from ..plans.layout import write_clustered

# Config parity with the reference (BASELINE.md):
MAX_OFFSETS_PER_TRIGGER = 100  # max.poll.records=100, KafkaMessageConsumer.kt:41
TRIGGER_INTERVAL = "5 seconds"  # size-or-time flush, KafkaMessageConsumer.kt:30-31
KAFKA_TOPIC = "ingest-topic"  # docker-compose.yml:46


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str = KAFKA_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """A7: the Kafka source (auto.offset.reset=earliest parity).

    Offsets live in the checkpoint, not the consumer group — Spark's
    equivalent of enable.auto.commit=false + manual commit-after-write.
    Requires the spark-sql-kafka package on the classpath; tests use
    :func:`file_source` (same downstream contract: a `value` column).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(MAX_OFFSETS_PER_TRIGGER))
        .load()
    )


def file_source(spark: SparkSession, path: str) -> DataFrame:
    """CI stand-in for the Kafka topic: a directory of text files, one JSON
    payload per line, surfaced with the same `value` column contract."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(path)
        .withColumnRenamed("value", "value")
    )


def ingest_transform(
    raw: DataFrame,
    schema: StructType = ingest.INGESTED_DATA_SCHEMA,
) -> DataFrame:
    """A2/A3/A9/A12/A13: the per-record pipeline, identical to batch mode."""
    df = ingest.filter_nonempty(raw, "value")
    df = ingest.parse_typed(df, "value", schema=schema, keep_raw=True)
    return ingest.enrich_received_at(df)


def foreach_batch_writer(
    out_path: str,
    dedupe_replays: bool = False,
):
    """A14/A15: the micro-batch sink.

    Append-mode parquet write laid out per the MergeTree DDL analog
    (plans/layout.py). With ``dedupe_replays`` the batch id is recorded in a
    ledger directory and re-delivered batches are skipped — idempotent
    writes on top of at-least-once delivery.
    """
    ledger = os.path.join(out_path, "_batch_ledger")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if dedupe_replays:
            marker = os.path.join(ledger, f"{batch_id}.done")
            if os.path.exists(marker):
                return
        write_clustered(
            batch_df,
            os.path.join(out_path, "data"),
            cluster_cols=("sensorId",),
            mode="append",
        )
        if dedupe_replays:
            os.makedirs(ledger, exist_ok=True)
            with open(os.path.join(ledger, f"{batch_id}.done"), "w") as fh:
                fh.write("")

    return write


def run_pipeline(
    source: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = False,
    dedupe_replays: bool = False,
) -> StreamingQuery:
    """Wire source → transforms → sink with the reference's trigger cadence.

    ``available_now=True`` drains everything currently available and stops —
    the test-mode replacement for the 5 s wall-clock trigger.
    """
    transformed = ingest_transform(source)
    writer = transformed.writeStream.foreachBatch(
        foreach_batch_writer(out_path, dedupe_replays=dedupe_replays)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=TRIGGER_INTERVAL)
    return writer.start()


def streaming_dedup(
    events: DataFrame, watermark: str = "1 hour", keys: list[str] | None = None
) -> DataFrame:
    """C9 streaming: exact dedup with bounded state.

    The watermark bounds how long a key is remembered — the streaming
    version of the batch groupBy-digest dedup; state size is
    O(keys-per-watermark-window), not O(stream).
    """
    return events.withWatermark("ts", watermark).dropDuplicates(
        keys or ["user_id", "event_type", "ts"]
    )


def kafka_sink_options(brokers: str, topic: str = KAFKA_TOPIC) -> dict[str, str]:
    """A6: the producer side (publisher/internal/kafka/publisher.go:34-49).

    Parity mapping — batching 100 msgs / 1 s, leader-only acks, async:
    kafka-go `BatchSize/BatchTimeout/RequiredAcks` become the producer's
    `batch.size/linger.ms/acks`. Spark's Kafka sink is naturally async
    within a task (librdkafka-style buffering in the Java producer), and
    like the reference's 202-before-ack trade-off, rows are acked to the
    query only at task completion.
    """
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.acks": "1",  # RequireOne, publisher.go:40
        "kafka.linger.ms": "1000",  # BatchTimeout 1s, publisher.go:46
        "kafka.batch.size": str(100 * 1024),  # ~100 msgs, publisher.go:45
    }


def write_to_kafka(df: DataFrame, brokers: str, topic: str = KAFKA_TOPIC):
    """Publish a DataFrame's `value` column (optionally `key`) to Kafka —
    the publisher's Publish(ctx, key, value) as a batch/stream write.
    Keyless messages (nil key, handler.go:81) are the default: omit `key`
    and the partitioner round-robins like kafka-go LeastBytes."""
    cols = [F.col("value").cast("string").alias("value")]
    if "key" in df.columns:
        cols.insert(0, F.col("key").cast("string").alias("key"))
    out = df.select(*cols)
    writer = out.write.format("kafka")
    for k, v in kafka_sink_options(brokers, topic).items():
        writer = writer.option(k, v)
    writer.save()
