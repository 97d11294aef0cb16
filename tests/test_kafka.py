"""Kafka smoke parity (SURVEY.md §2 A6/A7; VERDICT #6).

The sandbox ships no spark-sql-kafka package and no broker, so these tests
probe exactly what the environment allows and skip — visibly, with the
reason — past what it doesn't:

- package probe: does `format("kafka")` resolve at all?
- plan build: with the package present, `kafka_source` / `write_to_kafka`
  must produce analyzable plans WITHOUT a broker (Spark contacts Kafka at
  execution, not analysis).
- broker round-trip: gated behind KAFKA_TEST_BROKERS, runs only where a
  real broker exists.
"""

from __future__ import annotations

import os

import pytest

from kafka_clickhouse_ingest_pipeline_spark.streaming import pipeline as P


def _kafka_package_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9099"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg:
            return False
        # any other analysis error means the source class resolved
        return True


def test_kafka_source_builds_plan_or_skips(spark):
    if not _kafka_package_available(spark):
        pytest.skip(
            "spark-sql-kafka package not on classpath (no network in "
            "sandbox); kafka_source is config-parity-tested in test_sinks"
        )
    df = P.kafka_source(spark, brokers="localhost:9099")
    # analysis needs no broker: schema is the fixed Kafka source schema
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
    assert df.isStreaming


def test_kafka_sink_options_parity():
    """A6 producer parity holds with or without the classpath jar
    (publisher/internal/kafka/publisher.go:34-49)."""
    opts = P.kafka_sink_options("b:9092")
    assert opts["kafka.acks"] == "1"  # RequireOne, publisher.go:40
    assert opts["kafka.linger.ms"] == "1000"  # BatchTimeout 1s, publisher.go:46
    assert opts["topic"] == P.KAFKA_TOPIC


@pytest.mark.skipif(
    "KAFKA_TEST_BROKERS" not in os.environ,
    reason="set KAFKA_TEST_BROKERS=host:port to run the broker round-trip",
)
def test_kafka_round_trip(spark, tmp_path):
    """Publish a payload and stream it back through the full pipeline."""
    brokers = os.environ["KAFKA_TEST_BROKERS"]
    payload = spark.createDataFrame(
        [('{"sensorId": "rt1", "temperature": 1.5}',)], "value string"
    )
    P.write_to_kafka(payload, brokers=brokers)
    q = P.run_pipeline(
        P.kafka_source(spark, brokers=brokers),
        out_path=str(tmp_path / "kout"),
        checkpoint=str(tmp_path / "kckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "kout" / "data"))
    assert got.where("sensorId = 'rt1'").count() == 1


def test_kafka_reader_options_parity():
    """A7 consumer parity holds with or without the classpath jar
    (VERDICT r2 #8): the options dict the source is BUILT from is value-
    checked directly, so config drift can't hide behind the package
    skip. BASELINE.md: earliest offsets, max.poll.records=100."""
    opts = P.kafka_reader_options("b:9092")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "ingest-topic",  # docker-compose.yml:46
        "startingOffsets": "earliest",  # KafkaConsumerConfig.kt:43
        "maxOffsetsPerTrigger": "100",  # KafkaMessageConsumer.kt:41
    }


def test_kafka_sink_options_full_parity():
    """A6 producer parity, complete dict: batching 100 msgs / 1 s,
    leader-only acks (publisher.go:34-49)."""
    assert P.kafka_sink_options("b:9092") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "ingest-topic",
        "kafka.acks": "1",  # RequireOne, publisher.go:40
        "kafka.linger.ms": "1000",  # BatchTimeout 1s, publisher.go:46
        "kafka.batch.size": str(100 * 1024),  # ~100 msgs, publisher.go:45
    }


def test_retry_schedule_matches_spring_default_error_handler(
    spark, tmp_path, monkeypatch
):
    """VERDICT r2 #9: the bounded-retry writer reproduces the stock
    Spring DefaultErrorHandler schedule — FixedBackOff(interval, N):
    original delivery + N redeliveries (each preceded by the interval),
    then the recoverer (dead-letter) swallows the batch. Drive the
    foreachBatch writer directly with an always-failing sink and record
    the sleep schedule."""
    import types

    from kafka_clickhouse_ingest_pipeline_spark.streaming import pipeline as pl

    # Spring defaults: FixedBackOff(0ms, 9 retries) -> 10 attempts
    assert pl.DEFAULT_MAX_RETRIES == 9
    assert pl.DEFAULT_RETRY_BACKOFF_MS == 0

    sleeps: list[float] = []
    # rebind the module-level `time` name inside pipeline only — patching
    # the real time.sleep would record Spark's own background sleeps
    monkeypatch.setattr(
        pl,
        "time",
        types.SimpleNamespace(sleep=lambda s: sleeps.append(round(s, 3))),
    )

    def boom(*a, **k):
        raise IOError("sink down")

    monkeypatch.setattr(pl, "write_clustered", boom)
    out = str(tmp_path / "retry_out")
    write = pl.foreach_batch_writer(
        out, max_retries=2, retry_backoff_ms=250
    )
    batch = spark.createDataFrame([("s1", 1.0)], "sensorId string, value double")

    failures = 0
    for _ in range(4):  # deliveries: original + 2 retries + recoverer
        try:
            write(batch, 0)
        except IOError:
            failures += 1
    assert failures == 3  # attempts 1-3 raise (1 original + 2 redeliveries)
    assert sleeps == [0.25, 0.25]  # backoff before each REdelivery only
    # 4th delivery: budget exhausted -> whole batch to dead_letter, no raise
    dl = spark.read.parquet(os.path.join(out, "dead_letter"))
    assert dl.count() == 1
