"""Sink configuration parity tests (A6/A14) + clustered write layout (B7/B8)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.plans.layout import write_clustered
from kafka_clickhouse_ingest_pipeline_spark.sources.jdbc import (
    JDBC_BATCH_SIZE,
    jdbc_writer_options,
)
from kafka_clickhouse_ingest_pipeline_spark.streaming.pipeline import (
    kafka_sink_options,
)
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def test_jdbc_options_match_reference_config():
    opts = jdbc_writer_options("jdbc:clickhouse://ch:8123/db", "ingest_data")
    # application.yml:53 batch 100; :42 pool max 10
    assert opts["batchsize"] == str(JDBC_BATCH_SIZE) == "100"
    assert opts["numPartitions"] == "10"
    assert opts["isolationLevel"] == "NONE"


def test_kafka_sink_options_match_reference_config():
    opts = kafka_sink_options("broker:9092")
    assert opts["kafka.acks"] == "1"          # RequireOne, publisher.go:40
    assert opts["kafka.linger.ms"] == "1000"  # BatchTimeout 1s, publisher.go:46
    assert opts["topic"] == "ingest-topic"    # docker-compose.yml:46


def test_clustered_write_layout(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "clustered")
    write_clustered(
        ev, out, cluster_cols=("event_type",), partition_ts_col="ts"
    )
    # toYYYYMM directory partitions exist (init-db.sh:35 analog)
    parts = [d for d in os.listdir(out) if d.startswith("yyyymm=")]
    assert parts, "expected yyyymm= partition directories"
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: a yyyymm predicate scans a subset of partitions
    pruned = back.where(F.col("yyyymm") == parts[0].split("=")[1])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yyyymm" in plan


def test_kafka_source_fails_cleanly_without_connector(spark):
    """This environment ships no spark-sql-kafka jar; the source must fail
    with the standard 'Failed to find data source' guidance, not something
    cryptic (the file_source stand-in covers CI)."""
    import pytest as _pytest

    from kafka_clickhouse_ingest_pipeline_spark.streaming.pipeline import (
        kafka_source,
    )

    with _pytest.raises(Exception, match="Failed to find data source: kafka"):
        kafka_source(spark, "localhost:9092")
