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


def test_dynamic_partition_overwrite_backfills_one_month(spark, sf_dir, tmp_path):
    """B8 at scale: a backfill rewrites ONLY the partitions it touches.
    With partitionOverwriteMode=dynamic, overwriting a single yyyymm's
    corrected rows replaces that directory and leaves every other
    month's files physically untouched — the idempotent
    partition-rewrite loop a 100 TB table depends on (static overwrite
    would truncate the whole table)."""
    import os

    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    out = str(tmp_path / "events_by_day")
    # daily grain: the sf0.001 stream spans one month, so yyyymm gives a
    # single partition; the mechanism under test is identical
    ev = load_table(spark, sf_dir, "events").withColumn(
        "yyyymm", F.date_format("ts", "yyyyMMdd")
    )
    ev.write.partitionBy("yyyymm").parquet(out)

    months = sorted(
        e.split("=")[1] for e in os.listdir(out) if e.startswith("yyyymm=")
    )
    assert len(months) >= 2
    target, untouched = months[0], months[1:]

    def mtimes(month):
        d = os.path.join(out, f"yyyymm={month}")
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    before = {m: mtimes(m) for m in untouched}
    n_target_before = (
        spark.read.parquet(out).where(F.col("yyyymm") == target).count()
    )

    corrected = ev.where(F.col("yyyymm") == target).withColumn(
        "value", F.col("value") * 2
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        corrected.write.mode("overwrite").partitionBy("yyyymm").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    after = spark.read.parquet(out)
    # the other months' files are byte-stable (same names, same mtimes)
    for m in untouched:
        assert mtimes(m) == before[m], f"partition {m} was rewritten"
    # the target month was replaced, same row count, doubled values
    assert after.where(F.col("yyyymm") == target).count() == n_target_before
    total = load_table(spark, sf_dir, "events").count()
    assert after.count() == total
