"""SparkSession factory tuned for the analytics engine.

The reference pipeline (kh3dr0n/kafka-clickhouse-ingest-pipeline) has no
engine of its own — it delegates analytics to ClickHouse. Here the engine IS
Spark, so session-level configuration is where the 100 TB design choices
live:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing).
- Broadcast threshold generous enough that dimension tables (region, nation,
  customer at small SF, the api_keys auth table) always broadcast instead of
  shuffling the fact side.
- Arrow enabled so any unavoidable Python stage is batch-vectorized, never
  row-at-a-time.
- Shuffle partitions sized for the local[32] test harness; on a real cluster
  AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "kafka-clickhouse-ingest-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- runtime re-planning: partition coalescing, skew splits ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- joins: dimensions broadcast, never shuffle the fact table ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- shuffle sizing for local harness; AQE coalesces at runtime ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # --- Python<->JVM transfers are Arrow-batched ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- parquet: vectorized reads; timestamps kept in native unit ---
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata writes TIMESTAMP(NANOS) which Spark has no native type
        # for; read as epoch-nanos long, converted on load (tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # session timezone pinned: oracle comparisons are TZ-sensitive
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Variant-gate hook (ANSI / timezone hardening): semicolon-separated
    # k=v pairs applied LAST, so they override the defaults above. Lets
    # tools/check_correctness.py run the whole gate under e.g.
    # spark.sql.ansi.enabled=false or a non-UTC session timeZone without
    # touching call sites.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
