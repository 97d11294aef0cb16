"""Incremental rollup maintenance — the SummingMergeTree / materialized-
view analog.

ClickHouse's signature pattern for this pipeline's workload is a
MergeTree rollup: every INSERT creates a *part* holding partial
aggregates per key, background merges fold parts together, and SELECT
finishes the fold (`consumer/clickhouse/init-db.sh:20-36` declares the
MergeTree table the reference streams into; Summing/AggregatingMergeTree
is how its users pre-aggregate it). The Spark-first translation keeps all
three phases shuffle-minimal:

- **insert** (`rollup_sink` / `append_partials`): each micro-batch is
  aggregated map-side to one partial row per (key, batch) and APPENDED as
  a new parquet part — no read-modify-write, no streaming state, no
  update-mode shuffle of the whole table. Commutative+associative
  measures only (sum/count/min/max) — exactly SummingMergeTree's
  contract.
- **merge** (`compact_rollup`): folds all parts into one row per key —
  the background OPTIMIZE. Idempotent; throughput-only (reads stay
  correct without it).
- **read** (`read_rollup`): groupBy(keys) + sum/min/max of the partials
  finishes the fold. Cost scales with #parts × #keys, not raw events —
  run `compact_rollup` on whatever cadence keeps #parts bounded.

At-least-once note: replayed batches would double-count partials; reuse
the batch-ledger pattern (streaming/pipeline.foreach_batch_writer) or a
`batch_id` column + dedup-on-read when the source can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_MEASURES = ("sum_value", "n_events", "min_value", "max_value")


def partial_aggregate(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One partial-aggregate row per key for this slice of rows."""
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def _fold(df: DataFrame, keys: list[str]) -> DataFrame:
    """Fold partial rows (associative merge — identical at every level)."""
    return df.groupBy(*keys).agg(
        F.sum("sum_value").alias("sum_value"),
        F.sum("n_events").alias("n_events"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def rollup_sink(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the rollup from a stream: one appended part per batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partial_aggregate(batch_df, keys, value_col).write.mode("append").parquet(
            table_path
        )

    writer = stream.writeStream.foreachBatch(write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, table_path: str, keys: list[str]) -> DataFrame:
    """Finish the fold at read time (SELECT over SummingMergeTree)."""
    return _fold(spark.read.parquet(table_path), keys)


def compact_rollup(
    spark: SparkSession, table_path: str, keys: list[str], partitions: int = 1
) -> None:
    """Background-merge analog: rewrite all parts as one folded part.

    Reads must never observe a half-written table, so fold to a temp
    location first and swap via overwrite of the final path.
    """
    folded = _fold(spark.read.parquet(table_path), keys).repartition(partitions)
    tmp = table_path.rstrip("/") + "__compacting"
    folded.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_path)
