"""Write-layout discipline: the MergeTree storage model re-expressed as
parquet layout (SURVEY.md §2 B7/B8, §4).

ClickHouse DDL in the reference:
  ENGINE = MergeTree() ORDER BY (sensor_id, timestamp)   init-db.sh:34
  -- PARTITION BY toYYYYMM(timestamp)                    init-db.sh:35 (opt)
  SETTINGS index_granularity = 8192                      init-db.sh:36

Parquet equivalents:
- clustered sort key  → repartition(cluster_cols) + sortWithinPartitions:
  co-locates each key's rows and makes parquet row-group min/max stats
  selective — the data-skipping analog of the sparse primary index.
- monthly partitions  → partitionBy(yyyymm): Catalyst prunes whole
  directories for time-range predicates.
- index granularity   → parquet row-group size (config, not code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_yyyymm(df: DataFrame, ts_col: str, out_col: str = "yyyymm") -> DataFrame:
    """The toYYYYMM(timestamp) partition key (init-db.sh:35)."""
    return df.withColumn(out_col, F.date_format(F.col(ts_col), "yyyyMM"))


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    partition_ts_col: str | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Write with MergeTree-equivalent layout.

    At 100 TB the repartition count is the knob that sets file sizes;
    callers pass `target_partitions` ≈ bytes / 512 MB. Sorting happens
    within partitions only — no global sort, no range exchange.
    """
    out = df
    partition_cols: list[str] = []
    if partition_ts_col:
        out = with_yyyymm(out, partition_ts_col)
        partition_cols = ["yyyymm"]

    keys = [F.col(c) for c in (*partition_cols, *cluster_cols)]
    if target_partitions:
        out = out.repartition(target_partitions, *keys)
    elif keys:
        out = out.repartition(*keys)
    out = out.sortWithinPartitions(*(*partition_cols, *cluster_cols))

    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
