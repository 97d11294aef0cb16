"""Small-file compaction — the maintenance operator every streaming sink
needs (the ClickHouse analog is the MergeTree background merge itself).

A 5-second micro-batch trigger (streaming/pipeline.py) writes one small
parquet file per partition per batch; after a day that's tens of
thousands of tiny files and the scan planner drowns in footers. Compaction
rewrites a table directory into ~target-sized files, preserving the
clustered sort layout (plans/layout.py) so data skipping keeps working.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 512 * 1024 * 1024  # cluster default; tests use tiny targets


def dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of parquet data files under path."""
    n = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession,
    path: str,
    cluster_cols: tuple[str, ...] = (),
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> tuple[int, int]:
    """Rewrite `path` into ceil(total/target) files, re-sorted on the
    cluster key. Returns (files_before, files_after).

    Rewrite goes through a temp dir + atomic-ish swap: readers racing the
    compaction see either the old or the new file set, never a partial
    mix. (A table format — Delta/Iceberg — does this transactionally; this
    is the plain-parquet equivalent.)
    """
    before, total = dir_stats(path)
    n_out = max(1, -(-total // target_file_bytes))

    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(n_out, *[F.col(c) for c in cluster_cols]) if cluster_cols \
        else df.repartition(n_out)
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)

    tmp = path.rstrip("/") + "._compacting"
    out.write.mode("overwrite").parquet(tmp)

    import shutil

    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    after, _ = dir_stats(path)
    return before, after
