"""TTL data expiry — the MergeTree `TTL timestamp + INTERVAL n` analog.

ClickHouse tables commonly pair the reference's MergeTree DDL
(consumer/clickhouse/init-db.sh:20-36) with a TTL clause so the ingest
store forgets old events without manual DELETEs. On a time-partitioned
parquet table (plans/layout.py yyyymm, or any zero-padded time format)
the same contract decomposes into two very different costs:

- **whole expired partitions** — time buckets strictly older than the
  cutoff bucket — are dropped by deleting the directory: a metadata/
  filesystem operation that never reads a row, exactly like ClickHouse
  dropping expired parts. At 100 TB this is the only acceptable form
  for the bulk of expiry.
- **the boundary bucket** (contains the cutoff instant) is the only
  data that needs a rewrite: read just that partition, keep rows >=
  cutoff, rewrite it. Cost is one bucket of data, not the table.

Rows newer than the cutoff are never touched, read, or rewritten.
Zero-padded time formats (yyyyMM, yyyyMMdd) make bucket comparison a
plain string compare.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F



def expired_partitions(
    path: str, cutoff_bucket: str, partition_col: str = "yyyymm"
) -> list[str]:
    """Partition dirs strictly older than the cutoff bucket."""
    prefix = f"{partition_col}="
    out = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith(prefix) and entry.split("=", 1)[1] < cutoff_bucket:
            out.append(entry)
    return out


def _recover_interrupted_swap(
    path: str, partition_col: str, cutoff_bucket: str
) -> None:
    """Heal a crash inside apply_ttl's rename window — for EVERY bucket.

    The rewrite sequence is: write ``_ttl_tmp_*`` → rename boundary →
    ``_ttl_trash_*`` → rename tmp → boundary → rmtree trash. A crash
    between the two renames leaves NO live boundary dir — the filtered
    data sits complete in tmp and the old data in trash. Roll the swap
    forward (tmp has the full post-TTL partition) when tmp exists, else
    roll back from trash; finally drop whichever leftovers remain.

    Recovery scans for any ``_ttl_tmp_*`` / ``_ttl_trash_*`` sibling, not
    just the current cutoff's: yesterday's run may have crashed on
    yesterday's (different) boundary bucket, and healing only today's
    would leave that partition's live rows invisible in trash forever.
    Idempotent: a healthy tree (live boundary, no siblings) is untouched.
    """
    buckets = set()
    for entry in os.listdir(path):
        for prefix in ("_ttl_tmp_", "_ttl_trash_"):
            if entry.startswith(prefix):
                buckets.add(entry[len(prefix):])
    buckets.add(cutoff_bucket)
    for bucket in sorted(buckets):
        live = os.path.join(path, f"{partition_col}={bucket}")
        tmp = os.path.join(path, f"_ttl_tmp_{bucket}")
        trash = os.path.join(path, f"_ttl_trash_{bucket}")
        if not os.path.isdir(live):
            if os.path.isdir(tmp):
                os.rename(tmp, live)  # roll forward: tmp is complete
            elif os.path.isdir(trash):
                os.rename(trash, live)  # roll back: rewrite never landed
        # Leftover siblings (crash after a completed swap, or stale trash
        # alongside a healthy boundary) are junk either way.
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)


def apply_ttl(
    spark: SparkSession,
    path: str,
    ts_col: str,
    cutoff_ts: str,
    cutoff_bucket: str,
    partition_col: str = "yyyymm",
) -> tuple[int, bool]:
    """Expire rows with ts < cutoff from a time-partitioned table.

    ``cutoff_bucket`` is the partition value containing ``cutoff_ts``
    (e.g. "202402" for yyyymm). Returns (n_partitions_dropped,
    boundary_rewritten). Directory drops for fully-expired buckets; one
    partition-local filter+rewrite for the boundary bucket. Everything
    newer is untouched.
    """
    dropped = 0
    for part in expired_partitions(path, cutoff_bucket, partition_col):
        shutil.rmtree(os.path.join(path, part))
        dropped += 1

    boundary_dir = os.path.join(path, f"{partition_col}={cutoff_bucket}")
    _recover_interrupted_swap(path, partition_col, cutoff_bucket)
    boundary_rewritten = False
    if os.path.isdir(boundary_dir):
        # The boundary partition may hold any of three physical timestamp
        # forms (TIMESTAMP(NANOS) read as long via the legacy fallback,
        # TIMESTAMP_NTZ, or plain TIMESTAMP). The rewrite must preserve
        # the NATIVE form — normalizing to TIMESTAMP here would leave ONE
        # partition with a different parquet type than its siblings, and
        # the next whole-table read dies on the type mismatch. So only
        # the cutoff literal converts, into whatever form the data has.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(boundary_dir)
        dtype = raw.schema[ts_col].dataType.simpleString()
        if dtype == "bigint":  # nanos-as-long: compare in epoch nanos
            cutoff_expr = (
                F.unix_micros(F.lit(cutoff_ts).cast("timestamp")) * 1000
            )
        elif dtype == "timestamp_ntz":
            cutoff_expr = F.lit(cutoff_ts).cast("timestamp_ntz")
        else:
            cutoff_expr = F.lit(cutoff_ts).cast("timestamp")
        kept = raw.where(F.col(ts_col) >= cutoff_expr)
        # '_'-prefixed siblings are invisible to Spark partition discovery
        # (and to expired_partitions above), so a concurrent reader never
        # sees the rewrite in flight. Order: write tmp outside the visible
        # namespace, swap old out, swap new in, then delete. A crash in
        # the swap window leaves the boundary dir missing under its real
        # name; _recover_interrupted_swap (run at entry) rolls the swap
        # forward from tmp, or back from trash, before any new work.
        tmp = os.path.join(path, f"_ttl_tmp_{cutoff_bucket}")
        trash = os.path.join(path, f"_ttl_trash_{cutoff_bucket}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        kept.write.mode("overwrite").parquet(tmp)
        os.rename(boundary_dir, trash)
        os.rename(tmp, boundary_dir)
        shutil.rmtree(trash)
        boundary_rewritten = True
    return dropped, boundary_rewritten
