"""Compaction: many small files → few target-sized files, data preserved,
clustering layout restored."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.plans.compaction import compact, dir_stats
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def test_compact_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "frag")
    # simulate a micro-batch sink: 40 appends = 40+ tiny files
    for chunk in range(4):
        ev.where(F.col("event_id") % 4 == chunk).repartition(10).write.mode(
            "append"
        ).parquet(path)
    n_before, _ = dir_stats(path)
    assert n_before >= 40

    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg(F.sum("event_id")).first()[0]

    b, a = compact(spark, path, cluster_cols=("event_type",), target_file_bytes=10**9)
    assert b == n_before and a < n_before

    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.agg(F.sum("event_id")).first()[0] == before_sum


def test_compact_respects_target_size(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "sized")
    ev.repartition(30).write.parquet(path)
    _, total = dir_stats(path)
    target = max(total // 3, 1)
    _, after = compact(spark, path, target_file_bytes=target)
    # ceil(total/target) ≈ 3-4 files (parquet size varies post-rewrite)
    assert 2 <= after <= 6


def test_ttl_drops_old_partitions_and_rewrites_boundary(spark, sf_dir, tmp_path):
    from kafka_clickhouse_ingest_pipeline_spark.plans.retention import (
        apply_ttl,
        expired_partitions,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_ttl")
    ev.write.partitionBy("yyyymmdd").parquet(path)

    days = sorted(
        str(r["yyyymmdd"])
        for r in spark.read.parquet(path).select("yyyymmdd").distinct().collect()
    )
    assert len(days) >= 3, "need multiple day buckets to exercise TTL"
    # cutoff at noon inside the third day: days 1-2 fully expire,
    # day 3 is the boundary rewrite, later days untouched
    b = days[2]
    cutoff = f"{b[:4]}-{b[4:6]}-{b[6:]} 12:00:00"

    before = spark.read.parquet(path)
    expected = before.where(
        F.col("ts") >= F.lit(cutoff).cast("timestamp")
    ).count()

    assert expired_partitions(path, b, "yyyymmdd") == [
        f"yyyymmdd={d}" for d in days[:2]
    ]
    dropped, rewrote = apply_ttl(spark, path, "ts", cutoff, b, "yyyymmdd")
    assert dropped == 2 and rewrote

    after = spark.read.parquet(path)
    assert after.count() == expected
    assert after.where(F.col("ts") < F.lit(cutoff).cast("timestamp")).count() == 0
    kept_days = {
        str(r["yyyymmdd"]) for r in after.select("yyyymmdd").distinct().collect()
    }
    assert set(days[3:]).issubset(kept_days)


def test_ttl_recovers_from_crash_between_renames(spark, sf_dir, tmp_path):
    """A crash between `boundary → trash` and `tmp → boundary` leaves the
    boundary partition missing under its real name. The next apply_ttl
    run must roll the swap forward (tmp holds the complete post-TTL
    data) — never leave rows stranded invisible in _ttl_trash_*."""
    import os
    import shutil

    from kafka_clickhouse_ingest_pipeline_spark.plans.retention import apply_ttl

    ev = load_table(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_crash")
    ev.write.partitionBy("yyyymmdd").parquet(path)
    days = sorted(
        str(r["yyyymmdd"])
        for r in spark.read.parquet(path).select("yyyymmdd").distinct().collect()
    )
    b = days[2]
    cutoff = f"{b[:4]}-{b[4:6]}-{b[6:]} 12:00:00"
    expected = (
        spark.read.parquet(path)
        .where(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
        .count()
    )

    # Simulate the crash window: tmp fully written (here: a copy of the
    # boundary — recovery refilters it anyway), boundary renamed to trash,
    # second rename never happened.
    boundary = os.path.join(path, f"yyyymmdd={b}")
    shutil.copytree(boundary, os.path.join(path, f"_ttl_tmp_{b}"))
    os.rename(boundary, os.path.join(path, f"_ttl_trash_{b}"))
    assert not os.path.isdir(boundary)

    dropped, rewrote = apply_ttl(spark, path, "ts", cutoff, b, "yyyymmdd")
    assert rewrote
    after = spark.read.parquet(path)
    assert after.count() == expected
    assert not [e for e in os.listdir(path) if e.startswith("_ttl_")]


def test_ttl_rolls_back_when_tmp_missing(spark, sf_dir, tmp_path):
    """Crash before the tmp write finished (tmp deleted by its own
    cleanup) but after boundary → trash: recovery restores the original
    boundary from trash so no data is lost; the rewrite then proceeds."""
    import os

    from kafka_clickhouse_ingest_pipeline_spark.plans.retention import apply_ttl

    ev = load_table(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_rollback")
    ev.write.partitionBy("yyyymmdd").parquet(path)
    days = sorted(
        str(r["yyyymmdd"])
        for r in spark.read.parquet(path).select("yyyymmdd").distinct().collect()
    )
    b = days[2]
    cutoff = f"{b[:4]}-{b[4:6]}-{b[6:]} 12:00:00"
    expected = (
        spark.read.parquet(path)
        .where(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
        .count()
    )

    boundary = os.path.join(path, f"yyyymmdd={b}")
    os.rename(boundary, os.path.join(path, f"_ttl_trash_{b}"))

    dropped, rewrote = apply_ttl(spark, path, "ts", cutoff, b, "yyyymmdd")
    assert rewrote
    after = spark.read.parquet(path)
    assert after.count() == expected
    assert not [e for e in os.listdir(path) if e.startswith("_ttl_")]


def test_ttl_heals_stale_crash_from_an_earlier_bucket(spark, sf_dir, tmp_path):
    """Regression: a crashed swap from YESTERDAY'S run (different boundary
    bucket) must be healed by today's run — recovery keyed only on the
    current cutoff bucket left the older partition's rows invisible in
    _ttl_trash_* forever."""
    import os
    import shutil

    from kafka_clickhouse_ingest_pipeline_spark.plans.retention import apply_ttl

    ev = load_table(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd")
    )
    path = str(tmp_path / "events_stale_crash")
    ev.write.partitionBy("yyyymmdd").parquet(path)
    days = sorted(
        str(r["yyyymmdd"])
        for r in spark.read.parquet(path).select("yyyymmdd").distinct().collect()
    )
    stale, today = days[3], days[2]  # stale crash on a LATER (kept) bucket
    # yesterday's crash artifact: boundary renamed to trash, tmp complete
    stale_dir = os.path.join(path, f"yyyymmdd={stale}")
    shutil.copytree(stale_dir, os.path.join(path, f"_ttl_tmp_{stale}"))
    os.rename(stale_dir, os.path.join(path, f"_ttl_trash_{stale}"))
    assert not os.path.isdir(stale_dir)

    cutoff = f"{today[:4]}-{today[4:6]}-{today[6:]} 12:00:00"
    expected = ev.where(F.col("ts") >= F.lit(cutoff).cast("timestamp")).count()
    apply_ttl(spark, path, "ts", cutoff, today, "yyyymmdd")
    # the stale bucket is back under its live name, rows intact
    assert os.path.isdir(stale_dir)
    assert spark.read.parquet(path).count() == expected
    assert not [e for e in os.listdir(path) if e.startswith("_ttl_")]


def test_ttl_rewrite_preserves_native_timestamp_form(spark, sf_dir, tmp_path):
    """Regression: the boundary rewrite must keep the table's physical
    timestamp form. A nanos-generation table (ts read as bigint under the
    legacy fallback) previously got its boundary rewritten as TIMESTAMP,
    leaving one partition with a different parquet type than its siblings
    — the next whole-table read died on the type mismatch."""
    import os

    from kafka_clickhouse_ingest_pipeline_spark.plans.retention import apply_ttl

    # simulate a nanos-written table: ts as epoch-nanos long
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            (F.unix_micros("ts") * 1000).alias("ts"),
            F.date_format(
                F.timestamp_micros(F.floor(F.unix_micros("ts") / 1).cast("long")),
                "yyyyMMdd",
            ).alias("yyyymmdd"),
        )
    )
    path = str(tmp_path / "events_nanos")
    ev.write.partitionBy("yyyymmdd").parquet(path)
    days = sorted(
        str(r["yyyymmdd"])
        for r in spark.read.parquet(path).select("yyyymmdd").distinct().collect()
    )
    b = days[2]
    cutoff = f"{b[:4]}-{b[4:6]}-{b[6:]} 12:00:00"
    cutoff_ns_rows = ev.where(
        F.col("ts")
        >= F.unix_micros(F.lit(cutoff).cast("timestamp")) * 1000
    ).where(F.col("yyyymmdd") >= b).count()

    dropped, rewrote = apply_ttl(spark, path, "ts", cutoff, b, "yyyymmdd")
    assert rewrote and dropped == 2
    # the whole table still reads with ONE schema, ts still bigint
    after = spark.read.parquet(path)
    assert after.schema["ts"].dataType.simpleString() == "bigint"
    assert after.count() == cutoff_ns_rows
    # the rewritten boundary itself kept the long form
    bdir = os.path.join(path, f"yyyymmdd={b}")
    assert (
        spark.read.parquet(bdir).schema["ts"].dataType.simpleString()
        == "bigint"
    )
