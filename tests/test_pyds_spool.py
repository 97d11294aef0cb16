"""Spark 4 Python DataSource connector for the ingest spool
(sources/pyds.py): batch scan parallelized per file, streaming reads
with file-index offsets, incremental restarts, and the end-to-end
publisher -> connector handoff."""

from __future__ import annotations

import json
import os

from kafka_clickhouse_ingest_pipeline_spark.sources import pyds


def _spool_write(dirpath: str, name: str, lines: list[str]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_batch_scan_reads_all_files_one_partition_each(spark, tmp_path):
    spool = str(tmp_path / "spool")
    _spool_write(spool, "0001.spool", ['{"a":1}', '{"a":2}'])
    _spool_write(spool, "0002.spool", ['{"a":3}'])
    # in-flight tmp files must be invisible
    with open(os.path.join(spool, ".0003.spool.tmp"), "w") as fh:
        fh.write("half-written")

    pyds.register(spark)
    df = spark.read.format("spool").option("path", spool).load()
    rows = df.collect()
    assert {(r.value, r.spool_file, r.line_no) for r in rows} == {
        ('{"a":1}', "0001.spool", 0),
        ('{"a":2}', "0001.spool", 1),
        ('{"a":3}', "0002.spool", 0),
    }
    # one InputPartition per spool file (the Kafka-partition analog)
    assert df.rdd.getNumPartitions() == 2


def test_stream_reads_and_restart_consumes_only_new_files(spark, tmp_path):
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _spool_write(spool, "0001.spool", ["a", "b"])
    _spool_write(spool, "0002.spool", ["c"])

    pyds.register(spark)

    def run_once():
        seen = []

        def sink(df, bid):
            seen.extend((r.value, r.spool_file) for r in df.collect())

        q = (
            spark.readStream.format("spool")
            .option("path", spool)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return seen

    first = run_once()
    assert sorted(first) == [
        ("a", "0001.spool"),
        ("b", "0001.spool"),
        ("c", "0002.spool"),
    ]
    # restart with one NEW file: the committed offset {"index": 2} must
    # skip the old files entirely — incremental, never reprocessing
    _spool_write(spool, "0003.spool", ["d"])
    second = run_once()
    assert second == [("d", "0003.spool")]
    del out


def test_replay_between_offsets_is_deterministic(tmp_path):
    """The failure-recovery contract: readBetweenOffsets(start, end)
    returns exactly the rows of that file range, byte-identical on every
    call (files are immutable once renamed into place)."""
    spool = str(tmp_path / "spool")
    for i in range(4):
        _spool_write(spool, f"{i:04d}.spool", [f"x{i}"])
    r = pyds.SpoolStreamReader({"path": spool})
    # legacy {"index": N} checkpoints mean partition 0 at N
    a = list(r.readBetweenOffsets({"index": 1}, {"index": 3}))
    b = list(r.readBetweenOffsets({"index": 1}, {"index": 3}))
    assert a == b == [("x1", 0, "0001.spool", 0), ("x2", 0, "0002.spool", 0)]
    # and read(start) reports the full high-water offset
    rows, nxt = r.read({"index": 2})
    assert nxt == {"parts": {"0": 4}}
    assert [v for v, _p, _f, _l in rows] == ["x2", "x3"]


def test_publisher_to_connector_end_to_end(spark, tmp_path):
    """SpoolPublisher (the HTTP front door's async batcher) feeds the
    connector: everything published is read back through format('spool')
    with the same value contract the Kafka source would deliver."""
    from kafka_clickhouse_ingest_pipeline_spark.sources.http_ingest import (
        SpoolPublisher,
    )

    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool, batch_size=2, batch_timeout_s=0.2)
    payloads = [json.dumps({"sensorId": f"s{i}", "v": i}) for i in range(5)]
    for p in payloads:
        pub.publish(None, p.encode())  # nil key, as the HTTP handler does
    pub.close()  # flush-on-close drains the queue

    pyds.register(spark)
    got = [
        r.value
        for r in spark.read.format("spool")
        .option("path", spool)
        .load()
        .collect()
    ]
    assert sorted(got) == sorted(payloads)


# --- N-partition topic layout (VERDICT r5 #3) ----------------------------


def test_partitioned_batch_scan_one_input_partition_per_file(spark, tmp_path):
    spool = str(tmp_path / "spool")
    _spool_write(os.path.join(spool, "p=0"), "0001.spool", ["a0", "b0"])
    _spool_write(os.path.join(spool, "p=0"), "0002.spool", ["c0"])
    _spool_write(os.path.join(spool, "p=1"), "0001.spool", ["a1"])
    _spool_write(os.path.join(spool, "p=3"), "0001.spool", ["a3"])  # sparse

    pyds.register(spark)
    df = spark.read.format("spool").option("path", spool).load()
    rows = {(r.value, r.part, r.spool_file, r.line_no) for r in df.collect()}
    assert rows == {
        ("a0", 0, "0001.spool", 0),
        ("b0", 0, "0001.spool", 1),
        ("c0", 0, "0002.spool", 0),
        ("a1", 1, "0001.spool", 0),
        ("a3", 3, "0001.spool", 0),
    }
    assert df.rdd.getNumPartitions() == 4  # one per file, across partitions


def test_partitioned_offsets_order_and_replay_determinism(tmp_path):
    """The Kafka ordering contract under a 4-partition layout: total
    order within each partition (file sequence then line number), and
    byte-identical global replay for a pinned (start, end) range."""
    spool = str(tmp_path / "spool")
    for p in range(4):
        d = os.path.join(spool, f"p={p}")
        _spool_write(d, "0001.spool", [f"p{p}-f1-l0", f"p{p}-f1-l1"])
        _spool_write(d, "0002.spool", [f"p{p}-f2-l0"])

    r = pyds.SpoolStreamReader({"path": spool})
    rows, end = r.read(r.initialOffset())
    rows = list(rows)
    assert end == {"parts": {"0": 2, "1": 2, "2": 2, "3": 2}}
    by_part: dict[int, list[str]] = {}
    for v, p, _f, _l in rows:
        by_part.setdefault(p, []).append(v)
    for p in range(4):
        assert by_part[p] == [f"p{p}-f1-l0", f"p{p}-f1-l1", f"p{p}-f2-l0"]

    # pinned-range replay: partition 1 from file 1, partition 2 from 0
    start = {"parts": {"0": 2, "1": 1, "2": 0, "3": 2}}
    a = list(r.readBetweenOffsets(start, end))
    b = list(r.readBetweenOffsets(start, end))
    assert a == b
    assert [v for v, *_ in a] == [
        "p1-f2-l0",
        "p2-f1-l0",
        "p2-f1-l1",
        "p2-f2-l0",
    ]


def test_partition_expansion_and_rebalanced_restart(spark, tmp_path):
    """A checkpoint taken before a topic expansion must replay correctly
    after it: the restarted stream reads only the new file in the old
    partition AND the whole new partition (absent from the committed
    offset map -> starts at 0), never reprocessing committed files."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    _spool_write(os.path.join(spool, "p=0"), "0001.spool", ["a"])
    _spool_write(os.path.join(spool, "p=1"), "0001.spool", ["b"])

    pyds.register(spark)

    def run_once():
        seen = []

        def sink(df, bid):
            seen.extend((r.value, r.part) for r in df.collect())

        q = (
            spark.readStream.format("spool")
            .option("path", spool)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return seen

    assert sorted(run_once()) == [("a", 0), ("b", 1)]
    _spool_write(os.path.join(spool, "p=0"), "0002.spool", ["c"])
    _spool_write(os.path.join(spool, "p=2"), "0001.spool", ["d"])  # expansion
    assert sorted(run_once()) == [("c", 0), ("d", 2)]


def test_npartition_streaming_dedup_equals_batch(spark, tmp_path):
    """Stream-vs-batch equivalence for exact dedup over a 4-partition
    spool: duplicates of the same payload land in DIFFERENT partitions
    (the worst case for any per-partition shortcut — dedup state must be
    global), and the streaming dropDuplicates over the connector agrees
    with batch DISTINCT over the same files."""
    from pyspark.sql import functions as F

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    payloads = [f"doc-{i}" for i in range(6)]
    # copy i of doc d goes to partition (d + i) % 4
    for d, doc in enumerate(payloads):
        for i in range(d % 3 + 1):  # 1-3 copies per doc
            part = (d + i) % 4
            _spool_write(
                os.path.join(spool, f"p={part}"),
                f"{d:02d}{i}.spool",
                [doc],
            )

    pyds.register(spark)
    batch = (
        spark.read.format("spool")
        .option("path", spool)
        .load()
        .select("value")
        .distinct()
    )
    seen: set[str] = set()

    def sink(df, bid):
        seen.update(r.value for r in df.collect())

    q = (
        spark.readStream.format("spool")
        .option("path", spool)
        .load()
        .select("value")
        .dropDuplicates(["value"])
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen == {r.value for r in batch.collect()} == set(payloads)


def test_retention_violation_fails_loudly(tmp_path):
    """Committed spool files vanishing behind a checkpoint must raise
    (Kafka's OffsetOutOfRange contract), never silently drop rows from a
    replay or regress the end offset below the committed one."""
    import pytest

    spool = str(tmp_path / "spool")
    for p in range(2):
        d = os.path.join(spool, f"p={p}")
        _spool_write(d, "0001.spool", [f"p{p}a"])
        _spool_write(d, "0002.spool", [f"p{p}b"])
    r = pyds.SpoolStreamReader({"path": spool})
    _rows, end = r.read(r.initialOffset())
    assert end == {"parts": {"0": 2, "1": 2}}

    os.remove(os.path.join(spool, "p=1", "0002.spool"))
    with pytest.raises(ValueError, match="retention violation"):
        list(r.readBetweenOffsets({"parts": {"0": 0, "1": 0}}, end))
    with pytest.raises(ValueError, match="retention violation"):
        r.read(end)

    # an entire committed partition directory vanishing is the same error
    import shutil

    shutil.rmtree(os.path.join(spool, "p=1"))
    with pytest.raises(ValueError, match="retention violation"):
        list(r.readBetweenOffsets({"parts": {"1": 0}}, {"parts": {"1": 1}}))


def test_partition_dir_vanish_between_microbatches_fails_loudly(tmp_path):
    """Retention expiry removing an ENTIRE committed partition directory
    between micro-batches (not just one file): the next read(start)
    must raise like the file-vanish case — the offset map says files
    were committed there, so a missing directory is data loss, not an
    empty partition."""
    import shutil

    import pytest

    spool = str(tmp_path / "spool")
    for p in range(2):
        _spool_write(os.path.join(spool, f"p={p}"), "0001.spool", [f"p{p}a"])
    r = pyds.SpoolStreamReader({"path": spool})
    _rows, end = r.read(r.initialOffset())
    assert end == {"parts": {"0": 1, "1": 1}}

    shutil.rmtree(os.path.join(spool, "p=1"))
    with pytest.raises(ValueError, match="retention violation"):
        r.read(end)


def test_checkpoint_with_empty_partition_resumes_cleanly(tmp_path):
    """A checkpoint naming a partition at offset 0 — a topic expansion
    recorded before its first file landed, or a partition that expired
    before anything was committed — claims no data, so a missing or
    empty directory is consistent with it: read() and replay must both
    succeed, keep the partition in the offset map at 0, and never
    raise."""
    spool = str(tmp_path / "spool")
    _spool_write(os.path.join(spool, "p=0"), "0001.spool", ["a"])
    os.makedirs(os.path.join(spool, "p=2"))  # present but empty

    r = pyds.SpoolStreamReader({"path": spool})
    start = {"parts": {"0": 0, "1": 0, "2": 0}}  # p=1 doesn't exist at all
    rows, end = r.read(start)
    assert [v for v, *_ in rows] == ["a"]
    assert end == {"parts": {"0": 1, "1": 0, "2": 0}}
    # pinned-range replay over the empty partitions yields nothing
    assert list(r.readBetweenOffsets(start, {"parts": {"1": 0, "2": 0}})) == []
    # and the next cycle from the new checkpoint is a clean no-op
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end
