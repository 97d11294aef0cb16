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
    a = list(r.readBetweenOffsets({"index": 1}, {"index": 3}))
    b = list(r.readBetweenOffsets({"index": 1}, {"index": 3}))
    assert a == b == [("x1", "0001.spool", 0), ("x2", "0002.spool", 0)]
    # and read(start) reports the full high-water offset
    rows, nxt = r.read({"index": 2})
    assert nxt == {"index": 4}
    assert [v for v, _f, _l in rows] == ["x2", "x3"]


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
