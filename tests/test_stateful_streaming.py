"""applyInPandasWithState: custom per-key running aggregates over a stream
(streaming/stateful.py), state carried across micro-batches."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.streaming import pipeline as P
from kafka_clickhouse_ingest_pipeline_spark.streaming.stateful import running_stats


def _write_batch(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))


def _drain(spark, src_dir, out, ckpt):
    raw = P.file_source(spark, src_dir)
    parsed = raw.select(
        F.from_json("value", "sensorId string, value double").alias("p")
    ).select("p.*")
    stats = running_stats(parsed)

    def sink(df, _bid):
        if df.count():
            df.write.mode("append").parquet(out)

    q = stats.writeStream.outputMode("update").foreachBatch(sink).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)


def test_state_carries_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # two files + maxFilesPerTrigger=1 → two micro-batches in one run;
    # sensor "a" spans both, so its totals must come from carried state
    _write_batch(src, "b0.txt", [
        {"sensorId": "a", "value": 10.0},
        {"sensorId": "a", "value": 20.0},
        {"sensorId": "b", "value": 1.0},
    ])
    _write_batch(src, "b1.txt", [{"sensorId": "a", "value": 30.0}])
    _drain(spark, src, out, ckpt)

    rows = spark.read.parquet(out).collect()
    # latest emission per key wins (update mode)
    latest = {}
    for r in rows:
        if r.key not in latest or r.n_events > latest[r.key].n_events:
            latest[r.key] = r
    assert latest["a"].n_events == 3
    assert latest["a"].mean_value == 20.0  # (10+20+30)/3 — state persisted
    assert latest["b"].n_events == 1
