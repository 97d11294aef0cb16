"""Stream-stream interval join (streaming/temporal.py): VERDICT r3 #3.

Stream-vs-batch equivalence per the CLAUDE.md streaming-stateful oracle
exemption: the watermarked streaming join must emit exactly the rows the
identical batch join produces over the same inputs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.streaming import pipeline as P
from kafka_clickhouse_ingest_pipeline_spark.streaming.temporal import (
    batch_interval_join,
    streaming_interval_join,
)

PROBE_SCHEMA = "sensor_id string, p_ts timestamp, reading double"
BUILD_SCHEMA = "sensor_id string, b_ts timestamp, calibration double"


def _write(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))


def _parse(raw, schema):
    return raw.select(F.from_json("value", schema).alias("r")).select("r.*")


PROBES = [
    {"sensor_id": "a", "p_ts": "2024-01-01 10:00:00", "reading": 1.0},
    {"sensor_id": "a", "p_ts": "2024-01-01 11:30:00", "reading": 2.0},
    {"sensor_id": "b", "p_ts": "2024-01-01 10:15:00", "reading": 3.0},
    {"sensor_id": "c", "p_ts": "2024-01-01 10:30:00", "reading": 4.0},
]
BUILDS = [
    # in-window for probe a@10:00 (and too old for a@11:30)
    {"sensor_id": "a", "b_ts": "2024-01-01 09:30:00", "calibration": 0.1},
    # in-window for a@11:30 only
    {"sensor_id": "a", "b_ts": "2024-01-01 11:00:00", "calibration": 0.2},
    # build AFTER the probe: must not match
    {"sensor_id": "b", "b_ts": "2024-01-01 10:20:00", "calibration": 0.3},
    # in-window for b@10:15
    {"sensor_id": "b", "b_ts": "2024-01-01 10:00:00", "calibration": 0.4},
    # key with no probe
    {"sensor_id": "d", "b_ts": "2024-01-01 10:00:00", "calibration": 0.5},
    # sensor c: outside the 1h lookback (10:30 - 1h = 09:30 > 09:00)
    {"sensor_id": "c", "b_ts": "2024-01-01 09:00:00", "calibration": 0.6},
]


def _key_rows(rows):
    return sorted(
        (r["sensor_id"], str(r["p_ts"]), r["reading"], str(r["b_ts"]), r["calibration"])
        for r in rows
    )


def test_stream_matches_batch_interval_join(spark, tmp_path):
    psrc, bsrc = str(tmp_path / "p"), str(tmp_path / "b")
    os.makedirs(psrc), os.makedirs(bsrc)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # split across two files per side -> multiple micro-batches, so the
    # join state genuinely carries rows across batches
    _write(psrc, "p0.txt", PROBES[:2])
    _write(psrc, "p1.txt", PROBES[2:])
    _write(bsrc, "b0.txt", BUILDS[:3])
    _write(bsrc, "b1.txt", BUILDS[3:])

    probe_s = _parse(P.file_source(spark, psrc), PROBE_SCHEMA)
    build_s = _parse(P.file_source(spark, bsrc), BUILD_SCHEMA)
    joined = streaming_interval_join(
        probe_s, build_s, "sensor_id", "p_ts", "b_ts",
        lookback="1 hour", watermark="10 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = [r.asDict() for r in spark.read.parquet(out).collect()]

    probe_b = _parse(
        spark.createDataFrame([(json.dumps(r),) for r in PROBES], ["value"]),
        PROBE_SCHEMA,
    )
    build_b = _parse(
        spark.createDataFrame([(json.dumps(r),) for r in BUILDS], ["value"]),
        BUILD_SCHEMA,
    )
    want = [
        r.asDict()
        for r in batch_interval_join(
            probe_b, build_b, "sensor_id", "p_ts", "b_ts", lookback="1 hour"
        ).collect()
    ]
    assert _key_rows(got) == _key_rows(want)
    assert len(want) == 3  # a@10:00<-09:30, a@11:30<-11:00, b@10:15<-10:00


def test_interval_join_state_is_watermark_bounded(spark, tmp_path):
    """The physical plan must carry the watermark + the derived state
    eviction (the join is runnable forever only if state is bounded)."""
    psrc, bsrc = str(tmp_path / "p"), str(tmp_path / "b")
    os.makedirs(psrc), os.makedirs(bsrc)
    _write(psrc, "p0.txt", PROBES[:1])
    _write(bsrc, "b0.txt", BUILDS[:1])
    probe_s = _parse(P.file_source(spark, psrc), PROBE_SCHEMA)
    build_s = _parse(P.file_source(spark, bsrc), BUILD_SCHEMA)
    joined = streaming_interval_join(
        probe_s, build_s, "sensor_id", "p_ts", "b_ts"
    )
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_streaming_asof_picks_latest_build_within_lookback(spark, tmp_path):
    """Chained join+max_by: exact as-of on a stream (latest build wins),
    batch twin = the union-sentinel asof_join restricted to the lookback."""
    from kafka_clickhouse_ingest_pipeline_spark.streaming.temporal import (
        streaming_asof_enrich,
    )

    psrc, bsrc = str(tmp_path / "p"), str(tmp_path / "b")
    os.makedirs(psrc), os.makedirs(bsrc)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    probes = [
        {"sensor_id": "a", "p_ts": "2024-01-01 10:00:00", "reading": 1.0},
    ]
    # watermark-advancer: pushes both watermarks past the 'a' group so
    # append mode finalizes it (the documented emission discipline)
    advancer_p = {"sensor_id": "z", "p_ts": "2024-01-01 23:00:00", "reading": 9.0}
    builds = [
        {"sensor_id": "a", "b_ts": "2024-01-01 09:30:00", "calibration": 0.1},
        {"sensor_id": "a", "b_ts": "2024-01-01 09:45:00", "calibration": 0.2},
        {"sensor_id": "z", "b_ts": "2024-01-01 23:00:00", "calibration": 0.9},
    ]
    _write(psrc, "p0.txt", probes)
    _write(psrc, "p1.txt", [advancer_p])
    _write(bsrc, "b0.txt", builds)
    probe_s = _parse(P.file_source(spark, psrc), PROBE_SCHEMA)
    build_s = _parse(P.file_source(spark, bsrc), BUILD_SCHEMA)
    asof = streaming_asof_enrich(
        probe_s, build_s, "sensor_id", "p_ts", "b_ts",
        probe_cols=["reading"], payload_cols=["calibration"],
    )
    q = (
        asof.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    finalized = {r.sensor_id: r for r in rows}
    # 'a' finalized: LATEST in-window build (09:45, 0.2) — not 09:30
    assert "a" in finalized
    m = finalized["a"].matched
    assert m.calibration == 0.2 and str(m.b_ts) == "2024-01-01 09:45:00"


def test_left_outer_stream_emits_null_rows_after_watermark(spark, tmp_path):
    """Left-outer stream-stream interval join equals the batch LEFT JOIN:
    matched probes enrich, unmatched probes surface with NULL build
    columns once the watermark proves no match can arrive. A late
    'advancer' event on both streams pushes the watermark past every
    fixture probe so the null rows actually finalize within the run."""
    from kafka_clickhouse_ingest_pipeline_spark.streaming.temporal import (
        batch_interval_join_left,
        streaming_interval_join_left,
    )

    psrc, bsrc = str(tmp_path / "p"), str(tmp_path / "b")
    os.makedirs(psrc), os.makedirs(bsrc)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    advancer_p = {"sensor_id": "z", "p_ts": "2024-01-01 23:00:00", "reading": 9.0}
    advancer_b = {"sensor_id": "z", "b_ts": "2024-01-01 23:00:00", "calibration": 0.9}
    probes = PROBES + [advancer_p]
    builds = BUILDS + [advancer_b]
    _write(psrc, "p0.txt", PROBES)
    _write(psrc, "p1.txt", [advancer_p])
    _write(bsrc, "b0.txt", BUILDS)
    _write(bsrc, "b1.txt", [advancer_b])

    probe_s = _parse(P.file_source(spark, psrc), PROBE_SCHEMA)
    build_s = _parse(P.file_source(spark, bsrc), BUILD_SCHEMA)
    joined = streaming_interval_join_left(
        probe_s, build_s, "sensor_id", "p_ts", "b_ts",
        lookback="1 hour", watermark="10 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [r.asDict() for r in spark.read.parquet(out).collect()]

    probe_b = _parse(
        spark.createDataFrame([(json.dumps(r),) for r in probes], ["value"]),
        PROBE_SCHEMA,
    )
    build_b = _parse(
        spark.createDataFrame([(json.dumps(r),) for r in builds], ["value"]),
        BUILD_SCHEMA,
    )
    want = [
        r.asDict()
        for r in batch_interval_join_left(
            probe_b, build_b, "sensor_id", "p_ts", "b_ts", lookback="1 hour"
        ).collect()
    ]

    def keyed(rows):
        return sorted(
            (
                r["sensor_id"], str(r["p_ts"]), r["reading"],
                str(r["b_ts"]), r["calibration"],
            )
            for r in rows
        )

    assert keyed(got) == keyed(want)
    # the unmatched probe (sensor c: only build is outside the lookback)
    # is PRESENT with null build columns — the row inner join loses
    null_rows = [r for r in got if r["calibration"] is None]
    assert {r["sensor_id"] for r in null_rows} == {"c"}
    assert len(want) == 5  # 3 inner matches + advancer match + c's null row
