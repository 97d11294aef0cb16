"""End-to-end Structured Streaming tests: file-source stand-in for the Kafka
topic, availableNow trigger, foreachBatch parquet sink — the full tier-A
dataflow (SURVEY.md §3.2) in CI form."""

from __future__ import annotations

import json
import os

import pytest

from kafka_clickhouse_ingest_pipeline_spark.streaming import pipeline as P


@pytest.fixture()
def payload_dir(tmp_path):
    d = tmp_path / "topic"
    d.mkdir()
    events = [
        {"sensorId": "s1", "temperature": 21.5, "timestamp": "2024-01-01T00:00:00Z"},
        {"sensorId": "s2", "temperature": -3.25, "value": 7},
        {"sensorId": "s3"},
    ]
    lines = [json.dumps(e) for e in events]
    lines.insert(1, '{"sensorId": "bad", "value":')  # malformed: dropped
    lines.append("")  # empty line: dropped by text source or gate
    (d / "batch0.txt").write_text("\n".join(lines))
    return str(d)


def _run(spark, payload_dir, tmp_path, dedupe=False):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=ckpt,
        available_now=True,
        dedupe_replays=dedupe,
    )
    q.awaitTermination(120)
    return out


def test_stream_end_to_end(spark, payload_dir, tmp_path):
    out = _run(spark, payload_dir, tmp_path)
    result = spark.read.parquet(os.path.join(out, "data"))
    rows = {r.sensorId: r for r in result.collect()}
    # 3 valid payloads survive; malformed + empty dropped (A3/A9/A16)
    assert set(rows) == {"s1", "s2", "s3"}
    # typed parse (A9): values typed, missing keys → null
    assert rows["s1"].temperature == 21.5
    assert rows["s2"].value == 7
    assert rows["s3"].temperature is None
    # enrichment (A12) + raw retention (A13)
    assert rows["s1"].received_at is not None
    assert json.loads(rows["s2"]._raw_data)["sensorId"] == "s2"


def test_stream_is_incremental(spark, payload_dir, tmp_path):
    out = _run(spark, payload_dir, tmp_path)
    n1 = spark.read.parquet(os.path.join(out, "data")).count()
    # new file arrives; re-run drains ONLY the new data (checkpoint = A15)
    with open(os.path.join(payload_dir, "batch1.txt"), "w") as fh:
        fh.write('{"sensorId": "s9", "temperature": 1.0}\n')
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    result = spark.read.parquet(os.path.join(out, "data"))
    assert result.count() == n1 + 1
    assert result.where("sensorId = 's9'").count() == 1


def test_batch_ledger_skips_replayed_batch(spark, payload_dir, tmp_path):
    out = _run(spark, payload_dir, tmp_path, dedupe=True)
    n1 = spark.read.parquet(os.path.join(out, "data")).count()
    # wipe the checkpoint → the same data is re-delivered as batch 0 again;
    # the ledger makes the sink idempotent (§4 custom work #1)
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
        dedupe_replays=True,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "data")).count() == n1


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """C12: watermarked tumbling-window count over a rate-like stream."""
    src_dir = tmp_path / "events"
    src_dir.mkdir()
    rows = [
        {"ts": "2024-01-01T00:01:00Z", "user": 1},
        {"ts": "2024-01-01T00:04:00Z", "user": 2},
        {"ts": "2024-01-01T00:11:00Z", "user": 1},
    ]
    (src_dir / "f.txt").write_text("\n".join(json.dumps(r) for r in rows))

    from pyspark.sql import functions as F

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, user long").alias("p")
    ).select("p.*")
    agg = (
        parsed.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = str(tmp_path / "sinktbl")

    def sink(df, _bid):
        df.selectExpr("window.start as ws", "n").write.mode("overwrite").parquet(out)

    q = agg.writeStream.outputMode("complete").foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "wckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {str(r.ws): r.n for r in spark.read.parquet(out).collect()}
    assert got == {"2024-01-01 00:00:00": 2, "2024-01-01 00:10:00": 1}


def test_streaming_dedup_bounded_state(spark, tmp_path):
    src_dir = tmp_path / "dup_events"
    src_dir.mkdir()
    dup = {"ts": "2024-01-01T00:01:00Z", "user_id": 1, "event_type": "click"}
    other = {"ts": "2024-01-01T00:02:00Z", "user_id": 1, "event_type": "view"}
    (src_dir / "f.txt").write_text(
        "\n".join(json.dumps(r) for r in [dup, dup, other])
    )
    from pyspark.sql import functions as F

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json(
            "value", "ts timestamp, user_id long, event_type string"
        ).alias("p")
    ).select("p.*")
    deduped = P.streaming_dedup(parsed)
    out = str(tmp_path / "dedup_out")

    def sink(df, _bid):
        df.write.mode("append").parquet(out)

    q = deduped.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "dckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_streaming_near_dedup_by_signature(spark, tmp_path):
    """C9 x C12: the zero-shuffle MinHash signature runs on a stream as a
    pure projection; same-text docs (identical signature) collapse to one
    within the watermark, distinct text survives."""
    src_dir = tmp_path / "nd_docs"
    src_dir.mkdir()
    same = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        {"ts": "2024-01-01T00:01:00Z", "doc_id": 1, "text": same},
        {"ts": "2024-01-01T00:02:00Z", "doc_id": 2, "text": same},  # dup: dropped
        {"ts": "2024-01-01T00:03:00Z", "doc_id": 3,
         "text": "completely different words compose this other document body"},
    ]
    (src_dir / "f.txt").write_text("\n".join(json.dumps(r) for r in rows))
    from pyspark.sql import functions as F

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, doc_id long, text string").alias("p")
    ).select("p.*")
    deduped = P.streaming_near_dedup(parsed)
    out = str(tmp_path / "nd_out")

    def sink(df, _bid):
        df.write.mode("append").parquet(out)

    q = deduped.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "nd_ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2
    kept_same = [r.doc_id for r in got.where(F.col("text") == same).collect()]
    assert len(kept_same) == 1  # exactly one of the near-dup pair survives
    assert got.where("doc_id = 3").count() == 1


def test_graceful_shutdown(spark, payload_dir, tmp_path):
    """A17: signal → stop polling → flush → close (App.kt:56-65,
    main.go:98-108) = StreamingQuery.stop(); the query terminates cleanly
    and committed output stays readable."""
    out = str(tmp_path / "gout")
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=str(tmp_path / "gckpt"),
        available_now=False,  # the real 5s wall-clock trigger
    )
    assert q.isActive
    # let at least one trigger fire, then signal shutdown
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] >= 0:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert not q.isActive
    assert q.exception() is None


def test_auth_ttl_refresh_unit():
    """A5 TTL parity (caching.go:43, 60 m default): the loader is hit at
    most once per TTL window; after expiry the next current() reloads."""
    calls = []
    fake_now = [0.0]

    cache = P.RefreshingAuthKeys(
        loader=lambda: calls.append(1) or f"keys@{len(calls)}",
        ttl_seconds=60.0,
        clock=lambda: fake_now[0],
    )
    assert cache.current() == "keys@1"
    fake_now[0] = 59.9
    assert cache.current() == "keys@1"  # within TTL: cached
    fake_now[0] = 60.0
    assert cache.current() == "keys@2"  # expired: reloaded
    assert len(calls) == 2


def test_auth_revocation_propagates_within_ttl(spark, tmp_path):
    """A key deactivated mid-stream stops passing on the next refresh
    (VERDICT #4): ttl=0 forces a reload per batch, so batch 2 no longer
    accepts the revoked key."""
    keys_path = str(tmp_path / "api_keys")

    def write_keys(active: dict[str, bool]) -> None:
        spark.createDataFrame(
            [(k, v) for k, v in active.items()], "api_key string, is_active boolean"
        ).write.mode("overwrite").parquet(keys_path)

    write_keys({"s1": True, "s2": True})
    auth = P.RefreshingAuthKeys(
        loader=lambda: spark.read.parquet(keys_path), ttl_seconds=0.0
    )

    src_dir = tmp_path / "auth_topic"
    src_dir.mkdir()
    (src_dir / "b0.txt").write_text(
        '{"sensorId": "s1", "value": 1}\n{"sensorId": "s2", "value": 2}\n'
    )
    out = str(tmp_path / "auth_out")
    ckpt = str(tmp_path / "auth_ckpt")

    def drain():
        q = P.run_pipeline(
            P.file_source(spark, str(src_dir)),
            out_path=out,
            checkpoint=ckpt,
            available_now=True,
            auth=auth,
            auth_key_col="sensorId",
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(os.path.join(out, "data"))
    assert {r.sensorId for r in first.collect()} == {"s1", "s2"}

    # revoke s2, then stream two more events — only s1's passes
    write_keys({"s1": True, "s2": False})
    (src_dir / "b1.txt").write_text(
        '{"sensorId": "s1", "value": 3}\n{"sensorId": "s2", "value": 4}\n'
    )
    drain()
    result = spark.read.parquet(os.path.join(out, "data"))
    assert result.count() == 3
    assert result.where("value = 4").count() == 0  # revoked key's row dropped


def test_short_write_fails_batch_and_replays(spark, payload_dir, tmp_path):
    """A14 rows-affected parity (ClickHouseWriterService.kt:61-65): a sink
    that persists fewer rows than the batch holds must fail the batch —
    no offset commit — so the data is re-delivered and fully written on
    the next run (duplicates possible: at-least-once, like the
    reference)."""
    import pyspark.sql.utils as U

    out = str(tmp_path / "sw_out")
    ckpt = str(tmp_path / "sw_ckpt")

    real_write = P.write_clustered

    def short_write(df, path, **kwargs):
        real_write(df.limit(1), path, **kwargs)

    P.write_clustered = short_write
    try:
        q = P.run_pipeline(
            P.file_source(spark, payload_dir),
            out_path=out,
            checkpoint=ckpt,
            available_now=True,
            verify_rows=True,
        )
        with pytest.raises(U.StreamingQueryException, match="wrote 1 rows"):
            q.awaitTermination(120)
    finally:
        P.write_clustered = real_write

    # batch was NOT committed: a healthy re-run replays and writes all 3
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=ckpt,
        available_now=True,
        verify_rows=True,
    )
    q.awaitTermination(120)
    result = spark.read.parquet(os.path.join(out, "data"))
    assert {r.sensorId for r in result.collect()} >= {"s1", "s2", "s3"}
    # the short write's 1 row remains: at-least-once duplicates, faithful
    # to the reference's replay semantics
    assert result.count() == 4


def test_bounded_retry_dead_letters_poison_batch(spark, payload_dir, tmp_path):
    """DefaultErrorHandler parity (KafkaConsumerConfig.kt:53-70): a batch
    that keeps failing is retried max_retries times across restarts, then
    diverted to the dead-letter dir and committed past, so the stream
    makes progress instead of replaying forever."""
    import pyspark.sql.utils as U

    out = str(tmp_path / "dl_out")
    ckpt = str(tmp_path / "dl_ckpt")
    real_write = P.write_clustered

    def poison(df, path, **kwargs):
        raise IOError("sink down")

    P.write_clustered = poison
    try:
        for attempt in range(3):  # initial delivery + 2 retries
            q = P.run_pipeline(
                P.file_source(spark, payload_dir),
                out_path=out,
                checkpoint=ckpt,
                available_now=True,
                max_retries=2,
            )
            with pytest.raises(U.StreamingQueryException, match="sink down"):
                q.awaitTermination(120)
        # budget exhausted: the next delivery dead-letters and succeeds,
        # even though the sink is still broken
        q = P.run_pipeline(
            P.file_source(spark, payload_dir),
            out_path=out,
            checkpoint=ckpt,
            available_now=True,
            max_retries=2,
        )
        q.awaitTermination(120)
        assert q.exception() is None
    finally:
        P.write_clustered = real_write

    dl = spark.read.parquet(os.path.join(out, "dead_letter"))
    assert {r.sensorId for r in dl.collect()} == {"s1", "s2", "s3"}
    assert not os.path.exists(os.path.join(out, "data"))  # nothing half-written

    # the stream moved on: new data flows to the (healed) main sink
    with open(os.path.join(payload_dir, "after_dl.txt"), "w") as fh:
        fh.write('{"sensorId": "s7", "temperature": 7.0}\n')
    q = P.run_pipeline(
        P.file_source(spark, payload_dir),
        out_path=out,
        checkpoint=ckpt,
        available_now=True,
        max_retries=2,
    )
    q.awaitTermination(120)
    main = spark.read.parquet(os.path.join(out, "data"))
    assert {r.sensorId for r in main.collect()} == {"s7"}


def test_metrics_listener_health_and_counters(spark, payload_dir, tmp_path):
    """healthz/metrics analog (publisher/cmd/api/main.go:76-80): the
    StreamingQueryListener sees every batch, accumulates row counters,
    writes a JSONL metrics log, and reports ok for a clean run."""
    import json as _json
    import time

    from kafka_clickhouse_ingest_pipeline_spark.streaming.metrics import (
        PipelineMetricsListener,
    )

    log = str(tmp_path / "metrics.jsonl")
    listener = PipelineMetricsListener(log_path=log)
    spark.streams.addListener(listener)
    try:
        q = P.run_pipeline(
            P.file_source(spark, payload_dir),
            out_path=str(tmp_path / "m_out"),
            checkpoint=str(tmp_path / "m_ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        # listener bus is async: wait for the progress events to land
        deadline = time.time() + 30
        while time.time() < deadline:
            snap = listener.snapshot()
            if any(
                v.get("total_rows", 0) >= 4 and v.get("status") != "running"
                for v in snap.values()
            ):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    snap = listener.snapshot()
    # One query ran → exactly ONE entry: started/progress/terminated all
    # key on str(id), so counters and terminal status share a record
    # (regression: UUID-vs-str keys used to split every query in two,
    # doubling health() n_queries and stranding status at 'running').
    assert len(snap) == 1
    [q_metrics] = [v for v in snap.values() if v.get("total_rows", 0) > 0]
    assert q_metrics["status"] in ("terminated", "idle")
    assert q_metrics["batches"] >= 1
    # 4 source rows: 3 valid payloads + 1 malformed (counted at the
    # source, before the validity gate drops it)
    assert q_metrics["total_rows"] == 4
    assert listener.health()["status"] == "ok"
    with open(log) as fh:
        lines = [_json.loads(line) for line in fh]
    assert sum(r["num_input_rows"] for r in lines) == 4


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """C12: stream-stream inner join — clicks joined to purchases by the
    same user within 30 minutes, both sides watermarked so join state is
    bounded."""
    from pyspark.sql import functions as F

    src_dir = tmp_path / "ss_events"
    src_dir.mkdir()
    rows = [
        {"ts": "2024-01-01T00:01:00Z", "user": 1, "kind": "click"},
        {"ts": "2024-01-01T00:10:00Z", "user": 1, "kind": "purchase"},  # +9m: joins
        {"ts": "2024-01-01T02:00:00Z", "user": 1, "kind": "purchase"},  # +2h: outside window
        {"ts": "2024-01-01T00:05:00Z", "user": 2, "kind": "click"},     # no purchase
    ]
    (src_dir / "f.txt").write_text("\n".join(json.dumps(r) for r in rows))

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, user long, kind string").alias("p")
    ).select("p.*")
    clicks = (
        parsed.where("kind = 'click'")
        .select(F.col("user").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        parsed.where("kind = 'purchase'")
        .select(F.col("user").alias("p_user"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user AND
            purchase_ts > click_ts AND
            purchase_ts <= click_ts + interval 30 minutes
            """
        ),
    )
    out = str(tmp_path / "ss_out")

    def sink(df, _bid):
        df.write.mode("append").parquet(out)

    q = joined.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ss_ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0].c_user == 1


def test_streaming_hll_registers_merge_to_batch_estimate(spark, tmp_path):
    """HLL registers merge by MAX, so a streamed register table (state
    built across micro-batches) must yield the *identical* estimate to the
    batch query — the mergeability claim made in hll_distinct_portable's
    docstring, executed for real."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.functions import hashing as HS
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        hll_distinct_portable,
        hll_estimate_expr,
    )
    from kafka_clickhouse_ingest_pipeline_spark.functions.rounding import round4
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "event_type")
    src = str(tmp_path / "src")
    # two part-files -> two micro-batches; the register state must merge them
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    uid = F.col("user_id").cast("string")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = (
        stream.select(
            "event_type",
            HS.hll_register(uid).alias("reg"),
            HS.hll_rank(uid).alias("rank"),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rank").alias("mj"))
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    aggs, est = hll_estimate_expr()
    streamed = {
        r.event_type: r.hll_estimate
        for r in spark.table("hll_regs")
        .groupBy("event_type")
        .agg(*aggs)
        .select("event_type", round4(est).alias("hll_estimate"))
        .collect()
    }
    batch = {
        r.event_type: r.hll_estimate
        for r in hll_distinct_portable(spark, sf).collect()
    }
    assert streamed == batch  # bit-identical estimates


def test_dead_letter_replay_is_idempotent_with_ledger(spark, tmp_path):
    """Regression: the dead-letter path must write the replay-ledger
    marker too — a crash between the dead-letter append and the
    checkpoint commit replays the batch, which previously duplicated the
    poison rows in dead_letter despite dedupe_replays=True."""
    import os

    out = str(tmp_path / "out")
    writer = P.foreach_batch_writer(out, dedupe_replays=True, max_retries=0)
    # simulate an exhausted retry budget for batch 7
    os.makedirs(os.path.join(out, "_attempts"), exist_ok=True)
    with open(os.path.join(out, "_attempts", "7.n"), "w") as fh:
        fh.write("1")
    batch = spark.createDataFrame(
        [("s1", 1.0)], "sensorId string, temperature double"
    )
    writer(batch, 7)  # dead-letters the batch
    writer(batch, 7)  # replay of the same batch id: must be a no-op
    dl = spark.read.parquet(os.path.join(out, "dead_letter"))
    assert dl.count() == 1


def test_streaming_dynamic_gap_sessions_match_batch(spark, tmp_path):
    """C12: dynamic-gap session_window runs under Structured Streaming
    with a watermark, and its completed sessions equal the batch result
    on the same data (the stream-vs-batch contract the fixed-gap and
    rollup families already pin). Gap depends on the event: 'long' holds
    a session open 30 min, anything else 10 min."""
    import json as _json

    src_dir = tmp_path / "dynsess"
    src_dir.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:00Z", "user": 1, "kind": "long"},
        # 25 min later: within long's 30-min hold -> same session
        {"ts": "2024-01-01T00:25:00Z", "user": 1, "kind": "short"},
        # 12 min later: short only holds 10 min -> NEW session
        {"ts": "2024-01-01T00:37:00Z", "user": 1, "kind": "short"},
        # another user, one event
        {"ts": "2024-01-01T00:05:00Z", "user": 2, "kind": "short"},
    ]
    (src_dir / "f.txt").write_text("\n".join(_json.dumps(r) for r in rows))

    from pyspark.sql import functions as F

    gap = F.when(F.col("kind") == "long", "30 minutes").otherwise("10 minutes")

    def sessionize(df):
        return (
            df.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", gap).alias("w"), "user")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user",
                F.col("w.start").cast("string").alias("ws"),
                "n",
            )
        )

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, user long, kind string").alias("p")
    ).select("p.*")
    out = str(tmp_path / "dynsink")

    def sink(df, _bid):
        df.write.mode("overwrite").parquet(out)

    q = (
        sessionize(parsed)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "dynckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user, r.ws): r.n for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["ts"].replace("T", " ").replace("Z", ""), r["user"], r["kind"]) for r in rows],
        "ts string, user long, kind string",
    ).select(F.to_timestamp("ts").alias("ts"), "user", "kind")
    batch = {
        (r.user, r.ws): r.n for r in sessionize_batch(batch_df, gap).collect()
    }
    assert streamed == batch
    # and the dynamic gap actually mattered: user 1 has exactly 2 sessions
    assert sum(1 for (u, _w) in streamed if u == 1) == 2


def sessionize_batch(df, gap):
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user", F.col("w.start").cast("string").alias("ws"), "n")
    )


def test_session_window_exact_gap_boundary_merges(spark):
    """ADVICE r4 pinned the wrong way: it claimed Spark's session_window
    treats an event at exactly prev_ts + gap as a NEW session (half-open
    windows), which would make the dynamic-gap oracle's `MAX(ev_end) >= ts`
    comparison a divergence waiting for boundary-aligned data. Measured
    behavior is the opposite — Spark MERGES the touching event — so `>=`
    is correct and `>` would be the bug. This fixture lands an event at
    exactly prev_ts + gap for every gap branch (45/30/15 min) plus one a
    second past, so the boundary can never drift unobserved again."""
    import datetime as dt

    import duckdb
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 101, t0, "purchase"),
        (1, 102, t0 + dt.timedelta(minutes=45), "view"),  # == purchase gap
        (2, 201, t0, "click"),
        (2, 202, t0 + dt.timedelta(minutes=30), "view"),  # == click gap
        (3, 301, t0, "view"),
        (3, 302, t0 + dt.timedelta(minutes=15), "view"),  # == view gap
        (4, 401, t0, "view"),
        (4, 402, t0 + dt.timedelta(minutes=15, seconds=1), "view"),  # past
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    gap = (
        F.when(F.col("event_type") == "purchase", "45 minutes")
        .when(F.col("event_type") == "click", "30 minutes")
        .otherwise("15 minutes")
    )
    got = {
        (r.user_id, str(r.w.start)): r.n
        for r in df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    base = "2024-01-01 00:00:00"
    assert got == {
        (1, base): 2,  # touching events MERGE for every gap branch
        (2, base): 2,
        (3, base): 2,
        (4, base): 1,  # one second past the gap splits
        (4, "2024-01-01 00:15:01"): 1,
    }
    # and the oracle's running-max-island rebuild with >= agrees exactly
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ",".join(
            f"({u},{e},TIMESTAMP '{ts}','{et}')" for u, e, ts, et in rows
        )
        + ") t(user_id, event_id, ts, event_type)"
    )
    oracle = con.sql("""
        WITH gapped AS (
          SELECT user_id, ts, event_id,
                 ts + CASE event_type
                        WHEN 'purchase' THEN INTERVAL '45 minutes'
                        WHEN 'click'    THEN INTERVAL '30 minutes'
                        ELSE                 INTERVAL '15 minutes'
                      END AS ev_end
          FROM events),
        marked AS (
          SELECT *, CASE WHEN MAX(ev_end) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ) >= ts THEN 0 ELSE 1 END AS new_session
          FROM gapped),
        sessions AS (
          SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked)
        SELECT user_id, CAST(MIN(ts) AS VARCHAR) AS ws, COUNT(*) AS n
        FROM sessions GROUP BY user_id, session_id
    """).fetchall()
    assert {(u, ws): n for u, ws, n in oracle} == got


def test_watermark_drops_late_rows_and_accounts_for_them(spark, tmp_path):
    """Late-data handling is observable, not just configured: in update
    mode a row arriving after the watermark passed its window is DROPPED
    (its window gets no update), and the engine's own accounting
    (numRowsDroppedByWatermark) records it."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    src_dir = tmp_path / "late"
    src_dir.mkdir()
    # batch 1: establish event-time up to 10:00 (watermark -> 09:55)
    (src_dir / "a.txt").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"ts": "2024-01-01T09:01:00Z", "u": 1},
                {"ts": "2024-01-01T10:00:00Z", "u": 2},
            ]
        )
    )

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, u long").alias("p")
    ).select("p.*")
    agg = (
        parsed.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = tmp_path / "latesink"
    out.mkdir()
    ckpt = str(tmp_path / "lateckpt")

    def run_batch(tag):
        def sink(df, bid):
            df.selectExpr("window.start as ws", "n").write.mode(
                "append"
            ).parquet(str(out / tag))

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    run_batch("b1")
    # batch 2: a 09:02 row — its 09:00 window is behind the 09:55
    # watermark, so it must produce NO update and be counted as dropped
    (src_dir / "b.txt").write_text(
        _json.dumps({"ts": "2024-01-01T09:02:00Z", "u": 3})
    )
    q2 = run_batch("b2")

    b1 = {str(r.ws): r.n for r in spark.read.parquet(str(out / "b1")).collect()}
    assert b1["2024-01-01 09:00:00"] == 1
    b2_dir = out / "b2"
    b2 = (
        {str(r.ws): r.n for r in spark.read.parquet(str(b2_dir)).collect()}
        if any(f.endswith(".parquet") for f in os.listdir(b2_dir))
        else {}
    )
    assert "2024-01-01 09:00:00" not in b2  # late row produced no update
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for pr in q2.recentProgress
        for op in pr.get("stateOperators", [])
    )
    assert dropped >= 1  # and the engine accounted for the drop


def test_streaming_ohlc_bars_match_batch(spark, tmp_path):
    """OHLC downsampling runs as a watermarked streaming aggregate:
    min_by/max_by/min/max are all mergeable, so candlesticks stream with
    bounded state and equal the batch bars on the same ticks."""
    import json as _json

    from pyspark.sql import functions as F

    src_dir = tmp_path / "ticks"
    src_dir.mkdir()
    ticks = [
        ("2024-01-01T09:01:00Z", 10.0),
        ("2024-01-01T09:05:00Z", 30.0),   # high
        ("2024-01-01T09:07:00Z", 5.0),    # low
        ("2024-01-01T09:09:00Z", 20.0),   # close of 09:00 bar
        ("2024-01-01T09:11:00Z", 15.0),   # next bar
    ]
    (src_dir / "t.txt").write_text(
        "\n".join(_json.dumps({"ts": t, "v": v}) for t, v in ticks)
    )

    def bars(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(
                F.min_by("v", "ts").alias("open"),
                F.max("v").alias("high"),
                F.min("v").alias("low"),
                F.max_by("v", "ts").alias("close"),
            )
            .select(F.col("w.start").cast("string").alias("ws"),
                    "open", "high", "low", "close")
        )

    raw = P.file_source(spark, str(src_dir))
    parsed = raw.select(
        F.from_json("value", "ts timestamp, v double").alias("p")
    ).select("p.*")
    out = str(tmp_path / "barsink")

    def sink(df, _bid):
        df.write.mode("overwrite").parquet(out)

    q = (
        bars(parsed)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "barckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.ws: (r.open, r.high, r.low, r.close)
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(
        [(t.replace("T", " ").replace("Z", ""), v) for t, v in ticks],
        "ts string, v double",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    batch = {
        r.ws: (r.open, r.high, r.low, r.close)
        for r in bars(batch_df).collect()
    }
    assert streamed == batch
    assert streamed["2024-01-01 09:00:00"] == (10.0, 30.0, 5.0, 20.0)


def test_streaming_quantile_hist_state_merges_to_batch_estimate(spark, tmp_path):
    """The quantile sketch's streaming story, executed: bin counts built
    as streaming state across micro-batches (SUM-merge is exactly what a
    streaming groupBy-sum does) yield BIT-IDENTICAL quantile estimates
    to the single-pass batch query — the same contract the HLL register
    test pins for distinct counting. Global (mn, mx, n) bounds come from
    the batch stats table: the sketch's one global input, like HLL's
    hash seed."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        hist_bin_counts,
        hist_quantile_estimates,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    stats, batch_counts = hist_bin_counts(li, "l_extendedprice", "l_returnflag")
    stats = stats.cache()

    src = str(tmp_path / "lisrc")
    li.where(F.col("l_orderkey") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    li.where(F.col("l_orderkey") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = stream.select(
        F.col("l_returnflag").alias("flag"), "l_extendedprice"
    ).join(F.broadcast(stats), "flag")
    width = (F.col("mx") - F.col("mn")) / 64.0
    raw = F.floor((F.col("l_extendedprice") - F.col("mn")) / width).cast(
        "long"
    )
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(63), F.greatest(F.lit(0), raw))
    )
    counts = joined.groupBy("flag", bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("qhs_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    streamed = {
        (r.flag, r.q): r.est_v
        for r in hist_quantile_estimates(
            stats, spark.table("qhs_counts"), qs
        ).collect()
    }
    batch = {
        (r.flag, r.q): r.est_v
        for r in hist_quantile_estimates(stats, batch_counts, qs).collect()
    }
    assert streamed == batch  # bit-identical estimates


def test_suffix_remove_incremental_stream_equals_batch(spark, tmp_path):
    """VERDICT r6 #5 'done' criterion: rewriting an increment against a
    FROZEN corpus through a stream (3 micro-batches) produces exactly
    the rewrite a single batch pass produces — n_words, n_kept, and the
    rebuilt text — because cuts come only from the corpus, never from
    batch-mates. The removal twin of the ivf_assign equivalence."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)

    batch = {
        r.doc_id: (r.n_words, r.n_kept, r.text_deduped)
        for r in D.remove_suffix_spans_against_corpus(
            new, corpus, "text", "doc_id", 5
        ).collect()
    }
    assert len(batch) > 0
    assert any(v[1] < v[0] for v in batch.values())  # something was cut

    src = str(tmp_path / "increment")
    ckpt = str(tmp_path / "ckpt")
    new.repartition(3).write.parquet(src)
    streamed: dict[int, tuple] = {}

    def sink(df, bid):
        for r in D.remove_suffix_spans_against_corpus(
            df, corpus, "text", "doc_id", 5
        ).collect():
            streamed[r.doc_id] = (r.n_words, r.n_kept, r.text_deduped)

    q = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert streamed == batch


def test_classifier_score_at_ingest_stream_equals_batch(spark, tmp_path):
    """VERDICT r7 #6 'done' criterion: scoring a crawl increment under
    FROZEN classifier weights through a stream (3 micro-batches)
    produces exactly the single-batch scores — featurize depends only
    on the doc's own text and the weight table rides as a broadcast, so
    curation flags can be produced at ingest (the ivf_assign /
    embedding_cross_hits frozen-state pattern, now for model scores)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import (
        classifier as C,
    )
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        _quality_training_corpus,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    corpus = _quality_training_corpus(spark, sf_dir)
    feats = C.hashed_features(corpus, "text", "doc_id")
    wts = C.logreg_train(
        feats, corpus.select("doc_id", "y"), "doc_id", iters=3, lr=0.5
    )
    # freeze: the trained weights become a static local table, exactly
    # what a serving/ingest job loads at startup
    wts = spark.createDataFrame(wts.collect(), schema=wts.schema)

    new = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 10 == 0)
    )
    batch = {
        r.doc_id: r.score
        for r in C.logreg_score_docs(new, wts).collect()
    }
    assert len(batch) > 0

    src = str(tmp_path / "increment")
    ckpt = str(tmp_path / "ckpt")
    new.repartition(3).write.parquet(src)
    streamed: dict[int, float] = {}

    def sink(df, bid):
        for r in C.logreg_score_docs(df, wts).collect():
            streamed[r.doc_id] = r.score

    q = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert streamed == batch


def test_bm25_incremental_merge_maintained_by_foreach_batch(spark, tmp_path):
    """VERDICT r8 #3 'done' criterion: a foreachBatch loop ACTUALLY
    maintains the BM25 index across micro-batches (round 8 only proved
    the merge associative; nothing composed it). A frozen index over 80%
    of the corpus is updated per micro-batch (>=3 batches, batch_id-keyed
    merge names so an at-least-once replay is idempotent), and the final
    maintained index is value-identical to a from-scratch rebuild over
    the full corpus — postings, df, and dl compared as exact sets, plus
    the query path returns identical top-k."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_index_merge_increment,
        bm25_query_indexed,
    )
    from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import (
        reset_reuse_cache,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    reset_reuse_cache()
    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 5 > 0)
    increment = docs.where(F.col("doc_id") % 5 == 0)

    state = {"index": bm25_build_index(corpus, corpus_tag="t_stream_bm25")}
    seen_batches = []

    def sink(batch_df, bid):
        # the maintenance loop the operator docstring advertises: merge
        # THIS micro-batch into the running index, batch_id-keyed
        state["index"] = bm25_index_merge_increment(
            state["index"], batch_df, corpus_tag="t_stream_bm25", batch_id=bid
        )
        seen_batches.append(bid)

    src = str(tmp_path / "bm25_inc")
    ckpt = str(tmp_path / "bm25_ckpt")
    increment.repartition(3).write.parquet(src)
    q = (
        spark.readStream.schema(increment.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(seen_batches) >= 3, seen_batches

    full = bm25_build_index(docs, corpus_tag="t_stream_bm25_full")
    for m, f, cols in zip(
        state["index"],
        full,
        (("term", "doc_id", "tf"), ("term", "df"), ("doc_id", "dl")),
    ):
        ms = {tuple(r) for r in m.select(*cols).collect()}
        fs = {tuple(r) for r in f.select(*cols).collect()}
        assert ms == fs, cols
    a = bm25_query_indexed(state["index"], ("data", "stream"), k_top=10)
    b = bm25_query_indexed(full, ("data", "stream"), k_top=10)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    reset_reuse_cache()


def test_increment_verdicts_stream_equals_batch(spark, tmp_path):
    """VERDICT r10 #5 'done' criterion: the incremental curation path
    ACTUALLY runs as a stream. The frozen nightly state (hot grams,
    scrubbed base corpus, bench Bloom sketch, trained weights) is built
    once; the crawl increment arrives as a parquet stream in >= 3
    micro-batches and every batch is judged through the SAME
    _judge_increment the batch query uses in a foreachBatch sink. The
    accumulated streamed verdicts must equal the one-shot batch run
    row-for-row — the delivery-side proof on top of
    test_increment_chunks_equal_batch's semantic one. At-least-once
    safety rides on per-doc purity: a replayed batch overwrites its own
    doc_ids with identical rows (upsert-by-key), checked by re-running
    one batch through the sink."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        _frozen_nightly_state,
        _judge_increment,
    )
    from kafka_clickhouse_ingest_pipeline_spark.queries.dedup import (
        _docs_with_boilerplate,
    )

    sf_dir = "/root/testdata/sf0.001"
    state = _frozen_nightly_state(spark, sf_dir)
    incr = (
        _docs_with_boilerplate(spark, sf_dir)
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    batch = {r.doc_id: r for r in _judge_increment(incr, state).collect()}
    assert len(batch) > 0

    src = str(tmp_path / "incr_stream")
    ckpt = str(tmp_path / "incr_ckpt")
    incr.repartition(3).write.parquet(src)
    streamed: dict[int, object] = {}
    batches: list = []

    def sink(df, bid):
        rows = _judge_increment(df, state).collect()
        batches.append((bid, df))
        for r in rows:
            streamed[r.doc_id] = r

    q = (
        spark.readStream.schema(incr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batches) >= 3, [b for b, _ in batches]
    assert set(streamed) == set(batch)
    for did, r in batch.items():
        assert streamed[did] == r, (did, r, streamed[did])

    # at-least-once replay: re-judging one delivered batch produces the
    # identical rows, so an upsert-keyed sink converges exactly-once
    _, replay_df = batches[0]
    for r in _judge_increment(replay_df, state).collect():
        assert streamed[r.doc_id] == r
