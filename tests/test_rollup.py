"""Incremental rollup maintenance (SummingMergeTree analog)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.streaming import rollup as R
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

KEYS = ["event_type"]


def _expected(ev):
    return {
        r.event_type: (r.sum_value, r.n_events, r.min_value, r.max_value)
        for r in R.partial_aggregate(ev, KEYS, "value").collect()
    }


def _actual(spark, path):
    return {
        r.event_type: (r.sum_value, r.n_events, r.min_value, r.max_value)
        for r in R.read_rollup(spark, path, KEYS).collect()
    }


def _assert_matches(actual, expected):
    assert set(actual) == set(expected)
    for k, (s, n, lo, hi) in expected.items():
        a_s, a_n, a_lo, a_hi = actual[k]
        assert a_n == n and a_lo == lo and a_hi == hi
        assert a_s == pytest.approx(s, rel=1e-12)  # fold-order ulp noise only


def test_rollup_stream_matches_batch_and_compacts(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    src_dir, table, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "rollup"),
        str(tmp_path / "ckpt"),
    )
    # several source files -> several micro-batches -> several parts
    ev.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.format("parquet")
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    R.rollup_sink(stream, KEYS, "value", table, ckpt).awaitTermination(120)

    expected = _expected(ev)
    _assert_matches(_actual(spark, table), expected)

    # inserts appended parts (one per batch), reads fold them
    n_parts_before = len(glob.glob(f"{table}/*.parquet"))
    assert n_parts_before >= 4
    assert spark.read.parquet(table).count() > len(expected)

    # background-merge analog: fewer files, one row per key, same answer
    R.compact_rollup(spark, table, KEYS)
    assert len(glob.glob(f"{table}/*.parquet")) < n_parts_before
    assert spark.read.parquet(table).count() == len(expected)
    _assert_matches(_actual(spark, table), expected)


def test_rollup_incremental_append_keeps_folding(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    table = str(tmp_path / "rollup2")
    half1 = ev.where(F.col("value") < 0)
    half2 = ev.where(~(F.col("value") < 0))
    R.partial_aggregate(half1, KEYS, "value").write.mode("append").parquet(table)
    R.partial_aggregate(half2, KEYS, "value").write.mode("append").parquet(table)
    _assert_matches(_actual(spark, table), _expected(ev))
