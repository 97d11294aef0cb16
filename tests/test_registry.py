"""Contract tests: every registered query runs at sf0.001 with a stable
schema, and every oracle is valid DuckDB SQL over the same tables."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.tables import TABLES

registry.load_all()
ALL = sorted(registry.REGISTRY)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "event_type"


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_bench_headline_fits_driver_tail():
    """The driver captures only the LAST 2000 chars of bench stdout and
    parses the JSON line from that tail. Round 4's 79-query line exceeded
    it and the round recorded parsed=null. Pin the pessimistic serialized
    size under budget — every timing budgeted at 6 chars ('100.12', a
    >100 s outlier; sf0.1 timings are actually 0.5-2.6 s) so the guard
    holds even with slow outlier queries, and bench.py itself re-encodes
    at 1 decimal as a runtime backstop if the line ever exceeds the
    budget anyway. Also pins that every headline name resolves in the
    registry."""
    import json as _json

    import bench

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"headline names not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    pessimistic = _json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 12345.67,
            "unit": "sec",
            "queries": {k: 100.12 for k in bench.HEADLINE},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(pessimistic) < 1900, len(pessimistic)
    # the 44 baseline keys from BENCH_r01 must stay in the headline so
    # bench_vs_baseline stays like-for-like comparable
    from pathlib import Path as _Path

    r01_path = _Path(__file__).resolve().parent.parent / "BENCH_r01.json"
    r01 = _json.loads(r01_path.read_text())["parsed"]["queries"]
    lost = set(r01) - set(bench.HEADLINE)
    assert not lost, f"baseline keys dropped from headline: {sorted(lost)}"


def test_oracle_coverage_cannot_rot():
    """VERDICT #10 hook: the driver samples ~50 of the registered queries
    per round; this asserts the *full* registry stays oracle-checked so
    the unsampled remainder can't silently lose value coverage. Any new
    rows-only query must be added to the explicit allowlist with a reason
    (and shows up in review as a diff here)."""
    ROWS_ONLY_ALLOWED = set()  # every registered query is value-checked
    oracles = entrymod.oracle_sql()
    missing = {
        name for name in entrymod.queries()
        if name not in oracles and name not in ROWS_ONLY_ALLOWED
    }
    assert not missing, f"queries without oracles: {sorted(missing)}"


@pytest.mark.parametrize("name", ALL)
def test_query_runs_and_oracle_agrees_on_shape(name, spark, sf_dir, duck):
    q = registry.REGISTRY[name]
    df = q.fn(spark, sf_dir)
    n_spark = df.count()
    # tree-wide anti-pattern sweep, enforced on EVERY registered query:
    # no true cartesian product (broadcast-1-row crossJoins compile to
    # BroadcastNestedLoopJoin, which is fine), and no row-at-a-time
    # Python (Arrow entry points compile to ArrowEvalPython /
    # FlatMapGroupsInPandas / MapInPandas, never BatchEvalPython)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python"
    if q.oracle is None:
        assert n_spark >= 0
        return
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(df.columns) == sorted(ocols), f"{name}: column names diverge"
    assert n_spark == len(orows), f"{name}: row count diverges"
