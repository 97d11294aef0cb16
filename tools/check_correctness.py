"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Floats compare with a small tolerance locally
(the driver hashes exactly — queries are expected to round on both sides so
this only matters for diagnosing).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_clickhouse_ingest_pipeline_spark.session import build_session  # noqa: E402
from kafka_clickhouse_ingest_pipeline_spark.tables import TABLES  # noqa: E402


def normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(normalize(r[i]) for i in order))
    return sorted(out, key=repr)


def approx_equal(a, b, tol=1e-6):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=tol, abs_tol=tol)
    return a == b


def compare_results(scols, srows, ocols, orows) -> list[str]:
    """The gate's comparison: column names (order-insensitive), row count,
    then order-insensitive values with float tolerance. Returns the list
    of discrepancy strings — empty means PASS. Factored out of main() so
    tests/test_gate_sensitivity.py can prove the gate FAILS on perturbed
    output (a checker bug is a silent 255-query outage)."""
    status = []
    if sorted(scols) != sorted(ocols):
        status.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not status:
        sk = rows_key([tuple(r) for r in srows], scols)
        ok = rows_key(orows, ocols)
        n_bad = 0
        first_bad = None
        for a, b in zip(sk, ok):
            if len(a) != len(b) or not all(
                approx_equal(x, y) for x, y in zip(a, b)
            ):
                n_bad += 1
                if first_bad is None:
                    first_bad = (a, b)
        exact_bad = sum(1 for a, b in zip(sk, ok) if repr(a) != repr(b))
        if n_bad:
            status.append(f"values {n_bad}/{len(sk)} differ; first {first_bad}")
        elif exact_bad:
            status.append(
                f"EXACT-HASH RISK: {exact_bad}/{len(sk)} rows differ bitwise "
                f"(within tolerance)"
            )
    return status


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        status = compare_results(scols, srows, ocols, orows)
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
