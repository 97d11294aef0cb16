"""Meta-test of the correctness gate itself (round-7 VERDICT item 7).

255 green queries prove Spark and DuckDB AGREE; they do not prove the
comparator would NOTICE a disagreement. A checker bug (e.g. a normalize()
change that collapses distinct values, or a compare that silently zips
short) would green the whole registry at once — the single worst silent
failure this repo can have, because the gate IS the product's evidence.

Strategy: run the DuckDB oracle for a diverse sample of registered
queries, feed its own result back as the "Spark" side (must PASS — the
comparator agrees with itself), then apply one surgical mutation at a
time — perturb one value, null one value, drop one row, duplicate one
row, rename one column — and assert the gate FAILS every mutant. Runs
DuckDB only (no Spark session): the comparator's sensitivity is what is
under test, and the oracle result exercises the same value shapes
(floats, bigint epochs, NULLs, strings) the real gate sees.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from kafka_clickhouse_ingest_pipeline_spark.tables import TABLES
from tools.check_correctness import compare_results

SF_DIR = "/root/testdata/sf0.001"

# Diverse shapes: group-agg floats, joins, epoch-ms bigints, string keys,
# NULL-bearing rows, window output, dedup pairs, text stats, set ops.
SAMPLE = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "percentiles_by_group",
    "correlated_subquery_above_avg",
    "fuzzy_name_match",
    "null_semantics",
    "topk_orders",
    "dedup_exact_docs",
    "text_token_stats",
    "scan_count",
]


@pytest.fixture(scope="module")
def oracle_results():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    out = {}
    for name in SAMPLE:
        assert name in oracles, f"sample query {name} left the registry"
        res = con.execute(oracles[name])
        cols = [d[0] for d in res.description]
        rows = [tuple(r) for r in res.fetchall()]
        out[name] = (cols, rows)
    con.close()
    return out


def _mutable_cell(rows):
    """(row_idx, col_idx) of the first non-None cell, preferring numerics
    (strings mutate fine too); None if the result set has no cells."""
    fallback = None
    for i, r in enumerate(rows):
        for j, v in enumerate(r):
            if v is None:
                continue
            if isinstance(v, bool):
                return i, j
            if isinstance(v, (int, float)) and not (
                isinstance(v, float) and math.isnan(v)
            ):
                return i, j
            if fallback is None:
                fallback = (i, j)
    return fallback


def _perturb(v):
    if isinstance(v, bool):
        return not v
    if isinstance(v, int):
        return v + 1
    if isinstance(v, float):
        # well above the 1e-6 comparator tolerance, even for large epochs
        return v * (1 + 1e-3) + 1e-3
    if isinstance(v, str):
        return v + "_x"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v) + b"x"
    return "MUTANT" if v is not None else v


def _with_cell(rows, i, j, value):
    out = [list(r) for r in rows]
    out[i][j] = value
    return [tuple(r) for r in out]


def test_pristine_output_passes(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        assert compare_results(cols, rows, cols, rows) == [], name


def test_gate_fails_on_value_perturbation(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        cell = _mutable_cell(rows)
        assert cell is not None, f"{name}: no mutable cell in sample output"
        i, j = cell
        mutant = _with_cell(rows, i, j, _perturb(rows[i][j]))
        assert mutant[i][j] != rows[i][j], (name, rows[i][j])
        status = compare_results(cols, mutant, cols, rows)
        assert status, f"{name}: gate PASSED a perturbed value {rows[i][j]!r}"


def test_gate_fails_on_nulled_value(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        i, j = _mutable_cell(rows)
        mutant = _with_cell(rows, i, j, None)
        status = compare_results(cols, mutant, cols, rows)
        assert status, f"{name}: gate PASSED a value nulled to None"


def test_gate_fails_on_dropped_row(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        assert rows, f"{name}: empty sample output"
        status = compare_results(cols, rows[1:], cols, rows)
        assert status, f"{name}: gate PASSED a dropped row"


def test_gate_fails_on_duplicated_row(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        status = compare_results(cols, rows + [rows[0]], cols, rows)
        assert status, f"{name}: gate PASSED a duplicated row"


def test_gate_fails_on_renamed_column(oracle_results):
    for name, (cols, rows) in oracle_results.items():
        renamed = list(cols)
        renamed[0] = renamed[0] + "_x"
        status = compare_results(renamed, rows, cols, rows)
        assert status, f"{name}: gate PASSED a renamed column"


def test_gate_fails_on_swapped_rows_between_keys(oracle_results):
    """Swapping two rows' values in one column must fail when the rows are
    otherwise distinguishable — guards against a comparator that hashes
    columns independently instead of row-wise."""
    for name, (cols, rows) in oracle_results.items():
        if len(rows) < 2 or len(cols) < 2:
            continue
        # find a column where rows 0/1 differ (so the swap changes rows)
        for j in range(len(cols)):
            if rows[0][j] != rows[1][j]:
                mutant = _with_cell(rows, 0, j, rows[1][j])
                mutant = _with_cell(mutant, 1, j, rows[0][j])
                if sorted(map(repr, mutant)) != sorted(map(repr, rows)):
                    status = compare_results(cols, mutant, cols, rows)
                    assert status, f"{name}: gate PASSED cross-row swap"
                break
