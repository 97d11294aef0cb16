"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle (None for non-SQL-expressible
operators, which get a weaker rows-only check). This is the single source of
truth behind ``__spark_entry__.queries()`` / ``oracle_sql()``.

Oracle-parity conventions (SURVEY.md §7 "hard parts"):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (4 dp) on both sides so summation-order
  ulp noise can't flip the value hash;
- timestamps leave the query as epoch millis (bigint) or formatted strings —
  never raw timestamp values — to dodge ns-vs-µs python-type skew;
- DuckDB integer ``SUM`` returns INT128, so oracle SQL casts to BIGINT where
  Spark produces long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None
    description: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, description: str = ""):
    """Register a query implementation with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .queries import (  # noqa: F401
        analytics,
        behavior,
        curation,
        dedup,
        multimodal,
        pipeline,
        relational,
        sampling,
        similarity,
        text,
        timeseries,
        udfs,
    )
