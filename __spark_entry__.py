"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``kafka_clickhouse_ingest_pipeline_spark.registry`` — every
implemented operator from SURVEY.md §2 registers itself there with a Spark
callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_clickhouse_ingest_pipeline_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # The driver supplies its own SparkSession. events.ts has shipped as
    # TIMESTAMP(NANOS) (needs this legacy long fallback) and as ntz micros;
    # tables.load_table normalizes both, this conf just keeps the nanos
    # form readable and is harmless otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fn = registry.REGISTRY["pipeline_flagship"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only check)."""
    return {
        name: q.oracle for name, q in registry.REGISTRY.items() if q.oracle is not None
    }
