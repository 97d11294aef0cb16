"""Testdata table catalog.

Loads the driver-generated parquet tables (/root/testdata/sf*/ — see
TESTDATA.md) and registers them as temp views so both the DataFrame API and
spark.sql() can address them. Mirrors the reference's "declared at sink"
schema discipline (consumer/src/main/kotlin/.../ClickHouseWriterService.kt:91-96
warns against inferring columns from data): table names are a fixed list, not
a directory glob.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to session-TZ TIMESTAMP.

    Timestamps have shipped in two physical parquet forms across testdata
    generations (session TZ is pinned UTC in session.py, matching DuckDB's
    naive-as-UTC epoch math):
     - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong it
       arrives as epoch-nanos long. Integer `div`, not `/`: epoch-nanos
       ≈ 1.7e18 exceeds double's 2^53 integer range, and float division
       rounds a few rows to the wrong microsecond.
     - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
       TIMESTAMP_NTZ; cast reinterprets the wall-clock in the (UTC)
       session zone — lossless.
    """
    ts_type = dict(df.dtypes).get(ts_col)
    if ts_type == "bigint":
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The caller may hand us a vanilla SparkSession (the driver does);
        # events.parquet is TIMESTAMP(NANOS) which Spark rejects unless the
        # legacy long fallback is on. Runtime-settable, so set it here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_ts(df, "ts")
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
