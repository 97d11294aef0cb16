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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The caller may hand us a vanilla SparkSession (the driver does);
        # events.parquet is TIMESTAMP(NANOS) which Spark rejects unless the
        # legacy long fallback is on. Runtime-settable, so set it here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts has shipped in two physical forms across testdata
    # generations; normalize both to session-TZ TIMESTAMP (session TZ is
    # pinned UTC in session.py, matching DuckDB's naive-as-UTC epoch math):
    #  - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong it
    #    arrives as epoch-nanos long. Integer `div`, not `/`: epoch-nanos
    #    ≈ 1.7e18 exceeds double's 2^53 integer range, and float division
    #    rounds a few rows to the wrong microsecond.
    #  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    #    TIMESTAMP_NTZ; cast reinterprets the wall-clock in the (UTC)
    #    session zone — lossless.
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
