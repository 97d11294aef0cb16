"""B9: DDL surface — CREATE DATABASE/TABLE, INSERT, TRUNCATE-equivalent
(consumer/clickhouse/init-db.sh:20-36; TRUNCATE in
ClickHouseRepositoryIntegrationTest.kt:124)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def warehouse(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS ingest_db")
    yield "ingest_db"
    spark.sql("DROP DATABASE IF EXISTS ingest_db CASCADE")


def test_create_insert_select_truncate(spark, warehouse, tmp_path):
    # the consumer2 test schema (init-clickhouse.sql:5-13), MergeTree
    # ORDER BY becomes the write-layout concern (plans/layout.py).
    # Managed table (TRUNCATE is only legal on managed tables); the
    # warehouse dir is the session default, dropped by the fixture.
    spark.sql(
        f"""
        CREATE TABLE {warehouse}.ingested_data (
          sensorId STRING,
          temperature DOUBLE,
          timestamp STRING,
          value INT,
          message STRING,
          receivedAt TIMESTAMP
        ) USING parquet
        """
    )
    spark.sql(
        f"""
        INSERT INTO {warehouse}.ingested_data VALUES
          ('s1', 21.5, '2023-01-01T10:00:00Z', 1, 'hello', current_timestamp()),
          ('s2', NULL, NULL, NULL, NULL, current_timestamp())
        """
    )
    # count() readback (ClickHouseRepositoryIntegrationTest.kt:110)
    assert spark.sql(f"SELECT count(*) AS n FROM {warehouse}.ingested_data").first().n == 2
    # NULL round-trip (…:194-236)
    row = spark.sql(
        f"SELECT * FROM {warehouse}.ingested_data WHERE sensorId = 's2'"
    ).first()
    assert row.temperature is None and row.value is None
    # TRUNCATE (…:124)
    spark.sql(f"TRUNCATE TABLE {warehouse}.ingested_data")
    assert spark.sql(f"SELECT count(*) AS n FROM {warehouse}.ingested_data").first().n == 0
