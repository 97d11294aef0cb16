"""1:1 mirror of the reference's own integration suite, same data, same
reads, same assertion sequence.

Each test reproduces one @Test method of
`consumer2/.../ClickHouseRepositoryIntegrationTest.kt` byte-for-byte in
inputs and expectations — the exact IngestedData fixtures (:150-154,
:196-198), the exact verification SELECTs (:168, :212), and the
row-by-row assertion order (:169-233) — against embedded Derby through
the same batched JDBC sink (sources/jdbc). A user porting from the
reference gets the behavior its own tests pin.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.sources import jdbc as J

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

SCHEMA = (
    "sensorId string, temperature double, value int, message string, "
    "timestamp string, receivedAt long"
)


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/refparity;create=true"


def _write(spark, url, data):
    df = spark.createDataFrame(data, SCHEMA)
    J.write_jdbc_batch(df, url, "ingested_data", driver=DERBY_DRIVER)


def _read(spark, url):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "ingested_data")
        .option("driver", DERBY_DRIVER)
        # Derby maps StringType to CLOB, and Derby cannot compare CLOBs
        # server-side (ClickHouse String has no such limit) — evaluate
        # filters in Spark instead of pushing them into the dialect
        .option("pushDownPredicate", "false")
        .load()
    )


def test_insert_batch_inserts_multiple_records(spark, tmp_path):
    """`insertBatch should insert multiple records` (:148-176)."""
    url = _url(tmp_path)
    data = [  # :150-154, verbatim
        Row("sensor1", 10.1, None, None, "2023-01-01T10:00:00Z", 1),
        Row("sensor2", None, 50, "Data point", None, 2),
        Row("sensor1", 10.5, None, None, "2023-01-01T10:01:00Z", 3),
    ]
    _write(spark, url, data)
    got = _read(spark, url)
    # :162 — count equals batch size
    assert got.count() == len(data)
    # :168 — SELECT sensorId, temperature WHERE sensorId='sensor1'
    #         ORDER BY timestamp
    rs = (
        got.where(F.col("sensorId") == "sensor1")
        .orderBy("timestamp")
        .select("sensorId", "temperature")
        .collect()
    )
    # :169-175 — two rows, 10.1 then 10.5, nothing after
    assert [(r.sensorId, r.temperature) for r in rs] == [
        ("sensor1", 10.1),
        ("sensor1", 10.5),
    ]


def test_insert_batch_handles_empty_list(spark, tmp_path):
    """`insertBatch should handle empty list gracefully` (:181-190)."""
    url = _url(tmp_path)
    _write(spark, url, [])  # create the table with zero rows
    assert _read(spark, url).count() == 0  # :190


def test_insert_batch_handles_null_values(spark, tmp_path):
    """`insertBatch should handle records with null values` (:194-233)."""
    url = _url(tmp_path)
    data = [  # :196-198, verbatim — null temperature, then null sensorId
        Row("sensor_null", None, None, "Temp missing", None, 1),
        Row(None, None, 123, None, None, 2),
    ]
    _write(spark, url, data)
    got = _read(spark, url)
    assert got.count() == len(data)  # :206
    # :212 — SELECT sensorId, temperature, value, message ORDER BY receivedAt
    rs = (
        got.orderBy("receivedAt")
        .select("sensorId", "temperature", "value", "message")
        .collect()
    )
    # :213-233 — row 1: sensor_null with SQL NULL temperature; row 2:
    # NULL sensorId with value 123; exactly two rows
    assert len(rs) == 2
    assert rs[0].sensorId == "sensor_null"
    assert rs[0].temperature is None
    assert rs[0].message == "Temp missing"
    assert rs[1].sensorId is None
    assert rs[1].value == 123
