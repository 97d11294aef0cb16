"""Unit tests for tier-A ingest operators, mirroring the reference's test
scenarios (SURVEY.md §5): valid/invalid parse mix, all-invalid batch, NULL
round-trip, auth accept/reject, enrichment.

Reference scenarios replicated (paths relative to /root/reference/):
- MessageProcessorTest.kt:30-128  (parse-valid, mixed, all-invalid)
- handler_test.go:45-182          (auth accept / reject matrix)
- ClickHouseRepositoryIntegrationTest.kt:194-236 (NULL fidelity)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import ingest

# Payloads lifted from the reference's tests (MessageProcessorTest.kt:32-33,
# 65-66,113-114 and publisher/README.md:115).
VALID = '{"sensorId": "A1", "temperature": 25.5, "timestamp": "2023-10-27T10:00:00Z"}'
VALID_PARTIAL = '{"sensorId": "B2"}'
VALID_EXTRA_KEYS = '{"sensorId": "C3", "unknown_key": 42, "another": "x"}'
MALFORMED_TRUNCATED = '{"sensorId": "D4", "value":'
MALFORMED_COMMAS = '{"sensorId": "F6",,}'
EMPTY = ""


def _payload_df(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


class TestTypedParse:
    def test_valid_payload_parses_all_fields(self, spark):
        out = ingest.parse_typed(_payload_df(spark, [VALID])).collect()
        assert len(out) == 1
        row = out[0]
        assert row.sensorId == "A1"
        assert row.temperature == 25.5
        assert row.timestamp == "2023-10-27T10:00:00Z"
        assert row.value is None and row.message is None

    def test_missing_keys_become_null(self, spark):
        row = ingest.parse_typed(_payload_df(spark, [VALID_PARTIAL])).collect()[0]
        assert row.sensorId == "B2"
        assert row.temperature is None

    def test_unknown_keys_ignored(self, spark):
        row = ingest.parse_typed(_payload_df(spark, [VALID_EXTRA_KEYS])).collect()[0]
        assert row.sensorId == "C3"

    def test_mixed_batch_drops_only_malformed(self, spark):
        df = _payload_df(
            spark, [VALID, MALFORMED_TRUNCATED, VALID_PARTIAL, MALFORMED_COMMAS]
        )
        out = ingest.parse_typed(df).collect()
        assert sorted(r.sensorId for r in out) == ["A1", "B2"]

    def test_all_invalid_batch_yields_empty_not_error(self, spark):
        # MessageProcessorTest: all-failed batch still commits (empty result,
        # no exception).
        df = _payload_df(spark, [MALFORMED_TRUNCATED, MALFORMED_COMMAS])
        assert ingest.parse_typed(df).count() == 0

    def test_raw_payload_retained(self, spark):
        row = ingest.parse_typed(_payload_df(spark, [VALID]), keep_raw=True).collect()[0]
        assert row._raw_data == VALID


class TestValidityGate:
    def test_empty_body_rejected(self, spark):
        df = _payload_df(spark, [VALID, EMPTY])
        assert ingest.filter_nonempty(df).count() == 1

    def test_invalid_json_rejected(self, spark):
        df = _payload_df(spark, [VALID, MALFORMED_COMMAS, "not json at all {{"])
        assert ingest.json_validity_gate(df).count() == 1


class TestDynamicMapParse:
    def test_object_payload_to_map(self, spark):
        out = ingest.parse_dynamic(_payload_df(spark, [VALID]))
        row = out.collect()[0]
        assert row._map["sensorId"] == "A1"

    def test_malformed_dropped(self, spark):
        assert ingest.parse_dynamic(_payload_df(spark, [MALFORMED_COMMAS])).count() == 0


class TestProjection:
    def test_fixed_projection_missing_column_is_null(self, spark):
        df = ingest.parse_typed(_payload_df(spark, [VALID]), keep_raw=False)
        out = ingest.project_fixed(df, ("sensorId", "temperature", "humidity"))
        row = out.collect()[0]
        assert row.sensorId == "A1" and row.humidity is None

    def test_projection_from_map(self, spark):
        df = ingest.parse_dynamic(_payload_df(spark, [VALID]))
        out = ingest.project_fixed(df, ("sensorId", "nope"))
        row = out.collect()[0]
        assert row.sensorId == "A1" and row.nope is None


class TestEnrichment:
    def test_received_at_added(self, spark):
        df = ingest.parse_typed(_payload_df(spark, [VALID]), keep_raw=False)
        out = ingest.enrich_received_at(df)
        assert "received_at" in out.columns
        assert "received_at_ms" not in out.columns
        assert out.filter(F.col("received_at").isNotNull()).count() == 1

    def test_received_at_ms_is_true_instant(self, spark):
        """with_epoch_ms exports the INSTANT epoch (epoch_ms_instant):
        received_at_ms must equal floor(unix_micros(received_at)/1000)
        regardless of session zone — the external-sink contract."""
        df = ingest.parse_typed(_payload_df(spark, [VALID]), keep_raw=False)
        out = ingest.enrich_received_at(df, with_epoch_ms=True)
        assert "received_at_ms" in out.columns
        bad = out.filter(
            F.col("received_at_ms")
            != F.floor(F.unix_micros("received_at") / F.lit(1000)).cast("long")
        ).count()
        assert bad == 0


class TestAuthGate:
    def _keys(self, spark):
        return spark.createDataFrame(
            [("key-active", True), ("key-disabled", False)],
            "api_key string, is_active boolean",
        )

    def _events(self, spark):
        return spark.createDataFrame(
            [(1, "key-active"), (2, "key-disabled"), (3, "key-unknown")],
            "event_id long, api_key string",
        )

    def test_active_key_accepted(self, spark):
        out = ingest.auth_gate(self._events(spark), self._keys(spark))
        assert [r.event_id for r in out.collect()] == [1]

    def test_inactive_and_unknown_rejected(self, spark):
        out = ingest.auth_rejects(self._events(spark), self._keys(spark))
        assert sorted(r.event_id for r in out.collect()) == [2, 3]

    def test_gate_plus_rejects_partition_input(self, spark):
        ev, keys = self._events(spark), self._keys(spark)
        n = ingest.auth_gate(ev, keys).count() + ingest.auth_rejects(ev, keys).count()
        assert n == ev.count()

    def test_auth_join_is_broadcast(self, spark):
        plan = ingest.auth_gate(
            self._events(spark), self._keys(spark)
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestObservability:
    def test_observe_counts_invalid(self, spark):
        from pyspark.sql import Observation  # noqa: F401 — API presence

        df = _payload_df(spark, [VALID, MALFORMED_COMMAS, VALID_PARTIAL])
        observed = ingest.observe_parse_quality(df)
        observed.collect()  # metrics require an action
        # Observation via named observe: read through the listener-free API
        # is not exposed on plain observe(name, ...); presence of the column
        # pipeline and a clean run is the assertion here.
        assert observed.count() == 3


class TestKotlinxStrictParseParity:
    """VERDICT r3 #4: kotlinx decodeFromString accept/reject parity,
    enumerating MessageProcessorTest.kt's cases plus the structural edges
    of the whole-string span rule. The former documented deviation
    ('{"a":1}junk' accepted) is closed: trailing garbage now drops."""

    KOTLINX_ACCEPT = [
        '{"sensorId": "A1", "temperature": 25.5}',   # MessageProcessorTest.kt:32
        '{"sensorId": "B2", "message": "OK"}',       # :33
        '{"sensorId": "C3", "value": 99}',           # :65
        '{"sensorId": "E5"}',                        # :97
        '  {"sensorId": "H8"}  \n',                  # surrounding whitespace ok
        '{"a":"}"}',                                 # brace inside a string
        '{"a":"\\"}"}',                              # escaped quote then brace
        '{"a":{"b":[1,2]}}',                         # nesting
    ]
    KOTLINX_REJECT = [
        '{"sensorId": "D4", "value":}',              # :66 invalid JSON
        '{"sensorId": "F6",,}',                      # :113 invalid JSON
        '{"sensorId": "G7"}invalid',                 # :114 trailing garbage
        '{"a":1}{"b":2}',                            # concatenated docs
        '{"a":1},',                                  # trailing comma
        "null",                                      # non-object value
        "[1,2]",                                     # non-object value
        '"just a string"',                           # non-object value
        "",                                          # empty body
    ]

    def test_accept_set_parses(self, spark):
        out = ingest.parse_typed(_payload_df(spark, self.KOTLINX_ACCEPT))
        assert out.count() == len(self.KOTLINX_ACCEPT)

    def test_reject_set_drops(self, spark):
        out = ingest.parse_typed(_payload_df(spark, self.KOTLINX_REJECT))
        assert out.count() == 0

    def test_mixed_batch_keeps_exactly_the_kotlinx_survivors(self, spark):
        df = _payload_df(spark, self.KOTLINX_ACCEPT + self.KOTLINX_REJECT)
        out = ingest.parse_typed(df, keep_raw=True)
        assert sorted(r["_raw_data"] for r in out.collect()) == sorted(
            self.KOTLINX_ACCEPT
        )

    def test_validity_gate_rejects_bracketed_trailing_garbage(self, spark):
        """Go json.Valid is whole-string strict too (A3)."""
        df = _payload_df(
            spark,
            ['{"a":1}junk', "[1,2]extra", '{"a":1}', "[1,2]", "null", "12junk"],
        )
        kept = sorted(
            r["value"] for r in ingest.json_validity_gate(df).collect()
        )
        assert kept == ["[1,2]", "null", '{"a":1}']


class TestStringScalarStrictness:
    """A3 gate, string-scalar whole-string strictness — the LAST
    documented deviation from Go json.Valid, now closed: '"x"junk' drops
    while every legal string scalar (escapes, padding, embedded quotes)
    still passes."""

    def test_validity_gate_full_json_valid_parity(self, spark):
        cases = {
            '"x"': True,
            '  "padded"  ': True,
            '""': True,
            '"brace } inside"': True,
            '"esc \\" quote"': True,
            '"double esc \\\\"': True,
            '"x"junk': False,           # the former deviation
            '"a" "b"': False,           # concatenated strings
            '"unterminated': False,
            'junk"x"': False,
            "12": True,
            "12junk": False,
            "true": True,
        }
        df = _payload_df(spark, list(cases))
        kept = {r["value"] for r in ingest.json_validity_gate(df).collect()}
        assert kept == {p for p, ok in cases.items() if ok}


def test_strict_span_kernel_matches_jvm_folds(spark, sf_dir):
    """The Arrow strict-span kernel must reproduce the JVM HOF folds'
    combined decision on every real payload AND the adversarial shapes:
    braces inside strings, escaped quotes, nested docs, trailing
    whitespace vs trailing junk, string scalars, bare scalars."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators.ingest import (
        json_value_spans_string,
        string_scalar_spans_string,
    )
    from kafka_clickhouse_ingest_pipeline_spark.operators.udfs import (
        json_strict_span_udf,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    def jvm_combined(raw):
        lt = F.ltrim(raw)
        bracketed = F.startswith(lt, F.lit("{")) | F.startswith(lt, F.lit("["))
        strsc = F.startswith(lt, F.lit('"'))
        return (~bracketed | json_value_spans_string(raw)) & (
            ~strsc | string_scalar_spans_string(raw)
        )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("props").cast("string").alias("raw")
    )
    cmp = ev.select(
        jvm_combined(F.col("raw")).alias("jvm"),
        json_strict_span_udf(F.col("raw")).alias("arrow"),
    )
    assert cmp.where("jvm != arrow").count() == 0

    cases = [
        '{"a":1}', '{"a":1}junk', '{"a":1}   ', '  {"a":1}',
        '{"a":"}"}', '{"a":"}"}x', '{"a":"\\""}', '{"a":"\\""}junk',
        '{"a":{"b":[1,2]}}', '{"a":1}}', '[1,2,3]', '[1,2]x', '[]',
        '"x"', '"x"junk', '"x"  ', '  "x"', '"a\\"b"', '"a\\"b"z',
        '""', 'null', '12', '12junk', 'truex', '', '   ',
        '{"sensorId":"G7"}invalid',
    ]
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    rows = df.select(
        "raw",
        jvm_combined(F.col("raw")).alias("jvm"),
        json_strict_span_udf(F.col("raw")).alias("arrow"),
    ).collect()
    for r in rows:
        assert r.jvm == r.arrow, (r.raw, r.jvm, r.arrow)


def test_strict_span_kernel_handles_empty_arrow_batch():
    """Empty batches reach kernels when a partition filters to nothing;
    np.array([]) defaults to float64 and would crash the bitwise
    combine — regression-pinned at the kernel level."""
    import pandas as pd

    from kafka_clickhouse_ingest_pipeline_spark.operators.udfs import (
        json_strict_span_udf,
    )

    out = json_strict_span_udf.func(pd.Series([], dtype=object))
    assert list(out) == []
