"""Ingest dataflow operators (SURVEY.md §2 tier A), Spark-first.

The reference implements these imperatively across three services; here each
step is a declarative DataFrame transform so Catalyst can fuse, push down and
reorder them. Citations point at the reference behavior being replicated
(paths relative to /root/reference/):

- validity gate        publisher/internal/api/handler.go:59-81 (json.Valid)
- auth semi-join       publisher/internal/auth/auth.go:33-59
- lenient typed parse  consumer2/.../processing/MessageProcessor.kt:22-46
                       (ignoreUnknownKeys, all-nullable, drop-bad-continue)
- fixed projection     consumer/.../service/ClickHouseWriterService.kt:53-56,109-117
- enrichment           consumer2/.../persistence/ClickHouseRepository.kt:75
                       (receivedAt = now()); consumer/clickhouse/init-db.sh:28-29
                       (_raw_data, _received_at)

All of it is built-in expression work — no UDFs, fully inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Typed event record: consumer2/.../data/IngestedData.kt:7-16 — every field
# nullable. `timestamp` stays a string at parse time (the reference stores it
# as Nullable(String) in init-clickhouse.sql:8).
INGESTED_DATA_SCHEMA = StructType(
    [
        StructField("sensorId", StringType(), True),
        StructField("temperature", DoubleType(), True),
        StructField("timestamp", StringType(), True),
        StructField("value", IntegerType(), True),
        StructField("message", StringType(), True),
    ]
)

# consumer 1 projection order: ClickHouseWriterService.kt:109-117
CONSUMER1_COLUMNS = ("sensor_id", "temperature", "timestamp", "humidity", "location")


def filter_nonempty(df: DataFrame, payload_col: str = "value") -> DataFrame:
    """A2: reject empty bodies (handler.go:67-71)."""
    c = F.col(payload_col)
    return df.filter(c.isNotNull() & (F.length(c) > 0))


def json_validity_gate(
    df: DataFrame, payload_col: str = "value", variant_col: str | None = None
) -> DataFrame:
    """A3: keep only payloads that parse as JSON (handler.go:74-78).

    ``json.Valid`` accepts any JSON value; we use try-parse-as-variant so
    scalars, arrays and objects all pass, mirroring Go's semantics.
    json.Valid is also whole-string strict, so bracketed docs with
    trailing garbage ('{"a":1}junk') are rejected via the span fold —
    the same strictness DuckDB's json_valid applies on the oracle side.
    Non-string scalars keep the lenient path: try_parse_json already
    rejects '12junk'/'nulljunk'. String scalars get the same whole-string
    strictness via their own span fold ('"x"junk' drops, matching
    json.Valid) — with that, the gate is whole-string strict for every
    JSON value shape.

    ``variant_col``: when set, the parsed variant the gate already paid
    for is kept under that name so downstream field extraction reuses it
    (one JSON parse per row instead of one per consumer — measured on
    pipeline_flagship, whose get_json_object re-parse was its third
    full parse of the payload).
    """
    from .udfs import json_strict_span_udf

    raw = F.col(payload_col).cast("string")
    # the Arrow kernel replays both span state machines (bracketed docs
    # and string scalars) vectorized across the batch; the JVM HOF folds
    # below remain the semantic reference (parity pinned in
    # test_ingest.test_strict_span_kernel_matches_jvm_folds) but cost
    # ~10 struct ops per CHARACTER per row and doubled the flagship
    # ingest query's runtime when they sat in the hot filter path
    if variant_col is None:
        return df.filter(
            F.try_parse_json(raw).isNotNull() & json_strict_span_udf(raw)
        )
    return df.withColumn(variant_col, F.try_parse_json(raw)).filter(
        F.col(variant_col).isNotNull() & json_strict_span_udf(raw)
    )


def json_value_spans_string(raw: Column) -> Column:
    """True iff the first JSON object/array in ``raw`` ends at the last
    non-whitespace character — kotlinx/Go whole-string strictness.

    Spark's ``try_parse_json``/``from_json`` stop at the end of the first
    complete document and accept trailing garbage (``'{"a":1}junk'``);
    kotlinx ``decodeFromString`` (MessageProcessorTest.kt: ``'{"sensorId":
    "G7"}invalid'`` must drop) and Go ``json.Valid`` require the value to
    span the input. No parser option closes the gap, so this walks the
    characters with a JVM higher-order ``aggregate`` fold (still no
    Python): a depth/in-string/escape state machine that flags anything
    non-whitespace after the value closes. Combine with ``try_parse_json``
    (which validates the prefix is real JSON) for full strictness.

    Scalar documents (``'null'``, ``'12'``) report False here — callers
    that accept scalars must gate only bracketed docs on this check.
    Payloads are event-sized; the per-character fold is in-row work that
    scales linearly with payload bytes, not corpus size.
    """
    init = F.struct(
        F.lit(0).alias("depth"),
        F.lit(False).alias("instr"),
        F.lit(False).alias("esc"),
        F.lit(False).alias("done"),
        F.lit(False).alias("bad"),
    )

    def step(acc: Column, c: Column) -> Column:
        is_ws = c.isin(" ", "\t", "\n", "\r", "")
        open_b = (c == "{") | (c == "[")
        close_b = (c == "}") | (c == "]")
        in_str = acc["instr"]
        depth_inc = ~in_str & ~acc["done"] & open_b
        depth_dec = ~in_str & ~acc["done"] & close_b
        new_depth = acc["depth"] + F.when(depth_inc, 1).when(depth_dec, -1).otherwise(0)
        new_done = acc["done"] | (depth_dec & (new_depth == 0))
        new_bad = (
            acc["bad"]
            | (acc["done"] & ~is_ws)  # anything after the value closed
            | (depth_dec & (new_depth < 0))  # unbalanced close
            # non-ws before any bracket opens = scalar doc or garbage
            | (~in_str & ~acc["done"] & (acc["depth"] == 0) & ~is_ws & ~open_b)
        )
        # leaving a string needs an unescaped quote; entering one needs
        # to be inside the doc (depth > 0)
        stays_in_str = in_str & ~(~acc["esc"] & (c == '"'))
        enters_str = ~in_str & ~acc["done"] & (acc["depth"] > 0) & (c == '"')
        return F.struct(
            new_depth.alias("depth"),
            F.when(in_str, stays_in_str).otherwise(enters_str).alias("instr"),
            (in_str & ~acc["esc"] & (c == "\\")).alias("esc"),
            new_done.alias("done"),
            new_bad.alias("bad"),
        )

    return F.aggregate(
        F.split(raw, ""),
        init,
        step,
        lambda acc: acc["done"] & ~acc["bad"],
    )


def string_scalar_spans_string(raw: Column) -> Column:
    """True iff ``raw`` is exactly one JSON string scalar (optionally
    whitespace-padded) — the string-scalar twin of
    :func:`json_value_spans_string`, closing the last documented
    deviation from Go ``json.Valid`` / kotlinx whole-string strictness
    (``'"x"junk'`` must drop). Same JVM higher-order fold, simpler state
    machine: before-quote / in-string(+escape) / after-close. Combine
    with ``try_parse_json`` (which validates escapes are real)."""
    init = F.struct(
        F.lit(False).alias("started"),
        F.lit(False).alias("instr"),
        F.lit(False).alias("esc"),
        F.lit(False).alias("done"),
        F.lit(False).alias("bad"),
    )

    def step(acc: Column, c: Column) -> Column:
        is_ws = c.isin(" ", "\t", "\n", "\r", "")
        closes = acc["instr"] & ~acc["esc"] & (c == '"')
        return F.struct(
            (acc["started"] | (c == '"')).alias("started"),
            F.when(acc["instr"], ~closes)
            .otherwise(~acc["started"] & (c == '"'))
            .alias("instr"),
            (acc["instr"] & ~acc["esc"] & (c == "\\")).alias("esc"),
            (acc["done"] | closes).alias("done"),
            (
                acc["bad"]
                | (acc["done"] & ~is_ws)  # anything after the close quote
                | (~acc["started"] & ~is_ws & (c != '"'))  # pre-quote junk
            ).alias("bad"),
        )

    return F.aggregate(
        F.split(raw, ""),
        init,
        step,
        lambda acc: acc["done"] & ~acc["bad"],
    )


def parse_typed(
    df: DataFrame,
    payload_col: str = "value",
    schema: StructType = INGESTED_DATA_SCHEMA,
    keep_raw: bool = True,
    drop_malformed: bool = True,
) -> DataFrame:
    """A9/A16: lenient typed JSON parse, malformed rows dropped not failed.

    `from_json` is natively lenient the same way kotlinx with
    ``ignoreUnknownKeys`` is: unknown keys ignored, missing keys → null,
    malformed document → null struct (PERMISSIVE). The drop-don't-fail
    semantics of MessageProcessor.kt:36-46 become a null filter.
    """
    raw = F.col(payload_col).cast("string")
    out = df.withColumn("_parsed", F.from_json(raw, schema))
    if keep_raw:
        # A13: optional raw-payload retention (init-db.sh:28 `_raw_data`)
        out = out.withColumn("_raw_data", raw)
    if drop_malformed:
        # PERMISSIVE from_json yields an all-null struct (not a null) for
        # malformed documents, so gate on JSON validity too; and kotlinx
        # decodeFromString<IngestedData> rejects valid-but-non-object JSON
        # ('null', '[1,2]'), so require an object (first char '{'). The
        # span check closes the former trailing-garbage deviation:
        # '{"sensorId":"G7"}invalid' (MessageProcessorTest.kt) now drops
        # here exactly as kotlinx drops it.
        from .udfs import json_strict_span_udf

        # for '{'-docs the combined Arrow kernel equals the bracket span
        # fold (string-scalar branch can't fire); same filter, batch speed
        out = out.filter(
            F.try_parse_json(raw).isNotNull()
            & F.startswith(F.ltrim(raw), F.lit("{"))
            & json_strict_span_udf(raw)
            & F.col("_parsed").isNotNull()
        )
    return out.select("_parsed.*", *(["_raw_data"] if keep_raw else []))


def parse_dynamic(df: DataFrame, payload_col: str = "value") -> DataFrame:
    """A10: schema-free map parse (ClickHouseWriterService.kt:78-87).

    Jackson's ``Map<String, Any>`` becomes ``map<string,string>``; non-object
    or malformed payloads parse to null and are dropped (mapNotNull).
    """
    raw = F.col(payload_col).cast("string")
    out = df.withColumn("_map", F.from_json(raw, "map<string,string>"))
    return out.filter(F.col("_map").isNotNull())


def project_fixed(
    df: DataFrame, columns: tuple[str, ...] = CONSUMER1_COLUMNS
) -> DataFrame:
    """A11: schema-on-write fixed projection; absent keys surface as null.

    Works over either the typed-parse output (struct fields as columns) or
    the dynamic map (``_map`` column).
    """
    if "_map" in df.columns:
        return df.select(*[F.col("_map").getItem(c).alias(c) for c in columns])
    present = set(df.columns)
    return df.select(
        *[(F.col(c) if c in present else F.lit(None)).alias(c) for c in columns]
    )


def enrich_received_at(
    df: DataFrame, col_name: str = "received_at", with_epoch_ms: bool = False
) -> DataFrame:
    """A12: ingestion-timestamp enrichment (ClickHouseRepository.kt:75).

    ``with_epoch_ms`` adds ``{col_name}_ms``: the TRUE-INSTANT epoch
    milliseconds via :func:`functions.temporal.epoch_ms_instant` — the
    external-export flavor (JDBC / cross-system joins key on the point
    on the timeline, not the session wall clock). The oracle-contract
    ``epoch_ms`` is deliberately NOT used here: sink rows leave the
    session, so wall-clock recovery would be wrong off-UTC.
    """
    out = df.withColumn(col_name, F.current_timestamp())
    if with_epoch_ms:
        from ..functions.temporal import epoch_ms_instant

        out = out.withColumn(f"{col_name}_ms", epoch_ms_instant(col_name))
    return out


def observe_parse_quality(
    df: DataFrame, payload_col: str = "value", name: str = "parse"
) -> DataFrame:
    """A16: per-batch valid/invalid counts without a second pass.

    The reference counts and logs parse failures per batch
    (MessageProcessor.kt:33-52). `observe` attaches the metric to the same
    scan — zero extra jobs; read via QueryExecutionListener /
    StreamingQueryListener.
    """
    parsed = F.try_parse_json(F.col(payload_col).cast("string"))
    return df.observe(
        name,
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(parsed.isNull(), 1)).alias("invalid"),
    )


def auth_gate(
    events: DataFrame,
    api_keys: DataFrame,
    event_key: str | Column = "api_key",
    dim_key: str = "api_key",
    active_col: str = "is_active",
) -> DataFrame:
    """A4/A5: API-key auth as a broadcast left-semi join.

    The reference does `SELECT EXISTS(... WHERE api_key=$1 AND is_active)`
    per request (auth.go:38) behind an LRU+TTL cache (caching.go:43-77).
    Distributed equivalent: broadcast the (small) active-keys dimension and
    semi-join — the broadcast is shipped once per executor and reused across
    micro-batches, subsuming the cache. At 100 TB of events this never
    shuffles the fact side.
    """
    # alias to a private name: the fact side often carries the same column
    # name (api_key == api_key would be ambiguous)
    keys = api_keys.filter(F.col(active_col)).select(F.col(dim_key).alias("__auth_key"))
    ek = F.col(event_key) if isinstance(event_key, str) else event_key
    return events.join(
        F.broadcast(keys), on=ek == F.col("__auth_key"), how="left_semi"
    )


def auth_rejects(
    events: DataFrame,
    api_keys: DataFrame,
    event_key: str | Column = "api_key",
    dim_key: str = "api_key",
    active_col: str = "is_active",
) -> DataFrame:
    """Complement of :func:`auth_gate` — the 401 path (handler.go:41-56)."""
    keys = api_keys.filter(F.col(active_col)).select(F.col(dim_key).alias("__auth_key"))
    ek = F.col(event_key) if isinstance(event_key, str) else event_key
    return events.join(
        F.broadcast(keys), on=ek == F.col("__auth_key"), how="left_anti"
    )
