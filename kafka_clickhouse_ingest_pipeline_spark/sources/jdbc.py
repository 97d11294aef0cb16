"""JDBC sink — the ClickHouse writer re-expressed as Spark JDBC options
(SURVEY.md §2 A14).

Reference behavior (paths relative to /root/reference/):
- batched INSERT, batch size 100: consumer/src/main/resources/
  application.yml:53, consumer2/.../persistence/ClickHouseRepository.kt:77-79
- connection pool max 10: application.yml:42, ClickHouseRepository.kt:41
- NULL-preserving setObject binds: ClickHouseRepository.kt:69-75

Spark's JDBC writer batches with `batchsize` and opens one connection per
writing partition — `numPartitions` is therefore the pool-size analog.
No ClickHouse server exists in this environment, but the write path IS
executed for real against embedded Derby (the JDBC database Spark ships
for its metastore) in tests/test_jdbc_derby.py — batched INSERTs, NULL
round-trip, and the streaming foreachBatch seam all run through an
actual JDBC driver; only the dialect differs from production.

ClickHouse dialect quirks to expect when swapping the URL for a real
clickhouse-jdbc driver (none of which change this module's options):
- **No transactions**: commit/rollback are no-ops; `isolationLevel=NONE`
  below is therefore mandatory, not a tuning choice — Spark would
  otherwise call setTransactionIsolation and some driver versions throw.
  Exactly-once must come from the batch ledger / ReplacingMergeTree
  dedup, never from rollback (the reference's executeBatch is likewise
  fire-and-forget, ClickHouseRepository.kt:77-79).
- **Batch rewriting lives in the driver**: clickhouse-jdbc converts
  addBatch/executeBatch into its native block insert (the analog of
  MySQL's `rewriteBatchedStatements=true` — no extra option needed);
  `batchsize` here only sizes the blocks handed to it. Bigger blocks
  (10k-100k rows) are idiomatic for ClickHouse; 100 mirrors the
  reference's application.yml:53.
- **Async inserts / dedup windows**: server-side
  `async_insert`/`insert_deduplicate` settings change visibility and
  retry semantics; pass them via the JDBC URL query string, not Spark
  options.
- **Type mapping**: ClickHouse `DateTime` has second granularity
  (`DateTime64` for sub-second — the reference's schema uses DateTime,
  init-db.sh:25), `String` is unbounded (no CLOB split), and
  `Nullable(T)` must be declared in the sink DDL for the NULL
  round-trip this module's Derby tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Parity constants (BASELINE.md)
JDBC_BATCH_SIZE = 100
JDBC_MAX_CONNECTIONS = 10


def jdbc_writer_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batch_size: int = JDBC_BATCH_SIZE,
    max_connections: int = JDBC_MAX_CONNECTIONS,
    driver: str | None = None,
) -> dict[str, str]:
    """Options matching the reference's writer configuration."""
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "numPartitions": str(max_connections),
        "isolationLevel": "NONE",  # ClickHouse has no transactions; the
        # reference's executeBatch is likewise non-transactional
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    return opts


def with_column_types(opts: dict[str, str], column_types: str) -> dict[str, str]:
    """DDL column types for table auto-creation (the schema-at-sink
    discipline: the reference ships explicit DDL, init-db.sh:20-36, rather
    than inferring — e.g. 'sensor_id VARCHAR(64)' instead of the dialect
    default CLOB).

    Derby caveat: only retype columns that never carry NULLs. Spark binds
    string NULLs with the dialect's default JDBC type code (CLOB on
    Derby), and Derby rejects a CLOB-typed setNull against a VARCHAR
    column (ERROR 22005). Nullable string columns should keep the CLOB
    default and readers should disable predicate pushdown instead (Derby
    cannot compare CLOBs server-side). ClickHouse's String type has
    neither limitation."""
    return {**opts, "createTableColumnTypes": column_types}


def write_jdbc_batch(
    df: DataFrame,
    url: str,
    table: str,
    column_types: str | None = None,
    **kw,
) -> None:
    """A14: the batched append. Used inside foreachBatch for streaming
    (at-least-once: a replayed batch re-inserts, exactly like the
    reference's redelivered Kafka batch)."""
    opts = jdbc_writer_options(url, table, **kw)
    if column_types is not None:
        opts = with_column_types(opts, column_types)
    writer = df.write.mode("append").format("jdbc")
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save()


def jdbc_foreach_batch(url: str, table: str, **kw):
    """foreachBatch adapter: stream micro-batches into the JDBC sink —
    the direct equivalent of the reference's consumer loop."""

    def write(batch_df: DataFrame, _batch_id: int) -> None:
        write_jdbc_batch(batch_df, url, table, **kw)

    return write
