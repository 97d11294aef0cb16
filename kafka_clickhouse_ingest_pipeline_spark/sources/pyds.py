"""Spark 4 Python DataSource connector for the ingest spool.

The reference consumes a Kafka topic (consumer2/.../KafkaMessageConsumer.kt)
that the HTTP publisher feeds (publisher/internal/kafka/publisher.go). In
this environment there is no broker, so the durable handoff is the spool
directory `sources/http_ingest.SpoolPublisher` writes (atomic tmp+rename,
one file per flushed batch). This module exposes that spool through
Spark's first-class connector API — `spark.dataSource.register` +
`format("spool")` — instead of the generic text file source, giving the
ingest path a real DataSourceV2 surface:

- **batch**: one `InputPartition` per spool file, so a backfill scan
  parallelizes across files exactly like the Kafka source parallelizes
  across partitions;
- **streaming**: a `SimpleDataSourceStreamReader` whose offset is the
  count of spool files consumed in lexicographic order. Files are
  immutable once visible (the publisher renames complete files into
  place), so `(start, end)` file-index ranges are a deterministic,
  replayable offset scheme — `readBetweenOffsets` re-reads exactly the
  files of a failed micro-batch, the same contract Kafka offsets give.

Schema mirrors the Kafka `value` contract plus provenance:
``value string, spool_file string, line_no int``.

The row-building here is per-line Python, which is fine: a connector IS
the sanctioned Python boundary (Spark runs DataSource readers on
executors, batched through Arrow), unlike per-row UDFs in query plans.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SPOOL_SCHEMA = "value string, spool_file string, line_no int"


def _list_spool(path: str) -> list[str]:
    """Visible spool files, lexicographically ordered. The publisher's
    zero-padded sequence names (`batch-000000042.jsonl`) make that
    arrival order within one publisher process — the offset scheme
    assumes new files always sort AFTER committed ones (the same
    append-only contract Kafka offsets assume; compacting or renaming
    old spool files invalidates checkpoints exactly like shrinking Kafka
    retention past committed offsets does). Hidden/tmp files
    (dot-prefixed) are in-flight writes and never listed."""
    try:
        names = sorted(
            n
            for n in os.listdir(path)
            if not n.startswith(".") and not n.startswith("_")
        )
    except FileNotFoundError:
        return []
    return [os.path.join(path, n) for n in names]


def _read_file(fpath: str):
    name = os.path.basename(fpath)
    with open(fpath, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if line:
                yield (line, name, i)


class _SpoolFilePartition(InputPartition):
    def __init__(self, fpath: str):
        self.fpath = fpath


class SpoolBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spool source requires .option('path', ...)")

    def partitions(self):
        return [_SpoolFilePartition(f) for f in _list_spool(self.path)]

    def read(self, partition):
        yield from _read_file(partition.fpath)


class SpoolStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"index": N}: the first N files (sorted) are committed.

    `read(start)` consumes every currently-visible file past the offset;
    `readBetweenOffsets` replays a pinned range after failure. Both read
    the same immutable files, so replay is byte-identical — the
    at-least-once-upgraded-to-exactly-once story the reference's batch
    ledger implements on the sink side, provided by the source here.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spool source requires .option('path', ...)")

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        files = _list_spool(self.path)
        i0 = start["index"]
        rows = []
        for f in files[i0:]:
            rows.extend(_read_file(f))
        return iter(rows), {"index": len(files)}

    def readBetweenOffsets(self, start, end):
        files = _list_spool(self.path)
        for f in files[start["index"] : end["index"]]:
            yield from _read_file(f)


class SpoolDataSource(DataSource):
    @classmethod
    def name(cls):
        return "spool"

    def schema(self):
        return SPOOL_SCHEMA

    def reader(self, schema):
        return SpoolBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return SpoolStreamReader(self.options)


def register(spark) -> None:
    """Make `format('spool')` available on this session."""
    spark.dataSource.register(SpoolDataSource)
