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
- **streaming**: a `SimpleDataSourceStreamReader` whose offset is, per
  topic-partition, the count of spool files consumed in lexicographic
  order. Files are immutable once visible (the publisher renames complete
  files into place), so `(start, end)` file-index ranges are a
  deterministic, replayable offset scheme — `readBetweenOffsets` re-reads
  exactly the files of a failed micro-batch, the same contract Kafka
  offsets give.

**Topic partitions.** The reference's docker-compose provisions a
1-partition topic (docker-compose.yml:46), but the scale story needs N:
a spool root containing ``p=<int>/`` subdirectories models an
N-partition topic — each subdir is an independent append-only file
sequence (one publisher/partition, like a keyed Kafka producer), and the
stream offset is a per-partition map ``{"parts": {"0": n0, "1": n1}}``,
exactly Kafka's offset shape. Ordering contract mirrors Kafka's too:
total order WITHIN a partition (file sequence, then line number), no
order ACROSS partitions. A partition directory that appears mid-stream
(topic expansion / rebalance) is picked up at offset 0 on the next
micro-batch; a restart from a checkpoint taken before the expansion
replays correctly because old offsets simply omit the new partition.
A flat spool directory (no ``p=`` subdirs) is partition 0 of a
1-partition topic, and legacy ``{"index": N}`` checkpoints keep working.

Schema mirrors the Kafka `value` contract plus provenance:
``value string, part int, spool_file string, line_no int``.

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

SPOOL_SCHEMA = "value string, part int, spool_file string, line_no int"


def _list_parts(path: str) -> dict[int, str]:
    """Topic partitions: ``p=<int>`` subdirs, else the root as partition
    0. Partition ids come from the directory name, not enumeration
    order, so a sparse layout (p=0, p=3) keeps stable ids."""
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return {0: path}
    parts: dict[int, str] = {}
    for n in entries:
        full = os.path.join(path, n)
        if n.startswith("p=") and os.path.isdir(full):
            try:
                parts[int(n[2:])] = full
            except ValueError:
                continue
    return parts or {0: path}


def _list_spool(path: str) -> list[str]:
    """Visible spool files of ONE partition, lexicographically ordered.
    The publisher's zero-padded sequence names (`batch-000000042.jsonl`)
    make that arrival order within one publisher process — the offset
    scheme assumes new files always sort AFTER committed ones (the same
    append-only contract Kafka offsets assume; compacting or renaming
    old spool files invalidates checkpoints exactly like shrinking Kafka
    retention past committed offsets does). Hidden/tmp files
    (dot-prefixed) are in-flight writes and never listed."""
    try:
        names = sorted(
            n
            for n in os.listdir(path)
            if not n.startswith(".")
            and not n.startswith("_")
            and not n.startswith("p=")
            and os.path.isfile(os.path.join(path, n))
        )
    except FileNotFoundError:
        return []
    return [os.path.join(path, n) for n in names]


def _read_file(fpath: str, part: int):
    name = os.path.basename(fpath)
    with open(fpath, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if line:
                yield (line, part, name, i)


def _normalize_offset(off: dict) -> dict[str, int]:
    """Per-partition file counts. Legacy 1-partition checkpoints stored
    ``{"index": N}``; they mean partition 0 at N."""
    if "parts" in off:
        return {str(k): int(v) for k, v in off["parts"].items()}
    if "index" in off:
        return {"0": int(off["index"])}
    return {}


class _SpoolFilePartition(InputPartition):
    def __init__(self, fpath: str, part: int):
        self.fpath = fpath
        self.part = part


class SpoolBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spool source requires .option('path', ...)")

    def partitions(self):
        return [
            _SpoolFilePartition(f, p)
            for p, d in sorted(_list_parts(self.path).items())
            for f in _list_spool(d)
        ]

    def read(self, partition):
        yield from _read_file(partition.fpath, partition.part)


class SpoolStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"parts": {"<part>": N, ...}}: the first N files
    (sorted) of each partition are committed.

    `read(start)` consumes every currently-visible file past each
    partition's offset — including partitions absent from `start`
    (topic expansion starts them at 0); `readBetweenOffsets` replays a
    pinned range after failure. Both read the same immutable files, so
    replay is byte-identical — the at-least-once-upgraded-to-
    exactly-once story the reference's batch ledger implements on the
    sink side, provided by the source here. Rows come back in
    (partition, file, line) order: total order within a partition
    (Kafka's guarantee), deterministic-but-meaningless across
    partitions (Kafka makes no cross-partition promise; sorting just
    keeps replay byte-stable).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spool source requires .option('path', ...)")

    def initialOffset(self):
        return {"parts": {}}

    def read(self, start):
        committed = _normalize_offset(start)
        rows = []
        end: dict[str, int] = dict(committed)
        parts = _list_parts(self.path)
        # ONE listing snapshot per partition, shared by the retention
        # check and the consume loop below — listing twice would let a
        # committed file vanish between the two listings, bypassing the
        # guard and silently regressing the end offset.
        files_by_part = {p: _list_spool(d) for p, d in parts.items()}
        for key, n in committed.items():
            p = int(key)
            if n > 0 and len(files_by_part.get(p, [])) < n:
                # Retention violation: committed files vanished. Failing
                # loudly is the Kafka OffsetOutOfRange contract — the
                # alternative is an end offset that silently regresses
                # below the committed one, corrupting the monotonic
                # offset sequence the checkpoint depends on.
                raise ValueError(
                    f"spool partition {p}: committed offset {n} exceeds "
                    "visible files — spool files were removed behind a "
                    "checkpoint (retention violation)"
                )
        for p in sorted(files_by_part):
            files = files_by_part[p]
            i0 = committed.get(str(p), 0)
            for f in files[i0:]:
                rows.extend(_read_file(f, p))
            end[str(p)] = len(files)
        return iter(rows), {"parts": end}

    def readBetweenOffsets(self, start, end):
        s = _normalize_offset(start)
        e = _normalize_offset(end)
        parts = _list_parts(self.path)
        for key in sorted(e, key=int):
            p = int(key)
            want = e[key]
            files = _list_spool(parts[p]) if p in parts else []
            if len(files) < want:
                # Replaying a committed range against fewer files than
                # the end offset recorded means data the batch already
                # processed is gone — dropping it silently would violate
                # the byte-identical replay contract, so fail like
                # Kafka's OffsetOutOfRange does.
                raise ValueError(
                    f"spool partition {p}: replay needs {want} files, "
                    f"only {len(files)} visible — spool files were "
                    "removed behind a checkpoint (retention violation)"
                )
            for f in files[s.get(key, 0) : want]:
                yield from _read_file(f, p)


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
