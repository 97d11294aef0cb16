"""Materialization seam: localCheckpoint today, durable storage at scale.

Every dedup/ANN/text-index intermediate that must be computed ONCE and
scanned MANY times (minhash signatures, inverted indexes, k-means
assignments, PQ codes, BM25 postings) routes through :func:`materialize`.

Two modes:

- ``local`` (default): ``df.localCheckpoint(eager=True)``. Fast on a
  single box, but checkpoint blocks live on executor local disk and are
  unrecoverable on executor loss — fine for local[32], wrong for a
  1000-executor job over 100 TB.
- ``storage``: write the intermediate to parquet under a base directory
  and read it back. On a cluster the base points at durable shared
  storage (HDFS/object store); recomputation after executor loss re-reads
  the table instead of replaying the whole lineage. This is the
  "write the signature/index table once" plan the operator docstrings
  describe (operators/dedup.py:299, operators/similarity.py:529).

Mode resolution (per call): explicit ``mode=`` argument, else the Spark
conf ``spark.graft.materialize.mode``, else the environment variable
``SPARK_GRAFT_MATERIALIZE_MODE``, else ``local``. The storage base path
resolves the same way via ``spark.graft.materialize.path`` /
``SPARK_GRAFT_MATERIALIZE_PATH``, defaulting to a per-process temp dir.

Reuse semantics: by default every call writes to a fresh unique
directory (the ``name`` is a label only), so a returned DataFrame can
never be silently repointed at later data. Passing ``reuse=True`` with a
stable ``name`` writes ``{base}/{name}`` exactly once per (session,
name) and returns a reader over it on subsequent calls — the
probe-an-index-many-times path (e.g. the BM25 postings index). In
``local`` mode, ``reuse=True`` caches the checkpointed frame in-session
under the same key, so repeated queries skip the rebuild there too.
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid

from pyspark.sql import DataFrame

MODES = ("local", "storage")

_cache: dict[tuple[str, str], str] = {}
_local_cache: dict[tuple[str, str], DataFrame] = {}
_lock = threading.Lock()


def session_key(spark) -> str:
    """Stable identifier for reuse-cache keys. ``id(jvm_session)`` is NOT
    safe here: CPython reuses id() values after garbage collection, so a
    later SparkSession in the same process could false-hit a cache entry
    bound to a stopped session (stale DataFrame, or a skipped required
    write). The JVM session UUID is minted once per session and never
    recycled."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:  # pragma: no cover - very old JVM session API
        return f"{spark.sparkContext.applicationId}:{spark._jsparkSession.toString()}"


def _resolve_mode(spark, mode: str | None) -> str:
    if mode is None:
        mode = (
            spark.conf.get("spark.graft.materialize.mode", None)
            or os.environ.get("SPARK_GRAFT_MATERIALIZE_MODE")
            or "local"
        )
    if mode not in MODES:
        raise ValueError(f"materialize mode must be one of {MODES}, got {mode!r}")
    return mode


def _resolve_base(spark, path: str | None) -> str:
    return (
        path
        or spark.conf.get("spark.graft.materialize.path", None)
        or os.environ.get("SPARK_GRAFT_MATERIALIZE_PATH")
        or os.path.join(tempfile.gettempdir(), f"spark_graft_mat_{os.getpid()}")
    )


def _already_local_checkpoint(df: DataFrame) -> bool:
    """True iff ``df``'s analyzed plan is a bare LogicalRDD — the shape
    ``localCheckpoint`` returns. Derived frames (even a select on top)
    report False and are checkpointed normally."""
    try:
        return (
            df._jdf.queryExecution().analyzed().getClass().getSimpleName()
            == "LogicalRDD"
        )
    except Exception:  # pragma: no cover - py4j API drift
        return False


def materialize(
    df: DataFrame,
    name: str | None = None,
    *,
    mode: str | None = None,
    path: str | None = None,
    reuse: bool = False,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Cut lineage by materializing ``df`` once; return a re-readable frame.

    ``local`` mode is a localCheckpoint; ``storage`` mode writes parquet
    under the resolved base and reads it back. ``reuse=True`` (requires
    ``name``) makes repeated calls in one session return the
    already-written table without rewriting it.
    """
    spark = df.sparkSession
    resolved = _resolve_mode(spark, mode)
    if reuse and not name:
        raise ValueError("materialize(reuse=True) requires a stable name")
    if resolved == "local" and _already_local_checkpoint(df):
        # Idempotent in local mode: a bare LogicalRDD IS a checkpoint —
        # re-checkpointing it would copy every row once more for no
        # lineage benefit (callers like logreg_train defensively
        # materialize their inputs; callers that pre-materialize to
        # share the scan with a sibling consumer shouldn't pay twice).
        # Storage mode is exempt: there the call's contract is a durable
        # write, which a local checkpoint does not satisfy.
        return df
    if resolved == "local":
        if reuse:
            key = (session_key(spark), name)
            with _lock:
                cached = _local_cache.get(key)
            if cached is not None:
                return cached
            out = df.localCheckpoint(eager=True)
            with _lock:
                _local_cache[key] = out
            return out
        return df.localCheckpoint(eager=True)

    base = _resolve_base(spark, path)
    if reuse:
        key = (session_key(spark), name)
        with _lock:
            target = _cache.get(key)
        if target is None:
            target = os.path.join(base, name)
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(target)
            with _lock:
                _cache[key] = target
        return spark.read.parquet(target)

    label = name or "anon"
    target = os.path.join(base, f"{label}-{uuid.uuid4().hex[:12]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    return spark.read.parquet(target)


def reset_reuse_cache() -> None:
    """Test hook: forget written reuse tables (does not delete files)."""
    with _lock:
        _cache.clear()
        _local_cache.clear()
