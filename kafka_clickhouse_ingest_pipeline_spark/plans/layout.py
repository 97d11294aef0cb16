"""Write-layout discipline: the MergeTree storage model re-expressed as
parquet layout (SURVEY.md §2 B7/B8, §4).

ClickHouse DDL in the reference:
  ENGINE = MergeTree() ORDER BY (sensor_id, timestamp)   init-db.sh:34
  -- PARTITION BY toYYYYMM(timestamp)                    init-db.sh:35 (opt)
  SETTINGS index_granularity = 8192                      init-db.sh:36

Parquet equivalents:
- clustered sort key  → repartition(cluster_cols) + sortWithinPartitions:
  co-locates each key's rows and makes parquet row-group min/max stats
  selective — the data-skipping analog of the sparse primary index.
- monthly partitions  → partitionBy(yyyymm): Catalyst prunes whole
  directories for time-range predicates.
- index granularity   → parquet row-group size (config, not code).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_yyyymm(df: DataFrame, ts_col: str, out_col: str = "yyyymm") -> DataFrame:
    """The toYYYYMM(timestamp) partition key (init-db.sh:35)."""
    return df.withColumn(out_col, F.date_format(F.col(ts_col), "yyyyMM"))


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    partition_ts_col: str | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Write with MergeTree-equivalent layout.

    At 100 TB the repartition count is the knob that sets file sizes;
    callers pass `target_partitions` ≈ bytes / 512 MB. Sorting happens
    within partitions only — no global sort, no range exchange.
    """
    out = df
    partition_cols: list[str] = []
    if partition_ts_col:
        out = with_yyyymm(out, partition_ts_col)
        partition_cols = ["yyyymm"]

    keys = [F.col(c) for c in (*partition_cols, *cluster_cols)]
    if target_partitions:
        out = out.repartition(target_partitions, *keys)
    elif keys:
        out = out.repartition(*keys)
    out = out.sortWithinPartitions(*(*partition_cols, *cluster_cols))

    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a hash-bucketed parquet table (``bucketBy`` + ``saveAsTable``).

    Bucketing is the persisted form of a shuffle: rows are hash-placed into
    ``num_buckets`` files by the bucket key at WRITE time, so every later
    join or aggregation on that key reads the data already co-located —
    Catalyst drops the Exchange on the bucketed side(s) entirely. At 100 TB
    this converts the recurring fact⨝fact shuffle (the single most expensive
    stage in the pipeline) into a one-time write cost: the ClickHouse
    analog is the MergeTree ORDER BY key making point/merge reads cheap
    (init-db.sh:34), but bucketing additionally fixes the *placement*, which
    a sort key alone does not.

    The pre-write ``repartition`` puts exactly one task (and hence one file)
    per bucket, which keeps file counts bounded (files = buckets, not
    buckets x write-tasks) and lets Spark trust per-bucket ``sortBy`` order
    on read. Bucket counts should be sized like shuffle partitions: at
    100 TB, ``bytes / ~512 MB`` rounded to a power of two, identical on
    both sides of the intended join.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # External table under a per-process directory: the catalog entry is
    # per-process already (in-memory catalog), so giving the DATA a
    # per-process home too makes concurrent test/gate/bench processes
    # fully independent — no shared spark-warehouse paths to race on
    # (one process overwriting bucket files while another scans them).
    # On a cluster, callers pass an explicit shared `path` instead and
    # coordinate writes like any other table build.
    target = path or os.path.join(
        tempfile.gettempdir(), f"spark_graft_buckets_{os.getpid()}", table
    )
    if os.path.exists(target):
        shutil.rmtree(target)

    keyed = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        keyed.write.mode(mode)
        .format("parquet")
        .option("path", target)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _interleave_terms(col: F.Column, start_bit: int, bits: int) -> list[F.Column]:
    return [
        (F.shiftright(col, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + start_bit)))
        for i in range(bits)
    ]


def zorder_key(a, b, bits: int = 16):
    """Morton/Z-order interleave of two already-bucketed non-negative ints
    in [0, 2^bits). Pure integer bit arithmetic — identical in any engine.

    Sorting by this key gives *both* dimensions locality: any run of
    consecutive z-values is confined to a bounded rectangle of (a, b), so
    parquet min/max stats prune 2-d predicates, where a lexicographic sort
    key only ever prunes its leading column. This is the layout answer for
    "filter by user AND time window" at 100 TB.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    terms = _interleave_terms(a, 0, bits) + _interleave_terms(b, 1, bits)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — same shift/mask/sum sequence."""
    terms = [
        f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(bits)
    ] + [
        f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    target_partitions: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write with Z-order clustering on two pre-bucketed int columns.

    repartitionByRange on the z-key gives each output file a contiguous
    z-range (range exchange samples the key — one extra pass, no global
    sort); sortWithinPartitions tightens row-group stats inside files.
    """
    z = zorder_key(a_col, b_col, bits).alias("_z")
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(target_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).parquet(path)


def scale_to_bits(col, lo_col, hi_col, bits: int = 16):
    """Min-max scale an integer column into [0, 2^bits) with exact integer
    arithmetic. Z-order only interleaves meaningfully when both dims span
    the same bit width — a 150-value user dim against a 65536-value time
    dim otherwise collapses the curve onto the wide dimension.

    Computed entirely in long arithmetic — x - (x % span) is an exact
    multiple of span, so the final double division is exact for any span
    (a plain floor((c-lo)*top/span) silently diverges from the SQL twin's
    integer `//` once the span passes ~2^37, e.g. a raw epoch-ms column).
    The numerator (c-lo)*top must stay under 2^63: spans up to ~2^47 are
    safe with 16-bit targets.
    """
    c = F.col(col) if isinstance(col, str) else col
    lo = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hi = F.col(hi_col) if isinstance(hi_col, str) else hi_col
    top = F.lit((1 << bits) - 1)
    span = F.greatest(F.lit(1), hi - lo)
    x = ((c - lo).cast("long") * top).cast("long")
    return ((x - x % span) / span).cast("long")


def hilbert_key(a, b, bits: int = 16):
    """Hilbert-curve index of a 2-d point in [0, 2^bits)² — the
    premium-locality alternative to :func:`zorder_key` (Delta/Iceberg
    expose both; Hilbert has no Z-curve "seams", so consecutive key
    ranges stay in tighter bounding boxes and range scans touch fewer
    files). Delegates to the Arrow kernel
    (`operators/udfs.make_hilbert_udf`) — pure int64 arithmetic, so the
    vectorized replay is value-identical by construction; the per-row
    JVM struct fold it replaces (kept as :func:`hilbert_key_expr`)
    dominated the layout queries. The SQL twin
    (:func:`hilbert_key_sql`) replays the fold as one chained CTE per
    level."""
    from ..operators.udfs import make_hilbert_udf

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return make_hilbert_udf(bits)(a.cast("long"), b.cast("long"))


def hilbert_key_expr(a, b, bits: int = 16):
    """Pure-JVM form of :func:`hilbert_key` — same keys, bit for bit.
    Classic xy2d: walk levels s = 2^(bits-1) .. 1, accumulate quadrant
    offsets, reflect+swap the frame below each level — a JVM
    higher-order fold over the level list (struct state (x, y, d)).
    Kept for parity testing and codegen-only contexts."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    levels = F.array(
        *[F.lit(1 << k).cast("long") for k in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        a.cast("long").alias("x"),
        b.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        d2 = acc["d"] + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        refl_x = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        refl_y = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        # below this level: reflect when rx=1, then swap — only when ry=0
        fx = F.when(ry == 0, refl_y).otherwise(acc["x"])
        fy = F.when(ry == 0, refl_x).otherwise(acc["y"])
        return F.struct(fx.alias("x"), fy.alias("y"), d2.alias("d"))

    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def hilbert_key_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`hilbert_key`: the level fold unrolled into
    one chained CTE per level (the chained-replay pattern the BPE and
    PageRank oracles use). Returns a full scalar-subquery-free CTE body;
    embed via `WITH {hilbert_key_sql(...)} SELECT ... FROM h0`.

    The caller's source relation must be named `hsrc` and expose the two
    coordinates plus any carry-through columns; the final CTE `h0` has
    the same carry columns plus `hkey`."""
    parts = [
        f"h{bits} AS (SELECT *, CAST({a_expr} AS BIGINT) AS hx, "
        f"CAST({b_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM hsrc)"
    ]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        refl_x = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
        refl_y = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
        parts.append(
            f"h{lvl} AS (SELECT * EXCLUDE (hx, hy, hd), "
            f"CASE WHEN {ry} = 0 THEN {refl_y} ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN {refl_x} ELSE hy END AS hy, "
            f"hd + CAST({s * s} AS BIGINT) * xor(3 * {rx}, {ry}) AS hd "
            f"FROM h{lvl + 1})"
        )
    return ",\n".join(parts)


def write_hilbert(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    target_partitions: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write with Hilbert-curve clustering on two pre-bucketed int
    columns — :func:`write_zordered` with the no-seams key. Same write
    shape: repartitionByRange on the key (range exchange samples it, no
    global sort), sortWithinPartitions tightens row-group stats. The
    key fold costs ~bits struct ops per row at write time only."""
    k = hilbert_key(a_col, b_col, bits).alias("_h")
    out = (
        df.withColumn("_h", k)
        .repartitionByRange(target_partitions, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
    )
    out.write.mode(mode).parquet(path)


def bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Total order for a DOMAIN-BOUNDED final frame without the range
    exchange.

    ``orderBy`` plans a rangepartitioning Exchange whose bounds come from
    a separate sampling job — pure overhead when the frame is a final
    aggregate over enum/domain-bounded keys (return flags, nations,
    languages, event types, fixed-width z-buckets): the whole result is
    at most a few hundred rows at ANY corpus size, by construction, not
    by testdata luck. ``coalesce(1) + sortWithinPartitions`` yields the
    same total order in one task with no sampling job and no exchange;
    AQE folds the coalesce into the final-aggregate stage, so only the
    ≤|domain|-row merge runs single-task — every stage below keeps its
    parallelism (r13, guide §2.4; interleaved A/B on pipeline_flagship:
    ~0.1 s, one job off the per-query floor).

    ONLY for domain-bounded outputs — never for corpus-scaled frames,
    where the single-task sort would serialize real data.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)
