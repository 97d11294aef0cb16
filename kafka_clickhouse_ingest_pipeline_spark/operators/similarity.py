"""Similarity-search operators over embedding columns (tier C10).

Three rungs of the ANN ladder, all pure DataFrame API:

- brute-force cosine top-k: the exactness baseline. One broadcast of the
  query vector, one pass over the corpus, TakeOrderedAndProject for the
  top-k — never a global sort.
- random-hyperplane LSH (SimHash for vectors): 8 signed projections → 8-bit
  bucket id. At 100 TB the bucket id is the partition/cluster key; search
  touches one bucket (or Hamming-adjacent buckets for higher recall)
  instead of the full corpus — the classic sub-linear ANN trade.
- IVF-style blocked top-k: a coarse partition (here the `label` column;
  in production, k-means cell ids) prunes the candidate set before exact
  re-ranking.

Projection planes use ±1 (Rademacher) entries generated from a fixed seed:
integer-exact literals keep the arithmetic bit-identical across engines,
and Rademacher projections are a standard LSH family (distribution-free
Johnson-Lindenstrauss).

All dot products are sequential left folds over doubles (zip_with +
aggregate) so results are reproducible bit-for-bit anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.materialize import materialize
from ..functions.rounding import round4

# 6 planes → 64 buckets: ~8 candidates/bucket on the 500-vector test
# corpus. At real corpus sizes raise planes so bucket occupancy stays
# ~constant (planes ≈ log2(n / target_bucket_size)).
N_PLANES = 6
EMB_DIM = 64

_rng = random.Random(7)
PLANES: list[list[float]] = [
    [float(_rng.choice((-1, 1))) for _ in range(EMB_DIM)] for _ in range(N_PLANES)
]


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (never an error) for zero-norm vectors.

    ANSI mode (Spark 4 default) turns x/0 into a runtime
    ArithmeticException, so one all-zero embedding in 100 TB of data
    would kill the whole job; try_divide yields NULL instead, and NULLs
    sort last under the descending top-k ordering — a zero vector can
    never rank. On nonzero data try_divide is bit-identical to `/`, so
    every oracle twin is unaffected."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def lsh_bucket(vec: Column) -> Column:
    """N_PLANES-bit random-hyperplane bucket id: bit p = sign(<v, plane_p>).

    Delegates to the Arrow kernel (`operators/udfs.lsh_bucket_udf`),
    which replays the identical IEEE add sequence vectorized across the
    batch axis. The pure-JVM expression (`lsh_bucket_expr`) survives for
    contexts that need a codegen expression; it is bit-identical but
    measured ~1.2 ms/row — its ~4k-node flat sum is too large to JIT —
    and dominated every bucket-side ANN query (2.3 s of a 2.6 s
    `ann_batch_topk`). Parity between the three forms (expr, Arrow,
    SQL oracle) is pinned in tests/test_ml_lsh.py.

    The coalesce(-1) wrapper exists for the PLAN, not the value: a
    nullable bucket used as an inner-join key gets an inferred
    isnotnull(bucket) filter, and ExtractPythonUDFs then evaluates the
    kernel TWICE per side (once for the filter, once for the
    projection — observed in every bucket-join plan). Coalescing with a
    literal makes the column non-nullable, so no filter is inferred and
    each side pays exactly one ArrowEvalPython. The kernel returns a
    non-null long for every non-null vector (sums of floats; NaNs
    compare false and still yield a bucket). A NULL vector would land
    in bucket -1 on every side and could pair with other null rows —
    the pre-coalesce plans dropped such rows via the inferred filter —
    so every bucket-join consumer filters ``vec IS NOT NULL`` on its
    input column BEFORE bucketing (a JVM filter on the raw column, so
    no second kernel eval is induced; pinned by
    tests/test_ml_lsh.py::test_null_vectors_never_pair).
    """
    from .udfs import lsh_bucket_udf

    return F.coalesce(lsh_bucket_udf(vec), F.lit(-1))


def lsh_bucket_expr(vec: Column) -> Column:
    """Pure-JVM form of :func:`lsh_bucket` — same buckets, bit for bit.

    ±1 planes mean each dot is a plain signed sum of elements — built as
    left-assoc adds over `element_at` so it matches the fold order of the
    generic dot() (and the oracle), while staying a flat expression
    instead of 8 nested higher-order folds (which took ~100ms *per row*
    to evaluate). Kept for reference/parity testing and as the fallback
    where Python workers are unavailable.
    """
    bucket = F.lit(0)
    for p, plane in enumerate(PLANES):
        acc = F.lit(0.0)
        for i, sign in enumerate(plane):
            # null-safe get: vectors shorter than EMB_DIM contribute 0 for
            # the missing dims (ANSI element_at would error out) — same
            # result for full-width vectors, graceful for narrow ones.
            term = F.coalesce(F.get(vec, i), F.lit(0.0))
            acc = acc + (term if sign > 0 else -term)
        bucket = bucket + F.when(acc > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_sql(vec_expr: str) -> str:
    """DuckDB twin of :func:`lsh_bucket` — same planes, same fold order.

    Flat signed-sum form, same left-assoc order as the Spark side. (A
    list-literal + list_reduce formulation re-materializes the plane
    literal per lambda step in DuckDB — ~100ms/row; the flat sum is
    instant.) Each term is COALESCE'd to 0.0 to mirror lsh_bucket's
    null-safe `F.get`: DuckDB list indexing past the end yields NULL,
    which would otherwise null the whole plane sum and force bit 0 —
    diverging from Spark for vectors shorter than EMB_DIM.
    """
    terms = []
    for p, plane in enumerate(PLANES):
        signed = "0.0 " + " ".join(
            f"{'+' if sign > 0 else '-'} COALESCE({vec_expr}[{i + 1}], 0.0)"
            for i, sign in enumerate(plane)
        )
        terms.append(f"CASE WHEN ({signed}) > 0 THEN {2**p} ELSE 0 END")
    return " + ".join(terms)


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of `query` (single row) against the corpus.

    The query side broadcasts; the corpus is scanned once; LIMIT k compiles
    to TakeOrderedAndProject (per-partition heaps, k-way merge) — the right
    plan at any corpus size.
    """
    q = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), round4(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def bucketed_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: LSH-bucket prune, then exact cosine re-rank.

    Only corpus vectors landing in the query's bucket are scored — ~1/256
    of the data for 8 planes. Recall < 1 by construction; raise it by
    probing Hamming-adjacent buckets (multi-probe) or adding tables.
    """
    # NULL vectors must never reach the bucket join (they would all land
    # in coalesce's -1 bucket and pair with each other); the filter is on
    # the RAW column, so it cannot re-induce the double kernel eval the
    # coalesce exists to prevent (see lsh_bucket docstring).
    q = query.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(as_double(F.col(vec_col))).alias("q_bucket"),
    )
    c = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(as_double(F.col(vec_col))).alias("bucket"),
    )
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        c.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), F.col("bucket"), round4(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def multiprobe_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe ANN top-k: probe the query's bucket AND every bucket at
    Hamming distance 1 (one plane sign flipped).

    The standard recall fix for hyperplane LSH: a true neighbor that sits
    near one separating plane lands one bit away, so probing the
    N_PLANES adjacent buckets recovers exactly those misses without a
    second hash table. Cost: (1 + N_PLANES)/2^N_PLANES of the corpus
    (7/64 here) — still sub-linear, and the probe list is a broadcast of
    N_PLANES+1 rows, never a shuffle of the corpus side.
    """
    # null-vector guard: see bucketed_topk / lsh_bucket docstring
    q = query.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(as_double(F.col(vec_col))).alias("q_bucket"),
    )
    probe_buckets = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)],
    )
    probes = q.select(
        "q_id", "qv", F.explode(probe_buckets).alias("bucket")
    )
    c = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(as_double(F.col(vec_col))).alias("bucket"),
    )
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        c.join(F.broadcast(probes), "bucket")
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), F.col("bucket"), round4(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def batch_multiprobe_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query ANN top-k for a whole BATCH of query vectors.

    The single-query operators treat the query as a parameter; here the
    queries are DATA — the production shape (serve a stream of queries
    against one index, or all-vs-index retrieval for kNN-graph
    construction). Each query explodes into its 1 + N_PLANES multi-probe
    buckets; one equi-join on the bucket key matches every query to its
    candidates simultaneously (broadcast while the batch is small, plain
    shuffle join at millions of queries — same plan shape); a
    row_number window partitioned by query ranks within each query.
    No per-query loop, no collect, |Q| never touches the driver.

    Ranking uses the raw cosine (identical doubles in any engine);
    round4 only on the output column.
    """
    # null-vector guard: see bucketed_topk / lsh_bucket docstring
    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(as_double(F.col(vec_col))).alias("q_bucket"),
    )
    probe_buckets = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)],
    )
    probes = q.select("q_id", "qv", F.explode(probe_buckets).alias("bucket"))
    c = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(as_double(F.col(vec_col))).alias("bucket"),
    )
    w = (
        Window.partitionBy("q_id")
        .orderBy(F.col("_c").desc(), F.col(id_col))
    )
    # no broadcast hint: a small batch broadcasts via the threshold/AQE
    # anyway, and a corpus-sized batch (kNN graph) must be allowed to
    # fall back to a shuffle join instead of OOMing the driver
    return (
        c.join(probes, "bucket")
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id", F.col(id_col), cosine(F.col("v"), F.col("qv")).alias("_c")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "q_id",
            F.col(id_col),
            round4(F.col("_c")).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


def centroids(
    emb: DataFrame,
    block_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-block elementwise centroid, long format (block, dim, value).

    posexplode + groupBy(block, dim) — one shuffle keyed on (block, dim),
    perfectly parallel in the embedding dimension; the IVF "train" step.
    """
    exploded = emb.select(
        F.col(block_col),
        F.posexplode(as_double(F.col(vec_col))).alias("dim", "x"),
    )
    return (
        exploded.groupBy(block_col, "dim")
        .agg(round4(F.avg("x")).alias("centroid"))
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: exact top-k restricted to the `nprobe` nearest cells.

    Completes the IVF ladder that `centroids` trains: reassemble each
    cell's centroid vector, score the (tiny) centroid table against the
    query, keep the nprobe closest cells, and run the exact cosine re-rank
    only over corpus rows in those cells. The cell list stays a DataFrame
    (broadcast join, never collected to the driver), so the whole plan is
    two small shuffles over the centroid table plus one corpus scan whose
    filter is the broadcast cell join — at 100 TB, with the corpus
    clustered/partitioned by cell id, that scan prunes to nprobe/ncells of
    the data. Centroid components are rounded (4 dp) before the cosine so
    cell selection is reproducible across engines despite averaging-order
    ulp noise; ties between cells break on the block id.
    """
    cvec = (
        centroids(emb, block_col=block_col, vec_col=vec_col)
        .groupBy(block_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("s"))
        .select(
            block_col, F.transform("s", lambda st: st["centroid"]).alias("cv")
        )
    )
    q = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qv")
    )
    probe_cells = (
        cvec.crossJoin(F.broadcast(q))
        .select(
            block_col,
            round4(cosine(F.col("cv"), F.col("qv"))).alias("c_cos"),
        )
        .orderBy(F.col("c_cos").desc(), F.col(block_col))
        .limit(nprobe)
        .select(block_col)
    )
    c = emb.select(F.col(id_col), F.col(block_col), as_double(F.col(vec_col)).alias("v"))
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        c.join(F.broadcast(probe_cells), block_col)
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), F.col(block_col), round4(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "km",
    seeding: str = "hash",
    reseed_empty: bool = True,
    with_centroids: bool = False,
    with_trace: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """IVF train step done properly: k-means (Lloyd) cell assignment.

    `centroids`/`ivf_topk` accept any precomputed cell column; this
    operator LEARNS the cells instead of borrowing a label. Seeding is
    deterministic and engine-portable either way:

    - ``seeding="hash"``: the k smallest salted id hashes — a fixed
      pseudo-random draw, one corpus pass.
    - ``seeding="farthest"``: deterministic k-means++-style farthest-
      first — seed 0 is the hash-order minimum, each next seed is the
      point maximizing (rounded) distance to its nearest chosen seed,
      ties on id. k-1 extra corpus passes, each a broadcast of <=k seed
      vectors; the classic spread-the-seeds fix for hash draws that
      land in one region.

    Then `iters` rounds of assign-to-nearest / recompute-centroid.
    Every round is one broadcast of k centroid vectors + one corpus
    scan (assign) and one posexplode groupBy (update) — no corpus
    self-join anywhere, so a round is O(n·k·dim) compute and O(n)
    shuffle at any scale. With ``reseed_empty`` (default), a cell whose
    membership empties during a round is re-seeded to the point
    farthest from its assigned centroid (rank r empty cell takes the
    rank r farthest point; rounded distances, id ties) — so the final
    assignment covers k cells whenever the corpus has k distinct
    points. Centroid components round to 4 dp each round (portable
    across partial-agg orders); distances compare rounded, ties break
    on cell id, so assignments are bit-reproducible across engines.

    Returns (id_col, cell, dist_sq) — the assignment under the final
    centroids; `dist_sq` is the round4-ed squared L2 to the chosen cell.
    With ``with_centroids=True`` returns the tuple (assignment incl. the
    vector column ``v``, centroids (cell, cv)) — the IVFADC composition
    needs both to form residuals.

    ``with_trace=True`` (exclusive with ``with_centroids``) returns
    (assignment, curve) where curve is the per-round training inertia
    (round, inertia): round t averages the snapped dist_sq of the
    assignment step t's gradient-equivalent (assign under the PREVIOUS
    centroids), plus one final row under the trained centroids —
    iters+1 rows, each a 1-row aggregate over the already-materialized
    assignment. The convergence dashboard for the IVF index, mirroring
    classifier.logreg_train(with_trace=True): a corpus change that
    stops converging within the fixed Lloyd rounds becomes visible
    instead of silently degrading recall.
    """
    if with_trace and with_centroids:
        raise ValueError("with_trace and with_centroids are exclusive")
    from ..functions.hashing import hash60

    vec_d = as_double(F.col(vec_col))
    corpus = emb.select(F.col(id_col), vec_d.alias("v"))

    h = hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    if seeding == "farthest":
        first = (
            corpus.withColumn("__h", h)
            .orderBy("__h", id_col)
            .limit(1)
            .select(F.lit(0).alias("cell"), F.col(id_col), F.col("v"))
        )
        seeds = first
        for s in range(1, k):
            d = round4(_l2sq(F.col("v"), F.col("cv")))
            far = (
                corpus.crossJoin(
                    F.broadcast(seeds.select(F.col("v").alias("cv")))
                )
                .groupBy(id_col)
                .agg(F.min(d).alias("mind"), F.first("v").alias("v"))
                .orderBy(F.col("mind").desc(), id_col)
                .limit(1)
                .select(F.lit(s).alias("cell"), F.col(id_col), F.col("v"))
            )
            # materialize the (<=k row) seed set each step: the next
            # step broadcasts it, and without this the union lineage
            # replays every earlier corpus pass — O(k^2) scans
            seeds = materialize(seeds.unionByName(far), "kmeans_seeds")
        cvec = seeds.select("cell", F.col("v").alias("cv"))
    else:
        seeds = corpus.withColumn("__h", h).orderBy("__h", id_col).limit(k)
        # k rows post-limit: single-partition numbering is the intent;
        # the constant-valued partition key (attr % 1 — bare literals
        # constant-fold out of the spec) silences the WindowExec warning
        seed_w = Window.partitionBy(F.col("__h") % F.lit(1)).orderBy(
            "__h", id_col
        )
        cvec = seeds.select(
            (F.row_number().over(seed_w) - 1).alias("cell"),
            F.col("v").alias("cv"),
        )

    def assign_nearest(cvec: DataFrame) -> DataFrame:
        # argmin as min(struct(dist, cell)): same (dist asc, cell asc)
        # selection a window row_number would make, but partial-aggregable
        # — map-side combine collapses the k candidate rows per vector
        # before the shuffle, vs a window's full n·k exchange.
        d = round4(_l2sq(F.col("v"), F.col("cv")))
        return (
            corpus.crossJoin(F.broadcast(cvec))
            .groupBy(id_col)
            .agg(
                F.min(F.struct(d.alias("d"), F.col("cell"))).alias("m"),
                F.first("v").alias("v"),  # constant within the group
            )
            .select(
                id_col,
                F.col("m.cell").alias("cell"),
                F.col("m.d").alias("dist_sq"),
                "v",
            )
        )

    spark = emb.sparkSession
    traces: list[DataFrame] = []

    def _inertia_row(a: DataFrame, rnd: int) -> DataFrame:
        return a.agg(round4(F.avg("dist_sq")).alias("inertia")).select(
            F.lit(rnd).cast("long").alias("round"), "inertia"
        )

    for _t in range(iters):
        assign = assign_nearest(cvec)
        if reseed_empty or with_trace:
            # the round's assignment feeds BOTH the centroid update and
            # the farthest-point candidate scan; materialize it once so
            # the O(n·k·dim) assign pass isn't executed twice per round
            # (the cluster-mode analog is caching the assignment — the
            # standard Lloyd practice)
            assign = materialize(assign, "kmeans_assign_round")
        cent = (
            assign.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(round4(F.avg("x")).alias("c"))
        )
        cvec = (
            cent.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("s"))
            .select("cell", F.transform("s", lambda st: st["c"]).alias("cv"))
        )
        if reseed_empty:
            # Cells that lost every member vanish from the centroid
            # update; re-seed them from the farthest-assigned points.
            # All frames here are <=k rows except `cand`, whose top-k is
            # a TakeOrderedAndProject (per-partition heaps), never a
            # global sort of the corpus.
            all_cells = spark.range(k).select(
                F.col("id").cast("int").alias("cell")
            )
            empty = all_cells.join(
                F.broadcast(cvec.select("cell")), "cell", "left_anti"
            )
            # <= k rows each: bounded by construction (see seed_w note)
            e_w = Window.partitionBy(F.col("cell") % F.lit(1)).orderBy("cell")
            empty_rn = empty.select(
                "cell", F.row_number().over(e_w).alias("rn")
            )
            cand = assign.orderBy(F.col("dist_sq").desc(), id_col).limit(k)
            c_w = Window.partitionBy(
                F.col("dist_sq").cast("long") % F.lit(1)
            ).orderBy(F.col("dist_sq").desc(), id_col)
            cand_rn = cand.select(
                F.col("v").alias("cv"), F.row_number().over(c_w).alias("rn")
            )
            repl = empty_rn.join(cand_rn, "rn").select("cell", "cv")
            cvec = cvec.unionByName(repl)
        if with_trace:
            traces.append(_inertia_row(assign, _t + 1))
    # final assignment under the last centroids
    if with_centroids:
        return assign_nearest(cvec), cvec
    final = assign_nearest(cvec).select(id_col, "cell", "dist_sq")
    if with_trace:
        final = materialize(final, "kmeans_final_assign")
        traces.append(_inertia_row(final, iters + 1))
        curve = traces[0]
        for t in traces[1:]:
            curve = curve.unionByName(t)
        return final, curve
    return final


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign vectors to FROZEN centroids: (id, cell, dist_sq).

    The incremental-maintenance path for the IVF index (VERDICT r5 #4):
    a new crawl batch joins the index by assignment only — O(increment ·
    k · dim) compute, one broadcast of k centroid vectors, no retrain —
    the same discipline `dedup_incremental_new_batch` gives exact dedup.
    Uses the identical argmin as kmeans_cells' assign step
    (min(struct(round4(dist), cell)): partial-aggregable, map-side
    combine collapses the k candidate rows per vector before the
    shuffle), so an incremental assignment is bit-identical to what a
    full assign pass under the same centroids would produce — and
    because each vector's cell depends only on (vector, centroids), a
    STREAMED increment assigns identically to a batched one (pinned by
    test_ivf_assign_stream_equals_batch).

    ``centroids`` is (cell, cv) as returned by
    ``kmeans_cells(..., with_centroids=True)``.
    """
    v = as_double(F.col(vec_col))
    corpus = emb.select(F.col(id_col), v.alias("v"))
    d = round4(_l2sq(F.col("v"), F.col("cv")))
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(F.min(F.struct(d.alias("d"), F.col("cell"))).alias("m"))
        .select(
            id_col,
            F.col("m.cell").alias("cell"),
            F.col("m.d").alias("dist_sq"),
        )
    )


def ivf_drift(
    train_assign: DataFrame,
    new_assign: DataFrame,
    ratio_threshold: float = 1.5,
) -> DataFrame:
    """Per-cell drift dashboard: does the frozen index still fit the
    incoming distribution, or is it time to retrain?

    Compares the new batch's assignment quality against the training
    assignment per cell: (cell, n_train, n_new, avg_train_dist,
    avg_new_dist, drift_ratio, retrain_flag). drift_ratio =
    avg_new/avg_train (NULL when a cell's training distance is 0 or it
    received no new vectors); retrain_flag fires when the ratio clears
    ``ratio_threshold`` — new vectors landing systematically farther
    from their nearest centroid than training data did means the
    centroids no longer tile the distribution. FULL outer join: a cell
    whose training membership emptied (reseed edge) but that received
    new vectors still surfaces — with n_train = 0 it carries no
    baseline, so drift_ratio is NULL, and a planner should read the
    bare n_new count as its own retrain signal. Aggregates only: two
    k-row summaries joined, nothing rescanned.
    """
    t = train_assign.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        round4(F.avg("dist_sq")).alias("avg_train_dist"),
    )
    n = new_assign.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_new"),
        round4(F.avg("dist_sq")).alias("avg_new_dist"),
    )
    joined = t.join(n, "cell", "full_outer")
    ratio = F.when(
        F.col("avg_train_dist") > 0,
        round4(F.col("avg_new_dist") / F.col("avg_train_dist")),
    )
    return joined.select(
        "cell",
        F.coalesce("n_train", F.lit(0)).cast("long").alias("n_train"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        "avg_train_dist",
        "avg_new_dist",
        ratio.alias("drift_ratio"),
        F.coalesce(ratio > ratio_threshold, F.lit(False))
        .cast("int")
        .alias("retrain_flag"),
    )


def ivf_budgeted_topk(
    corpus: DataFrame,
    assign: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    nprobe: int = 2,
    budget: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search under a PER-CELL SCAN BUDGET: for each query, probe the
    ``nprobe`` cells whose centroids are cosine-nearest, scan at most the
    first ``budget`` members of each probed cell's inverted list in
    STORED order (dist-to-centroid ascending, id ties — the layout that
    keeps each list's densest core first), and exact-rerank the scanned
    candidates. Returns (q_id, vec_id, cosine): top-k per query.

    This models the work bound every production IVF deployment runs
    with: per-query latency is capped by nprobe × budget candidates no
    matter how a cell grows. That cap is precisely what distribution
    drift breaks — a drifted increment piles into ONE frozen cell AND
    sorts to the TAIL of its list (drifted members are farthest from the
    frozen centroid), so a budgeted scan never reaches them and
    recall@k collapses even though an unbounded scan would be fine.
    Retraining rebalances the lists and restores recall; the
    ivf_drift_retrain_recovery query measures that loop end to end.

    Scale shape: the budget rank is QUERY-INDEPENDENT — computed once
    per index build (row_number over cell, the physical write order of
    the list at 100 TB, where "rank <= budget" is a prefix read, not a
    window at query time); probes are a broadcast of k·|queries| cell
    picks; candidates cap at |queries|·nprobe·budget rows; both ranks
    end in window-prefix filters over bounded partitions.

    ``corpus`` is (id, embedding double-array), ``assign`` is the (id,
    cell, dist_sq) index table, ``cents`` is (cell, cv), ``queries`` is
    (q_id, qv).
    """
    w_list = Window.partitionBy("cell").orderBy("dist_sq", id_col)
    listed = assign.select(
        id_col, "cell", F.row_number().over(w_list).alias("list_rank")
    ).where(F.col("list_rank") <= budget)
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("c_cos").desc(), F.col("cell")
    )
    probes = (
        cents.crossJoin(F.broadcast(queries))
        .select(
            "cell",
            "q_id",
            round4(cosine(F.col("cv"), F.col("qv"))).alias("c_cos"),
        )
        .select("cell", "q_id", F.row_number().over(w_probe).alias("pr"))
        .where(F.col("pr") <= nprobe)
        .select("cell", "q_id")
    )
    cand = (
        # the listed/cand side derives from the aggregate-shaped
        # assignment table (underestimated-stats class) and under a
        # corpus-scale budget (ivf_drift_retrain_recovery uses
        # ceil(N/8)) candidates are corpus-sized — shuffle_hash per the
        # CLAUDE.md convention; the probe/query broadcasts are the
        # genuinely-bounded sides and stay
        listed.join(F.broadcast(probes), "cell")
        .hint("shuffle_hash")
        .join(corpus, id_col)
        .join(
            F.broadcast(queries), "q_id"
        )
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            round4(cosine(F.col("embedding"), F.col("qv"))).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.select("q_id", id_col, "cosine", F.row_number().over(w_rank).alias("rn"))
        .where(F.col("rn") <= k)
        .select("q_id", id_col, "cosine")
    )


def quantize_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization, long format (id, dim, qval, scale).

    Per-vector max-abs scaling to [-127, 127] — the standard trick that
    cuts embedding storage 4x before ANN indexing. scale is the exact
    max-|x| element (a raw data value, bit-identical everywhere);
    round-half-up is the portable floor(x + 0.5) form. All-zero vectors
    quantize to zeros (scale 0 guard). Scan + explode only — no shuffle.
    """
    v = as_double(F.col(vec_col))
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scaled = emb.select(
        F.col(id_col), v.alias("v"), maxabs.alias("scale")
    )
    q = F.when(
        F.col("scale") > 0,
        F.floor(F.col("x") * F.lit(127.0) / F.col("scale") + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    return scaled.select(
        F.col(id_col),
        F.posexplode("v").alias("dim", "x"),
        "scale",
    ).select(F.col(id_col), "dim", q.alias("qval"), "scale")




def sq_rescore_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    shortlist: int = 40,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar-quantized scan + exact rescore: the int8 ANN ladder rung.

    Phase 1 scores the whole corpus on symmetric max-abs int8 codes
    (:func:`quantize_int8`'s arithmetic in array form). Cosine over the
    quantized vectors needs NO dequantization — the per-vector scales
    cancel — so the scan reads 1/4 the bytes of the float corpus and the
    products are exact small-int doubles (bit-identical across engines).
    Phase 2 joins the ``shortlist`` survivors (a broadcast of ids, never
    the corpus) back to the full-precision table and re-ranks exactly.

    This is the classic scan-cheap/rescore-exact architecture (FAISS
    SQ8, ScaNN's AH+rescore): at 100 TB the quantized table is the thing
    you keep hot, and the float table is touched only for ~4k rows per
    query. Both phases end in TakeOrderedAndProject heaps — no global
    sort, nothing collected.
    """
    if query.limit(2).count() != 1:
        raise ValueError("sq_rescore_topk expects exactly one query row")

    def quantized(df: DataFrame, out_id: str, out_q: str) -> DataFrame:
        v = as_double(F.col(vec_col))
        maxabs = F.aggregate(
            v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        )
        scaled = df.select(
            F.col(id_col).alias(out_id), v.alias("_v"), maxabs.alias("_s")
        )
        q = F.transform(
            "_v",
            lambda x: F.when(
                F.col("_s") > 0,
                F.floor(x * F.lit(127.0) / F.col("_s") + F.lit(0.5)),
            )
            .otherwise(F.lit(0))
            .cast("double"),
        )
        return scaled.select(out_id, q.alias(out_q))

    cq = quantized(emb, id_col, "qv")
    qq = quantized(query, "q_id", "qqv")
    cand = (
        cq.crossJoin(F.broadcast(qq))
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            F.col(id_col),
            cosine(F.col("qv"), F.col("qqv")).alias("_approx"),
        )
        .orderBy(F.col("_approx").desc(), F.col(id_col))
        .limit(shortlist)
    )
    qfull = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qfv")
    )
    full = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("fv"))
    return (
        full.join(F.broadcast(cand), id_col)
        .crossJoin(F.broadcast(qfull))
        .select(
            F.col(id_col),
            round4(F.col("_approx")).alias("approx_cosine"),
            round4(cosine(F.col("fv"), F.col("qfv"))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pq_train_encode(
    emb: DataFrame,
    n_sub: int = 4,
    sub_dim: int = 16,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Product quantization: train per-subspace codebooks, encode the corpus.

    The 64-dim vector splits into `n_sub` contiguous `sub_dim`-dim
    subspaces; each gets its own k-means (hash seeding salted "pq<m>"),
    a member-mean codebook (the optimal codebook for the learned
    assignment) and an argmin re-encode. A vector's PQ code is n_sub
    small ints (4x4 bits = 2 bytes for a 512-byte float vector — a 256x
    index compression).

    All subspaces train TOGETHER in one keyed frame: the subspace id `m`
    is just another grouping column, so a Lloyd round is ONE broadcast of
    the n_sub*k centroid rows + ONE corpus pass for every subspace at
    once — per-round cost is flat in n_sub, not a sequential per-subspace
    loop (4x fewer jobs; measured ~3x faster on the test corpus). Each
    round's assignment materializes once (O(n) rows) so later rounds and
    the codebook/encode consumers never replay Lloyd lineage — on a
    cluster this is persist-per-round, standard Lloyd practice.

    Arithmetic is identical to running `kmeans_cells` per subspace
    (round4-ed distances/centroids, ties on cell, seeding hash
    "pq<m>"||id), so the per-subspace SQL oracle chains stay valid.

    Returns (enc, codebooks): enc = (m, id, code, err) — the per-subspace
    assignment under the final codebook with its round4-ed quantization
    error; codebooks = (m, cell, cv).
    """
    from ..functions.hashing import hash60

    v = as_double(F.col(vec_col))
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(v, m * sub_dim + 1, sub_dim).alias("sv"),
            )
            for m in range(n_sub)
        ]
    )
    sub = materialize(
        emb.select(F.col(id_col), F.explode(slices).alias("s"))
        .select("s.m", F.col(id_col), "s.sv"),
        "pq_subvectors",  # scanned by seeding + every round
    )

    h = hash60(
        F.concat(
            F.lit("pq"),
            F.col("m").cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    # per-subspace hash-order seeding: the k smallest salted hashes
    seed_w = Window.partitionBy("m").orderBy("__h", id_col)
    cvec = (
        sub.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(seed_w))
        .where(F.col("__rn") <= k)
        .select("m", (F.col("__rn") - 1).alias("cell"), F.col("sv").alias("cv"))
    )

    d = round4(_l2sq(F.col("sv"), F.col("cv")))

    def assign_nearest(cvec: DataFrame) -> DataFrame:
        return (
            sub.join(F.broadcast(cvec), "m")
            .groupBy("m", id_col)
            .agg(
                F.min(F.struct(d.alias("d"), F.col("cell"))).alias("mn"),
                F.first("sv").alias("sv"),
            )
            .select(
                "m",
                id_col,
                F.col("mn.cell").alias("cell"),
                F.col("mn.d").alias("err"),
                "sv",
            )
        )

    def member_mean(assign: DataFrame) -> DataFrame:
        return (
            assign.select("m", "cell", F.posexplode("sv").alias("dim", "x"))
            .groupBy("m", "cell", "dim")
            .agg(round4(F.avg("x")).alias("c"))
            .groupBy("m", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("s"))
            .select("m", "cell", F.transform("s", lambda st: st["c"]).alias("cv"))
        )

    for _ in range(iters):
        assign = materialize(assign_nearest(cvec), "pq_assign_round")
        cvec = member_mean(assign)

    codebooks = materialize(member_mean(assign_nearest(cvec)), "pq_codebooks")
    # The final argmin re-encode is INDEX BUILD (the stored code table —
    # this function's contract says "each vector stored as n_sub codes"),
    # so materialize it like every other index artifact: left lazy, the
    # full corpus assignment pass (broadcast 64 codebook rows, groupBy
    # (m, id) over n_sub*k candidates/vector) replayed inside every
    # downstream ADC query's timed probe.
    enc = materialize(
        assign_nearest(codebooks)
        .select("m", id_col, "cell", "err")
        .withColumnRenamed("cell", "code"),
        "pq_codes",
    )
    return enc, codebooks


def pq_adc_topk(
    emb: DataFrame,
    query: DataFrame,
    k_top: int = 10,
    n_sub: int = 4,
    sub_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search with exact-distance audit.

    The query stays un-quantized: per subspace its squared distance to
    each codebook entry is a (n_sub*k)-row lookup table; a corpus
    vector's estimated distance is n_sub table lookups on its code — no
    vector arithmetic per corpus row at query time (the scan reads 2-byte
    codes, not 512-byte floats, at 100 TB). Top-k by estimated distance;
    the k_top result rows are audited with the true squared L2 so the
    eval exposes the PQ approximation error.
    """
    # dtab drops q_id after the crossJoin, so >1 query row would mix
    # distances across queries in the (m, code) lookup join — fail loudly
    n_q = query.limit(2).count()
    if n_q != 1:
        raise ValueError(
            f"pq_adc_topk expects exactly one query row, got {'>=2' if n_q > 1 else 0}"
        )
    enc, codebooks = pq_train_encode(
        emb, n_sub=n_sub, sub_dim=sub_dim, vec_col=vec_col, id_col=id_col
    )
    q = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qslice = F.element_at(
        F.array(
            *[
                F.slice(F.col("qv"), m * sub_dim + 1, sub_dim)
                for m in range(n_sub)
            ]
        ),
        F.col("m").cast("int") + 1,
    )
    dtab = codebooks.crossJoin(F.broadcast(q)).select(
        "m",
        F.col("cell").alias("code"),
        round4(_l2sq(qslice, F.col("cv"))).alias("qd"),
    )
    # fixed-order sum (qd_0 + qd_1 + ...) so the final round4 matches the
    # oracle's left-to-right addition exactly
    per_m = [
        F.max(F.when(F.col("m") == m, F.col("qd"))).alias(f"qd_{m}")
        for m in range(n_sub)
    ]
    est_terms = enc.join(F.broadcast(dtab), ["m", "code"]).groupBy(id_col).agg(*per_m)
    est_sum = F.col("qd_0")
    for m in range(1, n_sub):
        est_sum = est_sum + F.col(f"qd_{m}")
    top = (
        est_terms.crossJoin(F.broadcast(q.select("q_id")))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), round4(est_sum).alias("est_dist"))
        .orderBy("est_dist", id_col)
        .limit(k_top)
    )
    corpus = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    true_d = round4(_l2sq(F.col("v"), F.col("qv")))
    return (
        top.join(corpus, id_col)
        .crossJoin(F.broadcast(q.select("qv")))
        .select(F.col(id_col), "est_dist", true_d.alias("true_dist"))
        .orderBy("est_dist", id_col)
    )


def ivfadc_topk(
    emb: DataFrame,
    query: DataFrame,
    k_top: int = 10,
    n_coarse: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): coarse k-means cell prune + ADC over PQ codes of
    the RESIDUALS within probed cells — the billion-vector architecture.

    Index build (once, via materialize — write tables at scale):
      1. coarse quantizer: k-means (`kmeans_cells`, hash seeding, Lloyd)
         assigns every vector to one of ``n_coarse`` cells;
      2. residual r = v − centroid(cell) (exact double subtraction of the
         round4-ed centroid — engine-portable);
      3. PQ codebooks trained on the residuals (`pq_train_encode`), each
         vector stored as (cell, n_sub codes).

    Query time: distance to each of the ``n_coarse`` centroids picks the
    ``n_probe`` nearest cells; per probed cell the query RESIDUAL builds
    the per-subspace distance table (n_probe·n_sub·k rows, broadcast);
    scoring a corpus vector is n_sub table lookups keyed on (cell, m,
    code) — the scan reads 2-byte codes of probed cells only, never
    float vectors. Top-k rows are audited with the true squared L2.

    At 100 TB: the corpus is partitioned by cell (the inverted file), the
    probe prunes partitions, the distance table is a broadcast join —
    no shuffle of vector data at query time.
    """
    n_q = query.limit(2).count()
    if n_q != 1:
        raise ValueError(
            f"ivfadc_topk expects exactly one query row, got {'>=2' if n_q > 1 else 0}"
        )
    assign, coarse_cvec = kmeans_cells(
        emb,
        k=n_coarse,
        iters=2,
        vec_col=vec_col,
        id_col=id_col,
        with_centroids=True,
    )
    coarse_cvec = materialize(coarse_cvec, "ivfadc_coarse_centroids")
    # residual encode: v - centroid of the assigned cell
    resid = assign.join(F.broadcast(coarse_cvec), "cell").select(
        id_col,
        "cell",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("resid"),
    )
    resid = materialize(resid, "ivfadc_residuals")
    enc, codebooks = pq_train_encode(
        resid, n_sub=n_sub, sub_dim=sub_dim, vec_col="resid", id_col=id_col
    )
    # The inverted file — (cell, m, code) per vector — is the index
    # IVFADC serves from (partitioned by cell at 100 TB), so its build
    # join runs at build time inside the checkpoint, not per query.
    # Both sides are corpus-sized checkpoint-derived frames, so per the
    # CLAUDE.md hint rule the join must not be allowed to broadcast:
    # shuffle_hash on the narrower (id, cell) side.
    enc_cells = materialize(
        enc.join(resid.select(id_col, "cell").hint("shuffle_hash"), id_col),
        "ivfadc_invfile",
    )

    q = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qv")
    )
    # coarse probe: n_probe nearest cells to the (un-quantized) query
    cd = round4(_l2sq(F.col("qv"), F.col("cv")))
    probe = (
        coarse_cvec.crossJoin(F.broadcast(q))
        .select("cell", "cv", cd.alias("cd"))
        .orderBy("cd", "cell")
        .limit(n_probe)
    )
    # per-probed-cell query residual feeds the ADC distance tables
    qres = probe.crossJoin(F.broadcast(q)).select(
        "cell", F.zip_with("qv", "cv", lambda a, b: a - b).alias("qr")
    )
    qslice = F.element_at(
        F.array(
            *[F.slice(F.col("qr"), m * sub_dim + 1, sub_dim) for m in range(n_sub)]
        ),
        F.col("m").cast("int") + 1,
    )
    dtab = (
        codebooks.withColumnRenamed("cell", "code")
        .crossJoin(F.broadcast(qres))
        .select(
            "cell",
            "m",
            "code",
            round4(_l2sq(qslice, F.col("cv"))).alias("qd"),
        )
    )
    # est over probed cells only: the dtab inner join IS the cell prune
    per_m = [
        F.max(F.when(F.col("m") == m, F.col("qd"))).alias(f"qd_{m}")
        for m in range(n_sub)
    ]
    est_terms = (
        enc_cells.join(F.broadcast(dtab), ["cell", "m", "code"])
        .groupBy(id_col)
        .agg(*per_m)
    )
    est_sum = F.col("qd_0")
    for m in range(1, n_sub):
        est_sum = est_sum + F.col(f"qd_{m}")
    top = (
        est_terms.crossJoin(F.broadcast(q.select("q_id")))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col(id_col), round4(est_sum).alias("est_dist"))
        .orderBy("est_dist", id_col)
        .limit(k_top)
    )
    corpus = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    true_d = round4(_l2sq(F.col("v"), F.col("qv")))
    return (
        top.join(corpus, id_col)
        .crossJoin(F.broadcast(q.select("qv")))
        .select(F.col(id_col), "est_dist", true_d.alias("true_dist"))
        .orderBy("est_dist", id_col)
    )


# Johnson-Lindenstrauss random projection: 64 -> 16 dims with Rademacher
# entries (distribution-free JL), scaled by 1/sqrt(16) = /4 (exact in
# binary). Seed 13 keeps the planes independent of the LSH family above.
RP_DIM = 16
_rp_rng = random.Random(13)
RP_PLANES: list[list[int]] = [
    [_rp_rng.choice((-1, 1)) for _ in range(EMB_DIM)] for _ in range(RP_DIM)
]


def random_project(vec: Column) -> Column:
    """Project to RP_DIM dims: flat signed sums (codegen-friendly, same
    left-assoc order as the SQL twin), each divided by sqrt(RP_DIM)."""
    outs = []
    for plane in RP_PLANES:
        acc = F.lit(0.0)
        for i, sign in enumerate(plane):
            term = F.coalesce(F.get(vec, i), F.lit(0.0))
            acc = acc + (term if sign > 0 else -term)
        outs.append(acc / F.lit(4.0))
    return F.array(*outs)


def random_project_sql(vec_expr: str) -> str:
    """DuckDB twin of :func:`random_project` — identical fold order."""
    comps = []
    for plane in RP_PLANES:
        signed = "0.0 " + " ".join(
            f"{'+' if sign > 0 else '-'} COALESCE({vec_expr}[{i + 1}], 0.0)"
            for i, sign in enumerate(plane)
        )
        comps.append(f"(({signed}) / 4.0)")
    return "list_value(" + ", ".join(comps) + ")"


def mmr_select(
    emb: DataFrame,
    query: DataFrame,
    pool: int = 20,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    greedily pick ``k`` items that balance relevance to the query against
    redundancy with what's already picked —
    ``argmax 0.7*rel(d) - 0.3*max_sim(d, selected)`` per round. The
    diversity-aware retrieval/sampling step plain top-k can't express
    (top-k returns near-duplicates of the best hit; MMR spends the same
    budget covering the space).

    Scale shape: candidate generation is the distributed part — one
    corpus scan into a TakeOrdered ``pool`` heap (swap in any ANN ladder
    rung to shrink the scan). The greedy loop then runs k rounds over
    the pool-sized frame: per round one argmax (TakeOrdered-1) and one
    broadcast-1-row rescore, each materialized to cut lineage — data
    never visits the driver. Scores and pairwise cosines round4-snap
    before every comparison so the greedy argmax can't be split by
    engine-specific ulps (the Q15 equality trick, applied per round).

    Returns (sel_rank, id, rel, mmr_score), one row per selection.
    """
    q = query.select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            id_col,
            "v",
            round4(cosine(F.col("v"), F.col("qv"))).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(pool)
        .withColumn("max_sim", F.lit(0.0))
    )
    cand = materialize(cand, "mmr_pool")
    picks: list[DataFrame] = []
    for r in range(k):
        # literal 0.3, not (1 - 0.7): the Python float 1-0.7 is
        # 0.30000000000000004 and would diverge from the SQL twin's 0.3
        score = round4(
            F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("max_sim")
        )
        pick = materialize(
            cand.select(id_col, "v", "rel", score.alias("mmr_score"))
            .orderBy(F.col("mmr_score").desc(), F.col(id_col))
            .limit(1)
            .withColumn("sel_rank", F.lit(r)),
            f"mmr_pick_{r}",
        )
        picks.append(pick.select("sel_rank", id_col, "rel", "mmr_score"))
        sel = pick.select(
            F.col(id_col).alias("sel_id"), F.col("v").alias("sel_v")
        )
        cand = materialize(
            cand.crossJoin(F.broadcast(sel))
            .where(F.col(id_col) != F.col("sel_id"))
            .select(
                id_col,
                "v",
                "rel",
                F.greatest(
                    F.col("max_sim"),
                    round4(cosine(F.col("v"), F.col("sel_v"))),
                ).alias("max_sim"),
            ),
            f"mmr_cand_{r}",
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out
