"""Tier-C similarity-search queries over `embeddings` with DuckDB oracles.

The query vector is always the corpus row with vec_id = 0 — fetched by
subquery on both engines, so no vector literals are needed except the LSH
projection planes (±1 Rademacher entries, integer-exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql
from ..functions.rounding import round4, round4_sql
from ..operators import similarity as S
from ..plans import layout as ZL
from ..plans.materialize import materialize
from ..registry import query
from ..tables import load_table

QUERY_VEC_ID = 0

_COS = """
    list_reduce(
      list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]),
      (acc, x) -> acc + x
    ) / (
      sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) *
      sqrt(list_reduce(list_transform(qv, x -> x * x), (acc, x) -> acc + x))
    )
"""


_bucket_sql = S.lsh_bucket_sql


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv FROM corpus WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT vec_id,
           (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
    FROM corpus CROSS JOIN q
    WHERE vec_id != q_id
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    description="C10: exact cosine top-10 for the query vector (vec_id=0) — "
    "broadcast query, one corpus scan, TakeOrderedAndProject (no global "
    "sort).",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.brute_force_topk(emb, q, k=10)


@query(
    "ann_lsh_buckets",
    oracle=f"""
    SELECT vec_id,
           {_bucket_sql("v")} AS bucket
    FROM (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    """,
    description="C10: random-hyperplane LSH bucket ids (8 Rademacher "
    "planes, seed 7) — the sub-linear index: bucket id is the partition "
    "key at scale.",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double(F.col("embedding"))
    return emb.select("vec_id", S.lsh_bucket(v).alias("bucket"))


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM corpus
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
      FROM bucketed WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT vec_id, bucket,
           (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
    FROM bucketed JOIN q ON bucket = q_bucket
    WHERE vec_id != q_id
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    description="C10: ANN top-10 — LSH-bucket prune (~1/256 of corpus) "
    "then exact cosine re-rank; the scale path vs the brute-force "
    "baseline.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.bucketed_topk(emb, q, k=10)


_PROBE_LIST = ", ".join(
    ["q_bucket"] + [f"xor(q_bucket, {1 << p})" for p in range(S.N_PLANES)]
)


@query(
    "ann_lsh_multiprobe_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM corpus
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
      FROM bucketed WHERE vec_id = {QUERY_VEC_ID}
    ),
    probes AS (
      SELECT q_id, qv, unnest([{_PROBE_LIST}]) AS bucket FROM q
    )
    SELECT vec_id, bucket,
           (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
    FROM bucketed JOIN probes USING (bucket)
    WHERE vec_id != q_id
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    description="C10: multi-probe ANN top-10 — the query's bucket plus all "
    "Hamming-distance-1 buckets (one plane sign flipped) are probed, "
    "recovering the near-misses single-probe LSH drops at plane "
    "boundaries; scans (1+planes)/2^planes of the corpus, probe list is "
    "a broadcast.",
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.multiprobe_topk(emb, q, k=10)


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           (FLOOR(AVG(v[i]) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS centroid
    FROM (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), (SELECT unnest(range(1, 65)) AS i)
    GROUP BY label, i
    """,
    description="C10/IVF train step: per-label elementwise centroids (long "
    "format) — one shuffle keyed on (label, dim).",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.centroids(emb)


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv FROM corpus WHERE vec_id = {QUERY_VEC_ID}
    ),
    cent AS (
      SELECT label, i - 1 AS dim,
             (FLOOR(AVG(v[i]) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS c
      FROM corpus, (SELECT unnest(range(1, 65)) AS i)
      GROUP BY label, i
    ),
    cvec AS (SELECT label, list(c ORDER BY dim) AS v FROM cent GROUP BY label),
    probe AS (
      SELECT label
      FROM cvec CROSS JOIN q
      ORDER BY (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) DESC,
               label
      LIMIT 2
    )
    SELECT vec_id, label,
           (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
    FROM corpus JOIN probe USING (label) CROSS JOIN q
    WHERE vec_id != q_id
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    description="C10: full IVF search — centroid train (embedding_centroids) "
    "+ nprobe=2 cell selection + exact cosine re-rank inside the probed "
    "cells; the partition-pruned scale path (corpus clustered by cell id "
    "scans nprobe/ncells of the data).",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.ivf_topk(emb, q, nprobe=2, k=10)


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, v,
             list_reduce(list_transform(v, x -> abs(x)),
                         (a, b) -> greatest(a, b)) AS scale
      FROM corpus
    )
    SELECT vec_id, i - 1 AS dim,
           CAST(CASE WHEN scale > 0
                     THEN FLOOR(v[i] * 127.0 / scale + 0.5)
                     ELSE 0 END AS BIGINT) AS qval,
           scale
    FROM scaled, (SELECT unnest(range(1, 65)) AS i)
    """,
    description="Embedding preprocessing: symmetric int8 quantization "
    "(per-vector max-abs scale to [-127,127], 4x storage cut before ANN "
    "indexing), long format — scan + explode, no shuffle. scale is an "
    "exact data element; round-half-up is the portable floor(x+0.5).",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.quantize_int8(emb)


N_HOURS = 24


@query(
    "user_activity_similarity",
    oracle=f"""
    WITH hours AS (SELECT unnest(range({N_HOURS})) AS h),
    u AS (SELECT DISTINCT user_id FROM events),
    cnt AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    vec AS (
      SELECT g.user_id,
             list(CAST(COALESCE(cnt.c, 0) AS DOUBLE) ORDER BY g.h) AS v
      FROM (SELECT u.user_id, hours.h FROM u CROSS JOIN hours) g
      LEFT JOIN cnt ON cnt.user_id = g.user_id AND cnt.h = g.h
      GROUP BY g.user_id
    ),
    normed AS (
      SELECT user_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (acc, x) -> acc + x)) AS nrm,
             list_transform(
               v, x -> x - (list_reduce(v, (a, b) -> a + b)
                            / {N_HOURS}.0)) AS vc
      FROM vec
    ),
    bucketed AS (
      SELECT user_id, v, nrm, {{bucket}} AS bucket FROM normed
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             (FLOOR((list_reduce(
                 list_transform(range(1, {N_HOURS} + 1),
                                i -> a.v[i] * b.v[i]),
                 (acc, x) -> acc + x) / (a.nrm * b.nrm))
                * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.user_id != b.user_id
       AND (a.bucket = b.bucket
            OR xor(a.bucket, b.bucket) IN (1, 2, 4, 8, 16, 32))
    )
    SELECT user_a, user_b, cosine
    FROM pairs
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_a ORDER BY cosine DESC, user_b
    ) <= 3
    ORDER BY user_a, cosine DESC, user_b
    """.replace("{bucket}", _bucket_sql("vc")),
    description="C10/C12: time-series similarity search — each user's "
    "hour-of-day activity profile (24-dim dense count vector built by "
    "conditional aggregation, no pivot shuffle) matched to their top-3 "
    "most-similar users by cosine. The profile reduction is the scale "
    "step: |users| x 24 doubles regardless of event volume; the pairing "
    "is BLOCKED on the mean-centered random-hyperplane LSH bucket with "
    "Hamming<=1 multi-probe (centering matters: raw count profiles all "
    "sit in the positive orthant and collapse into ~3 buckets; centered "
    "they spread over all 64). Candidates per user ~ 7/64 of users — "
    "sub-quadratic, and the same bucket key is the shuffle/cluster key "
    "at 100 TB. Oracle applies identical blocking.",
)
def user_activity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Two-stage profile build: (user, hour) counts, then a map->dense-array
    # projection. A single groupBy with 24 conditional-sum aggregates gives
    # the same result but its expression tree is ~25x larger — measured
    # 11 s of analysis + codegen vs 0.5 s for this formulation at sf0.01.
    cnt = ev.groupBy("user_id", F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    vec = (
        cnt.groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("h", "c"))).alias("m"))
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(N_HOURS - 1)),
                lambda i: F.coalesce(F.try_element_at("m", i), F.lit(0)).cast(
                    "double"
                ),
            ).alias("v"),
        )
    )
    # Mean-centered copy for the LSH blocking key only (cosine still uses
    # the raw profile). Count profiles are non-negative, so un-centered
    # they crowd the positive orthant and ~60% share one hyperplane
    # bucket; centering spreads them over all 2^N_PLANES buckets.
    mean = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x
    ) / F.lit(float(N_HOURS))
    normed = vec.select(
        "user_id",
        "v",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
        F.transform(F.col("v"), lambda x: x - mean).alias("vc"),
    )
    # The profile table is tiny (|users| rows) but its lineage is the full
    # events aggregation; it feeds BOTH sides of the self-join, so
    # materialize it once (same rationale + measurement as the ngram
    # inverted index in operators/dedup.py). The bucket is computed
    # INSIDE the checkpoint: lsh_bucket is an Arrow kernel, and placing
    # it after the checkpoint re-ran it per join side (6 Python stages
    # in the probe plan); inside, it runs once and the probe plan is
    # pure JVM. vc exists only to feed it, so the stored frame also
    # drops 24 doubles/row.
    normed = materialize(
        normed.withColumn("bucket", S.lsh_bucket(F.col("vc"))).drop("vc"),
        "activity_profiles",
    )
    bucketed = normed
    # Multi-probe Hamming<=1: probe the own bucket plus each one-bit
    # neighbor. Pairing becomes a bucket EQUI-join (hash, not nested
    # loop); at cluster scale the bucket is the shuffle key and the
    # candidate set is ~(1+N_PLANES)/2^N_PLANES of the pair space.
    probe_vals = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(S.N_PLANES)],
    )
    # The checkpointed profile table sits in ~1 partition; the pair scan
    # parallelizes over the STREAMED side's partitions, so spread it
    # across the cluster before the join.
    a = bucketed.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        F.col("user_id").alias("user_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.explode(probe_vals).alias("pbucket"),
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from ..functions.rounding import round4

    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("pbucket") == F.col("bucket"))
            & (F.col("user_a") != F.col("user_b")),
        )
        .select(
            "user_a",
            "user_b",
            round4(dot / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("user_a").orderBy(
        F.col("cosine").desc(), F.col("user_b")
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("user_a", "user_b", "cosine")
        .orderBy("user_a", F.col("cosine").desc(), "user_b")
    )


def _kmeans_parts(
    k: int = 8,
    iters: int = 2,
    seeding: str = "hash",
    reseed: bool = True,
    corpus_sql: str = (
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS v\n      FROM embeddings"
    ),
    dim: int = 64,
    salt: str = "km",
    sfx: str = "",
) -> tuple[list[str], str, str]:
    """CTE generator behind the k-means / PQ oracles: returns (parts,
    final-centroid CTE name, dist expr over aliases c/k). Parameterized so
    product quantization can compose one chain per subspace (corpus slice,
    subspace salt, name suffix) out of the same stage-for-stage twin."""
    seed_h = hash60_sql(f"'{salt}' || CAST(vec_id AS VARCHAR)")
    dist = (
        f"(FLOOR((list_reduce(list_transform(range(1, {dim + 1}), "
        "i -> (c.v[i] - k.cv[i]) * (c.v[i] - k.cv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    corpus = f"corpus{sfx}"
    parts = [
        f"""{corpus} AS (
      {corpus_sql}
    )""",
    ]
    if seeding == "farthest":
        # MATERIALIZED: each seeds{s} is referenced twice by seeds{s+1}
        # (union + distance subquery); left inline, DuckDB re-evaluates
        # the whole chain per reference — 2^k blowup (measured 64s -> 1s)
        parts.append(f"""seeds1{sfx} AS MATERIALIZED (
      SELECT 0 AS cell, vec_id, v
      FROM {corpus} ORDER BY {seed_h}, vec_id LIMIT 1
    )""")
        for s in range(1, k):
            parts.append(f"""seeds{s + 1}{sfx} AS MATERIALIZED (
      SELECT * FROM seeds{s}{sfx}
      UNION ALL
      SELECT {s} AS cell, vec_id, v FROM (
        SELECT c.vec_id, c.v, MIN({dist}) AS mind
        FROM {corpus} c
        CROSS JOIN (SELECT v AS cv FROM seeds{s}{sfx}) k
        GROUP BY c.vec_id, c.v
        ORDER BY mind DESC, vec_id LIMIT 1
      )
    )""")
        parts.append(
            f"cvec0{sfx} AS (SELECT cell, v AS cv FROM seeds{k}{sfx})"
        )
    else:
        parts.append(f"""cvec0{sfx} AS (
      SELECT ROW_NUMBER() OVER (ORDER BY {seed_h}, vec_id) - 1 AS cell,
             v AS cv
      FROM {corpus}
      ORDER BY {seed_h}, vec_id
      LIMIT {k}
    )""")
    prev = f"cvec0{sfx}"
    for t in range(iters):
        parts.append(f"""assign{t + 1}{sfx} AS (
      SELECT vec_id, cell, v, dist_sq FROM (
        SELECT c.vec_id, k.cell, c.v, {dist} AS dist_sq,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM {corpus} c CROSS JOIN {prev} k
      ) WHERE rn = 1
    )""")
        parts.append(f"""cent{t + 1}{sfx} AS (
      SELECT cell, i - 1 AS dim,
             (FLOOR(AVG(v[i]) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS c
      FROM assign{t + 1}{sfx}, (SELECT unnest(range(1, {dim + 1})) AS i)
      GROUP BY cell, i
    )""")
        parts.append(
            f"cvec{t + 1}{sfx} AS "
            f"(SELECT cell, list(c ORDER BY dim) AS cv FROM cent{t + 1}{sfx} "
            f"GROUP BY cell)"
        )
        prev = f"cvec{t + 1}{sfx}"
        if reseed:
            # rank-r empty cell takes the rank-r farthest point — same
            # (dist_sq DESC, vec_id) candidate order as the Spark side
            parts.append(f"""empty{t + 1}{sfx} AS (
      SELECT g.cell, ROW_NUMBER() OVER (ORDER BY g.cell) AS rn
      FROM (SELECT unnest(range({k})) AS cell) g
      LEFT JOIN cvec{t + 1}{sfx} c ON c.cell = g.cell
      WHERE c.cell IS NULL
    )""")
            parts.append(f"""cand{t + 1}{sfx} AS (
      SELECT v AS cv,
             ROW_NUMBER() OVER (ORDER BY dist_sq DESC, vec_id) AS rn
      FROM (SELECT * FROM assign{t + 1}{sfx}
            ORDER BY dist_sq DESC, vec_id LIMIT {k})
    )""")
            parts.append(
                f"cvecm{t + 1}{sfx} AS (SELECT * FROM cvec{t + 1}{sfx} "
                f"UNION ALL SELECT e.cell, c.cv FROM empty{t + 1}{sfx} e "
                f"JOIN cand{t + 1}{sfx} c USING (rn))"
            )
            prev = f"cvecm{t + 1}{sfx}"
    return parts, prev, dist


def _kmeans_sql(
    k: int = 8,
    iters: int = 2,
    seeding: str = "hash",
    reseed: bool = True,
) -> str:
    """DuckDB twin of operators.similarity.kmeans_cells: identical seeding
    (hash draw or deterministic farthest-first), identical round structure,
    identical empty-cell reseeding, identical rounding."""
    parts, prev, dist = _kmeans_parts(k=k, iters=iters, seeding=seeding,
                                      reseed=reseed)
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT vec_id, cell, dist_sq FROM (
      SELECT c.vec_id, k.cell, {dist} AS dist_sq,
             ROW_NUMBER() OVER (
               PARTITION BY c.vec_id ORDER BY {dist}, k.cell
             ) AS rn
      FROM corpus c CROSS JOIN {prev} k
    ) WHERE rn = 1
    ORDER BY vec_id
    """


@query(
    "ivf_kmeans_cells",
    oracle=_kmeans_sql(),
    description="C10/IVF train done properly: k-means (k=8, 2 Lloyd "
    "rounds) over the embeddings — deterministic hash-order seeding, "
    "assign-to-nearest via broadcast of k centroid vectors (no corpus "
    "self-join), centroid update as one posexplode groupBy; centroids "
    "and distances round4-ed so assignments reproduce bit-for-bit across "
    "engines. Output: final (vec_id, cell, dist_sq) — the learned "
    "partitioner that ivf_topk's block_col consumes at scale.",
)
def ivf_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.kmeans_cells(emb, k=8, iters=2).orderBy("vec_id")


@query(
    "ivf_kmeans_pp_cells",
    oracle=_kmeans_sql(seeding="farthest"),
    description="C10/IVF train, hardened seeding: deterministic "
    "k-means++-style farthest-first — seed 0 is the hash-order minimum, "
    "each next seed the point maximizing rounded distance to its "
    "nearest chosen seed (id ties). k-1 extra corpus passes, each a "
    "broadcast of <=k seed vectors, then the same Lloyd rounds with "
    "empty-cell reseeding (rank-r empty cell takes the rank-r farthest "
    "point). Oracle replicates seeding, rounds, and reseeding CTE-for-"
    "stage, so assignments value-hash across engines.",
)
def ivf_kmeans_pp_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.kmeans_cells(emb, k=8, iters=2, seeding="farthest").orderBy(
        "vec_id"
    )


_IVF_TRAIN_SQL = (
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
    " AS v\n      FROM embeddings WHERE vec_id % 10 != 0"
)
_IVF_NEW_SQL = (
    "newv AS (SELECT vec_id,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    "      FROM embeddings WHERE vec_id % 10 = 0)"
)


def _ivf_incremental_ctes() -> tuple[str, str, str]:
    """Shared chain for the incremental-assign oracles: k-means trained
    on the 90% split only, plus the held-out new batch."""
    parts, prev, dist = _kmeans_parts(corpus_sql=_IVF_TRAIN_SQL)
    parts.append(_IVF_NEW_SQL)
    return ",\n    ".join(parts), prev, dist


def _assign_sql(src: str, prev: str, dist: str) -> str:
    return f"""(
      SELECT vec_id, cell, dist_sq FROM (
        SELECT c.vec_id, k.cell, {dist} AS dist_sq,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM {src} c CROSS JOIN {prev} k
      ) WHERE rn = 1
    )"""


def _ivf_incremental_assign_sql() -> str:
    ctes, prev, dist = _ivf_incremental_ctes()
    return f"""
    WITH {ctes}
    SELECT vec_id, cell, dist_sq FROM {_assign_sql('newv', prev, dist)}
    ORDER BY vec_id
    """


def _ivf_drift_sql(threshold: float = 1.5) -> str:
    ctes, prev, dist = _ivf_incremental_ctes()
    r4 = round4_sql
    ratio = (
        "CASE WHEN avg_train_dist > 0 THEN "
        + r4("avg_new_dist / avg_train_dist")
        + " END"
    )
    return f"""
    WITH {ctes},
    trainasg AS {_assign_sql('corpus', prev, dist)},
    newasg AS {_assign_sql('newv', prev, dist)},
    t AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_train,
             {r4('AVG(dist_sq)')} AS avg_train_dist
      FROM trainasg GROUP BY cell
    ),
    n AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_new,
             {r4('AVG(dist_sq)')} AS avg_new_dist
      FROM newasg GROUP BY cell
    )
    SELECT cell,
           CAST(COALESCE(n_train, 0) AS BIGINT) AS n_train,
           CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
           avg_train_dist, avg_new_dist,
           {ratio} AS drift_ratio,
           CAST(COALESCE(({ratio}) > {threshold}, FALSE) AS INT)
             AS retrain_flag
    FROM t FULL JOIN n USING (cell)
    ORDER BY cell
    """


@query(
    "ivf_incremental_assign",
    oracle=_ivf_incremental_assign_sql(),
    description="C10/IVF incremental maintenance (VERDICT r5 #4): the "
    "index is trained once on the 90% split (vec_id%10!=0, the same "
    "k=8/2-round k-means as ivf_kmeans_cells) and a new crawl batch "
    "(the held-out 10%) joins by ASSIGNMENT ONLY — one broadcast of the "
    "8 frozen centroid vectors, O(increment·k·dim) compute, no retrain. "
    "Assignment reuses kmeans_cells' partial-aggregable argmin "
    "(min(struct(round4(dist), cell))), so the incremental result is "
    "bit-identical to a full assign pass, and streamed increments equal "
    "batched ones (stateless per vector; pinned by test).",
)
def ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 10 != 0)
    new = emb.where(F.col("vec_id") % 10 == 0)
    _asg, cents = S.kmeans_cells(train, k=8, iters=2, with_centroids=True)
    return S.ivf_assign(new, cents).orderBy("vec_id")


@query(
    "ivf_drift_metric",
    oracle=_ivf_drift_sql(),
    description="C10/IVF incremental maintenance, the retrain signal: "
    "per cell, the new batch's assignment quality vs the training "
    "assignment — counts, round4 mean distances, drift_ratio "
    "(avg_new/avg_train, NULL for zero-distance or new-vector-free "
    "cells) and retrain_flag (ratio > 1.5: new vectors land "
    "systematically farther from their nearest centroid than training "
    "data did, i.e. the frozen centroids no longer tile the incoming "
    "distribution). Two k-row aggregates joined — nothing rescanned.",
)
def ivf_drift_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 10 != 0)
    new = emb.where(F.col("vec_id") % 10 == 0)
    asg, cents = S.kmeans_cells(train, k=8, iters=2, with_centroids=True)
    newasg = S.ivf_assign(new, cents)
    return S.ivf_drift(
        asg.select("vec_id", "cell", "dist_sq"), newasg
    ).orderBy("cell")


@query(
    "ann_recall_eval",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM corpus
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
      FROM bucketed WHERE vec_id = {QUERY_VEC_ID}
    ),
    truth AS (
      SELECT vec_id FROM corpus CROSS JOIN q
      WHERE vec_id != q_id
      ORDER BY (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) DESC,
               vec_id
      LIMIT 10
    ),
    lsh AS (
      SELECT vec_id FROM bucketed JOIN q ON bucket = q_bucket
      WHERE vec_id != q_id
      ORDER BY (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) DESC,
               vec_id
      LIMIT 10
    ),
    multi AS (
      SELECT vec_id FROM bucketed
      JOIN (SELECT q_id, qv,
                   unnest([{_PROBE_LIST}]) AS bucket FROM q) p USING (bucket)
      WHERE vec_id != q_id
      ORDER BY (FLOOR(({_COS}) * 10000.0 + 0.5 + 0.000001) / 10000.0) DESC,
               vec_id
      LIMIT 10
    )
    SELECT
      CAST((SELECT COUNT(*) FROM lsh JOIN truth USING (vec_id)) AS BIGINT)
        AS lsh_hits,
      CAST((SELECT COUNT(*) FROM multi JOIN truth USING (vec_id)) AS BIGINT)
        AS multiprobe_hits,
      (FLOOR(((SELECT COUNT(*) FROM lsh JOIN truth USING (vec_id)) / 10.0)
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS lsh_recall,
      (FLOOR(((SELECT COUNT(*) FROM multi JOIN truth USING (vec_id)) / 10.0)
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS multiprobe_recall
    """,
    description="C10 evaluation: the ANN dashboard — recall@10 of "
    "single-probe and multi-probe LSH against the exact brute-force "
    "top-10 for the standard query vector. The number that decides "
    "plane count / probe width before an index build; multi-probe "
    "recall must dominate single-probe by construction (superset of "
    "probed buckets).",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    truth = S.brute_force_topk(emb, q, k=10).select("vec_id")
    lsh = S.bucketed_topk(emb, q, k=10).select("vec_id")
    multi = S.multiprobe_topk(emb, q, k=10).select("vec_id")
    lsh_hits = lsh.join(truth, "vec_id").agg(
        F.count(F.lit(1)).alias("lsh_hits")
    )
    multi_hits = multi.join(truth, "vec_id").agg(
        F.count(F.lit(1)).alias("multiprobe_hits")
    )
    return (
        lsh_hits.crossJoin(F.broadcast(multi_hits))
        .select(
            "lsh_hits",
            "multiprobe_hits",
            round4(F.col("lsh_hits") / 10.0).alias("lsh_recall"),
            round4(F.col("multiprobe_hits") / 10.0).alias("multiprobe_recall"),
        )
    )


# --- IVF drift → retrain → recovery (VERDICT r8 #4) ------------------------
DRIFT_OFFSET = 100_000
DRIFT_SHIFT = 2.0
DRIFT_NPROBE = 2
DRIFT_K = 10
DRIFT_QUERY_STRIDE = 100  # original ids divisible by this become queries

_DRIFT_TRAIN_SQL = (
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
    " AS v\n      FROM embeddings WHERE vec_id % 10 != 0"
)
_DRIFT_FULL_SQL = f"""{_DRIFT_TRAIN_SQL}
      UNION ALL
      SELECT vec_id + {DRIFT_OFFSET} AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + {DRIFT_SHIFT})
               AS v
      FROM embeddings WHERE vec_id % 10 = 0"""


def _cos_sql(a: str, b: str) -> str:
    return f"""(
      list_reduce(list_transform(range(1, len({a}) + 1),
                                 i -> {a}[i] * {b}[i]),
                  (acc, x) -> acc + x)
      / (sqrt(list_reduce(list_transform({a}, x -> x * x),
                          (acc, x) -> acc + x)) *
         sqrt(list_reduce(list_transform({b}, x -> x * x),
                          (acc, x) -> acc + x)))
    )"""


def _drift_recovery_sql() -> str:
    parts_f, prev_f, dist = _kmeans_parts(corpus_sql=_DRIFT_TRAIN_SQL, sfx="f")
    parts_r, prev_r, _ = _kmeans_parts(corpus_sql=_DRIFT_FULL_SQL, sfx="r")
    r4 = round4_sql
    cos_vq = r4(_cos_sql("c.v", "q.qv"))
    cos_cq = r4(_cos_sql("k.cv", "q.qv"))
    ratio = r4("avg_new_dist / avg_train_dist")

    def arm(tag: str, prev: str) -> str:
        return f"""asg{tag} AS {_assign_sql('corpusr', prev, dist)},
    list{tag} AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (
                 PARTITION BY cell ORDER BY dist_sq, vec_id
               ) AS lr
        FROM asg{tag}
      ) CROSS JOIN budget WHERE lr <= b
    ),
    probe{tag} AS (
      SELECT cell, q_id FROM (
        SELECT k.cell, q.q_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.q_id ORDER BY {cos_cq} DESC, k.cell
               ) AS pr
        FROM {prev} k CROSS JOIN q
      ) WHERE pr <= {DRIFT_NPROBE}
    ),
    cand{tag} AS (
      SELECT q_id, vec_id FROM (
        SELECT p.q_id, l.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.q_id ORDER BY {cos_vq} DESC, l.vec_id
               ) AS rn
        FROM list{tag} l
        JOIN probe{tag} p USING (cell)
        JOIN corpusr c ON c.vec_id = l.vec_id
        JOIN q ON q.q_id = p.q_id
        WHERE l.vec_id != p.q_id
      ) WHERE rn <= {DRIFT_K}
    ),
    hits{tag} AS (
      SELECT COUNT(*) AS h FROM cand{tag} JOIN truth USING (q_id, vec_id)
    )"""

    ctes_f = ",\n    ".join(parts_f)
    ctes_r = ",\n    ".join(parts_r)
    return f"""
    WITH {ctes_f},
    {ctes_r},
    newv AS (
      SELECT vec_id + {DRIFT_OFFSET} AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) + {DRIFT_SHIFT})
               AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    budget AS (
      SELECT CAST(CEIL(COUNT(*) / 8.0) AS BIGINT) AS b FROM corpusr
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv FROM corpusr
      WHERE vec_id >= {DRIFT_OFFSET}
        AND (vec_id - {DRIFT_OFFSET}) % {DRIFT_QUERY_STRIDE} = 0
    ),
    truth AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.q_id ORDER BY {cos_vq} DESC, c.vec_id
               ) AS rn
        FROM corpusr c CROSS JOIN q WHERE c.vec_id != q.q_id
      ) WHERE rn <= {DRIFT_K}
    ),
    {arm('f', prev_f)},
    {arm('r', prev_r)},
    trainasg AS {_assign_sql('corpusf', prev_f, dist)},
    newasg AS {_assign_sql('newv', prev_f, dist)},
    drift AS (
      SELECT COALESCE(
               ({ratio}) > 1.5, FALSE
             ) AS flag
      FROM (SELECT cell, {r4('AVG(dist_sq)')} AS avg_train_dist
            FROM trainasg GROUP BY cell) t
      FULL JOIN (SELECT cell, {r4('AVG(dist_sq)')} AS avg_new_dist
                 FROM newasg GROUP BY cell) n USING (cell)
    )
    SELECT
      CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_queries,
      CAST((SELECT COUNT(*) FROM drift WHERE flag) AS BIGINT)
        AS n_flagged_cells,
      CAST((SELECT b FROM budget) AS BIGINT) AS scan_budget,
      CAST((SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM asgf GROUP BY cell))
           AS BIGINT) AS frozen_max_cell,
      CAST((SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM asgr GROUP BY cell))
           AS BIGINT) AS retrained_max_cell,
      {r4(f"(SELECT h FROM hitsf) / ({DRIFT_K}.0 * (SELECT COUNT(*) FROM q))")}
        AS recall_frozen,
      {r4(f"(SELECT h FROM hitsr) / ({DRIFT_K}.0 * (SELECT COUNT(*) FROM q))")}
        AS recall_retrained
    """


@query(
    "ivf_drift_retrain_recovery",
    oracle=_drift_recovery_sql(),
    description="C10/IVF: the drift loop CLOSED (VERDICT r8 #4) — a "
    f"shifted increment (held-out 10%, +{DRIFT_SHIFT} per component, new "
    "ids) is injected; under FROZEN centroids the drifted mass piles "
    "into one cell AND sorts to the tail of its inverted list, so the "
    "budgeted IVF search (nprobe=2, per-cell budget = ceil(N/k) — the "
    "per-query work cap every production deployment runs with) loses "
    "recall@10 for drifted queries; ivf_drift flags the cells; "
    "retraining on corpus+increment rebalances the lists and recall "
    "recovers. One row: the retrain signal (n_flagged_cells), the bloat "
    "evidence (frozen vs retrained max cell), and the recall arms "
    "(recall_frozen vs recall_retrained). Same three-arm shape as "
    "ann_recall_eval; tests/test_ml_lsh.py pins degrade+recover.",
)
def ivf_drift_retrain_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 10 != 0).select(
        "vec_id", S.as_double(F.col("embedding")).alias("embedding")
    )
    shifted = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + DRIFT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(DRIFT_SHIFT)
        ).alias("embedding"),
    )
    full = train.unionByName(shifted)
    queries = shifted.where(
        (F.col("vec_id") - DRIFT_OFFSET) % DRIFT_QUERY_STRIDE == 0
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))

    budget = full.agg(
        F.ceil(F.count(F.lit(1)) / 8.0).cast("int").alias("b")
    )

    w_truth = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    truth = (
        full.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            round4(S.cosine(F.col("embedding"), F.col("qv"))).alias("cosine"),
        )
        .select("q_id", "vec_id", F.row_number().over(w_truth).alias("rn"))
        .where(F.col("rn") <= DRIFT_K)
        .select("q_id", "vec_id")
    )

    train_asg, cents_f = S.kmeans_cells(
        train, k=8, iters=2, with_centroids=True
    )
    asg_f = S.ivf_assign(full, cents_f)
    _, cents_r = S.kmeans_cells(full, k=8, iters=2, with_centroids=True)
    asg_r = S.ivf_assign(full, cents_r)

    # sanctioned 1-row scalar (like connected_components' convergence
    # check): the budget parameterizes a rank predicate, fetched once
    b_val = int(budget.first()["b"])

    def arm(asg: DataFrame, cents: DataFrame, name: str) -> DataFrame:
        topk = S.ivf_budgeted_topk(
            full, asg, cents, queries,
            nprobe=DRIFT_NPROBE, budget=b_val, k=DRIFT_K,
        )
        return topk.join(truth, ["q_id", "vec_id"]).agg(
            F.count(F.lit(1)).alias(name)
        )

    hits_f = arm(asg_f, cents_f, "hf")
    hits_r = arm(asg_r, cents_r, "hr")
    n_q = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    flagged = (
        S.ivf_drift(
            train_asg.select("vec_id", "cell", "dist_sq"),
            S.ivf_assign(shifted, cents_f),
        )
        .agg(F.sum("retrain_flag").cast("long").alias("n_flagged_cells"))
    )
    max_f = asg_f.groupBy("cell").count().agg(
        F.max("count").cast("long").alias("frozen_max_cell")
    )
    max_r = asg_r.groupBy("cell").count().agg(
        F.max("count").cast("long").alias("retrained_max_cell")
    )
    return (
        n_q.crossJoin(F.broadcast(flagged))
        .crossJoin(F.broadcast(budget.select(F.col("b").cast("long").alias("scan_budget"))))
        .crossJoin(F.broadcast(max_f))
        .crossJoin(F.broadcast(max_r))
        .crossJoin(F.broadcast(hits_f))
        .crossJoin(F.broadcast(hits_r))
        .select(
            "n_queries",
            "n_flagged_cells",
            "scan_budget",
            "frozen_max_cell",
            "retrained_max_cell",
            round4(F.col("hf") / (DRIFT_K * 1.0 * F.col("n_queries"))).alias(
                "recall_frozen"
            ),
            round4(F.col("hr") / (DRIFT_K * 1.0 * F.col("n_queries"))).alias(
                "recall_retrained"
            ),
        )
    )


_PQ_NSUB = 4
_PQ_SUBDIM = 16
_PQ_K = 16


def _pq_parts(
    src_table: str = "embeddings",
    src_col: str = "embedding",
    tag: str = "p",
) -> tuple[list[str], str]:
    """Compose one k-means CTE chain per PQ subspace plus member-mean
    codebook and argmin re-encode; returns (parts, 16-dim dist expr).
    Parameterized over the source list column so the IVFADC oracle can
    train the same chains on coarse-quantizer residuals (tag picks the
    CTE namespace)."""
    all_parts: list[str] = []
    dist16 = ""
    for m in range(_PQ_NSUB):
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        corpus_sql = (
            f"SELECT vec_id, list_transform({src_col}[{lo}:{hi}], "
            f"x -> CAST(x AS DOUBLE)) AS v\n      FROM {src_table}"
        )
        parts, prev, dist = _kmeans_parts(
            k=_PQ_K,
            iters=2,
            seeding="hash",
            reseed=False,
            corpus_sql=corpus_sql,
            dim=_PQ_SUBDIM,
            salt=f"pq{m}",
            sfx=f"_{tag}{m}",
        )
        dist16 = dist
        all_parts.extend(parts)
        all_parts.append(f"""assignf_{tag}{m} AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, k.cell, c.v,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM corpus_{tag}{m} c CROSS JOIN {prev} k
      ) WHERE rn = 1
    )""")
        all_parts.append(f"""cb_{tag}{m} AS (
      SELECT cell, i - 1 AS dim,
             (FLOOR(AVG(v[i]) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS c
      FROM assignf_{tag}{m}, (SELECT unnest(range(1, {_PQ_SUBDIM + 1})) AS i)
      GROUP BY cell, i
    )""")
        all_parts.append(
            f"cbv_{tag}{m} AS (SELECT cell, list(c ORDER BY dim) AS cv "
            f"FROM cb_{tag}{m} GROUP BY cell)"
        )
        all_parts.append(f"""enc_{tag}{m} AS (
      SELECT vec_id, cell AS code_{m}, dist_sq AS err_{m} FROM (
        SELECT c.vec_id, k.cell, {dist} AS dist_sq,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM corpus_{tag}{m} c CROSS JOIN cbv_{tag}{m} k
      ) WHERE rn = 1
    )""")
    return all_parts, dist16


def _pq_codes_sql() -> str:
    parts, _ = _pq_parts()
    ctes = ",\n    ".join(parts)
    joins = " ".join(f"JOIN enc_p{m} USING (vec_id)" for m in range(1, _PQ_NSUB))
    errs = " + ".join(f"err_{m}" for m in range(_PQ_NSUB))
    codes = ", ".join(f"code_{m}" for m in range(_PQ_NSUB))
    return f"""
    WITH {ctes}
    SELECT vec_id, {codes},
           (FLOOR(({errs}) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS recon_err
    FROM enc_p0 {joins}
    ORDER BY vec_id
    """


def _pq_adc_sql() -> str:
    parts, _ = _pq_parts()
    for m in range(_PQ_NSUB):
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        parts.append(
            f"qv_p{m} AS (SELECT list_transform(embedding[{lo}:{hi}], "
            f"x -> CAST(x AS DOUBLE)) AS qv FROM embeddings "
            f"WHERE vec_id = {QUERY_VEC_ID})"
        )
        qdist = (
            f"(FLOOR((list_reduce(list_transform(range(1, {_PQ_SUBDIM + 1}), "
            "i -> (q.qv[i] - k.cv[i]) * (q.qv[i] - k.cv[i])), "
            "(a, b) -> a + b)) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
        )
        parts.append(
            f"dtab_p{m} AS (SELECT k.cell AS code_{m}, {qdist} AS qd_{m} "
            f"FROM cbv_p{m} k, qv_p{m} q)"
        )
    enc_joins = " ".join(
        f"JOIN enc_p{m} USING (vec_id)" for m in range(1, _PQ_NSUB)
    )
    dtab_joins = " ".join(
        f"JOIN dtab_p{m} USING (code_{m})" for m in range(_PQ_NSUB)
    )
    qds = " + ".join(f"qd_{m}" for m in range(_PQ_NSUB))
    parts.append(f"""est AS (
      SELECT vec_id,
             (FLOOR(({qds}) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS est_dist
      FROM enc_p0 {enc_joins} {dtab_joins}
      WHERE vec_id != {QUERY_VEC_ID}
    )""")
    parts.append(
        "top AS (SELECT * FROM est ORDER BY est_dist, vec_id LIMIT 10)"
    )
    parts.append(
        "corpus_full AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    )
    parts.append(
        "qfull AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})"
    )
    true_d = (
        "(FLOOR((list_reduce(list_transform(range(1, 65), "
        "i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT t.vec_id, t.est_dist, {true_d} AS true_dist
    FROM top t JOIN corpus_full c ON t.vec_id = c.vec_id, qfull q
    ORDER BY t.est_dist, t.vec_id
    """


@query(
    "pq_encode_codes",
    oracle=_pq_codes_sql(),
    description="C10/PQ: product-quantization train + encode — the 64-dim "
    "corpus splits into 4 contiguous 16-dim subspaces, each trained with "
    "its own deterministic k-means (k=16, 2 Lloyd rounds, salt pq<m>), "
    "member-mean codebook, argmin re-encode. A vector's index entry "
    "becomes 4 codes (4 bits each) — a 256x compression of the float "
    "vector; recon_err is the summed per-subspace quantization error. "
    "Every stage broadcasts <=16 codebook rows against one corpus scan; "
    "oracle replicates all four chains CTE-for-stage.",
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    enc, _ = S.pq_train_encode(
        emb, n_sub=_PQ_NSUB, sub_dim=_PQ_SUBDIM, k=_PQ_K
    )
    # widen (m, vec_id, code, err) → one row per vector; exactly one row
    # per (vec_id, m), so max(when(...)) is a plain pivot
    aggs = [
        F.max(F.when(F.col("m") == m, F.col("code"))).alias(f"code_{m}")
        for m in range(_PQ_NSUB)
    ] + [
        F.max(F.when(F.col("m") == m, F.col("err"))).alias(f"err_{m}")
        for m in range(_PQ_NSUB)
    ]
    wide = enc.groupBy("vec_id").agg(*aggs)
    errs = F.col("err_0")
    for m in range(1, _PQ_NSUB):
        errs = errs + F.col(f"err_{m}")  # fixed order, matches the oracle
    return wide.select(
        "vec_id",
        *[f"code_{m}" for m in range(_PQ_NSUB)],
        round4(errs).alias("recon_err"),
    ).orderBy("vec_id")


@query(
    "pq_adc_topk",
    oracle=_pq_adc_sql(),
    description="C10/PQ: asymmetric-distance (ADC) top-10 for the query "
    "vector — per subspace the un-quantized query's distance to each of "
    "16 codebook entries is a broadcast lookup table, so scoring a corpus "
    "vector is 4 table lookups on its PQ code (no vector math per row at "
    "query time; at 100 TB the scan reads 2-byte codes, not 512-byte "
    "floats). Result rows audited with the true squared L2 to expose the "
    "PQ approximation error.",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.pq_adc_topk(
        emb, q, k_top=10, n_sub=_PQ_NSUB, sub_dim=_PQ_SUBDIM
    )


@query(
    "embedding_random_projection",
    oracle=f"""
    SELECT vec_id, i - 1 AS dim,
           (FLOOR(p[i] * 10000.0 + 0.5 + 0.000001) / 10000.0) AS value
    FROM (
      SELECT vec_id,
             {S.random_project_sql("list_transform(embedding, x -> CAST(x AS DOUBLE))")}
               AS p
      FROM embeddings
    ), (SELECT unnest(range(1, {S.RP_DIM + 1})) AS i)
    ORDER BY vec_id, dim
    """,
    description="C10/JL: Rademacher random projection 64 -> 16 dims "
    "(database-friendly Johnson-Lindenstrauss: +-1 planes, exact /4 "
    "scaling). Scan-only — no shuffle, no training state; the 4x-smaller "
    "vectors feed any downstream ANN rung. Long format (vec_id, dim, "
    "value).",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    p = S.random_project(S.as_double(F.col("embedding")))
    return (
        emb.select("vec_id", F.posexplode(p).alias("dim", "value"))
        .select("vec_id", "dim", round4(F.col("value")).alias("value"))
        .orderBy("vec_id", "dim")
    )


@query(
    "random_projection_distortion",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {S.random_project_sql("list_transform(embedding, x -> CAST(x AS DOUBLE))")}
               AS p
      FROM embeddings WHERE vec_id < 20
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           (FLOOR((list_reduce(list_transform(range(1, 65),
              i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])), (x, y) -> x + y))
              * 10000.0 + 0.5 + 0.000001) / 10000.0) AS orig_dsq,
           (FLOOR((list_reduce(list_transform(range(1, {S.RP_DIM + 1}),
              i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])), (x, y) -> x + y))
              * 10000.0 + 0.5 + 0.000001) / 10000.0) AS proj_dsq,
           CASE WHEN (list_reduce(list_transform(range(1, 65),
              i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])), (x, y) -> x + y)) > 0
           THEN (FLOOR(((list_reduce(list_transform(range(1, {S.RP_DIM + 1}),
              i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])), (x, y) -> x + y))
              / (list_reduce(list_transform(range(1, 65),
              i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])), (x, y) -> x + y)))
              * 10000.0 + 0.5 + 0.000001) / 10000.0)
           ELSE 1.0 END AS ratio
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    ORDER BY id_a, id_b
    """,
    description="C10/JL eval: squared-distance distortion of the random "
    "projection over all pairs of the first 20 vectors — the JL lemma "
    "says ratio concentrates around 1; the eval makes the trade "
    "measurable (dimension 4x down, pairwise geometry approximately "
    "kept). 20-row broadcast self-join; the distortion invariant is "
    "pinned in test_pq.",
)
def random_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    v = S.as_double(F.col("embedding"))
    sub = emb.select("vec_id", v.alias("v"), S.random_project(v).alias("p"))
    a = sub.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("p").alias("pa"),
    )
    b = sub.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("p").alias("pb"),
    )
    orig = S._l2sq(F.col("va"), F.col("vb"))
    proj = S._l2sq(F.col("pa"), F.col("pb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round4(orig).alias("orig_dsq"),
            round4(proj).alias("proj_dsq"),
            # identical vectors (orig = 0): pin ratio to 1.0 — Spark's
            # float x/0.0 is Infinity while DuckDB's is NULL, so an
            # unguarded ratio diverges across engines on planted dups
            F.when(orig > 0, round4(proj / orig))
            .otherwise(F.lit(1.0))
            .alias("ratio"),
        )
        .orderBy("id_a", "id_b")
    )


def _pq_recall_sql() -> str:
    parts, _ = _pq_parts()
    for m in range(_PQ_NSUB):
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        parts.append(
            f"qv_p{m} AS (SELECT list_transform(embedding[{lo}:{hi}], "
            f"x -> CAST(x AS DOUBLE)) AS qv FROM embeddings "
            f"WHERE vec_id = {QUERY_VEC_ID})"
        )
        qdist = (
            f"(FLOOR((list_reduce(list_transform(range(1, {_PQ_SUBDIM + 1}), "
            "i -> (q.qv[i] - k.cv[i]) * (q.qv[i] - k.cv[i])), "
            "(a, b) -> a + b)) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
        )
        parts.append(
            f"dtab_p{m} AS (SELECT k.cell AS code_{m}, {qdist} AS qd_{m} "
            f"FROM cbv_p{m} k, qv_p{m} q)"
        )
    enc_joins = " ".join(
        f"JOIN enc_p{m} USING (vec_id)" for m in range(1, _PQ_NSUB)
    )
    dtab_joins = " ".join(
        f"JOIN dtab_p{m} USING (code_{m})" for m in range(_PQ_NSUB)
    )
    qds = " + ".join(f"qd_{m}" for m in range(_PQ_NSUB))
    parts.append(f"""est AS (
      SELECT vec_id,
             (FLOOR(({qds}) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS est_dist
      FROM enc_p0 {enc_joins} {dtab_joins}
      WHERE vec_id != {QUERY_VEC_ID}
    )""")
    parts.append(
        "adc_top AS (SELECT vec_id FROM est ORDER BY est_dist, vec_id "
        "LIMIT 10)"
    )
    parts.append(
        "corpus_full AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    )
    parts.append(
        "qfull AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})"
    )
    true_d = (
        "(FLOOR((list_reduce(list_transform(range(1, 65), "
        "i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    parts.append(f"""exact_top AS (
      SELECT c.vec_id FROM corpus_full c, qfull q
      WHERE c.vec_id != {QUERY_VEC_ID}
      ORDER BY {true_d}, c.vec_id LIMIT 10
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(10 AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM adc_top JOIN exact_top USING (vec_id))
                AS BIGINT) AS n_hit,
           (FLOOR(((SELECT COUNT(*) FROM adc_top JOIN exact_top
                    USING (vec_id)) / 10.0) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS recall_at_10
    """


@query(
    "pq_recall_eval",
    oracle=_pq_recall_sql(),
    description="C10/PQ eval: recall@10 of ADC search against the exact "
    "squared-L2 top-10 — the number that decides whether 256x index "
    "compression is worth it for a given corpus (the tuning dashboard "
    "row, like ann_recall_eval for LSH). Candidate-bounded: both top-10s "
    "are TakeOrderedAndProject heaps, the overlap is a 10x10 join.",
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    adc = S.pq_adc_topk(
        emb, q, k_top=10, n_sub=_PQ_NSUB, sub_dim=_PQ_SUBDIM
    ).select("vec_id")
    corpus = emb.select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    qv = q.select(S.as_double(F.col("embedding")).alias("qv"))
    true_d = round4(S._l2sq(F.col("v"), F.col("qv")))
    exact = (
        corpus.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", true_d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    hits = adc.join(exact, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return hits.select(
        F.lit(10).cast("long").alias("k"),
        "n_hit",
        round4(F.col("n_hit") / 10.0).alias("recall_at_10"),
    )


def _ivfadc_parts(n_probe: int = 2) -> list[str]:
    """Shared CTE chain for the IVFADC oracles: coarse k-means (identical
    to the ivf_kmeans_cells twin), residuals, per-subspace PQ chains on
    the residuals, query probe, per-probed-cell ADC distance tables, and
    the `est` estimated-distance relation."""
    parts, prev, dist = _kmeans_parts(k=8, iters=2, seeding="hash", reseed=True)
    # MATERIALIZED: the final coarse centroids / assignment / residuals
    # are each referenced by several downstream chains (4 residual-PQ
    # chains x every Lloyd round, probe, est); left inline DuckDB
    # re-evaluates the whole coarse k-means per reference (measured 283s
    # -> ~20s at sf0.01)
    parts.append(
        f"coarse_cvec AS MATERIALIZED (SELECT cell, cv FROM {prev})"
    )
    parts.append(f"""coarse_assign AS MATERIALIZED (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, k.cell, c.v,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM corpus c CROSS JOIN coarse_cvec k
      ) WHERE rn = 1
    )""")
    # residual = v - round4-ed centroid: exact double subtraction, same
    # on both engines, so NO extra rounding here
    parts.append("""resid AS MATERIALIZED (
      SELECT a.vec_id, a.cell,
             list_transform(range(1, 65), i -> a.v[i] - k.cv[i]) AS r
      FROM coarse_assign a JOIN coarse_cvec k USING (cell)
    )""")
    pq_parts, _ = _pq_parts(src_table="resid", src_col="r", tag="r")
    parts.extend(pq_parts)
    parts.append(
        "qfull AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})"
    )
    cdist = (
        "(FLOOR((list_reduce(list_transform(range(1, 65), "
        "i -> (q.qv[i] - k.cv[i]) * (q.qv[i] - k.cv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    parts.append(f"""probe AS (
      SELECT k.cell, k.cv, {cdist} AS cd
      FROM coarse_cvec k, qfull q
      ORDER BY cd, k.cell LIMIT {n_probe}
    )""")
    parts.append("""qres AS (
      SELECT p.cell, list_transform(range(1, 65), i -> q.qv[i] - p.cv[i]) AS qr
      FROM probe p, qfull q
    )""")
    for m in range(_PQ_NSUB):
        lo = m * _PQ_SUBDIM
        qdist = (
            f"(FLOOR((list_reduce(list_transform(range(1, {_PQ_SUBDIM + 1}), "
            f"i -> (p.qr[{lo} + i] - k.cv[i]) * (p.qr[{lo} + i] - k.cv[i])), "
            "(a, b) -> a + b)) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
        )
        parts.append(
            f"dtab_r{m} AS (SELECT p.cell, k.cell AS code_{m}, {qdist} "
            f"AS qd_{m} FROM cbv_r{m} k CROSS JOIN qres p)"
        )
    enc_joins = " ".join(
        f"JOIN enc_r{m} e{m} USING (vec_id)" for m in range(1, _PQ_NSUB)
    )
    dtab_joins = " ".join(
        f"JOIN dtab_r{m} d{m} ON d{m}.cell = a.cell "
        f"AND d{m}.code_{m} = e{m}.code_{m}"
        for m in range(_PQ_NSUB)
    )
    qds = " + ".join(f"d{m}.qd_{m}" for m in range(_PQ_NSUB))
    parts.append(f"""est AS (
      SELECT e0.vec_id,
             (FLOOR(({qds}) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS est_dist
      FROM enc_r0 e0 {enc_joins}
      JOIN coarse_assign a USING (vec_id) {dtab_joins}
      WHERE e0.vec_id != {QUERY_VEC_ID}
    )""")
    return parts


def _ivfadc_sql() -> str:
    parts = _ivfadc_parts()
    parts.append(
        "top AS (SELECT * FROM est ORDER BY est_dist, vec_id LIMIT 10)"
    )
    parts.append(
        "corpus_full AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    )
    true_d = (
        "(FLOOR((list_reduce(list_transform(range(1, 65), "
        "i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT t.vec_id, t.est_dist, {true_d} AS true_dist
    FROM top t JOIN corpus_full c ON t.vec_id = c.vec_id, qfull q
    ORDER BY t.est_dist, t.vec_id
    """


def _ivfadc_recall_sql() -> str:
    parts = _ivfadc_parts()
    parts.append(
        "adc_top AS (SELECT vec_id FROM est ORDER BY est_dist, vec_id "
        "LIMIT 10)"
    )
    parts.append(
        "corpus_full AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    )
    true_d = (
        "(FLOOR((list_reduce(list_transform(range(1, 65), "
        "i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])), (a, b) -> a + b)) "
        "* 10000.0 + 0.5 + 0.000001) / 10000.0)"
    )
    parts.append(f"""exact_top AS (
      SELECT c.vec_id FROM corpus_full c, qfull q
      WHERE c.vec_id != {QUERY_VEC_ID}
      ORDER BY {true_d}, c.vec_id LIMIT 10
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(10 AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM adc_top JOIN exact_top USING (vec_id))
                AS BIGINT) AS n_hit,
           (FLOOR(((SELECT COUNT(*) FROM adc_top JOIN exact_top
                    USING (vec_id)) / 10.0) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS recall_at_10
    """


@query(
    "ivfadc_topk",
    oracle=_ivfadc_sql(),
    description="C10/IVFADC (Jégou et al. 2011): the composed "
    "billion-vector architecture — coarse k-means (k=8) cell prune, PQ "
    "codebooks trained on the RESIDUALS v-centroid, query probes the 2 "
    "nearest cells and scores only their members via per-cell ADC lookup "
    "tables (2-byte codes, no float vectors at query time). Top-10 rows "
    "audited with the true squared L2. Oracle replays coarse chain, "
    "residuals, 4 residual-PQ chains, probe and distance tables "
    "CTE-for-stage.",
)
def ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.ivfadc_topk(
        emb, q, k_top=10, n_coarse=8, n_probe=2,
        n_sub=_PQ_NSUB, sub_dim=_PQ_SUBDIM,
    )


@query(
    "ivfadc_recall_eval",
    oracle=_ivfadc_recall_sql(),
    description="C10/IVFADC eval: recall@10 of the composed "
    "cell-prune+residual-ADC search against the exact squared-L2 top-10 "
    "— quantifies what the 2/8-cell probe plus 256x code compression "
    "costs in answer quality (the n_probe tuning number).",
)
def ivfadc_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    adc = S.ivfadc_topk(
        emb, q, k_top=10, n_coarse=8, n_probe=2,
        n_sub=_PQ_NSUB, sub_dim=_PQ_SUBDIM,
    ).select("vec_id")
    corpus = emb.select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    qv = q.select(S.as_double(F.col("embedding")).alias("qv"))
    true_d = round4(S._l2sq(F.col("v"), F.col("qv")))
    exact = (
        corpus.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", true_d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    hits = adc.join(exact, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return hits.select(
        F.lit(10).cast("long").alias("k"),
        "n_hit",
        round4(F.col("n_hit") / 10.0).alias("recall_at_10"),
    )


def _cos_sql(a: str, b: str) -> str:
    """DuckDB twin of operators.similarity.cosine: sequential-fold dot /
    (norm * norm), every sum left-folded in index order."""
    return f"""
    (list_reduce(
       list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),
       (acc, x) -> acc + x
     ) / (
       sqrt(list_reduce(list_transform({a}, x -> x * x), (acc, x) -> acc + x))
       * sqrt(list_reduce(list_transform({b}, x -> x * x), (acc, x) -> acc + x))
     ))"""


@query(
    "ann_sq8_rescore_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    sc AS (
      SELECT vec_id, v,
             list_reduce(list_transform(v, x -> abs(x)),
                         (a, b) -> greatest(a, b)) AS scale
      FROM corpus
    ),
    quant AS (
      SELECT vec_id, v,
             list_transform(v, x -> CASE WHEN scale > 0
                  THEN FLOOR(x * 127.0 / scale + 0.5)
                  ELSE CAST(0 AS DOUBLE) END) AS qv
      FROM sc
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qfv, qv AS qqv
      FROM quant WHERE vec_id = {QUERY_VEC_ID}
    ),
    approx AS (
      SELECT vec_id, v, {{acos}} AS a
      FROM quant CROSS JOIN q WHERE vec_id != q_id
    ),
    shortlist AS (
      SELECT vec_id, v, a FROM approx ORDER BY a DESC, vec_id LIMIT 40
    )
    SELECT s.vec_id,
           (FLOOR(s.a * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS approx_cosine,
           (FLOOR(({{ecos}}) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS cosine
    FROM shortlist s CROSS JOIN q
    ORDER BY cosine DESC, s.vec_id
    LIMIT 10
    """.format(
        acos=_cos_sql("qv", "qqv"),
        ecos=_cos_sql("s.v", "qfv"),
    ),
    description="C10: scalar-quantized (SQ8) scan + exact rescore — the "
    "int8 ladder rung between brute force and PQ. Phase 1 ranks the "
    "whole corpus on max-abs int8 codes (scales cancel in cosine, so no "
    "dequantization; 4x fewer bytes scanned at scale), phase 2 joins "
    "the 40-candidate shortlist (broadcast ids, never the corpus) back "
    "to the float table and re-ranks exactly. Both phases are "
    "TakeOrderedAndProject heaps. The FAISS-SQ8/ScaNN rescore "
    "architecture; oracle replays both phases closed-form.",
)
def ann_sq8_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.sq_rescore_topk(emb, q, k=10, shortlist=40)


_BATCH_PROBES = ", ".join(
    ["q_bucket"] + [f"xor(q_bucket, {1 << p})" for p in range(S.N_PLANES)]
)


@query(
    "ann_batch_topk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql("v")} AS bucket FROM corpus
    ),
    q AS (
      SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
      FROM bucketed WHERE vec_id < 8
    ),
    probes AS (
      SELECT q_id, qv, unnest([{_BATCH_PROBES}]) AS bucket FROM q
    ),
    cand AS (
      SELECT p.q_id, b.vec_id, {_cos_sql("b.v", "p.qv")} AS c
      FROM bucketed b JOIN probes p USING (bucket)
      WHERE b.vec_id != p.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, c,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id)
               AS rn
      FROM cand
    )
    SELECT q_id, vec_id,
           (FLOOR(c * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine,
           CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5
    ORDER BY q_id, rank
    """,
    description="C10: BATCHED multi-probe ANN — eight query vectors as "
    "DATA (vec_id < 8), each exploded into its 9 probe buckets, matched "
    "to candidates in ONE bucket equi-join, ranked per query by a "
    "row_number window. The production retrieval shape (query stream vs "
    "one index; kNN-graph construction is this with Q = corpus): no "
    "per-query loop, no collect, the query batch broadcasts while small "
    "and degrades to a plain shuffle join at millions of queries with "
    "the same plan. Ranking on raw cosine doubles; round4 display only.",
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    # bounded final: 8 fixed probes x k=5 rows at any corpus size
    return ZL.bounded_sort(
        S.batch_multiprobe_topk(emb, qs, k=5), "q_id", "rank"
    )


def _centroid_sql(src: str) -> str:
    """Per-label elementwise mean over 64 dims (1-indexed lists)."""
    return f"""
    SELECT label,
           COUNT(*) AS n,
           list_transform(range(1, 65),
             i -> list_sum(list_transform(list({src}.v), vv -> vv[i]))
                  / COUNT(*)) AS c
    FROM {src} GROUP BY label
    """


@query(
    "embedding_drift_by_label",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    old AS (SELECT * FROM corpus WHERE vec_id % 2 = 0),
    new AS (SELECT * FROM corpus WHERE vec_id % 2 = 1),
    co AS ({_centroid_sql("old")}),
    cn AS ({_centroid_sql("new")})
    SELECT co.label,
           CAST(co.n AS BIGINT) AS n_old,
           CAST(cn.n AS BIGINT) AS n_new,
           (FLOOR(sqrt(list_reduce(
               list_transform(range(1, 65),
                 i -> (co.c[i] - cn.c[i]) * (co.c[i] - cn.c[i])),
               (acc, x) -> acc + x)) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS centroid_shift
    FROM co JOIN cn USING (label)
    ORDER BY co.label
    """,
    description="ML-ops drift monitor: per-label centroid shift between "
    "two corpus snapshots (vec_id parity stands in for generation — "
    "swap in a generation column in production). Centroids are "
    "elementwise-mean aggregates (posexplode + partial agg, one shuffle "
    "per half); the shift is an L2 fold over the 64-dim difference. "
    "When a label's embedding distribution moves between crawls, ANN "
    "indexes (IVF cells, PQ codebooks) trained on the old snapshot go "
    "stale — this is the number that says retrain. Sequential-fold "
    "parity with the oracle; aggregation-order noise absorbed by "
    "round4's epsilon.",
)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", S.as_double(F.col("embedding")).alias("v")
    )

    def centroid(df, tag):
        return (
            df.select("label", F.posexplode("v").alias("dim", "x"))
            .groupBy("label", "dim")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
            .select(
                "label",
                "dim",
                (F.col("sx") / F.col("cnt")).alias(f"m_{tag}"),
                F.col("cnt").alias(f"n_{tag}"),
            )
        )

    old = centroid(emb.where(F.col("vec_id") % 2 == 0), "old")
    new = centroid(emb.where(F.col("vec_id") % 2 == 1), "new")
    diff = F.col("m_old") - F.col("m_new")
    joined = old.join(new, ["label", "dim"]).select(
        "label", "dim", (diff * diff).alias("d2"), "n_old", "n_new"
    )
    return (
        joined.groupBy("label")
        .agg(
            F.first("n_old").cast("long").alias("n_old"),
            F.first("n_new").cast("long").alias("n_new"),
            round4(F.sqrt(F.sum("d2"))).alias("centroid_shift"),
        )
        .orderBy("label")
    )


def _cos2_sql(a: str, b: str) -> str:
    """Cosine between two named list columns — the two-argument form of
    _COS, same fold order as operators.similarity.cosine."""
    return f"""
    list_reduce(
      list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),
      (acc, x) -> acc + x
    ) / (
      sqrt(list_reduce(list_transform({a}, x -> x * x), (acc, x) -> acc + x)) *
      sqrt(list_reduce(list_transform({b}, x -> x * x), (acc, x) -> acc + x))
    )"""


def _mmr_oracle(pool: int = 20, k: int = 8) -> str:
    """Chained-CTE replay of the greedy MMR rounds (the kmeans/BPE/
    PageRank oracle technique): pick_r = snapped-score argmax of cand_r,
    cand_{r+1} = cand_r minus the pick with max_sim raised by the
    snapped cosine to the pick."""
    r4 = lambda e: f"(FLOOR(({e}) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
    parts = [
        f"""
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM corpus WHERE vec_id = {QUERY_VEC_ID}),
    cand_0 AS (
      SELECT vec_id, v, {r4(_COS)} AS rel, 0.0 AS max_sim
      FROM corpus CROSS JOIN q
      WHERE vec_id != {QUERY_VEC_ID}
      ORDER BY rel DESC, vec_id LIMIT {pool}
    )"""
    ]
    for r in range(k):
        score = r4("0.7 * rel - 0.3 * max_sim")
        parts.append(f"""
    pick_{r} AS (
      SELECT {r} AS sel_rank, vec_id, v, rel, {score} AS mmr_score
      FROM cand_{r} ORDER BY {score} DESC, vec_id LIMIT 1
    )""")
        if r < k - 1:
            cos_cp = r4(_cos2_sql("c.v", "p.v"))
            parts.append(f"""
    cand_{r + 1} AS (
      SELECT c.vec_id, c.v, c.rel,
             GREATEST(c.max_sim, {cos_cp}) AS max_sim
      FROM cand_{r} c, pick_{r} p
      WHERE c.vec_id != p.vec_id
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT sel_rank, vec_id, rel, mmr_score FROM pick_{r}"
        for r in range(k)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id, rel, mmr_score
    FROM ({union})
    ORDER BY sel_rank
    """
    )


@query(
    "mmr_diverse_topk",
    oracle=_mmr_oracle(),
    description="C10: Maximal Marginal Relevance diverse top-8 for the "
    "query vector — greedy argmax of 0.7*relevance - 0.3*max-similarity-"
    "to-selected over an exact top-20 candidate pool. The diversity-"
    "aware retrieval plain top-k can't express; candidate generation is "
    "the distributed scan (any ANN rung slots in), the k greedy rounds "
    "run TakeOrdered-1 + broadcast-1-row rescores over the pool-sized "
    "frame with round4-snapped scores so the argmax is engine-portable. "
    "Oracle replays every round as chained CTEs.",
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    return S.mmr_select(emb, q, pool=20, k=8).select(
        F.col("sel_rank").cast("long").alias("sel_rank"),
        "vec_id",
        "rel",
        "mmr_score",
    )


def _kmeans_inertia_sql(k: int = 8, iters: int = 2) -> str:
    """Per-round inertia selects over the _kmeans_parts CTE chain:
    round t averages assign{t}'s snapped dist_sq; the final row is the
    assignment under the trained centroids (the same subquery the
    ivf_kmeans_cells oracle selects from)."""
    parts, prev, dist = _kmeans_parts(k=k, iters=iters)
    parts.append(f"""finalassign AS (
      SELECT vec_id, dist_sq FROM (
        SELECT c.vec_id, {dist} AS dist_sq,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id ORDER BY {dist}, k.cell
               ) AS rn
        FROM corpus c CROSS JOIN {prev} k
      ) WHERE rn = 1
    )""")
    ctes = ",\n    ".join(parts)
    r4 = "(FLOOR(AVG(dist_sq) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
    rounds = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({t + 1} AS BIGINT) AS round, {r4} AS inertia "
        f"FROM assign{t + 1}"
        for t in range(iters)
    )
    return f"""
    WITH {ctes}
    SELECT * FROM (
    {rounds}
    UNION ALL
    SELECT CAST({iters + 1} AS BIGINT) AS round, {r4} AS inertia
    FROM finalassign
    ) ORDER BY round
    """


@query(
    "ivf_train_inertia_curve",
    oracle=_kmeans_inertia_sql(),
    description="C10/IVF convergence dashboard: per-round k-means "
    "training inertia (mean snapped squared L2 to the assigned "
    "centroid) — round 1 under the hash seeds through the assignment "
    "under the trained centroids. The IVF twin of "
    "quality_classifier_loss_curve: the fixed Lloyd round count keeps "
    "the oracle replayable, and the curve makes a corpus change that "
    "stops converging within those rounds VISIBLE (retrain signal next "
    "to ivf_drift) instead of silently degrading recall. Each point is "
    "one 1-row aggregate over the round's already-materialized "
    "assignment.",
)
def ivf_train_inertia_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    _asg, curve = S.kmeans_cells(emb, k=8, iters=2, with_trace=True)
    return curve.orderBy("round")
