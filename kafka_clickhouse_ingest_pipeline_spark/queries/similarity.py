"""Tier-C similarity-search queries over `embeddings` with DuckDB oracles.

The query vector is always the corpus row with vec_id = 0 — fetched by
subquery on both engines, so no vector literals are needed except the LSH
projection planes (±1 Rademacher entries, integer-exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
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


def _bucket_sql(vec_expr: str) -> str:
    """Flat signed-sum form, same left-assoc order as the Spark side.

    (A list-literal + list_reduce formulation re-materializes the plane
    literal per lambda step in DuckDB — ~100ms/row; the flat sum is
    instant.)
    """
    terms = []
    for p, plane in enumerate(S.PLANES):
        signed = "0.0 " + " ".join(
            f"{'+' if sign > 0 else '-'} {vec_expr}[{i + 1}]"
            for i, sign in enumerate(plane)
        )
        terms.append(f"CASE WHEN ({signed}) > 0 THEN {2**p} ELSE 0 END")
    return " + ".join(terms)


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
