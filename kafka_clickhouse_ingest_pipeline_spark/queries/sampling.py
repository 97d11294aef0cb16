"""Deterministic-sampling queries over `documents` with DuckDB oracles.

Hash-based sampling is exactly reproducible across engines (md5 bucket
membership), so unlike `df.sample` these are value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql
from ..operators import sampling as SMP
from ..registry import query
from ..tables import load_table

RATE_BP = 1_000  # 10%
SALT = "s0"
PER_STRATUM = 25


@query(
    "sample_docs_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source,
           {SMP.sample_bucket_sql("doc_id", SALT)} AS bucket
    FROM documents
    WHERE {SMP.sample_bucket_sql("doc_id", SALT)} < {RATE_BP}
    """,
    description="Deterministic ~10% Bernoulli sample of documents by "
    "salted key hash — a pure filter (no shuffle, pushes to the scan); "
    "stable under reruns, repartitioning, and appends, unlike "
    "seed-based df.sample.",
)
def sample_docs_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return SMP.bernoulli_sample(docs, "doc_id", RATE_BP, SALT).select(
        "doc_id",
        "lang",
        "source",
        SMP.sample_bucket(F.col("doc_id"), SALT).alias("bucket"),
    )


@query(
    "sample_docs_stratified",
    oracle=f"""
    SELECT doc_id, lang, sample_rank
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {hash60_sql(f"'{SALT}' || CAST(doc_id AS VARCHAR)")},
                        doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= {PER_STRATUM}
    """,
    description=f"Deterministic stratified sample: exactly {PER_STRATUM} "
    "documents per language, drawn by hash order — one shuffle on the "
    "stratum key, per-stratum top-n (no global sort).",
)
def sample_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return SMP.stratified_fixed_n(
        docs, "lang", PER_STRATUM, "doc_id", SALT
    ).select("doc_id", "lang", "sample_rank")


SPLITS = {"train": 8000, "valid": 9000, "test": 10000}


@query(
    "split_train_valid_test",
    oracle=f"""
    SELECT {SMP.hash_split_sql("doc_id", SPLITS)} AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, source
    """,
    description="Deterministic 80/10/10 train/valid/test split of the "
    "document corpus by salted key hash (operators/sampling.hash_split): "
    "membership is a pure per-row function — no shuffle, no seed, rows "
    "never migrate between splits as the corpus grows. Aggregated per "
    "(split, source) to verify both the assignment and the proportions.",
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        SMP.hash_split(docs, "doc_id", SPLITS)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "source")
    )
