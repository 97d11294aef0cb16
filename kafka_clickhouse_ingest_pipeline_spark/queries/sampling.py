"""Deterministic-sampling queries over `documents` with DuckDB oracles.

Hash-based sampling is exactly reproducible across engines (md5 bucket
membership), so unlike `df.sample` these are value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60_sql
from ..functions.rounding import round4, round4_sql
from ..operators import sampling as SMP
from ..plans import layout as ZL
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
        # bounded final: split × source — both fixed domains
        .transform(lambda d: ZL.bounded_sort(d, "split", "source"))
    )


# Target mixture weights by language (shares of the sampled char budget)
# and the global budget as a fraction of total corpus chars.
MIX_WEIGHTS = {"en": 0.40, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}
MIX_BUDGET = 0.5
MIX_SALT = "mix0"

_MIX_W_SQL = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items()
) + " ELSE 0.0 END"


@query(
    "mix_corpus_by_lang",
    oracle=f"""
    WITH lt AS (
      SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS lang_chars
      FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, lang_chars,
             CAST(LEAST(10000.0, FLOOR(
               ({_MIX_W_SQL}) * {MIX_BUDGET}
               * (SELECT SUM(lang_chars) FROM lt) / lang_chars * 10000.0
             )) AS BIGINT) AS rate_bp
      FROM lt
    )
    SELECT d.lang, r.rate_bp,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {SMP.sample_bucket_sql("d.doc_id", MIX_SALT)} < r.rate_bp
    GROUP BY d.lang, r.rate_bp
    ORDER BY d.lang
    """,
    description="Data-mixture construction: resample the corpus so each "
    "language's share of a 50%-of-corpus char budget matches target "
    "weights. Two-pass: (1) per-language char totals (tiny partial+final "
    "agg), keep-rate = min(1, weight*budget/lang_chars) quantized to "
    "hash buckets; (2) broadcast the 5-row rate table back and keep rows "
    "by deterministic salted key hash — a pure filter, reproducible "
    "across engines, reruns, and appends. The shape every LLM pretrain "
    "mix job needs; rate math is identical IEEE double arithmetic on "
    "both sides so the quantized rates agree exactly.",
)
def mix_corpus_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lt = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("double").alias("lang_chars")
    )
    total = lt.agg(F.sum("lang_chars").alias("total_chars"))
    w = None
    for k, v in MIX_WEIGHTS.items():
        cond = F.col("lang") == k
        w = F.when(cond, v) if w is None else w.when(cond, v)
    w = w.otherwise(0.0)
    rates = (
        lt.crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.least(
                F.lit(10000.0),
                F.floor(
                    w * F.lit(MIX_BUDGET) * F.col("total_chars")
                    / F.col("lang_chars") * F.lit(10000.0)
                ).cast("double"),
            ).cast("long").alias("rate_bp"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(SMP.sample_bucket(F.col("doc_id"), MIX_SALT) < F.col("rate_bp"))
        .groupBy("lang", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        # bounded final: lang is an enum domain
        .transform(lambda d: ZL.bounded_sort(d, "lang"))
    )


@query(
    "sample_docs_weighted",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE {SMP.sample_bucket_sql("doc_id", "w0")}
          < LEAST(10000, CAST(n_chars * 12 AS BIGINT))
    GROUP BY source
    ORDER BY source
    """,
    description="Length-weighted deterministic sampling: keep probability "
    "proportional to n_chars (capped at 1) — importance sampling for "
    "curation, where longer documents carry more training signal. Still "
    "a pure per-row hash filter: no shuffle, no seed, stable under "
    "reruns and appends; the weight only moves the per-row threshold.",
)
def sample_docs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thresh = F.least(
        F.lit(10000), (F.col("n_chars") * 12).cast("long")
    )
    return (
        docs.where(SMP.sample_bucket(F.col("doc_id"), "w0") < thresh)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


MIX_TEMP_ALPHA = 0.7
MIX_TEMP_BUDGET = 0.5
MIX_TEMP_SALT = "mixT"


@query(
    "mix_temperature_by_lang",
    oracle=f"""
    WITH lt AS (
      SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS lang_chars
      FROM documents GROUP BY lang
    ),
    pw AS (
      SELECT lang, lang_chars,
             (FLOOR(pow(lang_chars / (SELECT SUM(lang_chars) FROM lt),
                        {MIX_TEMP_ALPHA}) * 10000.0 + 0.5 + 0.000001)
              / 10000.0) AS pw
      FROM lt
    ),
    run AS (
      SELECT lang, lang_chars, pw,
             SUM(pw) OVER (ORDER BY lang
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS r
      FROM pw
    ),
    rates AS (
      SELECT lang, lang_chars,
             CAST(LEAST(10000.0, FLOOR(
               (pw / (SELECT MAX(r) FROM run)) * {MIX_TEMP_BUDGET}
               * (SELECT SUM(lang_chars) FROM lt) / lang_chars * 10000.0
             )) AS BIGINT) AS rate_bp
      FROM run
    )
    SELECT d.lang, r.rate_bp,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {SMP.sample_bucket_sql("d.doc_id", MIX_TEMP_SALT)} < r.rate_bp
    GROUP BY d.lang, r.rate_bp
    ORDER BY d.lang
    """,
    description="Data mixture via TEMPERATURE reweighting — target weight "
    f"∝ (language char share)^α with α={MIX_TEMP_ALPHA} (the standard "
    "multilingual upsampling: flattens the head, lifts the tail) over a "
    "50%-of-corpus budget. Normalization uses an ORDERED running-sum "
    "fold (window by lang) so the 5-double sum is the same fold on both "
    "engines; pow outputs round to 4dp before any threshold. Keep "
    "decisions stay a pure salted-hash filter — reproducible and "
    "append-stable.",
)
def mix_temperature_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    lt = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("double").alias("lang_chars")
    )
    total = lt.agg(F.sum("lang_chars").alias("total_chars"))
    pw = (
        lt.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "lang_chars",
            "total_chars",
            round4(
                F.pow(F.col("lang_chars") / F.col("total_chars"), MIX_TEMP_ALPHA)
            ).alias("pw"),
        )
    )
    # bounded frame: one row per language (|langs| <= 5 markers + und),
    # never corpus-sized — the constant-valued partition key (attr % 1;
    # bare literals are constant-folded away) documents that and
    # silences the WindowExec single-partition warning
    w_run = (
        Window.partitionBy(F.length("lang") % F.lit(1))
        .orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pw.withColumn("r", F.sum("pw").over(w_run))
    denom = run.agg(F.max("r").alias("denom"))
    rates = (
        run.crossJoin(F.broadcast(denom))
        .select(
            "lang",
            F.least(
                F.lit(10000.0),
                F.floor(
                    (F.col("pw") / F.col("denom"))
                    * F.lit(MIX_TEMP_BUDGET)
                    * F.col("total_chars")
                    / F.col("lang_chars")
                    * F.lit(10000.0)
                ).cast("double"),
            )
            .cast("long")
            .alias("rate_bp"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(
            SMP.sample_bucket(F.col("doc_id"), MIX_TEMP_SALT) < F.col("rate_bp")
        )
        .groupBy("lang", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        .orderBy("lang")
    )


@query(
    "split_leakage_safe",
    oracle=f"""
    WITH a AS (
      SELECT {SMP.hash_split_sql("md5(coalesce(text, ''))", SPLITS, "leak0")}
               AS split,
             md5(coalesce(text, '')) AS digest
      FROM documents
    ),
    x AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_digests_crossing_splits
      FROM (SELECT digest FROM a GROUP BY digest
            HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.digest) AS BIGINT) AS n_digests,
           x.n_digests_crossing_splits
    FROM a, x
    GROUP BY a.split, x.n_digests_crossing_splits
    ORDER BY a.split
    """,
    description="Leakage-safe train/valid/test split: assignment hashes "
    "the CONTENT digest, not the row id, so verbatim duplicates can "
    "never straddle splits (the eval-contamination failure mode of "
    "id-hashed splits — a test doc whose duplicate sits in train). "
    "Same pure per-row membership function as split_train_valid_test "
    "(stable under reruns/appends, no shuffle to assign); the output "
    "carries the machine-checked guarantee as data: "
    "n_digests_crossing_splits, a 1-row broadcast aggregate, must be 0. "
    "Near-dup-safe variants swap the digest for a dedup cluster id "
    "(dedup_minhash_clusters) — same assignment shape.",
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "digest", F.md5(F.coalesce(F.col("text"), F.lit("")))
    )
    assigned = SMP.hash_split(docs, "digest", SPLITS, salt="leak0")
    crossing = (
        assigned.groupBy("digest")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_digests_crossing_splits"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("digest").cast("long").alias("n_digests"),
        )
        .crossJoin(F.broadcast(crossing))
        .select("split", "n_docs", "n_digests", "n_digests_crossing_splits")
        .orderBy("split")
    )


from ..registry import REGISTRY as _REG  # noqa: E402 — oracle reuse
from ..queries import text as _text_mod  # noqa: F401,E402 — ensures registration


@query(
    "filter_reweighting_factors",
    oracle=f"""
    WITH qs AS ({_REG["text_quality_scores"].oracle}),
    labeled AS (
      SELECT d.lang, qs.quality_score
      FROM documents d JOIN qs ON d.doc_id = qs.doc_id
    ),
    shares AS (
      SELECT lang,
             COUNT(*) AS n_pre,
             SUM(CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END) AS n_post
      FROM labeled GROUP BY lang
    ),
    tot AS (
      SELECT SUM(n_pre) AS t_pre, SUM(n_post) AS t_post FROM shares
    )
    SELECT s.lang,
           CAST(s.n_pre AS BIGINT) AS n_pre,
           CAST(s.n_post AS BIGINT) AS n_post,
           {round4_sql("s.n_pre / t.t_pre")} AS share_pre,
           {round4_sql("s.n_post / t.t_post")} AS share_post,
           {round4_sql("(s.n_pre / t.t_pre) / (s.n_post / t.t_post)")}
             AS reweight
    FROM shares s CROSS JOIN tot t
    ORDER BY s.lang
    """,
    description="Curation: inverse-propensity reweighting after a "
    "quality filter — per language, the pre-filter share, the "
    "post-filter share (score >= 0.5), and the sampling weight that "
    "restores the original mix (share_pre / share_post). Quality "
    "filters are never language-neutral (stopword and alpha features "
    "favor some languages); reweighting keeps the filtered corpus from "
    "silently drifting its language distribution. One scan + one tiny "
    "aggregate + a broadcast totals row; the quality-score oracle is "
    "embedded verbatim so the filter and its correction can't diverge.",
)
def filter_reweighting_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    qs = T.quality_features(docs, "text", "doc_id").select(
        "doc_id", "quality_score"
    )
    labeled = docs.select("doc_id", "lang").join(qs, "doc_id")
    shares = labeled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pre"),
        F.sum((F.col("quality_score") >= 0.5).cast("long")).alias("n_post"),
    )
    tot = shares.agg(
        F.sum("n_pre").alias("t_pre"), F.sum("n_post").alias("t_post")
    )
    share_pre = F.col("n_pre") / F.col("t_pre")
    share_post = F.col("n_post") / F.col("t_post")
    return (
        shares.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_pre",
            "n_post",
            round4(share_pre).alias("share_pre"),
            round4(share_post).alias("share_post"),
            # a lang whose docs ALL score below threshold has share_post=0:
            # ANSI mode would kill the job on the plain division, and the
            # DuckDB oracle yields NULL there — try_divide matches it
            round4(F.try_divide(share_pre, share_post)).alias("reweight"),
        )
        .orderBy("lang")
    )
