"""Tier-C dedup queries over `documents` / `embeddings` with DuckDB oracles.

The corpus has no natural duplicates (every text is distinct at all SFs), so
the near-dup queries *plant* them deterministically: every 20th document
gets a variant (doc_id+1_000_000) with the last 3 words dropped — built with
identical expressions on both engines, so the oracle sees the same corpus.

Oracle-portability backbone: md5 is the only hash both engines share —
shingle hashes are 60-bit md5 prefixes (functions/hashing.py), and all
vector math is sequential left-fold double arithmetic so Spark and DuckDB
produce bit-identical floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    hash60_sql,
    LSH_BANDS,
    LSH_ROWS,
    N_MINHASH,
    P,
    MINHASH_A,
    MINHASH_B,
)
from ..functions.rounding import round4
from ..operators import dedup as D
from ..operators import text as TX
from ..plans.materialize import materialize
from ..operators.similarity import lsh_bucket_sql
from ..registry import query
from ..tables import load_table
from .text import quality_scores_sql

PLANT_EVERY = 20
PLANT_OFFSET = 1_000_000


def _docs_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted near-dup variants (deterministic)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    variants = (
        docs.where((F.col("doc_id") % PLANT_EVERY == 0) & (F.size(words) > 6))
        .select(
            (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
            F.concat_ws(" ", F.slice(words, 1, F.size(words) - 3)).alias("text"),
        )
    )
    return docs.unionAll(variants)


_PLANTED_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET} AS doc_id,
           array_to_string(w[1:len(w)-3], ' ') AS text
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE doc_id % {PLANT_EVERY} = 0 AND len(w) > 6
"""


def _docs_with_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """planted corpus + a 10-word template stamped onto every 3rd doc —
    the deterministic template-heavy corpus for the boilerplate-first
    curation queries (Spark twin of _BOILER_SQL)."""
    base = _docs_with_planted(spark, sf_dir)
    return base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(_BOILER_TPL + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

# DuckDB twin of operators.dedup.shingles (distinct word 3-grams)
_SHINGLES_SQL = """
    SELECT DISTINCT doc_id,
           unnest([array_to_string(w[i+1:i+3], ' ')
                   for i in range(0, greatest(len(w)-2, 1))]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ({base}))
"""

_H60 = "CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)"


def _sig_sql(base: str) -> str:
    mins = ",\n      ".join(
        f"MIN(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {P}) AS sig{i:02d}"
        for i in range(N_MINHASH)
    )
    return f"""
    SELECT doc_id, {mins}
    FROM (
      SELECT doc_id, {_H60} % {P} AS h
      FROM ({_SHINGLES_SQL.format(base=base)})
      WHERE length(shingle) > 0
    )
    GROUP BY doc_id
    """


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(text) AS digest, MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(text)
    """,
    description="C9: exact dedup by content digest — deterministic "
    "representative (min id) per distinct text; one shuffle on the digest.",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = D.content_digest(load_table(spark, sf_dir, "documents"), "text")
    return D.exact_dedup(docs, ["digest"], "doc_id")


@query(
    "dedup_exact_by_key",
    oracle="""
    SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS group_size
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    description="C9: key-based dedup — representative + group size per "
    "(lang, source).",
)
def dedup_exact_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("group_size"))
        .orderBy("lang", "source")
    )


@query(
    "dedup_minhash_signatures",
    oracle=_sig_sql("SELECT doc_id, text FROM documents"),
    description="C9 near-dup stage 1: 16-component MinHash signatures from "
    "word-3-gram shingles (portable md5-based hash family).",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_signatures(docs, "text", "doc_id")


def _lsh_pairs_sql() -> str:
    band_selects = []
    for b in range(LSH_BANDS):
        cols = " || '_' || ".join(
            f"CAST(sig{b * LSH_ROWS + r:02d} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {cols} AS band_key FROM sig"
        )
    bands = "\n      UNION ALL\n      ".join(band_selects)
    agree = " + ".join(
        f"CASE WHEN a.sig{i:02d} = b.sig{i:02d} THEN 1 ELSE 0 END"
        for i in range(N_MINHASH)
    )
    return f"""
    WITH base AS ({_PLANTED_SQL}),
    sig AS ({_sig_sql("SELECT * FROM base")}),
    bands AS (
      {bands}
    ),
    pairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    )
    SELECT p.id_a, p.id_b,
           ROUND(({agree}) / {N_MINHASH}.0, 4) AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.id_a
    JOIN sig b ON b.doc_id = p.id_b
    """


@query(
    "dedup_minhash_lsh_pairs",
    oracle=_lsh_pairs_sql(),
    description="C9 near-dup stage 2: LSH banding (4 bands x 4 rows) over "
    "the signatures; only bucket-mates pair up — never O(n^2). Planted "
    "truncated variants are the expected catches.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    return D.lsh_candidate_pairs(sig, "doc_id")


def _lsh_incremental_sql() -> str:
    def bands_sql(src: str) -> str:
        selects = []
        for b in range(LSH_BANDS):
            key = " || '_' || ".join(
                f"CAST(sig{b * LSH_ROWS + r:02d} AS VARCHAR)"
                for r in range(LSH_ROWS)
            )
            selects.append(
                f"SELECT doc_id, {b} AS band, {key} AS band_key FROM {src}"
            )
        return "\n      UNION ALL\n      ".join(selects)

    agree = " + ".join(
        f"CASE WHEN a.sig{i:02d} = b.sig{i:02d} THEN 1 ELSE 0 END"
        for i in range(N_MINHASH)
    )
    return f"""
    WITH nbase AS (
      SELECT doc_id + {PLANT_OFFSET} AS doc_id,
             array_to_string(w[1:len(w)-3], ' ') AS text
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE doc_id % {PLANT_EVERY} = 0 AND len(w) > 6
    ),
    csig AS ({_sig_sql("SELECT doc_id, text FROM documents")}),
    nsig AS ({_sig_sql("SELECT doc_id, text FROM nbase")}),
    cbands AS (
      {bands_sql("csig")}
    ),
    nbands AS (
      {bands_sql("nsig")}
    ),
    pairs AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM nbands n JOIN cbands c
        ON n.band = c.band AND n.band_key = c.band_key
    )
    SELECT p.new_id, p.corpus_id,
           ROUND(({agree}) / {N_MINHASH}.0, 4) AS est_jaccard
    FROM pairs p
    JOIN nsig a ON a.doc_id = p.new_id
    JOIN csig b ON b.doc_id = p.corpus_id
    """


@query(
    "dedup_minhash_pairs_incremental",
    oracle=_lsh_incremental_sql(),
    description="C9 incremental near-dup, MinHash flavor (completes the "
    "frozen-state family beside the ngram/suffix/embedding incrementals): "
    "a re-crawl increment (the planted truncated variants) probed against "
    "the FROZEN corpus LSH index — new-vs-corpus pairs only, "
    "O(increment · bucket-probe), never re-banding the corpus. The corpus "
    "signature + band tables are built once and materialized (at scale: "
    "the nightly bucketed band table, plans/layout.write_bucketed on the "
    "band key — see tools/band_probe.py for the measured stored-vs-"
    "rebuilt probe cost); each variant should catch its original. Probe "
    "join hints shuffle_hash on the increment side (48-byte band rows "
    "build, corpus streams).",
)
def dedup_minhash_pairs_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    variants = docs.where(
        (F.col("doc_id") % PLANT_EVERY == 0) & (F.size(words) > 6)
    ).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(words, 1, F.size(words) - 3)).alias("text"),
    )
    csig = materialize(
        D.minhash_signatures(docs, "text", "doc_id"), "minhash_inc_csig"
    )
    cband = materialize(
        D.lsh_band_table(csig, "doc_id"), "minhash_inc_cband"
    )
    nsig = materialize(
        D.minhash_signatures(variants, "text", "doc_id"), "minhash_inc_nsig"
    )
    return D.lsh_pairs_against_corpus(nsig, cband, csig, "doc_id").orderBy(
        "new_id", "corpus_id"
    )


def _simhash_sql() -> str:
    h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)"
    votes = ",\n      ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i:02d}"
        for i in range(60)
    )
    fp = " + ".join(
        f"CASE WHEN v{i:02d} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END"
        for i in range(60)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    votes AS (
      SELECT doc_id, {votes}
      FROM (SELECT doc_id, {h} AS h FROM toks WHERE length(tok) > 0)
      GROUP BY doc_id
    )
    SELECT doc_id, {fp} AS simhash FROM votes
    """


@query(
    "dedup_simhash",
    oracle=_simhash_sql(),
    description="C9: 60-bit SimHash fingerprints — near-dups differ in few "
    "bits; dedup becomes a Hamming-radius search over fingerprints.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "text", "doc_id")


NGRAM_MAX_DF = 100


@query(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sh0 AS ({_SHINGLES_SQL.format(base="SELECT * FROM base")}),
    keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {NGRAM_MAX_DF}
    ),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.2
    """,
    description="C9: exact n-gram Jaccard via inverted shingle index — the "
    "verification stage behind LSH candidates; threshold 0.2. Shingles "
    f"with document frequency > {NGRAM_MAX_DF} are dropped before the "
    "self-join (hot-key cap: a DF-f shingle makes f² join rows and "
    "carries no dup signal).",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    return D.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.2, max_df=NGRAM_MAX_DF
    )


@query(
    "dedup_jaccard_cap_recall_eval",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sh0 AS MATERIALIZED ({_SHINGLES_SQL.format(base="SELECT * FROM base")}),
    keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {NGRAM_MAX_DF}
    ),
    shc AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    sizes_c AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
    inter_c AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    capped AS (
      SELECT id_a, id_b FROM inter_c
      JOIN sizes_c sa ON sa.doc_id = id_a
      JOIN sizes_c sb ON sb.doc_id = id_b
      WHERE (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5
                   + 0.000001) / 10000.0) >= 0.2
    ),
    sizes_u AS (SELECT doc_id, COUNT(*) AS sz FROM sh0 GROUP BY doc_id),
    inter_u AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh0 a JOIN sh0 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    uncapped AS (
      SELECT id_a, id_b FROM inter_u
      JOIN sizes_u sa ON sa.doc_id = id_a
      JOIN sizes_u sb ON sb.doc_id = id_b
      WHERE (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5
                   + 0.000001) / 10000.0) >= 0.2
    )
    SELECT
      CAST((SELECT COUNT(*) FROM capped) AS BIGINT) AS n_capped,
      CAST((SELECT COUNT(*) FROM uncapped) AS BIGINT) AS n_uncapped,
      CAST((SELECT COUNT(*) FROM capped JOIN uncapped USING (id_a, id_b))
           AS BIGINT) AS n_hits,
      (FLOOR(((SELECT COUNT(*) FROM capped JOIN uncapped USING (id_a, id_b))
              * 1.0 / (SELECT COUNT(*) FROM capped))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cap_precision,
      (FLOOR(((SELECT COUNT(*) FROM capped JOIN uncapped USING (id_a, id_b))
              * 1.0 / (SELECT COUNT(*) FROM uncapped))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cap_recall
    """,
    description=f"C9 eval: the recall guard for the DF>{NGRAM_MAX_DF} "
    "hot-shingle cap (VERDICT r2 #7) — capped vs uncapped exact Jaccard "
    "pairs at threshold 0.2, reported as hit counts + precision/recall "
    "of the capped plan against the uncapped truth. The number an "
    "operator checks before trusting the cap at a new corpus: recall "
    "dropping means real near-dup pairs ride on corpus-common shingles. "
    "Eval-only (runs the quadratic uncapped join) — small-SF tool, "
    "never the production path.",
)
def dedup_jaccard_cap_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    capped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.2, max_df=NGRAM_MAX_DF
    ).select("id_a", "id_b")
    uncapped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.2, max_df=None
    ).select("id_a", "id_b")
    hits = capped.join(uncapped, ["id_a", "id_b"])
    n_c = capped.agg(F.count(F.lit(1)).alias("n_capped"))
    n_u = uncapped.agg(F.count(F.lit(1)).alias("n_uncapped"))
    n_h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_c.crossJoin(F.broadcast(n_u))
        .crossJoin(F.broadcast(n_h))
        .select(
            "n_capped",
            "n_uncapped",
            "n_hits",
            round4(F.col("n_hits") * 1.0 / F.col("n_capped")).alias(
                "cap_precision"
            ),
            round4(F.col("n_hits") * 1.0 / F.col("n_uncapped")).alias(
                "cap_recall"
            ),
        )
    )


# Shared CTE prefix for the embedding near-dup family: normalized doubles,
# norm, and the SAME random-hyperplane LSH bucket the Spark operator blocks
# on (cardinality grows with corpus size — never O(n²/k) on a constant key).
_EMB_NORMED_CTES = f"""
    base AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, label, v,
             ({lsh_bucket_sql('v')}) AS blk,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (acc, x) -> acc + x)) AS nrm
      FROM base
    )
"""


@query(
    "dedup_embedding_cosine_pairs",
    oracle=f"""
    WITH {_EMB_NORMED_CTES}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           (FLOOR((list_reduce(
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
               (acc, x) -> acc + x
             ) / (a.nrm * b.nrm)) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cosine
    FROM normed a JOIN normed b
      ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE (FLOOR((list_reduce(
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
               (acc, x) -> acc + x
             ) / (a.nrm * b.nrm)) * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.4
    """,
    description="C9: embedding-cosine near-dup pairs, LSH-bucket-blocked to "
    "stay sub-quadratic (bucket count scales with corpus via plane count; "
    "an IVF cell id works the same way via block_col). Threshold 0.4 — "
    "this corpus is random vectors, real dup corpora use ~0.95.",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs(emb, threshold=0.4)


@query(
    "dedup_minhash_clusters",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    )
    SELECT node AS doc_id, MIN(root) AS cluster_id
    FROM walk
    GROUP BY node
    """,
    description="C9 near-dup stage 3: duplicate *groups* from the LSH "
    "pairs — connected components by iterative min-label propagation "
    "(operators/dedup.connected_components, O(diameter) rounds, one "
    "shuffle per round); cluster_id = min doc id is the deterministic "
    "representative. Oracle walks the same graph with a recursive CTE.",
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    return D.connected_components(pairs, docs.select("doc_id"), "doc_id")


@query(
    "dedup_cluster_size_profile",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id
      FROM walk GROUP BY node
    ),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM cc GROUP BY cluster_id
    )
    SELECT CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2'
                WHEN sz <= 5 THEN '3-5' ELSE '6+' END AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz - 1) AS BIGINT) AS n_removable
    FROM sizes
    GROUP BY 1 ORDER BY size_bucket
    """,
    description="C9 dedup-QA dashboard: the duplicate-CLUSTER size "
    "distribution — per size bucket (1 / 2 / 3-5 / 6+), how many "
    "clusters, how many docs they hold, and how many docs a "
    "keep-one-per-cluster policy removes (sum of size-1). THE number an "
    "operator reads before committing a dedup pass at 100 TB: a fat 6+ "
    "tail means boilerplate/template families (route to the suffix "
    "pass first), a thin all-size-2 profile means true near-dup twins. "
    "Reuses the same CC plan as dedup_minhash_clusters (O(diameter) "
    "rounds) plus two tiny aggregates; oracle replays the recursive "
    "walk and rolls up identically.",
)
def dedup_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    cc = D.connected_components(pairs, docs.select("doc_id"), "doc_id")
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    bucket = (
        F.when(F.col("sz") == 1, "1")
        .when(F.col("sz") == 2, "2")
        .when(F.col("sz") <= 5, "3-5")
        .otherwise("6+")
    )
    return (
        sizes.groupBy(bucket.alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_removable"),
        )
        .orderBy("size_bucket")
    )


@query(
    "dedup_keeper_election",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    ),
    cc AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id
      FROM walk GROUP BY node
    ),
    q AS (
      SELECT doc_id, quality_score, n_chars
      FROM ({quality_scores_sql(f"({_PLANTED_SQL})")})
    ),
    m AS (
      SELECT cc.cluster_id, cc.doc_id, q.quality_score,
             ROW_NUMBER() OVER (
               PARTITION BY cc.cluster_id
               ORDER BY q.quality_score DESC, q.n_chars DESC, cc.doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY cc.cluster_id) AS n_members,
             MAX(CASE WHEN cc.doc_id = cc.cluster_id
                      THEN q.quality_score END)
               OVER (PARTITION BY cc.cluster_id) AS default_quality_score
      FROM cc JOIN q USING (doc_id)
    )
    SELECT cluster_id,
           CAST(n_members AS BIGINT) AS n_members,
           doc_id AS keeper_id,
           CAST(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END
                AS INTEGER) AS keeper_changed,
           quality_score AS keeper_quality_score,
           default_quality_score
    FROM m WHERE rn = 1 AND n_members >= 2
    """,
    description="C9 keeper QUALITY re-election (the explicit pass "
    "SCALE.md §8's incumbent policy defers to): per multi-member "
    "duplicate cluster, re-elect the keeper by content quality "
    "(quality_score desc, n_chars desc, id asc — a total order) and "
    "report it next to the min-id default the CC representative / "
    "incumbent rebuild policy would keep. keeper_changed counts the "
    "first-crawl-bias corrections a scheduled re-election buys. "
    "Narrow checkpoint-derived cc frame joins the projected feature "
    "frame under the CLAUDE.md shuffle_hash hint; election is one "
    "window over the cluster key (operators/dedup.keeper_election).",
)
def dedup_keeper_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    cc = D.connected_components(pairs, docs.select("doc_id"), "doc_id")
    feats = TX.quality_features(docs, "text", "doc_id")
    return D.keeper_election(cc, feats, "doc_id", ["quality_score", "n_chars"])


def _band_keys_sql(sig_rel: str) -> str:
    """DuckDB band-key projection over a signature relation (LSH banding)."""
    selects = []
    for b in range(LSH_BANDS):
        cols = " || '_' || ".join(
            f"CAST(sig{b * LSH_ROWS + r:02d} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band, {cols} AS band_key FROM {sig_rel}"
        )
    return "\n      UNION ALL\n      ".join(selects)


@query(
    "dedup_incremental_new_batch",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    fresh AS (
      SELECT doc_id + {PLANT_OFFSET} AS doc_id,
             array_to_string(w[1:len(w)-3], ' ') AS text
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE doc_id % {PLANT_EVERY} = 0 AND len(w) > 6
    ),
    exact_hit AS (
      SELECT DISTINCT f.doc_id
      FROM fresh f JOIN corpus c ON md5(f.text) = md5(c.text)
    ),
    sig_c AS ({_sig_sql("SELECT * FROM corpus")}),
    sig_f AS ({_sig_sql("SELECT * FROM fresh")}),
    bands_c AS (
      {_band_keys_sql("sig_c")}
    ),
    bands_f AS (
      {_band_keys_sql("sig_f")}
    ),
    near_hit AS (
      SELECT DISTINCT f.doc_id
      FROM bands_f f JOIN bands_c c
        ON f.band = c.band AND f.band_key = c.band_key
    )
    SELECT f.doc_id,
           CAST(e.doc_id IS NOT NULL AS INT) AS is_exact_dup,
           CAST(n.doc_id IS NOT NULL AS INT) AS is_near_dup,
           CAST(e.doc_id IS NULL AND n.doc_id IS NULL AS INT) AS keep
    FROM fresh f
    LEFT JOIN exact_hit e ON f.doc_id = e.doc_id
    LEFT JOIN near_hit n ON f.doc_id = n.doc_id
    ORDER BY f.doc_id
    """,
    description="C9: incremental dedup — the continual-pretraining case: a "
    "fresh crawl batch (the planted truncated variants) is deduped "
    "AGAINST the existing corpus, never against itself: exact hits via "
    "digest anti-join, near hits via LSH band keys joined new-side vs "
    "corpus-side only. At 100 TB the corpus band index is a precomputed "
    "table, so each increment costs O(|increment|) plus one bucket join — "
    "the whole corpus is never re-paired.",
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    fresh = docs.where(
        (F.col("doc_id") % PLANT_EVERY == 0) & (F.size(words) > 6)
    ).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(words, 1, F.size(words) - 3)).alias("text"),
    )

    exact_hit = (
        D.content_digest(fresh, "text")
        .join(
            D.content_digest(docs, "text").select("digest"), "digest", "left_semi"
        )
        .select("doc_id")
        .distinct()
    )

    def band_keys(sig: DataFrame) -> DataFrame:
        # single-pass explode, NOT a 4-way union: each union branch would
        # recompute the signature projection from the scan (4x the work —
        # measured 4.7s -> sub-second here). The band key is a struct of
        # the LSH_ROWS signature longs (32 B), not a concat string
        # (~60-80 B): the bucket join shuffles the longs themselves,
        # exact equality, no string build (same rep as
        # operators/dedup.lsh_candidate_pairs).
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.struct(
                        *[
                            F.col(f"sig{b * LSH_ROWS + r:02d}").alias(
                                f"k{r}"
                            )
                            for r in range(LSH_ROWS)
                        ]
                    ).alias("band_key"),
                )
                for b in range(LSH_BANDS)
            ]
        )
        return sig.select("doc_id", F.explode(bands).alias("bk")).select(
            "doc_id", "bk.band", "bk.band_key"
        )

    # The corpus band index IS the precomputed artifact at scale (one
    # signature pass per crawl generation, stored); localCheckpoint
    # models that here so each increment pays O(|increment|) + the
    # bucket join, not a corpus re-signature.
    corpus_index = materialize(
        band_keys(D.minhash_signatures(docs, "text", "doc_id")),
        "corpus_band_index",
    )
    near_hit = (
        band_keys(D.minhash_signatures(fresh, "text", "doc_id"))
        .join(corpus_index, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
    )

    e = exact_hit.withColumn("is_exact_dup", F.lit(1))
    n = near_hit.withColumn("is_near_dup", F.lit(1))
    return (
        fresh.select("doc_id")
        .join(e, "doc_id", "left")
        .join(n, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact_dup", F.lit(0)).alias("is_exact_dup"),
            F.coalesce("is_near_dup", F.lit(0)).alias("is_near_dup"),
            (
                F.coalesce("is_exact_dup", F.lit(0))
                + F.coalesce("is_near_dup", F.lit(0))
                == 0
            )
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


TOKEN_MIN = 8
CURATE_PER_LANG = 20
CURATE_SALT = "cur"


@query(
    "curate_training_corpus",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    ),
    reps AS (
      SELECT d.doc_id, d.lang,
             len(string_split(d.text, ' ')) AS n_tokens
      FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
      WHERE c.cluster_id = c.doc_id
    )
    SELECT doc_id, lang, n_tokens, sample_rank
    FROM (
      SELECT doc_id, lang, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY
                 {hash60_sql(f"'{CURATE_SALT}' || CAST(doc_id AS VARCHAR)")},
                 doc_id
             ) AS sample_rank
      FROM reps
      WHERE n_tokens >= {TOKEN_MIN}
    )
    WHERE sample_rank <= {CURATE_PER_LANG}
    """,
    description="Flagship curation composite: near-dup clusters (LSH pairs "
    "-> connected components) -> keep the min-id representative of each "
    "cluster -> token-count quality gate -> deterministic stratified "
    f"sample of {CURATE_PER_LANG} docs per language. The whole "
    "training-data prep path in one plan: candidate graph is tiny vs the "
    "corpus, sampling is hash-based, so every stage scales linearly.",
)
def curate_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as SMP

    planted = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(planted, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    clusters = D.connected_components(pairs, planted.select("doc_id"), "doc_id")
    reps = clusters.where(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    corpus = (
        docs.join(reps, "doc_id", "left_semi")
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .where(F.col("n_tokens") >= TOKEN_MIN)
    )
    return SMP.stratified_fixed_n(
        corpus, "lang", CURATE_PER_LANG, "doc_id", CURATE_SALT
    ).select("doc_id", "lang", "n_tokens", "sample_rank")


@query(
    "curate_training_corpus_best_keeper",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    ),
    q AS (
      SELECT doc_id, quality_score, n_chars
      FROM ({quality_scores_sql(f"({_PLANTED_SQL})")})
    ),
    elected AS (
      SELECT doc_id FROM (
        SELECT c.doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY c.cluster_id
                 ORDER BY q.quality_score DESC, q.n_chars DESC, c.doc_id
               ) AS rn
        FROM clusters c JOIN q ON q.doc_id = c.doc_id
      ) WHERE rn = 1
    ),
    reps AS (
      SELECT p.doc_id, d.lang,
             len(string_split(p.text, ' ')) AS n_tokens
      FROM ({_PLANTED_SQL}) p
      JOIN elected e ON e.doc_id = p.doc_id
      JOIN documents d
        ON d.doc_id = CASE WHEN p.doc_id >= {PLANT_OFFSET}
                           THEN p.doc_id - {PLANT_OFFSET}
                           ELSE p.doc_id END
    )
    SELECT doc_id, lang, n_tokens, sample_rank
    FROM (
      SELECT doc_id, lang, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY
                 {hash60_sql(f"'{CURATE_SALT}' || CAST(doc_id AS VARCHAR)")},
                 doc_id
             ) AS sample_rank
      FROM reps
      WHERE n_tokens >= {TOKEN_MIN}
    )
    WHERE sample_rank <= {CURATE_PER_LANG}
    """,
    description="Curation composite, quality-keeper variant: the same "
    "cluster -> representative -> gate -> stratified-sample chain as "
    "curate_training_corpus, but EVERY cluster's representative is the "
    "quality-ELECTED member (keeper_election with min_members=1) "
    "instead of the min-id arrival default — the rebuild shape SCALE.md "
    "§8 prescribes when the re-election pass runs on its own schedule. "
    "Elected keepers that are planted variants stay in the corpus "
    "(language resolved from their source doc), so no cluster loses "
    "representation. Both checkpoint-derived narrow sides carry "
    "shuffle_hash hints; the text-carrying planted frame is only ever "
    "a semi-join STREAM side, never a build side.",
)
def curate_training_corpus_best_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as SMP

    planted = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(planted, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    clusters = D.connected_components(pairs, planted.select("doc_id"), "doc_id")
    feats = TX.quality_features(planted, "text", "doc_id")
    elected = D.keeper_election(
        clusters, feats, "doc_id", ["quality_score", "n_chars"], min_members=1
    )
    reps = elected.select(F.col("keeper_id").alias("doc_id"))
    kept = planted.join(reps.hint("shuffle_hash"), "doc_id", "left_semi")
    src_id = F.when(
        F.col("doc_id") >= PLANT_OFFSET, F.col("doc_id") - PLANT_OFFSET
    ).otherwise(F.col("doc_id"))
    kept_narrow = kept.select(
        "doc_id",
        src_id.alias("src_id"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    lang = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("src_id"), "lang"
    )
    corpus = (
        kept_narrow.hint("shuffle_hash")
        .join(lang, "src_id")
        .select("doc_id", "lang", "n_tokens")
        .where(F.col("n_tokens") >= TOKEN_MIN)
    )
    return SMP.stratified_fixed_n(
        corpus, "lang", CURATE_PER_LANG, "doc_id", CURATE_SALT
    ).select("doc_id", "lang", "n_tokens", "sample_rank")


# DuckDB twin of operators.dedup.doc_chunks (non-overlapping 5-word chunks,
# duplicates kept, trailing partial chunk dropped; 1-indexed inclusive slice)
_CHUNKS_SQL = """
    SELECT doc_id,
           unnest([array_to_string(w[(j*5)+1:(j*5)+5], ' ')
                   FOR j IN range(0, CAST(floor(len(w)/5) AS INT))]) AS chunk
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


@query(
    "dedup_substring_spans",
    oracle=f"""
    SELECT chunk, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM ({_CHUNKS_SQL})
    GROUP BY chunk
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_occurrences DESC, chunk
    """,
    description="C9: exact-substring dedup candidates — corpus-wide "
    "duplicated 5-word spans (distributed stand-in for Lee et al. suffix-"
    "array substring dedup: fixed-width chunk fingerprints, one explode of "
    "~n_words/5 rows, one partial-aggregated groupBy).",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicated_spans(docs, "text", "doc_id", 5).orderBy(
        F.col("n_occurrences").desc(), "chunk"
    )


# THE suffix-dedup k: interpolated into every suffix oracle below AND
# passed to every operators/dedup.py suffix call, so changing it breaks
# loudly (oracle mismatch is impossible by construction, per ADVICE r6).
_SUFFIX_K = 5

_SUFFIX_KG_SQL = f"""
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           md5(array_to_string(w[pos:pos+{_SUFFIX_K - 1}], ' ')) AS dig
    FROM (
      SELECT doc_id, w, unnest(range(1, len(w) - {_SUFFIX_K} + 2)) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= {_SUFFIX_K}
    )
"""


@query(
    "dedup_suffix_spans",
    oracle=f"""
    WITH k2 AS ({_SUFFIX_KG_SQL}),
    dupd AS (SELECT dig FROM k2 GROUP BY dig HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, pos FROM k2 JOIN dupd USING (dig)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM dup
    )
    SELECT doc_id,
           MIN(pos) AS start_pos,
           CAST(MAX(pos) + {_SUFFIX_K - 1} AS BIGINT) AS end_pos,
           CAST(MAX(pos) - MIN(pos) + {_SUFFIX_K} AS BIGINT) AS span_words
    FROM isl GROUP BY doc_id, g
    ORDER BY doc_id, start_pos
    """,
    description="C9: TRUE exact-substring dedup (Lee et al. 2022 suffix-"
    "array formulation): maximal duplicated word spans of length ≥5 at "
    "ANY offset — sliding 5-gram suffix prefixes, corpus-wide repeat "
    "mark (count ≥2, within-doc repeats included), gaps-and-islands "
    "merge of consecutive duplicated positions. Catches the unaligned "
    "duplicates dedup_substring_spans' fixed chunk grid misses; "
    "dedup_suffix_grid_recall_eval quantifies the gap. groupBy(digest) "
    "partial-aggregates hot boilerplate kgrams map-side; island window "
    "is doc-bounded.",
)
def dedup_suffix_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.suffix_duplicated_spans(docs, "text", "doc_id", _SUFFIX_K).orderBy(
        "doc_id", "start_pos"
    )


@query(
    "dedup_suffix_remove",
    oracle=f"""
    WITH k2 AS ({_SUFFIX_KG_SQL}),
    cut AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                 PARTITION BY dig ORDER BY doc_id, pos
               ) AS rn,
               COUNT(*) OVER (PARTITION BY dig) AS n
        FROM k2
      ) WHERE n >= 2 AND rn > 1
    ),
    cov AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM cut CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    words AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS word
      FROM (
        SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    ),
    kept AS (
      SELECT wd.doc_id, wd.p, wd.word FROM words wd
      WHERE NOT EXISTS (
        SELECT 1 FROM cov
        WHERE cov.doc_id = wd.doc_id AND cov.p = wd.p
      )
    )
    SELECT b.doc_id,
           CAST(COALESCE(t.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(kk.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(kk.txt, '') AS text_deduped
    FROM documents b
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id
    ) t USING (doc_id)
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(word, ' ' ORDER BY p) AS txt
      FROM kept GROUP BY doc_id
    ) kk USING (doc_id)
    ORDER BY b.doc_id
    """,
    description="C9: suffix-based exact-substring dedup ACTION (Lee et "
    "al. 2022) — every corpus-repeated 5-gram keeps only its first "
    "(doc, pos) occurrence; word positions covered by later occurrences "
    "are cut at ANY offset (not just the chunk grid) and each document "
    "is rebuilt from its surviving words. Keeper election is a "
    "partial-aggregated groupBy(digest) (hot boilerplate collapses "
    "map-side); every input doc returns exactly once (fully-duplicated "
    "docs emptied, never dropped).",
)
def dedup_suffix_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_suffix_duplicate_spans(docs, "text", "doc_id", _SUFFIX_K).orderBy(
        "doc_id"
    )


# --- boilerplate-first curation ordering (VERDICT r8 #1) -------------------
# SCALEPROBE's DF-cap recall eval ended round 8 in an untested claim:
# "after boilerplate removal the Jaccard index sees content-only overlap
# again". These queries make that ordering executable and oracle-gated:
# a 10-word template is stamped onto every 3rd doc (deterministically, on
# both engines), the scrub cuts every k-gram shared by >BOILER_MIN_DOCS
# DISTINCT docs from every occurrence, and the composed pass runs the
# capped shingle-Jaccard on the CLEANED text. tools/skew_probe.py re-runs
# the recall eval on the scrubbed skewed corpus and records the recovery.

BOILER_MIN_DOCS = 20
_BOILER_TPL = "follow us on social media and subscribe to our newsletter"

_BOILER_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN '{_BOILER_TPL} ' || text ELSE text END AS text
    FROM ({_PLANTED_SQL})
"""

# sliding k-gram index + hot-gram cut + per-doc rebuild, over any base CTE
# (the DuckDB twin of operators/dedup.remove_boilerplate_spans; same
# word-position arithmetic as the dedup_suffix_remove oracle)
_BOILER_SCRUB_SQL = f"""
    kg AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             md5(array_to_string(w[pos:pos+{_SUFFIX_K - 1}], ' ')) AS dig
      FROM (
        SELECT doc_id, w, unnest(range(1, len(w) - {_SUFFIX_K} + 2)) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
        WHERE len(w) >= {_SUFFIX_K}
      )
    ),
    hot AS (
      SELECT dig FROM kg GROUP BY dig
      HAVING COUNT(DISTINCT doc_id) > {BOILER_MIN_DOCS}
    ),
    cut AS (SELECT doc_id, pos FROM kg JOIN hot USING (dig)),
    cov AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM cut CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    words AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS word
      FROM (
        SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
      )
    ),
    kept AS (
      SELECT wd.doc_id, wd.p, wd.word FROM words wd
      WHERE NOT EXISTS (
        SELECT 1 FROM cov WHERE cov.doc_id = wd.doc_id AND cov.p = wd.p
      )
    )
"""


@query(
    "dedup_boilerplate_scrub",
    oracle=f"""
    WITH base AS ({_BOILER_SQL}),
    {_BOILER_SCRUB_SQL}
    SELECT b.doc_id,
           CAST(COALESCE(t.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(kk.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(kk.txt, '') AS text_deduped
    FROM base b
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id
    ) t USING (doc_id)
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(word, ' ' ORDER BY p) AS txt
      FROM kept GROUP BY doc_id
    ) kk USING (doc_id)
    ORDER BY b.doc_id
    """,
    description="C9 curation stage 1 (VERDICT r8 #1): boilerplate scrub — "
    f"every {_SUFFIX_K}-gram appearing in > {BOILER_MIN_DOCS} DISTINCT "
    "docs is cut from EVERY occurrence (templates have no first owner, "
    "unlike dedup_suffix_remove's keep-first exact dedup) and each doc is "
    "rebuilt from surviving words. The stamped 10-word template must come "
    "out surgically: the oracle checks every rebuilt text, so a stamped "
    "doc whose cleaned text differs from its pre-stamp original by even "
    "one word fails the hash. Hot-gram election partial-aggregates "
    "map-side; clean docs pass through verbatim.",
)
def dedup_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_boilerplate(spark, sf_dir)
    return D.remove_boilerplate_spans(
        base, "text", "doc_id", k=_SUFFIX_K, min_docs=BOILER_MIN_DOCS
    ).orderBy("doc_id")


@query(
    "dedup_boilerplate_first_pairs",
    oracle=f"""
    WITH base AS ({_BOILER_SQL}),
    {_BOILER_SCRUB_SQL},
    cleaned AS (
      SELECT b.doc_id, COALESCE(kk.txt, '') AS text
      FROM base b
      LEFT JOIN (
        SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS txt
        FROM kept GROUP BY doc_id
      ) kk USING (doc_id)
    ),
    sh0 AS (
      SELECT * FROM ({_SHINGLES_SQL.format(base="SELECT doc_id, text FROM cleaned")})
      WHERE length(shingle) > 0
    ),
    keepc AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {NGRAM_MAX_DF}
    ),
    sh AS (SELECT sh0.* FROM sh0 JOIN keepc USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5 + 0.000001) / 10000.0) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.2
    """,
    description="C9 composed curation pass (VERDICT r8 #1 'done' "
    "criterion): boilerplate scrub FIRST, capped shingle-Jaccard near-dup "
    "SECOND — the ordering rule SCALEPROBE's DF-cap recall eval derived "
    "(template mass both bloats the inverted index's hot keys and pushes "
    "unrelated short docs over the threshold; scrubbing it first leaves "
    "content-only overlap for the pair stage). One registered pipeline: "
    "template-stamped corpus -> remove_boilerplate_spans -> "
    f"ngram_jaccard_pairs(0.2, max_df={NGRAM_MAX_DF}); the oracle runs "
    "the identical two-stage SQL, so pair drift in EITHER stage fails "
    "the hash. tools/skew_probe.py measures the recall recovery this "
    "ordering buys on the planted-boilerplate corpus.",
)
def dedup_boilerplate_first_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_boilerplate(spark, sf_dir)
    cleaned = D.remove_boilerplate_spans(
        base, "text", "doc_id", k=_SUFFIX_K, min_docs=BOILER_MIN_DOCS
    ).select("doc_id", F.col("text_deduped").alias("text"))
    return D.ngram_jaccard_pairs(
        cleaned, "text", "doc_id", threshold=0.2, max_df=NGRAM_MAX_DF
    )


@query(
    "dedup_suffix_grid_recall_eval",
    oracle=f"""
    WITH k2 AS ({_SUFFIX_KG_SQL}),
    tdup AS (
      SELECT dig FROM k2 GROUP BY dig
      HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    truth AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM (SELECT doc_id, pos FROM k2 JOIN tdup USING (dig))
      CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    g2 AS (SELECT * FROM k2 WHERE (pos - 1) % {_SUFFIX_K} = 0),
    gdup AS (
      SELECT dig FROM g2 GROUP BY dig
      HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    grid AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM (SELECT doc_id, pos FROM g2 JOIN gdup USING (dig))
      CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    hit AS (SELECT doc_id, p FROM grid JOIN truth USING (doc_id, p))
    SELECT
      CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth_pos,
      CAST((SELECT COUNT(*) FROM grid) AS BIGINT) AS n_grid_pos,
      CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
      (FLOOR(((SELECT COUNT(*) FROM hit) * 1.0
              / (SELECT COUNT(*) FROM truth))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS grid_recall,
      (FLOOR(((SELECT COUNT(*) FROM hit) * 1.0
              / (SELECT COUNT(*) FROM grid))
             * 10000.0 + 0.5 + 0.000001) / 10000.0) AS grid_precision
    """,
    description="C9 eval: how much duplicated text the fixed 5-word "
    "chunk grid (dedup_substring_spans) misses vs the suffix-array "
    "truth (dedup_suffix_spans) at the same k and the same ≥2-distinct-"
    "docs criterion — word positions covered by each detector, their "
    "intersection, and grid recall/precision. A grid chunk is exactly "
    "the k-gram at an aligned offset ((pos-1)%5=0) marked duplicated "
    "among aligned occurrences only, so grid positions ⊆ truth "
    "positions (precision pins at 1.0) and recall is the number that "
    "justifies paying the suffix index's k× larger explode. Linear in "
    "corpus size (no quadratic join) but eval-grade — not a headline "
    "query.",
)
def dedup_suffix_grid_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kg = D.suffix_kgrams(docs, "text", "doc_id", _SUFFIX_K)
    covered = F.explode(
        F.sequence(F.col("pos"), F.col("pos") + F.lit(_SUFFIX_K - 1))
    ).alias("p")

    def dup_positions(frame: DataFrame) -> DataFrame:
        dupd = (
            frame.groupBy("dig")
            .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
            .where(F.col("mn") != F.col("mx"))
            .select("dig")
        )
        return (
            frame.join(dupd, "dig")
            .select("doc_id", covered)
            .distinct()
        )

    truth = dup_positions(kg)
    grid = dup_positions(kg.where((F.col("pos") - 1) % _SUFFIX_K == 0))
    hit = grid.join(truth, ["doc_id", "p"])
    n_t = truth.agg(F.count(F.lit(1)).alias("n_truth_pos"))
    n_g = grid.agg(F.count(F.lit(1)).alias("n_grid_pos"))
    n_h = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_t.crossJoin(F.broadcast(n_g))
        .crossJoin(F.broadcast(n_h))
        .select(
            "n_truth_pos",
            "n_grid_pos",
            "n_hit",
            round4(F.col("n_hit") * 1.0 / F.col("n_truth_pos")).alias(
                "grid_recall"
            ),
            round4(F.col("n_hit") * 1.0 / F.col("n_grid_pos")).alias(
                "grid_precision"
            ),
        )
    )


@query(
    "dedup_substring_doc_stats",
    oracle=f"""
    WITH ch AS ({_CHUNKS_SQL}),
    cd AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk)
    SELECT ch.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN cd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           (FLOOR((SUM(CASE WHEN cd.nd >= 2 THEN 1 ELSE 0 END) * 1.0
                   / COUNT(*)) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS dup_chunk_frac
    FROM ch JOIN cd USING (chunk)
    GROUP BY ch.doc_id
    ORDER BY ch.doc_id
    """,
    description="C9: per-document duplicated-span load — fraction of a "
    "doc's 5-word chunks that also appear in other docs (the drop/trim "
    "signal exact-substring dedup acts on). Chunk-grain join back to the "
    "span index; AQE handles boilerplate-span skew.",
)
def dedup_substring_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = D.doc_chunks(docs, "text", "doc_id", 5)
    cd = ch.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        ch.join(cd, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            round4(F.sum(dup) * 1.0 / F.count(F.lit(1))).alias("dup_chunk_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_semdedup_keep",
    oracle=f"""
    WITH {_EMB_NORMED_CTES},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM normed a JOIN normed b
        ON a.blk = b.blk AND a.vec_id < b.vec_id
      WHERE (FLOOR((list_reduce(
                 list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                 (acc, x) -> acc + x
               ) / (a.nrm * b.nrm)) * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.4
    ),
    drops AS (
      SELECT id_b AS vec_id, COUNT(*) AS n_lower_dups
      FROM pairs GROUP BY id_b
    )
    SELECT e.vec_id, e.label,
           COALESCE(d.n_lower_dups, 0) AS n_lower_dups,
           CAST(d.vec_id IS NULL AS INT) AS keep
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    ORDER BY e.vec_id
    """,
    description="C9: SemDeDup-style semantic dedup decision — within each "
    "block (LSH bucket; IVF cell works via block_col) drop any vector that has a "
    "lower-id neighbor above the cosine threshold, keeping exactly one "
    "representative per near-dup set without connected components (the "
    "keep rule is local to pairs). Output: per-vector keep/drop + how many "
    "lower-id near-dups forced the drop.",
)
def dedup_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dup_pairs(emb, threshold=0.4)
    drops = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_lower_dups")
    )
    # shuffle_hash (r13, guide §3.2): drops is vec_id + one long — narrow —
    # but corpus-sized in the worst case behind the checkpointed bucket
    # index, so it must not broadcast; the hint also swaps the final
    # SortMergeJoin for a hash join, dropping both sides' sorts.
    return (
        emb.select("vec_id", "label")
        .join(drops.hint("shuffle_hash"), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_lower_dups", F.lit(0)).alias("n_lower_dups"),
            F.col("n_lower_dups").isNull().cast("int").alias("keep"),
        )
        .orderBy("vec_id")
    )


@query(
    "crosslingual_near_dup_pairs",
    oracle=f"""
    WITH {_EMB_NORMED_CTES},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             (FLOOR((list_reduce(
                 list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                 (acc, x) -> acc + x
               ) / (a.nrm * b.nrm)) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS cosine
      FROM normed a JOIN normed b
        ON a.blk = b.blk AND a.vec_id < b.vec_id
    )
    SELECT p.id_a, p.id_b, p.cosine,
           da.lang AS lang_a, db.lang AS lang_b
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    WHERE p.cosine >= 0.4 AND da.lang != db.lang
    ORDER BY p.id_a, p.id_b
    """,
    description="C9/C10 composite: cross-lingual near-duplicate mining — "
    "document pairs semantically close in embedding space (LSH-bucket-"
    "blocked cosine, same operator as SemDeDup) whose LANGUAGES differ: "
    "translation-pair candidates, the multilingual-curation signal "
    "(keep for parallel data, or drop one side for monolingual "
    "pretraining mixes). The lang lookup joins doc metadata back onto "
    "the pair stream — two broadcast-sized probes, no extra shuffle of "
    "the pair fan-out.",
)
def crosslingual_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = D.embedding_near_dup_pairs(emb, threshold=0.4)
    la = docs.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")
    )
    lb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")
    )
    return (
        pairs.join(F.broadcast(la), "id_a")
        .join(F.broadcast(lb), "id_b")
        .where(F.col("lang_a") != F.col("lang_b"))
        .select("id_a", "id_b", "cosine", "lang_a", "lang_b")
        .orderBy("id_a", "id_b")
    )


# DuckDB twin of operators.dedup.shingle_array (distinct word 3-grams,
# in-row list form)
_SHINGLE_ARR_SQL = """
    list_distinct(list_filter(
      [array_to_string(w[i+1:i+3], ' ')
       for i in range(0, greatest(len(w)-2, 1))],
      s -> length(s) > 0))
"""


@query(
    "dedup_lsh_verified_pairs",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sig AS ({_sig_sql("SELECT * FROM base")}),
    bands AS (
      {_band_keys_sql("sig")}
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    sh AS (
      SELECT doc_id, {_SHINGLE_ARR_SQL} AS arr
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
    )
    SELECT c.id_a, c.id_b,
           (FLOOR((len(list_intersect(a.arr, b.arr)) * 1.0
                   / (len(a.arr) + len(b.arr)
                      - len(list_intersect(a.arr, b.arr))))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b
    WHERE (FLOOR((len(list_intersect(a.arr, b.arr)) * 1.0
                  / (len(a.arr) + len(b.arr)
                     - len(list_intersect(a.arr, b.arr))))
                 * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.2
    ORDER BY c.id_a, c.id_b
    """,
    description="C9: the production near-dup verify stage — EXACT n-gram "
    "Jaccard computed ONLY on LSH banding candidates, via in-row shingle-"
    "array intersection (size(array_intersect)/size-of-union). Unlike the "
    "inverted-index self-join (dedup_ngram_jaccard_pairs), cost is "
    "O(candidate pairs), each a per-row HOF — no shingle-grain shuffle "
    "at all; at 100 TB this is banding's O(collisions) plus a pair-wise "
    "array op.",
)
def dedup_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    cand = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    sh = materialize(
        docs.select("doc_id", D.shingle_array(docs, "text").alias("arr")),
        "shingle_arrays",
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("arr").alias("arr_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = inter * 1.0 / (
        F.size("arr_a") + F.size("arr_b") - inter
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", round4(jac).alias("jaccard"))
        .where(round4(jac) >= 0.2)
        .orderBy("id_a", "id_b")
    )


SIMHASH_MAX_HAMMING = 3


def _simhash_planted_sql() -> str:
    """SimHash fingerprints over the planted corpus (DuckDB twin)."""
    h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)"
    votes = ",\n      ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i:02d}"
        for i in range(60)
    )
    fp = " + ".join(
        f"CASE WHEN v{i:02d} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END"
        for i in range(60)
    )
    return f"""
    SELECT doc_id, {fp} AS simhash FROM (
      SELECT doc_id, {votes}
      FROM (
        SELECT doc_id, {h} AS h FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM ({_PLANTED_SQL})
        ) WHERE length(tok) > 0
      )
      GROUP BY doc_id
    )
    """


def _simhash_hamming_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    n_bands = max_hamming + 1
    width = 60 // n_bands
    mask = (1 << width) - 1
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, (simhash >> {b * width}) & {mask} "
        f"AS band_bits FROM fp"
        for b in range(n_bands)
    )
    return f"""
    WITH fp AS ({_simhash_planted_sql()}),
    bands AS (
      {band_selects}
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_bits = r.band_bits
       AND l.doc_id < r.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM cand c
    JOIN fp a ON a.doc_id = c.id_a
    JOIN fp b ON b.doc_id = c.id_b
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY c.id_a, c.id_b
    """


@query(
    "dedup_simhash_hamming_pairs",
    oracle=_simhash_hamming_sql(),
    description="C9: SimHash Hamming-radius search WITHOUT all-pairs — "
    "pigeonhole banding (radius 3 -> 4 bands of 15 bits; a pair within "
    "distance 3 must agree on >=1 band) generates candidates via an "
    "equi-self-join, then bit_count(xor) verifies exactly. The same "
    "sub-linear shape as MinHash banding, completing the SimHash ladder "
    "from fingerprint to pairs.",
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    # fingerprint frame fans out (bands + both verify sides): materialize
    fp = materialize(D.simhash(docs, "text", "doc_id"), "simhash_fp")
    return D.simhash_hamming_pairs(
        fp, "doc_id", max_hamming=SIMHASH_MAX_HAMMING
    ).orderBy("id_a", "id_b")


@query(
    "dedup_lsh_quality_eval",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sig AS ({_sig_sql("SELECT * FROM base")}),
    bands AS (
      {_band_keys_sql("sig")}
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    sh0 AS ({_SHINGLES_SQL.format(base="SELECT * FROM base")}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh0 GROUP BY doc_id),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh0 a JOIN sh0 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING (FLOOR((COUNT(*) * 1.0 / (
                (SELECT sz FROM sizes WHERE doc_id = a.doc_id)
              + (SELECT sz FROM sizes WHERE doc_id = b.doc_id) - COUNT(*)))
              * 10000.0 + 0.5 + 0.000001) / 10000.0) >= 0.5
    ),
    tp AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
    SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS n_tp,
           (FLOOR(((SELECT COUNT(*) FROM tp) * 1.0
                   / GREATEST((SELECT COUNT(*) FROM cand), 1))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS precision_,
           (FLOOR(((SELECT COUNT(*) FROM tp) * 1.0
                   / GREATEST((SELECT COUNT(*) FROM truth), 1))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS recall_
    """,
    description="C9 evaluation: LSH banding quality measured against exact "
    "ground truth — candidates vs the true Jaccard>=0.5 pair set gives "
    "(n_candidates, n_true, n_tp, precision, recall): the dashboard that "
    "decides band/row tuning before a 100 TB run. Ground truth uses the "
    "inverted-index join (affordable at eval scale, run on a sample in "
    "production).",
)
def dedup_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    cand = materialize(
        D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b"),
        "lsh_eval_candidates",
    )
    truth = materialize(
        D.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, max_df=None
        ).select("id_a", "id_b"),
        "lsh_eval_truth",
    )
    tp = cand.intersect(truth)
    # three single-row aggregates crossJoined broadcast — no driver-side
    # counts, same pattern as the other scalar-summary queries
    out = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(F.broadcast(truth.agg(F.count(F.lit(1)).alias("n_true"))))
        .crossJoin(F.broadcast(tp.agg(F.count(F.lit(1)).alias("n_tp"))))
    )
    return out.select(
        "n_candidates",
        "n_true",
        "n_tp",
        round4(F.col("n_tp") * 1.0 / F.greatest(F.col("n_candidates"), F.lit(1))).alias(
            "precision_"
        ),
        round4(F.col("n_tp") * 1.0 / F.greatest(F.col("n_true"), F.lit(1))).alias(
            "recall_"
        ),
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sh0 AS ({_SHINGLES_SQL.format(base="SELECT * FROM base")}),
    keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {NGRAM_MAX_DF}
    ),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b,
             (FLOOR((inter / sa.sz) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS contain_a_in_b,
             (FLOOR((inter / sb.sz) * 10000.0 + 0.5 + 0.000001) / 10000.0)
               AS contain_b_in_a,
             (FLOOR((inter / (sa.sz + sb.sz - inter)) * 10000.0 + 0.5
                    + 0.000001) / 10000.0) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT * FROM scored
    WHERE contain_a_in_b >= 0.8 OR contain_b_in_a >= 0.8
    """,
    description="C9: asymmetric containment dedup — C(A→B) = |A∩B|/|A| "
    "catches the subset relationships Jaccard misses (a short doc fully "
    "quoted inside a long one is 1.0 containment but small Jaccard). "
    "Same inverted-index + hot-shingle-cap machinery as the Jaccard "
    "pairs; a pair survives when either direction clears 0.8.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    return D.ngram_containment_pairs(
        docs, "text", "doc_id", threshold=0.8, max_df=NGRAM_MAX_DF
    )


@query(
    "corpus_source_overlap",
    oracle="""
    WITH sg AS (
      SELECT DISTINCT source,
             unnest([array_to_string(w[i+1:i+3], ' ')
                     for i in range(0, greatest(len(w)-2, 1))]) AS shingle
      FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
    ),
    sg2 AS (SELECT source, shingle FROM sg WHERE length(shingle) > 0),
    sizes AS (SELECT source, COUNT(*) AS sz FROM sg2 GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM sg2 a JOIN sg2 b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b,
           CAST(sa.sz AS BIGINT) AS n_a,
           CAST(sb.sz AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           (FLOOR((n_common / (sa.sz + sb.sz - n_common)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS jaccard,
           (FLOOR((n_common / LEAST(sa.sz, sb.sz)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS containment
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    description="Corpus analytics: pairwise shingle overlap between "
    "sources — the cross-source contamination matrix every mixture "
    "decision needs (is source X just a scrape of source Y?). Per-source "
    "distinct shingle sets, then a shingle equi-join; a shingle present "
    "in f sources yields at most f(f-1)/2 pair rows, so with a bounded "
    "source catalog the join is linear in corpus size at any scale. "
    "Containment = overlap over the smaller set.",
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sg = D.shingles(docs, "text", "source", n=3)
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = sg.select(F.col("source").alias("src_a"), "shingle")
    b = sg.select(F.col("source").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    un = F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    return (
        inter.join(F.broadcast(sz_a), "src_a")
        .join(F.broadcast(sz_b), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("sz_a").cast("long").alias("n_a"),
            F.col("sz_b").cast("long").alias("n_b"),
            F.col("n_common").cast("long").alias("n_common"),
            round4(F.col("n_common") / un).alias("jaccard"),
            round4(
                F.col("n_common") / F.least(F.col("sz_a"), F.col("sz_b"))
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "dedup_substring_removed",
    oracle="""
    WITH ch AS (
      SELECT doc_id, u.pos AS pos, u.chunk AS chunk
      FROM (
        SELECT doc_id,
               unnest([{'pos': j,
                        'chunk': array_to_string(w[(j*5)+1:(j*5)+5], ' ')}
                       FOR j IN range(0, CAST(floor(len(w)/5) AS INT))]) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos)
               AS rn,
             COUNT(*) OVER (PARTITION BY chunk) AS n_occ
      FROM ch
    ),
    kept AS (SELECT * FROM ranked WHERE n_occ = 1 OR rn = 1),
    totals AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id),
    kept_agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             array_to_string(list(chunk ORDER BY pos), ' ') AS text_deduped
      FROM kept GROUP BY doc_id
    )
    -- left-join from the full doc set: short docs (no chunks) and
    -- fully-duplicated docs (no kept rows) must surface as 0 / '', not
    -- vanish (mirrors the operator's left-join shape)
    SELECT d.doc_id,
           CAST(COALESCE(t.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(ka.text_deduped, '') AS text_deduped
    FROM documents d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN kept_agg ka USING (doc_id)
    ORDER BY d.doc_id
    """,
    description="C9: exact-substring dedup REWRITE (Lee et al. 2021 §3) — "
    "the action to dedup_substring_spans' detector: every duplicated "
    "5-word span keeps only its corpus-wide first occurrence (min (doc, "
    "pos)); later occurrences anywhere are cut and each doc's text is "
    "rebuilt from surviving chunks. One posexplode, one window on the "
    "span key (same shuffle key as the detector, AQE-split skew), per-doc "
    "rebuild bounded by document length.",
)
def dedup_substring_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_duplicate_spans(docs, "text", "doc_id", 5).orderBy("doc_id")


@query(
    "dedup_savings_summary",
    oracle="""
    WITH d AS (
      SELECT doc_id, md5(coalesce(text, '')) AS digest,
             coalesce(n_chars, 0) AS nc,
             ROW_NUMBER() OVER (PARTITION BY md5(coalesce(text, ''))
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    sizes AS (
      SELECT digest, COUNT(*) AS csize FROM d GROUP BY digest
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d.digest) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removable,
           (FLOOR((SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / COUNT(*))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS pct_removable,
           CAST(SUM(nc) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN rn > 1 THEN nc ELSE 0 END) AS BIGINT)
             AS chars_removable,
           CAST(MAX(s.csize) AS BIGINT) AS largest_cluster
    FROM d JOIN sizes s USING (digest)
    """,
    description="C9/dashboard: what exact dedup would SAVE — doc and "
    "char counts of min-id-survivor removal, duplication rate, and the "
    "largest duplicate cluster, in one pass (window rank over the "
    "digest + one digest-grain aggregate joined back). The corpus-health "
    "row a curation run reports before anyone commits to the heavier "
    "near-dup ladder; at 100 TB both shuffles are on the digest key.",
)
def dedup_savings_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("digest"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("nc"),
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    d = docs.withColumn("rn", F.row_number().over(w))
    sizes = d.groupBy("digest").agg(F.count(F.lit(1)).alias("csize"))
    dup = (F.col("rn") > 1).cast("long")
    return (
        d.join(sizes, "digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("digest").cast("long").alias("n_unique"),
            F.sum(dup).alias("n_removable"),
            round4(F.sum(dup) / F.count(F.lit(1))).alias("pct_removable"),
            F.sum("nc").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("rn") > 1, F.col("nc")).otherwise(0))
            .cast("long")
            .alias("chars_removable"),
            F.max("csize").cast("long").alias("largest_cluster"),
        )
    )


@query(
    "dedup_neardup_savings",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_sql()}),
    nodes AS (SELECT doc_id FROM ({_PLANTED_SQL})),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, root) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.d, w.root FROM walk w JOIN edges e ON e.s = w.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT)
             AS n_removable,
           (FLOOR(((COUNT(*) - COUNT(DISTINCT cluster_id)) / COUNT(*))
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS pct_removable,
           CAST(MAX(csize) AS BIGINT) AS largest_cluster
    FROM clusters
    JOIN (SELECT cluster_id AS cid, COUNT(*) AS csize
          FROM clusters GROUP BY cluster_id) s
      ON clusters.cluster_id = s.cid
    """,
    description="C9/dashboard: the NEAR-dup twin of dedup_savings_summary "
    "— MinHash-LSH candidate pairs over the planted-duplicate corpus, "
    "connected components (large-star/small-star), and the keep-one-"
    "per-cluster savings: docs, clusters, removable count/rate, largest "
    "cluster. Exact savings say what byte-identical dedup buys; this "
    "says what the full near-dup ladder buys on the same corpus. Same "
    "sub-quadratic machinery as the ladder itself (band equi-join + "
    "O(log n)-round CC); the oracle replays it with a recursive CTE.",
)
def dedup_neardup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    planted = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(planted, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    clusters = D.connected_components(
        pairs, planted.select("doc_id"), "doc_id"
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("csize")
    )
    return clusters.join(sizes, "cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        (F.count(F.lit(1)) - F.countDistinct("cluster_id"))
        .cast("long")
        .alias("n_removable"),
        round4(
            (F.count(F.lit(1)) - F.countDistinct("cluster_id"))
            / F.count(F.lit(1))
        ).alias("pct_removable"),
        F.max("csize").cast("long").alias("largest_cluster"),
    )


@query(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents),
    pos AS (
      SELECT doc_id, unnest(range(8, ln + 1)) AS i FROM d
    ),
    cutpos AS (
      SELECT p.doc_id, p.i
      FROM pos p JOIN d ON d.doc_id = p.doc_id
      WHERE ({{h}}) % 64 = 0
    ),
    cuts AS (
      SELECT doc_id, list(i ORDER BY i) AS cuts FROM cutpos GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id, d.text, d.ln,
             COALESCE(c.cuts, []) AS cuts
      FROM d LEFT JOIN cuts c ON c.doc_id = d.doc_id
    ),
    spans AS (
      SELECT doc_id, text,
             CASE WHEN j = 0 THEN 1 ELSE cuts[j] + 1 END AS s,
             CASE WHEN j = len(cuts) THEN ln ELSE cuts[j + 1] END AS e
      FROM (SELECT *, unnest(range(len(cuts) + 1)) AS j FROM base)
    ),
    chunks AS (
      SELECT doc_id, s, e - s + 1 AS length,
             md5(substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT)))
               AS digest
      FROM spans WHERE e >= s
    ),
    owned AS (
      SELECT doc_id, length,
             ROW_NUMBER() OVER (PARTITION BY digest
                                ORDER BY doc_id, s) AS rn
      FROM chunks
    ),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_chunks,
             SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup_chunks,
             SUM(CASE WHEN rn > 1 THEN length ELSE 0 END) AS dup_bytes
      FROM owned GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
           CAST(COALESCE(p.dup_bytes, 0) AS BIGINT) AS dup_bytes
    FROM d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """.format(h=__import__("kafka_clickhouse_ingest_pipeline_spark.functions.hashing",
                            fromlist=["hash60_sql"]).hash60_sql(
        "substr(d.text, CAST(p.i - 7 AS INT), 8)"
    )),
    description="C9/storage dedup: content-defined chunking — a chunk "
    "boundary falls wherever the portable hash of the trailing 8 chars "
    "is 0 mod 64 (~64-char chunks), so an early edit shifts only the "
    "chunks it touches, never every downstream block (the rsync/"
    "backup-dedup property; the storage-layer complement of the "
    "token-level span rewrite). The variant is position-independent — "
    "every boundary test is local, one explode, no sequential rolling "
    "state — so it parallelizes like shingling. Per doc: chunk count, "
    "chunks whose digest already occurred earlier in the corpus "
    "((doc_id, start) first-owner order), and the bytes a chunk store "
    "would save. Every input doc surfaces (left join; zero-chunk docs "
    "report 0s).",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = D.cdc_chunks(docs, "text", "doc_id", window=8, divisor=64)
    w = Window.partitionBy("digest").orderBy("doc_id", "start")
    owned = ch.select(
        "doc_id", "length", F.row_number().over(w).alias("rn")
    )
    per_doc = owned.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dup_chunks"),
        F.sum(F.when(F.col("rn") > 1, F.col("length")).otherwise(0)).alias(
            "dup_bytes"
        ),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("long")
            .alias("n_chunks"),
            F.coalesce(F.col("n_dup_chunks"), F.lit(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.coalesce(F.col("dup_bytes"), F.lit(0))
            .cast("long")
            .alias("dup_bytes"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_cdc_savings_summary",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents),
    pos AS (
      SELECT doc_id, unnest(range(8, ln + 1)) AS i FROM d
    ),
    cutpos AS (
      SELECT p.doc_id, p.i
      FROM pos p JOIN d ON d.doc_id = p.doc_id
      WHERE ({{h}}) % 64 = 0
    ),
    cuts AS (
      SELECT doc_id, list(i ORDER BY i) AS cuts FROM cutpos GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id, d.text, d.ln, COALESCE(c.cuts, []) AS cuts
      FROM d LEFT JOIN cuts c ON c.doc_id = d.doc_id
    ),
    spans AS (
      SELECT doc_id, text,
             CASE WHEN j = 0 THEN 1 ELSE cuts[j] + 1 END AS s,
             CASE WHEN j = len(cuts) THEN ln ELSE cuts[j + 1] END AS e
      FROM (SELECT *, unnest(range(len(cuts) + 1)) AS j FROM base)
    ),
    chunks AS (
      SELECT doc_id, s, e - s + 1 AS length,
             md5(substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT)))
               AS digest
      FROM spans WHERE e >= s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(length) AS BIGINT) AS total_bytes,
           CAST(SUM(length) - SUM(CASE WHEN rn = 1 THEN length ELSE 0 END)
                AS BIGINT) AS dup_bytes,
           (FLOOR(((SUM(length)
                    - SUM(CASE WHEN rn = 1 THEN length ELSE 0 END)) * 1.0
                   / SUM(length)) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS dedup_ratio
    FROM (
      SELECT length, digest,
             ROW_NUMBER() OVER (PARTITION BY digest
                                ORDER BY doc_id, s) AS rn
      FROM chunks
    )
    """.format(h=__import__(
        "kafka_clickhouse_ingest_pipeline_spark.functions.hashing",
        fromlist=["hash60_sql"],
    ).hash60_sql("substr(d.text, CAST(p.i - 7 AS INT), 8)")),
    description="C9/storage dedup dashboard: the 1-row CDC savings "
    "summary a chunk store's capacity planning reads — total chunks, "
    "distinct chunks, total bytes, the bytes duplicate occurrences "
    "would NOT re-store (first-owner accounting), and the resulting "
    "dedup ratio. Same chunking as dedup_cdc_chunks; the rollup is one "
    "more partial aggregate.",
)
def dedup_cdc_savings_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _cdc_savings(docs)


def _cdc_savings(docs: DataFrame) -> DataFrame:
    ch = D.cdc_chunks(docs, "text", "doc_id", window=8, divisor=64)
    # r13 (guide §2.3 aggregate before you shuffle): first-owner bytes via
    # a mergeable min_by(length, (doc_id, start)) per digest instead of a
    # row_number window — the window shape paid Exchange+Sort over EVERY
    # chunk row and then a count_distinct re-aggregation; this shape
    # partial-aggregates map-side and shuffles one row per distinct
    # digest. min_by's (doc_id, start) struct ordering picks exactly the
    # window's rn=1 row (the pair is unique within a digest group), and
    # every rollup value is integer arithmetic until the final division —
    # bit-identical dedup_ratio.
    per_digest = ch.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("length").alias("bytes"),
        F.min_by("length", F.struct("doc_id", "start")).alias("first_len"),
    )
    dup_bytes = F.sum("bytes") - F.sum("first_len")
    return per_digest.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_unique_chunks"),
        F.sum("bytes").cast("long").alias("total_bytes"),
        dup_bytes.cast("long").alias("dup_bytes"),
        round4(dup_bytes * 1.0 / F.sum("bytes")).alias("dedup_ratio"),
    )


@query(
    "dedup_cdc_savings_probe",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents
               WHERE doc_id % 10 = 0),
    pos AS (
      SELECT doc_id, unnest(range(8, ln + 1)) AS i FROM d
    ),
    cutpos AS (
      SELECT p.doc_id, p.i
      FROM pos p JOIN d ON d.doc_id = p.doc_id
      WHERE ({h}) % 64 = 0
    ),
    cuts AS (
      SELECT doc_id, list(i ORDER BY i) AS cuts FROM cutpos GROUP BY doc_id
    ),
    base AS (
      SELECT d.doc_id, d.text, d.ln, COALESCE(c.cuts, []) AS cuts
      FROM d LEFT JOIN cuts c ON c.doc_id = d.doc_id
    ),
    spans AS (
      SELECT doc_id, text,
             CASE WHEN j = 0 THEN 1 ELSE cuts[j] + 1 END AS s,
             CASE WHEN j = len(cuts) THEN ln ELSE cuts[j + 1] END AS e
      FROM (SELECT *, unnest(range(len(cuts) + 1)) AS j FROM base)
    ),
    chunks AS (
      SELECT doc_id, s, e - s + 1 AS length,
             md5(substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT)))
               AS digest
      FROM spans WHERE e >= s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(length) AS BIGINT) AS total_bytes,
           CAST(SUM(length) - SUM(CASE WHEN rn = 1 THEN length ELSE 0 END)
                AS BIGINT) AS dup_bytes,
           (FLOOR(((SUM(length)
                    - SUM(CASE WHEN rn = 1 THEN length ELSE 0 END)) * 1.0
                   / SUM(length)) * 10000.0 + 0.5 + 0.000001) / 10000.0)
             AS dedup_ratio
    FROM (
      SELECT length, digest,
             ROW_NUMBER() OVER (PARTITION BY digest
                                ORDER BY doc_id, s) AS rn
      FROM chunks
    )
    """.format(h=__import__(
        "kafka_clickhouse_ingest_pipeline_spark.functions.hashing",
        fromlist=["hash60_sql"],
    ).hash60_sql("substr(d.text, CAST(p.i - 7 AS INT), 8)")),
    description="C9/storage dedup, HEADLINE representative (VERDICT r6 "
    "#3): the identical CDC chunking + first-owner savings rollup as "
    "dedup_cdc_savings_summary, over the doc_id%10=0 tenth of the "
    "corpus — the per-position boundary test dominates both, so this "
    "exercises the same plan (explode, local hash test, groupBy(digest) "
    "window, 1-row rollup) at a tenth the bench cost. The full-corpus "
    "dashboard stays registered and oracle-checked; only the bench "
    "headline rides the probe.",
)
def dedup_cdc_savings_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    return _cdc_savings(docs)


_AGREE_SQL = " + ".join(
    f"CASE WHEN sa.sig{i:02d} = sb.sig{i:02d} THEN 1 ELSE 0 END"
    for i in range(N_MINHASH)
)


@query(
    "dedup_lsh_s_curve",
    oracle=f"""
    WITH base AS ({_PLANTED_SQL}),
    sig AS MATERIALIZED ({_sig_sql("SELECT * FROM base")}),
    bands AS (
      {_band_keys_sql("sig")}
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key
       AND l.doc_id < r.doc_id
    ),
    sh0 AS MATERIALIZED ({_SHINGLES_SQL.format(base="SELECT * FROM base")}),
    keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {NGRAM_MAX_DF}
    ),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    pool AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    agrees AS (
      SELECT p.id_a, p.id_b, ({_AGREE_SQL}) AS n_agree,
             CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS detected
      FROM pool p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
      LEFT JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b
    )
    SELECT CAST(n_agree AS BIGINT) AS n_agree,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(detected) AS BIGINT) AS n_detected,
           (FLOOR((SUM(detected) * 1.0 / COUNT(*)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS detection_rate,
           (FLOOR((1 - power(1 - power(n_agree / 16.0, 4), 4)) * 10000.0
                  + 0.5 + 0.000001) / 10000.0) AS analytic_rate
    FROM agrees GROUP BY n_agree ORDER BY n_agree
    """,
    description="C9 evaluation: the LSH banding S-curve, measured — for "
    "every co-shingled pair (inverted index with the DF cap), bucket by "
    "MinHash signature agreement (0-16 of 16) and report the fraction "
    "the 4x4 banding actually surfaces next to the textbook expectation "
    "1-(1-s^4)^4. This is the band/row tuning chart: where the "
    "empirical curve departs from the analytic one shows how the FIXED "
    "band layout treats pairs the random-placement model averages over. "
    "Pool and candidates reuse the planted corpus and the exact "
    "operators under evaluation; everything is integer counts plus one "
    "closed-form per bucket.",
)
def dedup_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted(spark, sf_dir)
    sig = materialize(
        D.minhash_signatures(docs, "text", "doc_id"), "scurve_sigs"
    )
    cand = materialize(
        D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b"),
        "scurve_cand",
    )
    pool = materialize(
        D.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.0, max_df=NGRAM_MAX_DF
        ).select("id_a", "id_b"),
        "scurve_pool",
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"sig{i:02d}").alias(f"a{i:02d}") for i in range(N_MINHASH)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"sig{i:02d}").alias(f"b{i:02d}") for i in range(N_MINHASH)],
    )
    n_agree = sum(
        F.when(F.col(f"a{i:02d}") == F.col(f"b{i:02d}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    detected = F.when(F.col("c_a").isNotNull(), 1).otherwise(0)
    agrees = (
        pool.join(sa, "id_a")
        .join(sb, "id_b")
        .join(
            cand.select(
                F.col("id_a").alias("c_a"), F.col("id_b").alias("c_b")
            ),
            (F.col("id_a") == F.col("c_a")) & (F.col("id_b") == F.col("c_b")),
            "left",
        )
        .select(n_agree.alias("n_agree"), detected.alias("detected"))
    )
    analytic = 1 - F.pow(
        1 - F.pow(F.col("n_agree") / 16.0, F.lit(4.0)), F.lit(4.0)
    )
    return (
        agrees.groupBy(F.col("n_agree").cast("long").alias("n_agree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("detected").cast("long").alias("n_detected"),
            round4(F.sum("detected") * 1.0 / F.count(F.lit(1))).alias(
                "detection_rate"
            ),
        )
        .select(
            "n_agree",
            "n_pairs",
            "n_detected",
            "detection_rate",
            round4(analytic).alias("analytic_rate"),
        )
        .orderBy("n_agree")
    )


@query(
    "dedup_suffix_savings_summary",
    oracle=f"""
    WITH k2 AS ({_SUFFIX_KG_SQL}),
    cut AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                 PARTITION BY dig ORDER BY doc_id, pos
               ) AS rn,
               COUNT(*) OVER (PARTITION BY dig) AS n
        FROM k2
      ) WHERE n >= 2 AND rn > 1
    ),
    cov AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM cut CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split(text, ' ')) END)
                  AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
    ),
    cutn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cut FROM cov),
    affected AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_touched
      FROM cov
    )
    SELECT tot.n_docs, tot.n_words, cutn.n_cut, affected.n_docs_touched,
           (FLOOR((cutn.n_cut * 1.0 / tot.n_words)
                  * 10000.0 + 0.5 + 0.000001) / 10000.0) AS cut_frac
    FROM tot CROSS JOIN cutn CROSS JOIN affected
    """,
    description="C9 dashboard: the 1-row suffix-dedup savings summary — "
    "total corpus words, word positions the suffix rewrite cuts (later "
    "occurrences of corpus-repeated 5-grams at any offset), documents "
    "touched, and the cut fraction. The token-budget number a curation "
    "run reads before paying for the rewrite, and the suffix-truth "
    "counterpart of dedup_cdc_savings_summary's byte-level accounting. "
    "Same partial-aggregated kgram machinery as the detector; rollup "
    "adds three 1-row aggregates.",
)
def dedup_suffix_savings_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kg = D.suffix_kgrams(docs, "text", "doc_id", _SUFFIX_K)
    stats = kg.groupBy("dig").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.struct(F.col("doc_id").alias("kid"), F.col("pos").alias("kpos"))
        ).alias("keeper"),
    )
    cut = (
        kg.join(stats.where(F.col("n") >= 2), "dig")
        .where(
            ~(
                (F.col("doc_id") == F.col("keeper.kid"))
                & (F.col("pos") == F.col("keeper.kpos"))
            )
        )
        .select("doc_id", "pos")
    )
    cov = cut.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(_SUFFIX_K - 1))
        ).alias("p"),
    ).distinct()
    wlen = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.col("text"), " ")))
    tot = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(wlen).cast("long").alias("n_words"),
    )
    cutn = cov.agg(F.count(F.lit(1)).cast("long").alias("n_cut"))
    touched = cov.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_touched")
    )
    return (
        tot.crossJoin(F.broadcast(cutn))
        .crossJoin(F.broadcast(touched))
        .select(
            "n_docs",
            "n_words",
            "n_cut",
            "n_docs_touched",
            round4(F.col("n_cut") * 1.0 / F.col("n_words")).alias("cut_frac"),
        )
    )


def _suffix_kg_where_sql(pred: str) -> str:
    """The suffix k-gram CTE body restricted to a doc predicate."""
    return f"""
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           md5(array_to_string(w[pos:pos+{_SUFFIX_K - 1}], ' ')) AS dig
    FROM (
      SELECT doc_id, w, unnest(range(1, len(w) - {_SUFFIX_K} + 2)) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE {pred})
      WHERE len(w) >= {_SUFFIX_K}
    )
"""


@query(
    "dedup_suffix_incremental",
    oracle=f"""
    WITH newkg AS ({_suffix_kg_where_sql("doc_id % 10 = 0")}),
    corpusdig AS (
      SELECT DISTINCT dig FROM ({_suffix_kg_where_sql("doc_id % 10 != 0")})
    ),
    dup AS (
      SELECT doc_id, pos FROM newkg JOIN corpusdig USING (dig)
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM dup
    )
    SELECT doc_id,
           MIN(pos) AS start_pos,
           CAST(MAX(pos) + {_SUFFIX_K - 1} AS BIGINT) AS end_pos,
           CAST(MAX(pos) - MIN(pos) + {_SUFFIX_K} AS BIGINT) AS span_words
    FROM isl GROUP BY doc_id, g
    ORDER BY doc_id, start_pos
    """,
    description="C9: INCREMENTAL suffix dedup — maximal spans in a new "
    "crawl batch (the 10% doc_id%10=0 split) that duplicate the "
    "existing corpus (the 90%) at any offset. O(increment) per batch: "
    "only the increment's k-grams are built and semi-joined against "
    "the corpus digest set (at scale the materialized-once suffix "
    "index); the island merge runs on the increment only. Completes "
    "the incremental family: exact dedup has first-owner-incremental, "
    "IVF has frozen-centroid assign, suffix dedup has this.",
)
def dedup_suffix_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    return D.suffix_spans_against_corpus(
        new, corpus, "text", "doc_id", _SUFFIX_K
    ).orderBy("doc_id", "start_pos")


@query(
    "dedup_suffix_remove_incremental",
    oracle=f"""
    WITH newkg AS ({_suffix_kg_where_sql("doc_id % 10 = 0")}),
    corpusdig AS (
      SELECT DISTINCT dig FROM ({_suffix_kg_where_sql("doc_id % 10 != 0")})
    ),
    cut AS (SELECT doc_id, pos FROM newkg JOIN corpusdig USING (dig)),
    cov AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM cut CROSS JOIN (SELECT unnest(range(0, {_SUFFIX_K})) AS j)
    ),
    words AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS word
      FROM (
        SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id % 10 = 0)
      )
    ),
    kept AS (
      SELECT wd.doc_id, wd.p, wd.word FROM words wd
      WHERE NOT EXISTS (
        SELECT 1 FROM cov
        WHERE cov.doc_id = wd.doc_id AND cov.p = wd.p
      )
    )
    SELECT b.doc_id,
           CAST(COALESCE(t.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(kk.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(kk.txt, '') AS text_deduped
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) b
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id
    ) t USING (doc_id)
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(word, ' ' ORDER BY p) AS txt
      FROM kept GROUP BY doc_id
    ) kk USING (doc_id)
    ORDER BY b.doc_id
    """,
    description="C9: INCREMENTAL suffix-dedup ACTION (completes VERDICT "
    "r6 #5) — a new crawl batch (the 10% doc_id%10=0 split) is REWRITTEN "
    f"against the frozen existing corpus: word positions covered by any "
    f"{_SUFFIX_K}-gram the corpus already contains are cut at any offset "
    "and each new doc is rebuilt from its surviving words; fully-"
    "duplicated docs come back emptied, never dropped. O(increment) per "
    "batch (only the increment's k-grams/words are built; the corpus "
    "side is the materialized-once digest index) and stateless per doc, "
    "so micro-batched and single-batch runs are identical — the "
    "equivalence test pins it.",
)
def dedup_suffix_remove_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    return D.remove_suffix_spans_against_corpus(
        new, corpus, "text", "doc_id", _SUFFIX_K
    ).orderBy("doc_id")
