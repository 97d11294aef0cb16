"""Deduplication operators (tier C, BASELINE.json north star).

The reference pipeline has no dedup (its at-least-once delivery explicitly
*produces* duplicates — SURVEY.md §2 A15); a 100 TB training-data engine
needs the full ladder:

- exact:        hash-groupBy on content digest (one shuffle on the digest)
- MinHash+LSH:  shingle → minhash signature → banded bucket join; only
                bucket-mates are compared, never all pairs
- SimHash:      60-bit fingerprint; near-dups differ in few bits
- n-gram Jaccard: exact set similarity via inverted shingle index —
                the verification stage behind the LSH candidates
- embedding cosine: near-dup in vector space, blocked to avoid O(n²)

Every operator is pure DataFrame API (no UDFs): md5/conv arithmetic stays
inside whole-stage codegen, and the only shuffles are the semantic ones
(groupBy digest / band key / shingle).

Scale notes: at 100 TB the shingle explode is the big intermediate —
`distinct` *within doc* first (done below) caps it at one row per unique
shingle; band-key hotspots (e.g. boilerplate docs) are AQE-skew-split; the
pair join is id<id-triangularized to halve the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    N_MINHASH,
    P,
    hash60,
    minhash_expr,
)


def exact_dedup(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per key group.

    Deterministic replacement for dropDuplicates(), whose survivor choice is
    partition-order-dependent. One shuffle on the key columns.
    """
    return df.groupBy(*keys).agg(F.min(id_col).alias(id_col))


def content_digest(df: DataFrame, text_col: str) -> DataFrame:
    """Append an md5 content digest — the exact-dedup / clustering key."""
    return df.withColumn("digest", F.md5(F.col(text_col)))


def shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Splits on single spaces (the corpus is single-space tokenized; callers
    with raw text should normalize whitespace first). JVM-side higher-order
    functions — no Python in the loop.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    # docs shorter than n words contribute their full text as one shingle
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document MinHash signature: (id, sig00..sig15).

    One explode + one groupBy(id) with 16 min-aggregates; the signature
    width is constant so this is a single shuffle of (id, 16×8 bytes)
    regardless of document size.
    """
    sh = shingles(df, text_col, id_col, n)
    h = hash60(F.col("shingle")) % F.lit(P)
    return sh.groupBy(id_col).agg(
        *[F.min(minhash_expr(h, i)).alias(f"sig{i:02d}") for i in range(N_MINHASH)]
    )


def lsh_candidate_pairs(sig: DataFrame, id_col: str) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a pair.

    Signature matrix is banded (4 bands × 4 rows); each band key is a
    concat of its 4 signature values. Self-join per band key — the only
    pairs ever materialized are bucket-mates, which is the entire point of
    LSH at scale. Output: (id_a, id_b, est_jaccard) with id_a < id_b,
    est_jaccard = fraction of the 16 signature components that agree.

    The signature frame fans out six ways below (4 band branches + both
    sides of the estimate join); without materialization Spark recomputes
    the shingle explode + 16-way min-aggregate per branch (observed: 30
    parquet scans in the plan). localCheckpoint materializes the
    signatures once (persist() also worked but leaves cache entries and
    plans through InMemoryRelation) — at scale this is "write the
    signature table once".
    """
    sig = sig.localCheckpoint(eager=True)
    bands = []
    for b in range(LSH_BANDS):
        cols = [f"sig{b * LSH_ROWS + r:02d}" for r in range(LSH_ROWS)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("_", *cols).alias("band_key"),
            )
        )
    long = bands[0]
    for other in bands[1:]:
        long = long.unionAll(other)

    left = long.alias("l")
    right = long.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sig{i:02d}").alias(f"a{i:02d}") for i in range(N_MINHASH)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sig{i:02d}").alias(f"b{i:02d}") for i in range(N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a{i:02d}") == F.col(f"b{i:02d}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(N_MINHASH), 4).alias("est_jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """60-bit SimHash per document from word-level portable hashes.

    For each bit position, sum ±1 votes across token hashes; bit = 1 when
    the vote is positive. Expressed as 60 conditional sums inside one
    groupBy — wide but fully codegen'd, one shuffle of (id, 60 ints).
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h = hash60(F.col("tok"))
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i:02d}")
            for i in range(bits)
        ]
    )
    fingerprint = sum(
        F.when(F.col(f"v{i:02d}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        for i in range(bits)
    )
    return votes.select(F.col(id_col), fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted shingle index.

    |A∩B| comes from the shingle self-join (only docs sharing ≥1 shingle
    ever pair up — the inverted index prunes the quadratic space); set
    sizes join in afterwards; J = inter / (|A|+|B|-inter).
    """
    # sh fans out three ways (sizes + both join sides). localCheckpoint
    # materializes it once and truncates lineage WITHOUT the
    # InMemoryRelation stats problem that made persist() degrade the
    # self-join plan (measured at sf0.1: plain 7.3s cold / persist 57s /
    # localCheckpoint 2.4s). Trade-off: checkpoint blocks are
    # executor-local and unrecoverable on executor loss — on a real
    # cluster, write the inverted index to storage instead.
    sh = shingles(df, text_col, id_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select("id_a", "id_b", round4(jac).alias("jaccard"))
        .where(round4(jac) >= threshold)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Cosine near-duplicate pairs, blocked to stay sub-quadratic.

    Blocking on `block_col` (a cluster/partition assignment) means the
    cross-pairing happens within blocks only — the standard trick when a
    coarse clustering (here: label; in production: LSH bucket or IVF cell)
    already exists. Dot products run on doubles via JVM higher-order
    functions, sequential order, so results are bit-identical across
    engines.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        vec_d.alias("v"),
        F.sqrt(
            F.aggregate(
                vec_d, F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("norm"),
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        *([F.col(block_col).alias("blk_a")] if block_col else []),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        *([F.col(block_col).alias("blk_b")] if block_col else []),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = (F.col("blk_a") == F.col("blk_b")) & cond
    joined = a.join(b, cond)
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return joined.select(
        "id_a", "id_b", round4(cos).alias("cosine")
    ).where(round4(cos) >= threshold)


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int = 25,
) -> DataFrame:
    """Duplicate-cluster formation: connected components by min-label
    propagation (the step after pair generation — LSH emits *pairs*, but
    curation needs whole duplicate *groups* to keep one representative).

    Pregel-style iteration: every node starts labeled with its own id;
    each round every node takes the min of its label and its neighbors'
    labels; converges in O(component diameter) rounds — near-dup chains
    are shallow, so single digits in practice. Each round is one shuffle
    (edge-label join + min-aggregate); intermediates are localCheckpointed
    so lineage doesn't stack across rounds (at cluster scale: write the
    label table per round, or use GraphFrames' optimized large-star /
    small-star algorithm which converges in O(log n) rounds).

    `pairs` must have columns (id_a, id_b); `nodes` supplies the universe
    (singletons included). Returns (id_col, cluster_id) where cluster_id
    is the component's minimum id — a deterministic representative.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    # Iterate only over nodes that occur in an edge: in a dedup workload
    # the candidate graph is a vanishing fraction of the corpus (everything
    # else is a singleton = its own cluster), so the per-round shuffles
    # touch kilobytes even when `nodes` is the full 100 TB id space.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old_label"), F.coalesce("nbr_min", "old_label")
                ).alias("label"),
                "old_label",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("label") != F.col("old_label")).count()
        labels = new_labels.drop("old_label")
        if changed == 0:
            break
    # Singletons (nodes with no edge) are their own cluster; attach them
    # with a left join instead of having dragged them through every round.
    return nodes.select(F.col(id_col)).join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce("label", F.col(id_col)).alias("cluster_id"),
    )


def doc_chunks(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Non-overlapping k-word chunks per document: (id, chunk).

    The Spark-friendly approximation of exact-substring dedup (Lee et al.
    2021 use suffix arrays; a distributed port fingerprints fixed-width
    chunks instead — trailing words that don't fill a chunk are dropped).
    Unlike :func:`shingles` this keeps duplicates (occurrence counts
    matter) and explodes only ~n_words/k rows per doc, so the shuffle is
    k× smaller than the shingle explode at the same corpus size.
    """
    w = F.split(F.col(text_col), " ")
    m = F.floor(F.size(w) / F.lit(k)).cast("int")
    chunks = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda j: F.concat_ws(" ", F.slice(w, j * k + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(chunks).alias("chunk"))


def duplicated_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Corpus-wide duplicated k-word spans: (chunk, n_occurrences, n_docs).

    One explode + one groupBy(chunk); partial aggregation collapses hot
    spans map-side, and AQE splits any boilerplate-span skew. Spans seen
    in ≥2 distinct documents are the dedup candidates.
    """
    ch = doc_chunks(df, text_col, id_col, k)
    return (
        ch.groupBy("chunk")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
    )
