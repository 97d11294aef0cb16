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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.materialize import materialize
from ..functions.rounding import round4
from ..functions.hashing import (
    BLOOM_BITS,
    BLOOM_K,
    LSH_BANDS,
    LSH_ROWS,
    N_MINHASH,
    P,
    double_hash_pos_from,
    hash60,
    md5_window1,
    md5_window2,
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
    df: DataFrame, text_col: str, id_col: str, n: int = 3, digest: bool = False
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Splits on single spaces (the corpus is single-space tokenized; callers
    with raw text should normalize whitespace first). JVM-side higher-order
    functions — no Python in the loop.

    ``digest=True`` emits the raw 16-byte md5 of each gram instead of
    its text (counts unchanged; md5-128 collisions a non-event).
    MEASURED and left OFF everywhere: at sf0.1 the digest version of
    dedup_ngram_jaccard_pairs shuffled +9% MORE bytes (21.6 MB vs
    19.8 MB) — shuffle files are lz4-compressed and natural-language
    3-grams compress better than incompressible digests. The binary-key
    win is real only for keys that are ALREADY high-entropy (the
    suffix index's md5 hex → unhex halved its shuffle); text keys
    should stay text. Kept as an option for long-gram callers.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    if digest:
        # the empty-gram guard must test the TEXT (an empty doc yields
        # one empty gram), so filter before digesting
        digested = F.transform(
            F.filter(grams, lambda g: F.length(g) > 0),
            lambda g: F.unhex(F.md5(g)),
        )
        return df.select(
            F.col(id_col), F.explode(digested).alias("shingle")
        ).distinct()
    # docs shorter than n words contribute their full text as one shingle
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def shingle_array(df: DataFrame, text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (no explode).

    Same shingle set as :func:`shingles`, kept in-row — the zero-shuffle
    representation the HOF signature path consumes.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) > 0))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document MinHash signature: (id, sig00..sig15), ZERO shuffle.

    Pure projection: shingles stay an in-row array; each signature
    component is an `array_min` over a transformed copy of the hashed
    shingle array. The earlier formulation (explode + groupBy(id) with 16
    min-aggregates) shuffles every (id, shingle) pair; this one touches
    the shuffle system not at all — at 100 TB the signature step becomes
    part of the scan stage, and it runs unchanged on a stream (no
    aggregation state). md5 is computed once per shingle (`hs` is
    materialized per row, then 16 cheap affine-min passes reuse it).

    Rows whose shingle set is empty (empty text) are dropped, matching
    the explode form's semantics.

    Trade-off, measured at sf0.1: HOF lambdas evaluate interpreted (3.4s
    for 5000 docs) vs the codegen'd explode+groupBy's 2.0s — locally the
    shuffle is cheaper than the lambda interpreter. The HOF form still
    wins the architecture: no shuffle I/O at 100 TB corpus scale, and it
    is the only form that runs on a stream. Callers that recompute
    signatures repeatedly should checkpoint/persist the output (every
    batch query here does).
    """
    arr = shingle_array(df, text_col, n)
    hs = F.transform(arr, lambda s: hash60(s) % F.lit(P))
    out = df.select(F.col(id_col), hs.alias("__hs")).where(F.size("__hs") > 0)
    return out.select(
        id_col,
        *[
            F.array_min(
                F.transform("__hs", lambda h: minhash_expr(h, i))
            ).alias(f"sig{i:02d}")
            for i in range(N_MINHASH)
        ],
    )


def lsh_band_table(sig: DataFrame, id_col: str) -> DataFrame:
    """The banded LSH index as a standalone long table — (id, band,
    k0..k{LSH_ROWS-1}), one row per (doc, band). Band key = the LSH_ROWS
    signature longs THEMSELVES (plus the band ordinal), not a concat
    string: joins shuffle 4 longs (32 B) per row instead of a
    ~60-80-char decimal string, with exact equality semantics (no
    hashing, no collisions, no string build/compare in the hot path).
    At 100 TB the band index IS the shuffle, so the key representation
    is the cost. Exposed standalone so a nightly build can persist it
    once (plans/layout.write_bucketed on (band, k0..k{LSH_ROWS-1}))
    and every increment probes the stored table instead of re-banding
    the corpus (ROUND11_NOTES #5 — band writes pay only on cross-run
    reuse)."""
    bands = []
    for b in range(LSH_BANDS):
        cols = [f"sig{b * LSH_ROWS + r:02d}" for r in range(LSH_ROWS)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                *[F.col(c).alias(f"k{j}") for j, c in enumerate(cols)],
            )
        )
    long = bands[0]
    for other in bands[1:]:
        long = long.unionAll(other)
    return long


def lsh_pairs_against_corpus(
    new_sig: DataFrame,
    corpus_band: DataFrame,
    corpus_sig: DataFrame,
    id_col: str,
) -> DataFrame:
    """Incremental MinHash near-dup: LSH pairs between NEW documents and
    a FROZEN corpus index only — (new_id, corpus_id, est_jaccard), the
    O(increment · bucket-probe) counterpart of
    :func:`lsh_candidate_pairs`, completing the frozen-state incremental
    family beside :func:`ngram_jaccard_against_corpus` /
    :func:`suffix_spans_against_corpus` / :func:`embedding_cross_hits`.

    ``corpus_band`` / ``corpus_sig`` are the nightly tables a production
    build persists (at scale: :func:`..plans.layout.write_bucketed` on
    the band key / the id — the bucketed scan then arrives
    pre-partitioned and the corpus side of the probe join needs NO
    exchange). Each new doc's pairs depend only on (its own signature,
    the frozen index), so a streamed increment pairs identically to a
    batched one.

    The probe join hints shuffle_hash on the NEW side: the increment is
    the smaller side (probe-sized hash map of 48-byte band rows,
    streaming the corpus), and one hinted side forces the SHJ — so a
    session-built corpus index (checkpoint-derived, underestimated
    stats) can never auto-broadcast either (CLAUDE.md hint rule)."""
    nband = lsh_band_table(new_sig, id_col)
    keys = ["band"] + [f"k{j}" for j in range(LSH_ROWS)]
    cand = (
        corpus_band.select(F.col(id_col).alias("corpus_id"), *keys)
        .join(
            nband.select(F.col(id_col).alias("new_id"), *keys).hint(
                "shuffle_hash"
            ),
            keys,
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    sa = new_sig.select(
        F.col(id_col).alias("new_id"),
        *[F.col(f"sig{i:02d}").alias(f"a{i:02d}") for i in range(N_MINHASH)],
    )
    sb = corpus_sig.select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(f"sig{i:02d}").alias(f"b{i:02d}") for i in range(N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a{i:02d}") == F.col(f"b{i:02d}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        cand.join(sa.hint("shuffle_hash"), "new_id")
        .join(sb.hint("shuffle_hash"), "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(agree / F.lit(N_MINHASH), 4).alias("est_jaccard"),
        )
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
    signature table once" (materialize mode="storage").
    """
    sig = materialize(sig, "minhash_sigs")
    long = lsh_band_table(sig, id_col)

    left = long.alias("l")
    right = long.alias("r")
    same_band = (F.col("l.band") == F.col("r.band"))
    for j in range(LSH_ROWS):
        same_band = same_band & (F.col(f"l.k{j}") == F.col(f"r.k{j}"))
    # shuffle_hash hints (256x-probe finding, same bug as the shingle
    # self-join): the checkpointed signature table carries the child
    # plan's underestimated stats, so Catalyst auto-broadcast the
    # corpus-sized band table / signature sides. Both self-join sides
    # hash-partition on the band key; the estimate joins on the ids.
    pairs = (
        left.join(
            right.hint("shuffle_hash"),
            same_band & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
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
        pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
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
    # hash pre-projected once per token (r12 perf): referencing the
    # hash60 expression from all `bits` aggregate inputs leaves md5
    # re-derivations the aggregate codegen only partially CSEs —
    # measured -14% on a 2M-token synthetic. Values unchanged.
    hashed = words.select(id_col, hash60(F.col("tok")).alias("__h"))
    h = F.col("__h")
    votes = hashed.groupBy(id_col).agg(
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


def simhash_hamming_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Hamming-radius near-dup pairs over SimHash fingerprints — never
    all-pairs.

    Pigeonhole blocking: the ``bits``-wide fingerprint splits into
    ``max_hamming + 1`` bands; a pair within Hamming distance ≤
    max_hamming differs in at most max_hamming bands, so it MUST agree
    exactly on at least one band. Candidates therefore come from an
    equi-self-join on (band, band_bits) — the same sub-linear shape as
    MinHash banding — and ``bit_count(xor)`` verifies the exact distance
    on candidates only. Output: (id_a, id_b, hamming), ham ≤ max_hamming.
    """
    n_bands = max_hamming + 1
    width = bits // n_bands
    mask = (1 << width) - 1
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(fp_col), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_bits"),
            )
            for b in range(n_bands)
        ]
    )
    bands = fp.select(F.col(id_col), F.explode(bands_arr).alias("bk")).select(
        id_col, "bk.band", "bk.band_bits"
    )
    # shuffle_hash hints here and below (256x-probe finding): corpus-
    # sized sides derived from checkpointed tables or aggregates carry
    # underestimated stats, so Catalyst auto-broadcast them — fatal on a
    # cluster, >1 GB driver collects locally. Hash-partitioning on the
    # join key is the correct plan at every scale; genuinely-small sides
    # keep their explicit F.broadcast().
    cand = (
        bands.alias("l")
        .join(
            bands.hint("shuffle_hash").alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    fa = fp.select(F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp_a"))
    fb = fp.select(F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp_b"))
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.join(fa.hint("shuffle_hash"), "id_a")
        .join(fb.hint("shuffle_hash"), "id_b")
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def _shingle_pair_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    max_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared inverted-index machinery behind the Jaccard and containment
    pair operators: shingle set (hot-shingle DF cap applied BEFORE the
    self-join), one materialization, per-doc sizes, and the (id_a, id_b,
    inter) intersection counts.

    The `sh` frame fans out three ways (sizes + both join sides);
    materialize() writes it once and truncates lineage WITHOUT the
    InMemoryRelation stats problem that made persist() degrade the
    self-join plan (measured at sf0.1: plain 7.3s cold / persist 57s /
    localCheckpoint 2.4s). In the default "local" mode this is a
    localCheckpoint (blocks are executor-local, unrecoverable on executor
    loss); on a real cluster set mode="storage" so the inverted index is
    written to durable storage instead (plans/materialize.py).

    A shingle appearing in f docs produces f^2 join rows, so one
    boilerplate/stopword n-gram is a hot key AQE can split but not
    shrink. `max_df` caps that: shingles with document frequency >
    max_df are dropped from the index BEFORE the self-join (set sizes
    are computed over the filtered universe so the similarity stays
    internally consistent).

    Returns inter = (id_a, id_b, inter, sz_a, sz_b): the per-doc set
    sizes ride the index rows through the self-join instead of joining
    in afterwards. r12 measurement: the old (sizes, inter) contract made
    each consumer re-aggregate the checkpointed index twice (once per
    side) and shuffle the candidate-PAIR table twice more for the two
    shuffle_hash size joins; carrying sz costs one window exchange at
    index-build time plus 8 bytes/row/side through the shingle shuffle,
    and removes all four probe-time exchanges — best-of-4 noop at sf0.1
    1.28 s → 0.74 s on dedup_ngram_jaccard_pairs, identical rows. sz is
    constant per doc, so the pair aggregate reads it with min().
    """
    sh = shingles(df, text_col, id_col, n)
    if max_df is not None:
        # DF cap as a HOT-shingle anti join, not a keep semi/inner join:
        # the kept set is per-DISTINCT-shingle (corpus-sized strings — a
        # hash-map build of it OOMed the round-12 256x pipeline run,
        # where live checkpoint blocks shrink the execution pool), while
        # the hot set is bounded by construction at n_shingle_rows /
        # max_df (each hot shingle needs > max_df occurrences), ~100x
        # smaller — a narrow SHJ build at any scale.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .where(F.col("df_count") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot.hint("shuffle_hash"), "shingle", "left_anti")
    # per-doc set size computed ONCE at build time (sizes are defined
    # over the DF-capped universe, as before) and stored on every index
    # row; the window is partition-local after one doc_id exchange and
    # spills via ExternalAppendOnlyUnsafeRowArray if a doc is enormous
    sh = sh.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    sh = materialize(sh, "ngram_inverted_index")
    a = sh.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "shingle"
    )
    b = sh.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "shingle"
    )
    # merge hint (round-12; was shuffle_hash since the r9 256x probe):
    # the hint must force a shuffle join — in LOCAL materialize mode the
    # checkpointed index is a LogicalRDD with no size stats, so an
    # un-hinted Catalyst auto-broadcast the ENTIRE inverted index
    # (catastrophic on a cluster, no shuffle boundary for AQE to demote)
    # — but the SHJ flavor builds a hash map of the WHOLE (shingle, id)
    # index per task, which is exactly the wide-build OOM the 256x
    # pipeline run hit once stage-1 checkpoint blocks squeezed the
    # execution pool. SortMergeJoin spills by construction; the self-
    # join's two sides still reuse ONE exchange (measured round 11), so
    # merge adds sorts, never a second shuffle.
    inter = (
        a.join(b.hint("merge"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("sz_a").alias("sz_a"),
            F.min("sz_b").alias("sz_b"),
        )
    )
    return inter


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = 100,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted shingle index.

    |A∩B| comes from the shingle self-join (only docs sharing ≥1 shingle
    ever pair up — the inverted index prunes the quadratic space); set
    sizes join in afterwards; J = inter / (|A|+|B|-inter).

    A shingle appearing in f docs produces f² join rows, so one
    boilerplate/stopword n-gram is a hot key AQE can split but not shrink.
    `max_df` caps that: shingles with document frequency > max_df are
    dropped from the index BEFORE the self-join (set sizes are computed
    over the filtered universe so the Jaccard stays internally
    consistent). Recall trade-off: a pair whose entire overlap is
    corpus-common shingles scores 0 — acceptable, since shingles shared
    by >max_df docs carry no near-duplicate signal by definition.
    """
    inter = _shingle_pair_index(df, text_col, id_col, n, max_df)
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    # sizes ride the index rows (see _shingle_pair_index) — no post-hoc
    # size joins, so the candidate-pair table is never re-shuffled
    return (
        inter.select("id_a", "id_b", round4(jac).alias("jaccard"))
        .where(round4(jac) >= threshold)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.4,
) -> DataFrame:
    """Cosine near-duplicate pairs, blocked to stay sub-quadratic.

    By default blocks on the random-hyperplane LSH bucket
    (operators/similarity.lsh_bucket): near-identical vectors agree on
    every hyperplane sign, so they land in the same bucket, and bucket
    cardinality is tuned to the corpus (planes ≈ log2(n/target_bucket)) —
    within-block pairing stays ~O(n·bucket_size) instead of O(n²/k) on a
    constant-cardinality key. Pass `block_col` to block on a precomputed
    assignment (e.g. an IVF cell id) instead. The candidate-pair dot
    product runs as an Arrow-batched pandas_udf that reproduces the
    sequential left-fold order exactly (operators/udfs.seqdot_udf) —
    bit-identical to the JVM higher-order `similarity.dot` and the
    DuckDB list_reduce oracle, but one vectorized numpy pass per batch
    instead of an interpreted ~190-node expression per pair (the
    measured hot spot of the verify stage).
    """
    from .similarity import lsh_bucket

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    blk = F.col(block_col) if block_col else lsh_bucket(vec_d)
    base = emb.select(
        F.col(id_col),
        blk.alias("blk"),
        vec_d.alias("v"),
        F.sqrt(
            F.aggregate(
                vec_d, F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("norm"),
    )
    # The bucketed projection feeds BOTH join sides; without a
    # materialization the interpreted bucket/norm expressions (the most
    # expensive part of the index build) evaluate twice. On a cluster
    # this step is "write the bucket index once" — locally,
    # localCheckpoint (measured ~2x on the pair stage; same rationale as
    # the ngram inverted index).
    base = materialize(base, "cosine_bucket_index")
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("blk").alias("blk_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("blk").alias("blk_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    cond = (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b"))
    # shuffle_hash: the checkpointed bucket index carries the CHILD
    # plan's (under)estimated stats, so Catalyst auto-broadcast the
    # whole corpus-sized b side (found by the 256x probe; same bug as
    # the shingle self-join). Hash-partitioning on the bucket key is
    # the correct plan at every scale.
    joined = a.join(b.hint("shuffle_hash"), cond)
    from .udfs import seqdot_udf

    cos = seqdot_udf(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        joined.select("id_a", "id_b", round4(cos).alias("cosine"))
        # filter on the aliased column, not a re-derivation, so the UDF
        # runs once per candidate pair
        .where(F.col("cosine") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int = 25,
    algorithm: str = "star",
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster formation: connected components (the step after
    pair generation — LSH emits *pairs*, but curation needs whole
    duplicate *groups* to keep one representative).

    Two interchangeable engines behind one signature, identical output:

    - ``algorithm="star"`` (default, the cluster-scale path): alternating
      large-star/small-star rounds (Kiveris et al., "Connected Components
      in MapReduce and Beyond") — converges in O(log n) rounds regardless
      of component diameter, so a pathological chain-shaped component
      can't turn into thousands of shuffles.
    - ``algorithm="minlabel"``: Pregel-style min-label propagation —
      O(component diameter) rounds; near-dup chains are shallow so this
      is fine for dedup graphs, and its per-round plan is simpler.

    `pairs` must have columns (id_a, id_b); `nodes` supplies the universe
    (singletons included). Returns (id_col, cluster_id) where cluster_id
    is the component's minimum id — a deterministic representative.
    ``stats``, if given, receives {"rounds": n} for observability.
    """
    if algorithm == "star":
        return _cc_star(pairs, nodes, id_col, max_iters, stats)
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return _cc_minlabel(pairs, nodes, id_col, max_iters, stats)


def _cc_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star until the edge set is a fixpoint.

    large-star: every node u connects its LARGER neighbors to the minimum
    of its neighborhood (min(N(u) ∪ {u})) — long chains telescope.
    small-star: every node u re-points its smaller neighbors (and itself)
    at that minimum — edges canonicalize into stars. Each phase is one
    groupBy + one join over the edge set, so a round is O(|E|) shuffle
    regardless of graph shape; rounds are O(log n). At fixpoint every
    non-root node holds exactly the edge (node, component_min).

    Per-round materialize() truncates the lineage (cluster mode: set
    materialize mode="storage" to write the edge table per round). Convergence test = (count, hash-sum)
    signature over the canonical directed edges — one tiny agg per round.
    """
    edges = materialize(
        pairs.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias("u"),
            F.least(F.col("id_a"), F.col("id_b")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct(),
        "cc_edges_init",
    )

    def sig(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum((F.xxhash64("u", "v") % F.lit(2**31)).cast("long")),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = sig(edges)
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # large-star over the symmetric view: m(u) = min(N(u) ∪ {u});
        # larger neighbors re-attach to m(u).
        sym = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nm = (
            sym.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least("u", "minv").alias("m"))
        )
        ls = (
            sym.join(nm.hint("shuffle_hash"), "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the to-smaller directed view: u and all its
        # smaller neighbors point at the neighborhood minimum.
        nm2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = materialize(
            ls.join(nm2.hint("shuffle_hash"), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(nm2.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct(),
            "cc_edges_round",
        )
        edges = ss
        cur = sig(edges)
        if cur == prev:
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    labels = edges.groupBy("u").agg(F.min("v").alias("label"))
    return (
        nodes.select(F.col(id_col))
        .join(labels.hint("shuffle_hash").withColumnRenamed("u", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
    )


def _cc_minlabel(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Min-label propagation: O(component-diameter) rounds, one shuffle
    per round (edge-label join + min-aggregate); intermediates are
    materialized so lineage doesn't stack across rounds. Iterates
    only over nodes that occur in an edge: in a dedup workload the
    candidate graph is a vanishing fraction of the corpus (everything
    else is a singleton = its own cluster), so the per-round shuffles
    touch kilobytes even when `nodes` is the full 100 TB id space.
    """
    edges = materialize(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        ),
        "labelprop_edges",
    )
    labels = materialize(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        "labelprop_labels_init",
    )
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        nbr_min = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = materialize(
            labels.withColumnRenamed("label", "old_label")
            .join(nbr_min.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old_label"), F.coalesce("nbr_min", "old_label")
                ).alias("label"),
                "old_label",
            ),
            "labelprop_labels_round",
        )
        changed = new_labels.where(F.col("label") != F.col("old_label")).count()
        labels = new_labels.drop("old_label")
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # Singletons (nodes with no edge) are their own cluster; attach them
    # with a left join instead of having dragged them through every round.
    return nodes.select(F.col(id_col)).join(
        labels.hint("shuffle_hash").withColumnRenamed("node", id_col),
        id_col,
        "left",
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

    r13 shape (guide §2.3 aggregate before you shuffle): the
    countDistinct(doc) form planned TWO full exchanges of the chunk text
    (partial on (chunk, doc), final on chunk — Spark's single-distinct
    rewrite). A doc's chunks live in its own row, so the per-(doc, chunk)
    occurrence count is computed IN-ROW first: sort the row's chunk
    array, take run starts (boundaries), emit one (chunk, cnt) pair per
    distinct chunk — the same sort + run-length discipline as
    repetition_features' top_cnt. The explode then carries one row per
    DISTINCT chunk per doc and the single groupBy(chunk) shuffle
    partial-aggregates map-side: n_occurrences = sum(cnt), n_docs =
    count(*). One exchange instead of two, fewer rows on it, identical
    values. Chunk text stays text on the shuffle (CLAUDE.md: natural-
    text keys compress better than digests, and the output contract is
    the chunk string).
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
    srt_df = df.select(F.col(id_col), F.array_sort(chunks).alias("__srt"))
    srt = F.col("__srt")
    # run starts: position 1 plus every position whose chunk differs from
    # its predecessor (when() keeps element_at(srt, 0) unevaluated under
    # ANSI; sequence() guarded — it DESCENDS when start > stop)
    bnd = F.when(
        F.size(srt) > 0,
        F.filter(
            F.sequence(F.lit(1), F.size(srt)),
            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(srt, i) != F.element_at(srt, i - 1)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    staged = srt_df.select(F.col(id_col), srt, bnd.alias("__bnd"))
    b = F.col("__bnd")
    nb = F.size(b)
    pairs = F.when(
        nb > 0,
        F.transform(
            F.sequence(F.lit(1), nb),
            lambda j: F.struct(
                F.element_at(srt, F.element_at(b, j)).alias("chunk"),
                (
                    F.when(j == nb, F.size(srt) + 1).otherwise(
                        F.element_at(b, j + 1)
                    )
                    - F.element_at(b, j)
                ).alias("cnt"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk:string,cnt:int>>"))
    per_doc = staged.select(F.col(id_col), F.explode(pairs).alias("p"))
    return (
        per_doc.groupBy(F.col("p.chunk").alias("chunk"))
        .agg(
            F.sum("p.cnt").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
    )


def suffix_kgrams(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Sliding k-word windows with positions: (id, pos, dig) — one row
    per word position 1..n_words-k+1, dig = md5 of the k words starting
    there.

    This is the distributed analog of a suffix array's sort keys: sorting
    suffixes and taking adjacent-LCP≥k runs groups exactly the suffixes
    that share their first k words, which is what grouping on the k-word
    prefix digest does with one hash shuffle instead of a global sort.
    The digest is the RAW 16-byte md5 (unhex of the hex form) — at one
    row per word position the digest column IS the shuffle, and binary
    halves its bytes vs the 32-char hex string with identical collision
    behavior (md5's 128 bits make collisions a non-event at any corpus
    size; 64-bit hashes collide in the thousands at 10^12 kgrams). The
    digest never reaches an output schema, so oracles are unaffected.

    Explodes ~n_words rows per doc (k× more than the :func:`doc_chunks`
    grid — the price of catching UNALIGNED duplicates), same row count
    as the shingle explode the Jaccard index already pays.
    """
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k) + 1)
    ).otherwise(F.array().cast("array<int>"))
    kg = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.unhex(F.md5(F.concat_ws(" ", F.slice(w, i, k)))).alias("dig"),
        ),
    )
    return df.select(F.col(id_col), F.explode(kg).alias("s")).select(
        F.col(id_col), F.col("s.pos").alias("pos"), F.col("s.dig").alias("dig")
    )


def suffix_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    distinct_docs: bool = False,
) -> DataFrame:
    """TRUE exact-substring dedup detector (Lee et al. 2022, suffix-array
    formulation): maximal duplicated word spans of length ≥ k at ANY
    offset — (id, start_pos, end_pos, span_words), 1-based inclusive.

    A duplicated span of length L ≥ k appears as L-k+1 consecutive
    duplicated k-gram positions, so: sliding k-grams
    (:func:`suffix_kgrams`, the suffix-prefix index) → mark positions
    whose k-gram repeats corpus-wide (``distinct_docs=True`` demands ≥2
    distinct documents; default counts within-doc repeats too, as Lee et
    al. do) → merge consecutive duplicated positions per doc into
    maximal islands (pos - row_number gaps-and-islands). Catches the
    unaligned duplicates the :func:`doc_chunks` grid misses — a span
    starting mid-chunk shifts every grid cell and matches nothing.

    Scale shape: groupBy(dig) with map-side partial aggregation collapses
    a boilerplate k-gram to one row per input partition BEFORE the
    shuffle (a window-over-dig formulation would instead ship every
    occurrence of the hot key to one task); the join back is
    AQE-skew-splittable; the island window shuffles on doc_id and is
    bounded by document length. No UDF anywhere.
    """
    kg = suffix_kgrams(df, text_col, id_col, k)
    stats = kg.groupBy("dig").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(id_col).alias("mn_id"),
        F.max(id_col).alias("mx_id"),
    )
    cond = (
        (F.col("mn_id") != F.col("mx_id"))
        if distinct_docs
        else (F.col("n_occ") >= 2)
    )
    dup = kg.join(
        stats.where(cond).select("dig").hint("shuffle_hash"), "dig"
    ).select(id_col, "pos")  # stats is per-DISTINCT-kgram: corpus-sized
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    isl = dup.select(
        id_col, "pos", (F.col("pos") - F.row_number().over(wdoc)).alias("g")
    )
    return (
        isl.groupBy(id_col, "g")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_pos"),
            (F.max("pos") - F.min("pos") + F.lit(k))
            .cast("long")
            .alias("span_words"),
        )
        .drop("g")
    )


def remove_suffix_duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Suffix-based exact-substring dedup ACTION (Lee et al. 2022): for
    every k-gram that repeats corpus-wide, only its FIRST occurrence
    (min (doc, pos)) keeps the words it covers; every word position
    covered by a later occurrence is cut, and each document's text is
    rebuilt from the surviving words. The suffix-index counterpart of
    :func:`remove_duplicate_spans` — it cuts duplicated text at ANY
    offset, not just on the chunk grid, because the k-gram index is the
    sliding one (:func:`suffix_kgrams`).

    Scale shape mirrors the detector's: keeper election is a
    partial-aggregated groupBy(dig) (count + min(struct(id, pos)) — a
    boilerplate k-gram collapses map-side, never a window's
    full-exchange), the cut-position join is AQE-skew-splittable, and
    the rebuild's collect_list is bounded by document length. Overlapping
    cut occurrences union through one distinct on (id, position).

    EVERY input doc appears exactly once: fully-duplicated docs come
    back n_kept = 0 / text_deduped = '' (emptied, never dropped — the
    r4 lesson), untouched docs come back verbatim.

    Returns (id, n_words, n_kept, text_deduped).
    """
    kg = suffix_kgrams(df, text_col, id_col, k)
    stats = kg.groupBy("dig").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.struct(F.col(id_col).alias("kid"), F.col("pos").alias("kpos"))
        ).alias("keeper"),
    )
    cut = (
        kg.join(stats.where(F.col("n") >= 2).hint("shuffle_hash"), "dig")
        .where(
            ~(
                (F.col(id_col) == F.col("keeper.kid"))
                & (F.col("pos") == F.col("keeper.kpos"))
            )
        )
        .select(id_col, "pos")
    )
    covered = cut.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("p"),
    ).distinct()
    return _rebuild_minus_covered(df, text_col, id_col, covered)


def _rebuild_minus_covered(
    df: DataFrame, text_col: str, id_col: str, covered: DataFrame
) -> DataFrame:
    """Shared rewrite tail for the span-removal family: drop every word
    position in ``covered`` (id, p — 1-based) and rebuild each document's
    text from the survivors. EVERY input doc returns exactly once
    (fully-cut docs emptied, never dropped — the r4 lesson); the
    collect_list is bounded by document length, never corpus size.

    The final joins are merge-hinted (spillable SortMergeJoin), not
    shuffle_hash: ``rebuilt`` is corpus-sized AND carries the rebuilt
    document text, and the round-11 256x probe showed exactly this shape
    dying in a ShuffledHashJoin hash-map build at default partitions
    (SCALEPROBE.md "Partition-sizing finding" — one 32nd of 1.28M
    scrubbed docs WITH text overflows per-task execution memory). SMJ
    spills by construction at any scale; chaining both joins as SMJ on
    the same key lets the second reuse the first's sort order. The merge
    hint still forces a shuffle join, so the checkpoint-stats
    auto-broadcast bug class stays closed (CLAUDE.md hint rule,
    wide-build-side exception).

    Returns (id, n_words, n_kept, text_deduped).
    """
    words = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("widx", "word"),
    ).select(id_col, (F.col("widx") + 1).cast("long").alias("p"), "word")
    kept = words.join(covered.hint("shuffle_hash"), [id_col, "p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "word"))),
                lambda s: s["word"],
            ),
        ).alias("text_deduped"),
    )
    totals = words.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words")
    )
    return (
        df.select(id_col)
        .join(totals.hint("merge"), id_col, "left")
        .join(rebuilt.hint("merge"), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def remove_boilerplate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_docs: int = 20,
) -> DataFrame:
    """Boilerplate scrub (the C4/CCNet-style template cut): every word
    position covered by a k-gram appearing in MORE THAN ``min_docs``
    DISTINCT documents is cut from EVERY occurrence, and each document is
    rebuilt from its surviving words.

    Contrast :func:`remove_suffix_duplicate_spans` (exact-substring
    DEDUP: cuts every cross-repeated span, keeping one first owner) —
    boilerplate has no first owner worth keeping and genuine near-dup
    content must SURVIVE this pass so the shingle/MinHash passes can
    still find it. A span shared by >min_docs documents is template
    markup by definition (navigation, footers, license headers), which
    is exactly the mass that (a) bloats the shingle inverted index's hot
    keys and (b) pushes unrelated short docs over the Jaccard threshold.
    SCALEPROBE's DF-cap recall eval derived the ordering rule this
    operator exists for: run THIS pass BEFORE shingle near-dup on
    template-heavy corpora, and the capped Jaccard index sees
    content-only overlap again (measured by the probe's cleaned-corpus
    recall row).

    Scale shape: the hot-gram election is a partial-aggregated
    groupBy(digest) over the sliding k-gram index (~n_words rows/doc,
    the same explode the suffix family pays; a corpus-wide template
    collapses map-side before the shuffle); the hot set is tiny by
    construction (few grams clear a corpus-fraction DF bar) so the
    cut-position join is a near-no-op for clean docs; the rebuild is
    document-bounded. No UDF anywhere.

    Returns (id, n_words, n_kept, text_deduped); every input doc exactly
    once, clean docs verbatim.
    """
    return scrub_against_frozen(
        df, frozen_hot_kgrams(df, text_col, id_col, k, min_docs),
        text_col, id_col, k,
    )


def frozen_hot_kgrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_docs: int = 20,
) -> DataFrame:
    """The hot-template gram set :func:`remove_boilerplate_spans` elects,
    as a standalone (dig) table — build once on the nightly corpus,
    scrub every increment against it via :func:`scrub_against_frozen`
    (the frozen-state discipline of ivf_assign / logreg_score_docs /
    suffix_spans_against_corpus). Partial-aggregated groupBy over the
    sliding k-gram index; the result is tiny by construction (few grams
    clear a corpus-fraction DF bar)."""
    kg = suffix_kgrams(df, text_col, id_col, k)
    return (
        kg.groupBy("dig")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") > min_docs)
        .select("dig")
    )


def scrub_against_frozen(
    df: DataFrame,
    hot: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Scrub ``df`` with a FROZEN hot-gram set (dig): every word position
    covered by a k-gram in ``hot`` is cut and each doc rebuilt. The
    incremental path — increments don't re-elect templates, they cut
    what the nightly election already flagged, so a streamed increment
    scrubs identically to its batch twin (per-doc pure given ``hot``).
    Returns (id, n_words, n_kept, text_deduped), every input doc once."""
    kg = suffix_kgrams(df, text_col, id_col, k)
    cut = kg.join(hot.hint("shuffle_hash"), "dig").select(id_col, "pos")
    covered = cut.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("p"),
    ).distinct()
    return _rebuild_minus_covered(df, text_col, id_col, covered)


def bloom_gram_sketch(grams: DataFrame, gram_col: str = "gram") -> DataFrame:
    """Collapse a gram set into ONE row holding its Bloom sketch as a
    word_idx -> 32-bit-word map (<= BLOOM_BITS/32 = 2048 entries, 8 KiB).

    The scale-safe decontamination state (VERDICT r10 #1): the exact path
    broadcasts every distinct benchmark gram — a side that grows with the
    eval corpus — while this sketch is O(m) REGARDLESS of benchmark size,
    so broadcasting it is sanctioned-bounded under the CLAUDE.md rule no
    matter how the benchmark scales. BLOOM_K positions per gram via
    Kirsch-Mitzenmacher double hashing from one md5
    (functions/hashing.py), arithmetic identical in DuckDB so probes stay
    oracle-checkable. False-positive direction: the sketch can only
    OVER-flag (extra docs dropped as contaminated), never leak a true
    benchmark gram through — the safe direction for decontamination.
    """
    # md5 once per gram (r12 perf): windows pre-projected so the explode
    # does not re-inline 2*BLOOM_K md5s into the Generate (see
    # functions/hashing.double_hash_pos perf note). Bit-identical.
    m = F.md5(F.col(gram_col))
    hh = grams.select(
        md5_window1(m).alias("_h1"), md5_window2(m).alias("_h2")
    )
    pos = F.explode(
        F.array(
            *[
                double_hash_pos_from(
                    F.col("_h1"), F.col("_h2"), j, BLOOM_BITS
                )
                for j in range(BLOOM_K)
            ]
        )
    ).alias("pos")
    words = (
        hh.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("bloom_words")
    )


def bloom_dense_words(sketch_row: DataFrame) -> DataFrame:
    """Densify the 1-row word_idx->word map sketch into a 1-row ARRAY of
    BLOOM_BITS/32 words (absent => 0). element_at on a MapType is a
    LINEAR scan of the entries (r12 measurement: probing the 2048-entry
    map per gram cost more than the shuffle it replaced in the eval
    query), while on an ArrayType it is O(1) and codegen'd. The 16 KiB
    dense row broadcasts exactly like the sparse one; the 2048 map
    lookups are paid once at build time."""
    return sketch_row.select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(BLOOM_BITS // 32 - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("bloom_words"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom_arr")
    )


def bloom_all_set(h1, h2, words_arr):
    """All-BLOOM_K-positions-set test as BLOOM_K codegen'd scalar array
    lookups AND-ed together — no position array, no forall/transform
    (HOF lambdas evaluate interpreted; an r12 probe of the HOF form
    measured 2x slower than the codegen'd row form it was meant to
    replace). Out-of-set word => 0 => bit test fails, identical to the
    word-IS-NOT-NULL semantics of the row form."""
    hit = F.lit(True)
    for j in range(BLOOM_K):
        pos = double_hash_pos_from(h1, h2, j, BLOOM_BITS)
        word = F.element_at(words_arr, (F.shiftright(pos, 5) + 1).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 32).cast("int")
        )
        hit = hit & (word.bitwiseAND(mask) != 0)
    return hit


def bloom_contaminated_ids(
    grams: DataFrame,
    sketch_row: DataFrame,
    id_col: str = "doc_id",
    gram_col: str = "gram",
) -> DataFrame:
    """Distinct ids in ``grams`` (id, gram) with >= 1 gram fully present in
    the sketch (all BLOOM_K positions set) — the MAP-SIDE decontamination
    probe. The 1-row sketch rides in as a broadcast nested-loop join and
    the hit test runs inside the scan via higher-order functions (forall
    over the position array probing the word map), so the ONLY shuffle in
    the stage is the final distinct over contaminated ids — at 100 TB the
    probe cost is a pure map pass over the gram stream. Compare
    decontaminate_bloom_eval (queries/curation.py), which materializes the
    per-gram verdict for FP accounting; this operator is the hot path the
    composed pipeline runs nightly. No false negatives by construction.
    """
    # r12 probe-kernel rewrite, measured (tools/perf_probe + synthetic
    # A/B): md5 once per gram via pre-projected hash windows (the old
    # position array inlined 2*BLOOM_K md5s — see
    # functions/hashing.double_hash_pos perf note), the sparse word map
    # densified ONCE to an O(1)-indexable array, and the all-K test run
    # as codegen'd scalar lookups instead of an interpreted
    # forall/transform HOF over a linear-scanned map. Same verdicts, same
    # plan class: 1-row broadcast BNLJ, zero shuffled joins, the final
    # distinct is still the stage's only exchange (pin test
    # test_bloom_probe_bounded_broadcast_and_no_false_negatives).
    m = F.md5(F.col(gram_col))
    hit = bloom_all_set(F.col("_h1"), F.col("_h2"), F.col("bloom_arr"))
    return (
        grams.withColumn("_h1", md5_window1(m))
        .withColumn("_h2", md5_window2(m))
        .crossJoin(F.broadcast(bloom_dense_words(sketch_row)))
        .where(hit)
        .select(id_col)
        .distinct()
    )


def ngram_jaccard_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = 100,
) -> DataFrame:
    """Incremental near-dup: Jaccard pairs between NEW documents and the
    EXISTING corpus only — (new_id, corpus_id, jaccard), the
    O(increment · index-probe) counterpart of :func:`ngram_jaccard_pairs`
    (completing the incremental family beside
    :func:`suffix_spans_against_corpus` and :func:`embedding_cross_hits`).

    The DF cap is FROZEN on the corpus side: shingles with corpus
    document frequency > ``max_df`` are dropped from the index AND from
    the increment's shingle sets (sizes computed over the filtered
    universe on both sides, keeping the Jaccard internally consistent
    with the nightly index's own statistics — an increment shingle the
    corpus never saw is kept). Each new doc's verdict depends only on
    (its own text, the frozen index), so a streamed increment pairs
    identically to a batched one. At scale the capped corpus index is
    the materialized-once nightly table (plans/materialize seam)."""
    csh = shingles(corpus, text_col, id_col, n)
    cdf = csh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
    if max_df is not None:
        hot_df = cdf.where(F.col("df_count") > max_df).select("shingle")
        csh = csh.join(hot_df.hint("shuffle_hash"), "shingle", "left_anti")
    csh = materialize(csh, "ngram_frozen_index")
    nsh = shingles(new_docs, text_col, id_col, n)
    if max_df is not None:
        nsh = nsh.join(hot_df.hint("shuffle_hash"), "shingle", "left_anti")
    nsh = materialize(nsh, "ngram_increment_shingles")
    n_sz = nsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_n"))
    c_sz = csh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_c"))
    # hint the INCREMENT side (round-12): the forced SHJ still shields
    # the checkpointed corpus index from auto-broadcast, but the hash
    # map now holds increment shingles (probe-sized), streaming the
    # corpus — the serving shape at any corpus scale. Was: build on the
    # corpus index, the wide-build OOM class.
    inter = (
        csh.select(F.col(id_col).alias("corpus_id"), "shingle")
        .join(
            nsh.select(F.col(id_col).alias("new_id"), "shingle").hint(
                "shuffle_hash"
            ),
            "shingle",
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_n") + F.col("sz_c") - F.col("inter"))
    return (
        inter.join(
            n_sz.select(F.col(id_col).alias("new_id"), "sz_n")
            .hint("shuffle_hash"),
            "new_id",
        )
        .join(
            c_sz.select(F.col(id_col).alias("corpus_id"), "sz_c")
            .hint("shuffle_hash"),
            "corpus_id",
        )
        .select("new_id", "corpus_id", round4(jac).alias("jaccard"))
        .where(round4(jac) >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 100,
) -> DataFrame:
    """Asymmetric containment dedup: C(A→B) = |A∩B| / |A|.

    Jaccard misses subset relationships — a short doc fully quoted inside
    a long one scores |A|/|B| (small) on Jaccard but 1.0 on containment.
    Same inverted-index machinery as :func:`ngram_jaccard_pairs` (shared
    hot-shingle DF cap, same scale shape); the pair survives when EITHER
    direction's containment clears the threshold. Output keeps both
    directions plus the Jaccard for triage.
    """
    inter = _shingle_pair_index(df, text_col, id_col, n, max_df)
    c_ab = round4(F.col("inter") / F.col("sz_a"))
    c_ba = round4(F.col("inter") / F.col("sz_b"))
    jac = round4(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            c_ab.alias("contain_a_in_b"),
            c_ba.alias("contain_b_in_a"),
            jac.alias("jaccard"),
        )
        .where(
            (F.col("contain_a_in_b") >= threshold)
            | (F.col("contain_b_in_a") >= threshold)
        )
    )


def remove_duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact-substring dedup ACTION (Lee et al. 2021 §3): every duplicated
    k-word span keeps only its corpus-wide FIRST occurrence (min (doc,
    pos)); later occurrences — in other docs or later in the same doc —
    are cut, and each document's text is rebuilt from its surviving
    chunks. `duplicated_spans` is the detector; this is the rewrite.

    Scale shape: one posexplode (~n_words/k rows), one window over the
    span key (shuffle on `chunk`, AQE-split for boilerplate skew — the
    same key the detector aggregates on), one per-doc rebuild whose
    collect_list is bounded by document length, never corpus size.
    Trailing words that don't fill a chunk are dropped by the chunking,
    as in :func:`doc_chunks`.

    EVERY input doc appears in the output exactly once: docs with fewer
    than k words (zero chunks) and docs whose every chunk is a later
    duplicate occurrence come back as n_chunks/n_kept = 0 and
    text_deduped = '' — a caller rebuilding the corpus from this output
    must EMPTY those docs, not delete them (a dropped row is
    indistinguishable from "never existed" downstream).

    Returns (id, n_chunks, n_kept, text_deduped).
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
    ch = df.select(F.col(id_col), F.posexplode(chunks).alias("pos", "chunk"))
    wspan = Window.partitionBy("chunk").orderBy(F.col(id_col), F.col("pos"))
    wcnt = Window.partitionBy("chunk")
    ranked = ch.select(
        id_col,
        "pos",
        "chunk",
        F.row_number().over(wspan).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n_occ"),
    )
    kept = ranked.where((F.col("n_occ") == 1) | (F.col("rn") == 1))
    rebuilt = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
            lambda s: s["chunk"],
        ),
    )
    totals = ch.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        rebuilt.alias("text_deduped"),
    )
    # Left-join from the FULL doc set: an inner join here silently deleted
    # short docs (no chunks) and fully-duplicated docs (no kept rows).
    # merge, not shuffle_hash: kept_agg is corpus-sized WITH the rebuilt
    # text — the SHJ hash-map OOM shape from the 256x probe (see
    # _rebuild_minus_covered); both joins SMJ so the second reuses the
    # first's sort order.
    return (
        df.select(id_col)
        .join(totals.hint("merge"), id_col, "left")
        .join(kept_agg.hint("merge"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("long")
            .alias("n_chunks"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (the rsync/storage-dedup technique,
    position-independent variant): a chunk boundary falls AFTER position
    i wherever the portable hash of the trailing ``window`` characters
    is 0 mod ``divisor`` — so an insertion early in a document shifts
    only the chunks it touches, unlike fixed-size blocks where one byte
    shifts every subsequent block (the property that makes CDC the
    storage-layer complement of the token-level span dedup in
    :func:`remove_duplicate_spans`). Boundaries depend only on local
    content, so this variant is embarrassingly parallel: every position
    is tested independently (one explode, ~n_chars rows), no sequential
    rolling state — the FastCDC-style gear loop trades that parallelism
    for speed constants a vectorized engine doesn't need.

    Expected chunk length ~``divisor`` chars; docs shorter than
    ``window`` or with no boundary form a single chunk. Returns one row
    per chunk: (id, chunk_idx, start, length, digest) with 1-based
    ``start``; digest is the portable md5 of the chunk text.
    """
    ln = F.length(F.col(text_col))
    from ..functions.hashing import hash60

    # r13 (guide §2.4 remove shuffles outright): the boundary test is a
    # pure per-row computation — every position's verdict depends only on
    # the row's own text — so it runs as an array `filter` HOF instead of
    # the former explode(~n_chars rows, each materializing the full text
    # column) → groupBy(id) collect_list shuffle → shuffle_hash join back
    # onto the docs. Same per-position hash60 arithmetic, same ascending
    # cut order (sequence ascends; filter preserves order ==
    # sort_array(collect_list)), zero exchanges until the consumer's own
    # aggregation. A doc's boundary scan is in-row work bounded by doc
    # length, not corpus size. NB sequence(start, stop) DESCENDS when
    # start > stop, hence the explicit ln >= window guard.
    cut_positions = F.when(
        ln >= window,
        F.filter(
            F.sequence(F.lit(window), ln),
            lambda i: hash60(
                F.substring(F.col(text_col), i - window + 1, window)
            )
            % divisor
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(
        id_col, text_col, ln.alias("ln"), cut_positions.alias("cuts")
    )
    cuts_arr = F.coalesce(F.col("cuts"), F.array().cast("array<int>"))
    starts = F.concat(
        F.array(F.lit(1)), F.transform(cuts_arr, lambda c: c + 1)
    )
    ends = F.concat(cuts_arr, F.array(F.col("ln")))
    spans = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda p: p["e"] >= p["s"],  # drops the empty tail when ln is a cut
    )
    return (
        base.select(id_col, text_col, F.posexplode(spans).alias("chunk_idx", "p"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("p.s").cast("long").alias("start"),
            (F.col("p.e") - F.col("p.s") + 1).cast("long").alias("length"),
            F.md5(
                F.substring(
                    F.col(text_col), F.col("p.s"), F.col("p.e") - F.col("p.s") + 1
                )
            ).alias("digest"),
        )
    )


def suffix_spans_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Incremental suffix dedup: maximal spans in NEW documents that
    duplicate the EXISTING corpus at any offset — (id, start_pos,
    end_pos, span_words).

    The O(increment) counterpart of :func:`suffix_duplicated_spans`,
    completing the incremental family (exact dedup has
    first-owner-incremental, IVF has frozen-centroid assign): per crawl
    batch, only the increment's k-grams are built and semi-joined
    against the corpus digest set — the corpus side is a distinct
    digest projection that at scale is the materialized-once suffix
    index (plans/materialize seam), so a new batch costs
    O(new_kgrams + index probe), never a corpus rescan per batch. The
    island merge runs on the increment only.
    """
    new_kg = suffix_kgrams(new_docs, text_col, id_col, k)
    corpus_digs = suffix_kgrams(corpus, text_col, id_col, k).select(
        "dig"
    ).distinct()
    dup = new_kg.join(
        corpus_digs.hint("shuffle_hash"), "dig", "left_semi"
    ).select(id_col, "pos")  # corpus_digs: per-distinct-kgram, corpus-sized
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    isl = dup.select(
        id_col, "pos", (F.col("pos") - F.row_number().over(wdoc)).alias("g")
    )
    return (
        isl.groupBy(id_col, "g")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_pos"),
            (F.max("pos") - F.min("pos") + F.lit(k))
            .cast("long")
            .alias("span_words"),
        )
        .drop("g")
    )


def remove_suffix_spans_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Incremental suffix-dedup ACTION (VERDICT r6 #5): rewrite a NEW
    batch against a FROZEN corpus — every word position of a new doc
    covered by a k-gram the corpus already contains is cut (the corpus
    occurrence is by definition the earlier one, so it always keeps),
    and each new doc is rebuilt from its surviving words. The removal
    counterpart of :func:`suffix_spans_against_corpus`, same frozen-
    state pattern as similarity.ivf_assign.

    O(increment): only the increment's k-grams and words are built; the
    corpus side is the distinct-digest projection that at scale is the
    materialized-once suffix index. Stateless per new document (cuts
    come ONLY from the corpus, never from batch-mates) — which is
    exactly what makes it streamable: micro-batched and single-batch
    runs produce identical rewrites (pinned in
    tests/test_streaming.py::test_suffix_remove_incremental_stream_equals_batch).
    Note the semantic difference from the full-corpus
    :func:`remove_suffix_duplicate_spans`: duplicates BETWEEN two new
    docs in the same increment survive until they become corpus members
    — the price every frozen-index incremental path pays.

    Every new doc appears exactly once: fully-duplicated docs come back
    n_kept = 0 / text_deduped = '' (emptied, never dropped). Returns
    (id, n_words, n_kept, text_deduped).
    """
    new_kg = suffix_kgrams(new_docs, text_col, id_col, k)
    corpus_digs = (
        suffix_kgrams(corpus, text_col, id_col, k).select("dig").distinct()
    )
    cut = new_kg.join(
        corpus_digs.hint("shuffle_hash"), "dig", "left_semi"
    ).select(id_col, "pos")
    covered = cut.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("p"),
    ).distinct()
    words = new_docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("widx", "word"),
    ).select(id_col, (F.col("widx") + 1).cast("long").alias("p"), "word")
    kept = words.join(covered.hint("shuffle_hash"), [id_col, "p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "word"))),
                lambda s: s["word"],
            ),
        ).alias("text_deduped"),
    )
    totals = words.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words")
    )
    # merge, not shuffle_hash: same wide-build-side rule as
    # _rebuild_minus_covered — rebuilt carries the rebuilt text (here
    # increment-sized, but the increment is unbounded too).
    return (
        new_docs.select(id_col)
        .join(totals.hint("merge"), id_col, "left")
        .join(rebuilt.hint("merge"), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def embedding_cross_hits(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.2,
) -> DataFrame:
    """Semantic decontamination: flag corpus vectors within cosine
    ``threshold`` of ANY probe vector — (id, n_probe_hits,
    max_probe_cosine).

    The embedding-space complement of the 8-gram + Bloom text
    decontamination (queries/curation.decontaminate_*): n-gram overlap
    misses paraphrases of an eval item; embedding cosine catches them.
    Same LSH-bucket blocking as :func:`embedding_near_dup_pairs` — both
    sides bucket with the shared random-hyperplane planes, the
    candidate join is bucket-equi (never all-pairs), and the cosine
    kernel is the fold-order-exact seqdot_udf. The corpus-side bucket
    index materializes once (at scale: the stored index the probe set —
    tiny by comparison — is shipped against per eval release).

    Asymmetric by design: output rows are CORPUS ids only; probes are
    never flagged. Blocked recall mirrors the near-dup operator's: a
    true hit in a different bucket is missed — acceptable for the same
    reason there (near-identical vectors agree on every plane sign),
    and the text-side decontamination pass backstops it.
    """
    from .similarity import lsh_bucket
    from .udfs import seqdot_udf

    def _indexed(df: DataFrame, tag: str) -> DataFrame:
        vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(f"id_{tag}"),
            lsh_bucket(vec_d).alias(f"blk_{tag}"),
            vec_d.alias(f"v_{tag}"),
            F.sqrt(
                F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias(f"n_{tag}"),
        )

    c = materialize(_indexed(corpus, "c"), "decontam_corpus_index")
    p = _indexed(probes, "p")
    joined = c.join(F.broadcast(p), F.col("blk_c") == F.col("blk_p"))
    cos = seqdot_udf(F.col("v_c"), F.col("v_p")) / (
        F.col("n_c") * F.col("n_p")
    )
    hits = joined.select(
        F.col("id_c").alias(id_col), round4(cos).alias("cosine")
    ).where(F.col("cosine") >= threshold)
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_hits"),
        F.max("cosine").alias("max_probe_cosine"),
    )


def keeper_election(
    cc: DataFrame,
    features: DataFrame,
    id_col: str,
    rank_cols: list[str],
    cluster_col: str = "cluster_id",
    min_members: int = 2,
) -> DataFrame:
    """Quality-ranked keeper re-election over duplicate clusters.

    :func:`connected_components` (and the incumbent rebuild policy)
    keep a cluster representative by ARRIVAL order — min id / corpus
    seniority — which is the right serving-stability rule but a
    permanent first-crawl bias: the kept copy is whatever was crawled
    first, not the best one (SCALE.md §8). This is the explicit
    re-election pass those policies defer to: rank every cluster's
    members by content QUALITY (``rank_cols`` descending, ties by
    ascending id — a total order) and report, per multi-member
    cluster, the quality-elected keeper next to the min-id default.

    `cc` is (id_col, cluster_col) from connected_components — a
    checkpoint-derived, data-scaling, NARROW frame, so its join with
    the (projected, equally narrow) feature frame carries the
    CLAUDE.md shuffle_hash hint; election itself is one window over
    the cluster key. Two narrow shuffles total, nothing corpus-sized
    ever builds a broadcast. Run on the rebuild's own schedule, never
    as a rebuild side effect — re-electing keepers un-serves docs, so
    it is priced and scheduled like a rebuild, not an increment.

    Returns (cluster_col, n_members, keeper_id, keeper_changed,
    keeper_<rank_cols[0]>, default_<rank_cols[0]>) for clusters with
    >= ``min_members`` members (default 2 — the report shape; pass 1
    to elect a keeper for EVERY cluster, the corpus-rebuild shape);
    ``keeper_changed`` = 1 where election disagrees with the min-id
    default (cluster_col IS the min member id).
    """
    feats = features.select(F.col(id_col), *[F.col(c) for c in rank_cols])
    j = cc.hint("shuffle_hash").join(feats, id_col)
    w = Window.partitionBy(cluster_col)
    order = [F.col(c).desc() for c in rank_cols] + [F.col(id_col).asc()]
    top = w.orderBy(*order)
    lead = rank_cols[0]
    ranked = j.select(
        F.col(cluster_col),
        F.col(id_col),
        F.col(lead),
        F.row_number().over(top).alias("_rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
        F.max(
            F.when(F.col(id_col) == F.col(cluster_col), F.col(lead))
        ).over(w).alias(f"default_{lead}"),
    )
    return (
        ranked.where((F.col("_rn") == 1) & (F.col("n_members") >= min_members))
        .select(
            cluster_col,
            "n_members",
            F.col(id_col).alias("keeper_id"),
            (F.col(id_col) != F.col(cluster_col)).cast("int").alias(
                "keeper_changed"
            ),
            F.col(lead).alias(f"keeper_{lead}"),
            f"default_{lead}",
        )
    )
