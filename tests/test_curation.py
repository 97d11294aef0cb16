"""Repetition filters, sequence packing, and full-outer join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import packing as PK
from kafka_clickhouse_ingest_pipeline_spark.operators import text as T


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.repetition_features(df, "text", "doc_id")
    return {r.doc_id: r for r in out.collect()}


def test_repetition_features_hand_checked(spark):
    got = _rep(
        spark,
        [
            (1, "a b c d"),  # all unique
            (2, "a a a a"),  # one word repeated
            (3, "a b a b"),  # unique bigrams repeat as pairs
            (4, ""),  # empty → all zeros
            (5, "solo"),  # single word → no bigrams
        ],
    )
    r1 = got[1]
    assert (r1.n_words, r1.n_distinct_words) == (4, 4)
    assert r1.dup_word_frac == 0.0
    assert r1.top_word_frac == 0.25
    assert r1.dup_bigram_frac == 0.0
    assert r1.passes_repetition_gate == 0  # top_word_frac 0.25 > 0.20

    r2 = got[2]
    assert r2.dup_word_frac == 0.75
    assert r2.top_word_frac == 1.0
    assert r2.dup_bigram_frac == 0.6667  # 3 bigrams, 1 distinct (round4)
    assert r2.passes_repetition_gate == 0

    r3 = got[3]
    assert r3.dup_word_frac == 0.5
    # bigrams: "a b","b a","a b" → 3 total, 2 distinct (round4)
    assert r3.dup_bigram_frac == 0.3333

    r4 = got[4]
    assert (r4.n_words, r4.dup_word_frac, r4.top_word_frac) == (0, 0.0, 0.0)

    r5 = got[5]
    assert (r5.n_words, r5.dup_bigram_frac) == (1, 0.0)


def test_repetition_gate_passes_clean_text(spark):
    clean = " ".join(f"w{i}" for i in range(100))
    got = _rep(spark, [(1, clean)])
    assert got[1].passes_repetition_gate == 1


def test_pack_sequential_invariants(spark):
    rows = [(i, "s%d" % (i % 2), " ".join(["t"] * n)) for i, n in enumerate(
        [100, 900, 500, 700, 800, 50, 2100, 10, 300, 600]
    )]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    packed = PK.pack_sequential(
        df,
        tokens_col=T.token_count(F.col("text")),
        order_col="doc_id",
        group_col="source",
        budget=1000,
    ).collect()

    by_group: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r.source, r.doc_id)):
        by_group.setdefault(r.source, []).append(r)

    for rs in by_group.values():
        # bin ids start at 0 and never decrease along the order column
        assert rs[0].bin_id == 0 and rs[0].bin_offset == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur.bin_id >= prev.bin_id
            # start offset = previous start + previous tokens (mod budget walk)
            assert cur.bin_id * 1000 + cur.bin_offset == (
                prev.bin_id * 1000 + prev.bin_offset + prev.n_tokens
            )
        # a doc belongs to the bin its start offset falls in
        for r in rs:
            assert 0 <= r.bin_offset < 1000

    # oversized doc (2100 tokens) still lands in exactly one bin
    big = [r for r in packed if r.n_tokens == 2100]
    assert len(big) == 1


def test_full_outer_join_fills_both_directions(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k long, a long")
    right = spark.createDataFrame([(2, 200), (3, 300)], "k long, b long")
    out = {
        r.k: (r.a, r.b)
        for r in left.join(right, "k", "full_outer").collect()
    }
    assert out == {1: (10, None), 2: (20, 200), 3: (None, 300)}


def test_doc_chunks_and_duplicated_spans(spark):
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    rows = [
        (1, "a b c d e f g h i j k"),  # 2 full chunks of 5, 1 word dropped
        (2, "a b c d e x y z w v"),  # shares chunk "a b c d e" with doc 1
        (3, "short text"),  # < 5 words → no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = D.doc_chunks(df, "text", "doc_id", 5).collect()
    by_doc: dict[int, list[str]] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r.chunk)
    assert sorted(by_doc[1]) == ["a b c d e", "f g h i j"]
    assert sorted(by_doc[2]) == ["a b c d e", "x y z w v"]
    assert 3 not in by_doc

    spans = D.duplicated_spans(df, "text", "doc_id", 5).collect()
    assert len(spans) == 1
    assert spans[0].chunk == "a b c d e"
    assert spans[0].n_occurrences == 2 and spans[0].n_docs == 2


def test_remove_duplicate_spans_keeps_every_doc(spark):
    """ADVICE r4 (medium): the rewrite must return one row per INPUT doc —
    short docs (< k words → zero chunks) and docs whose every chunk is a
    later duplicate occurrence come back emptied (0 / ''), never dropped.
    A corpus rebuilt from this output would otherwise silently delete
    them."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    rows = [
        (1, "a b c d e f g h i j"),  # first owner of both its chunks
        (2, "a b c d e f g h i j"),  # every chunk duplicates doc 1 → emptied
        (3, "tiny"),  # < 5 words → zero chunks → emptied
        (4, "u v w x y z q r s t"),  # untouched survivor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_deduped)
        for r in D.remove_duplicate_spans(df, "text", "doc_id", 5).collect()
    }
    assert set(out) == {1, 2, 3, 4}, "every input doc must appear"
    assert out[1] == (2, 2, "a b c d e f g h i j")
    assert out[2] == (2, 0, "")  # all chunks are later occurrences
    assert out[3] == (0, 0, "")  # no chunks at all
    assert out[4] == (2, 2, "u v w x y z q r s t")


def test_boilerplate_scrub_is_surgical_and_ordering_matters(spark):
    """VERDICT r8 #1: the boilerplate-first curation ordering, pinned on
    a hand-built template-heavy corpus. (a) remove_boilerplate_spans cuts
    EVERY occurrence of the shared template (no first owner — contrast
    remove_suffix_duplicate_spans) and restores each doc's own content
    exactly; (b) genuine near-dup content SURVIVES the scrub; (c) the
    ordering matters: uncapped Jaccard on the RAW corpus pairs unrelated
    short docs via the template, while the same Jaccard AFTER the scrub
    sees content-only overlap."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    # 10-word template dominating 5-word bodies: the short-doc regime
    # where template mass alone pushes true Jaccard over the threshold
    tpl = "like comment share and subscribe to our newsletter right now"
    bodies = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta extra",  # content near-dup of 1
        3: "one two three four five",
        4: "red orange yellow green blue",
        5: "cats dogs birds fish mice",
    }
    rows = [(i, f"{tpl} {b}") for i, b in bodies.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r.doc_id: r.text_deduped
        for r in D.remove_boilerplate_spans(
            df, "text", "doc_id", k=5, min_docs=3
        ).collect()
    }
    # (a) surgical: every doc comes back as exactly its own body
    assert out == bodies
    # (b)+(c): content near-dup survives the scrub; template pairs do not
    cleaned = spark.createDataFrame(
        list(out.items()), "doc_id long, text string"
    )
    after = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(
            cleaned, "text", "doc_id", threshold=0.2, max_df=None
        ).collect()
    }
    assert after == {(1, 2)}, after
    before = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.2, max_df=None
        ).collect()
    }
    # raw corpus: the template alone pushes unrelated docs over 0.2
    assert len(before) > len(after) and (3, 4) in before, before


def test_suffix_spans_catch_unaligned_duplicates_grid_misses(spark):
    """VERDICT r5 #1: the suffix-array detector must find a duplicated
    span at ANY offset. Doc 2 embeds doc 1's 10-word run shifted by two
    words, so no 5-word grid chunk of doc 2 equals a grid chunk of
    doc 1 (every cell is misaligned) — duplicated_spans (the chunk grid)
    sees nothing, suffix_duplicated_spans finds the full maximal span in
    both docs."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    shared = "q w e r t y u i o p"  # 10 words
    rows = [
        (1, shared + " alpha beta"),
        (2, "xx yy " + shared + " gamma"),  # shift 2 → grid-invisible
        (3, "completely different words here live now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.duplicated_spans(df, "text", "doc_id", 5).count() == 0

    spans = {
        r.doc_id: (r.start_pos, r.end_pos, r.span_words)
        for r in D.suffix_duplicated_spans(df, "text", "doc_id", 5).collect()
    }
    assert spans == {1: (1, 10, 10), 2: (3, 12, 10)}


def test_suffix_spans_merge_islands_and_count_within_doc_repeats(spark):
    """Within-doc repetition counts as duplication by default (Lee et
    al.); distinct_docs=True demands two documents. Two disjoint
    duplicated regions in one doc come back as two islands, not one."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "a b c d e ZZ a b c d e")], "doc_id long, text string"
    )
    spans = sorted(
        (r.start_pos, r.end_pos)
        for r in D.suffix_duplicated_spans(df, "text", "doc_id", 5).collect()
    )
    assert spans == [(1, 5), (7, 11)]
    assert (
        D.suffix_duplicated_spans(
            df, "text", "doc_id", 5, distinct_docs=True
        ).count()
        == 0
    )


def test_duplicated_spans_requires_distinct_docs(spark):
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    # the same span twice within ONE doc is not a cross-doc duplicate
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], "doc_id long, text string"
    )
    assert D.duplicated_spans(df, "text", "doc_id", 5).count() == 0


def test_semdedup_keep_rule(spark):
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    # ids 1,2 identical direction (dup pair), 3 orthogonal, 9 in other block
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [2.0, 0.0]),  # cosine 1.0 with id 1 → dropped (higher id)
        (3, 0, [0.0, 1.0]),  # orthogonal → kept
        (9, 1, [1.0, 0.0]),  # same direction but different block → kept
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    # precomputed-block path (e.g. an IVF cell id): respects block walls
    pairs = D.embedding_near_dup_pairs(emb, block_col="label", threshold=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()}
    assert got == {(1, 2)}


def test_embedding_pairs_default_lsh_blocking(spark):
    """Default blocking is the random-hyperplane LSH bucket: identical
    directions always share a bucket (they agree on every plane sign), so
    near-dups are caught without any label column; opposite directions
    land apart."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
    from kafka_clickhouse_ingest_pipeline_spark.operators.similarity import (
        EMB_DIM,
        lsh_bucket,
    )
    from pyspark.sql import functions as F

    base = [float(i % 7 - 3) or 1.0 for i in range(EMB_DIM)]
    rows = [
        (1, [x * 1.0 for x in base]),
        (2, [x * 2.5 for x in base]),  # same direction → same bucket, cos 1.0
        (3, [-x for x in base]),  # antipode → different bucket
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = D.embedding_near_dup_pairs(emb, threshold=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()}
    assert got == {(1, 2)}
    # blocking really is the bucket id: 1 and 2 agree, 3 differs
    b = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id",
            lsh_bucket(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("b"),
        ).collect()
    }
    assert b[1] == b[2] != b[3]


def test_bpe_merge_semantics_match_canonical_left_to_right(spark):
    """Boundary-sharing runs must all merge in one round (the double-space
    representation's whole job): 'abab' with best pair (a,b) becomes
    [ab, ab], and 'aaa' with (a,a) becomes [aa, a] — canonical BPE."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import text as T

    vocab = spark.createDataFrame(
        [("abab", 10), ("aaa", 1)], ["term", "freq"]
    )
    merges = {r.merge_rank: r for r in T.bpe_train_merges(vocab, rounds=2).collect()}
    # round 1: 'a b' dominates ('abab' has two occurrences: 2*10 = 20)
    assert merges[1].pair == "a b" and merges[1].merged == "ab"
    assert merges[1].weight == 20
    # round 2: both occurrences collapsed, so 'ab ab' and 'ab </w>' tie
    # at weight 10 and the lexicographic tie-break (space < 'a') picks
    # 'ab </w>'. A single-merge-per-word bug would instead leave
    # ' ab  a  b  </w> ', whose top pair is the leftover 'a b' (10) with
    # 'ab </w>' at 0.
    assert merges[2].pair == "ab </w>" and merges[2].merged == "ab</w>"
    assert merges[2].weight == 10


def test_bpe_fully_merged_word_emits_no_pairs(spark):
    """A word collapsed to a single symbol must drop out of pair counting
    (regression: unguarded sequence(0,-1) produced NULL pairs that outvoted
    real pairs and nulled the vocab through replace(s, NULL, ...))."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import text as T

    vocab = spark.createDataFrame([("e", 100), ("xy", 1)], ["term", "freq"])
    merges = {r.merge_rank: r for r in T.bpe_train_merges(vocab, rounds=2).collect()}
    assert merges[1].pair == "e </w>" and merges[1].weight == 100
    # round 2: 'e</w>' is a single symbol now; only 'xy' contributes
    assert merges[2].pair is not None
    assert merges[2].pair == "x y" and merges[2].weight == 1


def test_bpe_apply_zero_merges_counts_chars_plus_eow(spark):
    """bpe_apply_merges with an empty merge prefix: every word encodes to
    len(word)+1 symbols (chars + </w>)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bpe_apply_merges,
        bpe_train_merges,
    )

    vocab = spark.createDataFrame(
        [("ab", 5), ("abc", 3), ("a", 1)], ["term", "freq"]
    )
    merges = bpe_train_merges(vocab, rounds=2)
    enc = bpe_apply_merges(vocab.select("term"), merges, rounds=0)
    got = {r["term"]: r["n_bpe_tokens"] for r in enc.collect()}
    assert got == {"ab": 3, "abc": 4, "a": 2}


def test_bpe_apply_merges_shrinks_tokens_consistently_with_training(spark):
    """Applying the learned merges to the training vocab reproduces the
    training chain's final symbol counts (train and apply share the
    rewrite machinery, so w_rounds == e_rounds)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bpe_apply_merges,
        bpe_train_merges,
    )

    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        ["term", "freq"],
    )
    merges = bpe_train_merges(vocab, rounds=3)
    assert merges.count() == 3
    enc = bpe_apply_merges(vocab.select("term"), merges, rounds=3)
    got = {r["term"]: r["n_bpe_tokens"] for r in enc.collect()}
    # 3 merges each strictly reduce some word's symbol count; every word
    # still ends with </w> and nothing grows
    base = {"low": 4, "lower": 6, "newest": 7, "widest": 7}
    assert all(got[t] <= base[t] for t in base)
    assert sum(got.values()) <= sum(base.values()) - 3


def test_bpe_encode_is_lossless_roundtrip(spark):
    """BPE is a segmentation, never a rewrite: concatenating the encoded
    symbols (dropping the double-space joins) must reproduce the original
    word + '</w>' for EVERY vocab term, at any number of merges — the
    decode half of the tokenizer loop."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import text as T

    vocab = spark.createDataFrame(
        [("abab", 10), ("aaa", 3), ("banana", 2), ("a", 7), ("cab", 1)],
        ["term", "freq"],
    )
    for rounds in (0, 2, 4):
        merges = T.bpe_train_merges(vocab, rounds=max(rounds, 1))
        enc = T.bpe_apply_merges(vocab, merges, rounds=rounds)
        decoded = enc.select(
            "term",
            F.replace(
                F.replace(F.trim(F.col("encoded")), F.lit("  "), F.lit("")),
                F.lit("</w>"),
                F.lit(""),
            ).alias("dec"),
        )
        bad = decoded.where(F.col("dec") != F.col("term")).count()
        assert bad == 0, f"roundtrip broke at rounds={rounds}"


def test_novelty_exact_duplicate_scores_zero(spark):
    """A verbatim duplicate of an earlier doc has zero novel 8-grams; the
    original keeps novelty 1.0 for grams nobody used before it."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import (
        reset_reuse_cache,
    )
    from kafka_clickhouse_ingest_pipeline_spark.registry import REGISTRY
    import kafka_clickhouse_ingest_pipeline_spark.queries.curation as C

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(0, text), (1, text), (2, "totally different words")],
        ["doc_id", "text"],
    )
    # drive the same operator logic directly on a local frame
    w = F.split(F.col("text"), " ")
    grams8 = F.when(
        F.size(w) >= 8,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 7),
                lambda i: F.concat_ws(" ", F.slice(w, i, 8)),
            )
        ),
    )
    grams = docs.select("doc_id", F.explode(grams8).alias("gram"))
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nov = (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias("novelty")
        )
    )
    vals = {r.doc_id: r.novelty for r in nov.collect()}
    assert vals[0] == 1.0
    assert vals[1] == 0.0
    assert 2 not in vals  # < 8 words -> no grams, excluded like the oracle


def test_phrase_match_counts_overlaps_and_chains_terms(spark):
    """Positional phrase search: overlapping matches each count (start
    positions are what's joined), a 3-term phrase chains two joins, and
    non-adjacent co-occurrence never matches."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.text import phrase_match

    docs = spark.createDataFrame(
        [
            (0, "a a a"),               # 'a a' overlaps twice
            (1, "x a y a"),             # co-occurs, never adjacent
            (2, "one two three done"),  # 3-term phrase hit
            (3, "one two one two three"),  # hit at pos 2
            (4, "three two one"),       # reversed: no hit
        ],
        ["doc_id", "text"],
    )
    two = {r.doc_id: r.n_matches for r in phrase_match(docs, ["a", "a"]).collect()}
    assert two == {0: 2}
    three = {
        r.doc_id: r.n_matches
        for r in phrase_match(docs, ["one", "two", "three"]).collect()
    }
    assert three == {2: 1, 3: 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_match(docs, ["solo"])


def test_cdc_chunks_localize_edits_unlike_fixed_blocks(spark):
    """CDC's defining property: prepending bytes to a document leaves
    every chunk after the edit region byte-identical (same digests),
    while fixed-size blocking would shift and re-digest every block.
    Also pins the boundary rule end-to-end: chunks tile the text exactly
    and re-chunking is deterministic."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    base = " ".join(f"w{i % 97}x{(i * 7) % 89}" for i in range(400))
    edited = "PREPENDED HEADER " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    ch = D.cdc_chunks(df, "text", "doc_id", window=8, divisor=64).collect()
    by_doc: dict[int, list] = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.start)
        # chunks tile the text: starts/lengths are contiguous from 1
        pos = 1
        for r in rows:
            assert r.start == pos
            pos += r.length
        text = base if doc_id == 1 else edited
        assert pos == len(text) + 1
    d1 = [r.digest for r in by_doc[1]]
    d2 = [r.digest for r in by_doc[2]]
    shared = set(d1) & set(d2)
    # everything after the first post-edit boundary re-synchronizes:
    # the two docs share almost all of doc 1's chunks
    assert len(shared) >= len(d1) - 2, (len(shared), len(d1))
    # and a fixed-block baseline would NOT: 64-char blocks of the two
    # texts share no digests at all (the shift breaks every block)
    import hashlib

    fb1 = {hashlib.md5(base[i : i + 64].encode()).hexdigest()
           for i in range(0, len(base), 64)}
    fb2 = {hashlib.md5(edited[i : i + 64].encode()).hexdigest()
           for i in range(0, len(edited), 64)}
    assert len(fb1 & fb2) == 0


def test_quality_classifier_separates_planted_spam(spark, sf_dir):
    """VERDICT r5 #2 'done' criterion: the in-engine logistic model must
    actually separate the planted classes, not just replay
    deterministically. After 10 full-batch steps every spam twin scores
    >= 0.5 and every clean doc < 0.5 (100% training accuracy on this
    corpus), with a real margin between the classes."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        quality_classifier_eval,
    )

    rows = {r.label: r for r in quality_classifier_eval(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    for label in (0, 1):
        assert rows[label].n_correct == rows[label].n_docs, rows[label]
    assert rows[0].max_score < 0.5 <= rows[1].min_score
    assert rows[1].min_score - rows[0].max_score > 0.3  # real separation


def test_logreg_gradient_step_matches_closed_form(spark):
    """One gradient step on a hand-checked 2-doc, 1-feature problem:
    w0=0 -> p=0.5 for both docs; grad = ((0.5-1)*1 + (0.5-0)*(-1))/2
    = -0.5; w1 = 0 - 0.5*(-0.5) = 0.25 (plus the bias dim, whose grad
    is ((0.5-1)+(0.5-0))/2 = 0 -> stays 0)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import (
        classifier as C,
    )

    feats = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, -1.0), (1, 32, 1.0), (2, 32, 1.0)],
        "doc_id long, dim long, val double",
    )
    labels = spark.createDataFrame([(1, 1), (2, 0)], "doc_id long, y int")
    w = {
        r.dim: r.wt
        for r in C.logreg_train(feats, labels, "doc_id", iters=1, lr=0.5)
        .collect()
    }
    assert w == {0: 0.25, 32: 0.0}


def test_suffix_remove_cuts_later_occurrence_at_any_offset(spark):
    """The remove action under an UNALIGNED duplicate: doc 1 owns the
    shared 10-word run (first (doc,pos) occurrence), doc 2 carries it
    shifted by two words — the grid-based rewrite can't see it, the
    suffix-based one cuts exactly those 10 words from doc 2 and leaves
    its unique words intact. An exact full-duplicate doc comes back
    emptied, never dropped."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    shared = "q w e r t y u i o p"  # 10 words
    rows = [
        (1, shared + " alpha beta"),
        (2, "xx yy " + shared + " gamma"),
        (3, shared + " alpha beta"),  # exact duplicate of doc 1
        (4, "totally unrelated words live here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_words, r.n_kept, r.text_deduped)
        for r in D.remove_suffix_duplicate_spans(
            df, "text", "doc_id", 5
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (12, 12, shared + " alpha beta")  # first owner keeps
    assert out[2] == (13, 3, "xx yy gamma")  # shifted copy cut
    assert out[3] == (12, 0, "")  # full duplicate emptied, not dropped
    assert out[4] == (6, 6, "totally unrelated words live here now")


def test_quality_scoring_stream_equals_batch(spark, sf_dir, tmp_path):
    """Model SCORING is stateless under frozen weights, so a document
    stream scored micro-batch by micro-batch must produce exactly the
    batch scores — the property that lets the trained quality filter sit
    in the ingest path (score-at-ingest) instead of re-scanning the
    corpus."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_clickhouse_ingest_pipeline_spark.operators import (
        classifier as C,
    )
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        _LOGREG_ITERS,
        _LOGREG_LR,
        _quality_training_corpus,
    )

    corpus = _quality_training_corpus(spark, sf_dir)
    feats = C.hashed_features(corpus, "text", "doc_id")
    labels = corpus.select("doc_id", "y")
    wts = C.logreg_train(
        feats, labels, "doc_id", iters=_LOGREG_ITERS, lr=_LOGREG_LR
    )
    # freeze the trained weights as literal rows (no lineage replay)
    wts = spark.createDataFrame(wts.collect(), schema=wts.schema)

    docs = corpus.select("doc_id", "text")
    batch = {
        r.doc_id: r.score
        for r in C.logreg_score(
            C.hashed_features(docs, "text", "doc_id"), wts, "doc_id"
        ).collect()
    }

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    docs.repartition(3).write.parquet(src)
    streamed: dict[int, float] = {}

    def sink(df, bid):
        scored = C.logreg_score(
            C.hashed_features(df, "text", "doc_id"), wts, "doc_id"
        )
        for r in scored.collect():
            streamed[r.doc_id] = r.score

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert streamed == batch and len(batch) > 0


def test_suffix_incremental_flags_corpus_matches_only(spark):
    """Incremental suffix dedup is against-the-CORPUS only: a phrase two
    new docs share but the corpus lacks must NOT be flagged (that is the
    full detector's job on the next compaction); a corpus phrase at a
    shifted offset in a new doc must be, with the island merged
    maximally."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    phrase = "the quick brown fox jumps over"  # 6 words in corpus
    corpus = spark.createDataFrame(
        [(1, phrase + " one two"), (2, "other corpus words entirely here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "aa bb " + phrase + " tail"),  # shifted corpus match
            (11, "shared new phrase never in corpus xx"),
            (12, "shared new phrase never in corpus yy"),  # dup of 11 only
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.start_pos, r.end_pos, r.span_words)
        for r in D.suffix_spans_against_corpus(
            new, corpus, "text", "doc_id", 5
        ).collect()
    }
    assert spans == {10: (3, 8, 6)}  # only the corpus phrase, merged


def test_classifier_loss_curve_decreases_on_planted_corpus(spark):
    """VERDICT r6 #6 'done' criterion: on the planted spam fixture the
    per-iteration training log-loss starts at the zero-weight ln 2
    baseline and decreases monotonically through the trained-weight
    loss — the convergence signal that makes a data change that stops
    converging at the fixed iteration count visible."""
    import math

    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        quality_classifier_loss_curve,
    )

    rows = quality_classifier_loss_curve(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r.iteration for r in rows] == list(range(len(rows)))
    assert len(rows) == 11
    losses = [r.log_loss for r in rows]
    assert abs(losses[0] - round(math.log(2.0), 4)) < 5e-4  # ln 2 baseline
    assert all(a > b for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < 0.25  # converged well below the baseline


def test_incremental_suffix_remove_frozen_semantics(spark):
    """Pins the frozen-index contract of remove_suffix_spans_against_corpus:
    (a) a new doc fully contained in the corpus comes back EMPTIED, never
    dropped; (b) a corpus phrase at an UNALIGNED offset inside a new doc
    is cut exactly (the grid-invisible case); (c) duplicates between two
    new batch-mates survive — cuts come only from the corpus."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    corpus_phrase = "alpha beta gamma delta epsilon"
    corpus = spark.createDataFrame(
        [(1, corpus_phrase + " zeta eta theta")], "doc_id long, text string"
    )
    twin = "x1 x2 x3 x4 x5 x6 x7"  # shared by two NEW docs, not in corpus
    new = spark.createDataFrame(
        [
            (10, corpus_phrase),                       # fully duplicated
            (11, "pre1 pre2 " + corpus_phrase + " post1 post2"),  # offset 3
            (12, twin),
            (13, twin),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in D.remove_suffix_spans_against_corpus(
            new, corpus, "text", "doc_id", 5
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}  # every input returns exactly once
    assert out[10].n_kept == 0 and out[10].text_deduped == ""  # emptied
    # unaligned cut: exactly the 5 phrase words go, the flanks stay
    assert out[11].n_words == 9 and out[11].n_kept == 4
    assert out[11].text_deduped == "pre1 pre2 post1 post2"
    # batch-mates never cut each other under a frozen corpus index
    for d in (12, 13):
        assert out[d].n_kept == out[d].n_words == 7
        assert out[d].text_deduped == twin
    # rebuilt text is consistent with the kept count everywhere
    for r in out.values():
        n = len(r.text_deduped.split()) if r.text_deduped else 0
        assert n == r.n_kept


def test_embedding_cross_hits_flags_planted_probe_twin(spark):
    """Pins embedding_cross_hits: a corpus vector identical to a probe is
    flagged at cosine 1.0; an orthogonal corpus vector is not; probe ids
    never appear in the output (asymmetry)."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    dim = 8
    v = [1.0] + [0.0] * (dim - 1)
    w = [0.0, 1.0] + [0.0] * (dim - 2)  # orthogonal to v
    corpus = spark.createDataFrame(
        [(100, v), (101, w)], "vec_id long, embedding array<float>"
    )
    probes = spark.createDataFrame(
        [(900, v)], "vec_id long, embedding array<float>"
    )
    out = {
        r.vec_id: r
        for r in D.embedding_cross_hits(
            corpus, probes, threshold=0.5
        ).collect()
    }
    assert set(out) == {100}  # the twin, never the probe id 900
    assert out[100].n_probe_hits == 1
    assert abs(out[100].max_probe_cosine - 1.0) < 1e-9


def test_increment_chunks_equal_batch(spark, sf_dir):
    """The incremental pipeline's streaming contract without a stream:
    every stage of curation_increment_verdicts is per-doc pure given the
    FROZEN nightly state (hot grams, capped shingle index, bench set,
    trained weights), so processing the increment in 3 deterministic
    chunks and unioning must equal the single batch run row-for-row —
    the same stream-vs-batch equivalence discipline as
    test_classifier_score_at_ingest_stream_equals_batch, applied to the
    whole increment pipeline."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        _increment_verdicts,
    )

    full = {r.doc_id: r for r in _increment_verdicts(spark, sf_dir).collect()}
    chunked = {}
    for c in range(3):
        for r in _increment_verdicts(spark, sf_dir, chunk=c).collect():
            assert r.doc_id not in chunked, "chunks must partition the increment"
            chunked[r.doc_id] = r
    assert set(chunked) == set(full)
    for did, r in full.items():
        assert chunked[did] == r, (did, r, chunked[did])


def test_bloom_probe_bounded_broadcast_and_no_false_negatives(spark, sf_dir):
    """VERDICT r10 #1 pin: the pipeline's decontamination stage probes an
    8 KiB Bloom sketch map-side. Three invariants: (1) the sketch is ONE
    row with <= BLOOM_BITS/32 map entries (genuinely bounded, so its
    broadcast is sanctioned at any benchmark size); (2) the probe plan is
    a BroadcastNestedLoopJoin with ZERO shuffled joins — the only shuffle
    is the final distinct of contaminated ids; (3) no false negatives:
    every exactly-contaminated doc is bloom-flagged (the sketch may only
    over-drop, never leak a benchmark gram through)."""
    from kafka_clickhouse_ingest_pipeline_spark.functions.hashing import (
        BLOOM_BITS,
    )
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    g5 = F.when(
        F.size(w) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 4),
                lambda i: F.concat_ws(" ", F.slice(w, i, 5)),
            )
        ),
    )
    grams = docs.select("doc_id", F.explode(g5).alias("gram"))
    bench = grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    probe = grams.where(F.col("doc_id") % 97 != 0)

    sketch = D.bloom_gram_sketch(bench)
    srow = sketch.collect()
    assert len(srow) == 1
    assert len(srow[0].bloom_words) <= BLOOM_BITS // 32

    flagged = D.bloom_contaminated_ids(probe, sketch)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan

    exact = probe.join(bench, "gram").select("doc_id").distinct()
    bloom_ids = {r.doc_id for r in flagged.collect()}
    exact_ids = {r.doc_id for r in exact.collect()}
    assert exact_ids <= bloom_ids


def test_incumbent_policy_never_exceeds_smallest_id_drift(spark, sf_dir):
    """Round-12 (VERDICT r11 #2): the incumbent keep policy exists to
    remove the keep-smallest-id reversal class, so its near-dup and
    composite kept disagreement rows can never EXCEED the smallest-id
    policy's (the measured sf0.1 claim — reversal class eliminated — is
    recorded in SCALE.md §8; this pins the direction at every SF)."""
    from kafka_clickhouse_ingest_pipeline_spark import registry

    def rows(q):
        return {
            r.metric: r.n_disagree
            for r in registry.REGISTRY[q].fn(spark, sf_dir).collect()
        }

    base = rows("curation_drift_report")
    inc = rows("curation_drift_report_incumbent")
    for metric in ("near_dup", "kept", "near_dup_with_merge",
                   "kept_with_merge"):
        assert inc[metric] <= base[metric], (metric, inc, base)
    # scrub and contamination are policy-independent
    for metric in ("scrubbed", "contaminated"):
        assert inc[metric] == base[metric], (metric, inc, base)
