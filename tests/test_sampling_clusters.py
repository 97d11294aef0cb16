"""Deterministic sampling and duplicate-cluster formation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
from kafka_clickhouse_ingest_pipeline_spark.operators import sampling as SMP
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def test_bernoulli_rate_and_stability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = SMP.bernoulli_sample(docs, "doc_id", 2_000)  # 20%
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    # 20% ± generous tolerance on a small corpus
    assert 0.10 * n < len(ids1) < 0.30 * n
    # exactly reproducible: membership is a pure function of the key
    ids2 = {r.doc_id for r in SMP.bernoulli_sample(docs, "doc_id", 2_000).select("doc_id").collect()}
    assert ids1 == ids2
    # monotone in the rate: a 10% sample is a subset of the 20% sample
    ids_small = {r.doc_id for r in SMP.bernoulli_sample(docs, "doc_id", 1_000).select("doc_id").collect()}
    assert ids_small <= ids1


def test_bernoulli_salt_gives_independent_draw(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in SMP.bernoulli_sample(docs, "doc_id", 2_000, "s0").select("doc_id").collect()}
    b = {r.doc_id for r in SMP.bernoulli_sample(docs, "doc_id", 2_000, "s1").select("doc_id").collect()}
    assert a != b  # different salts re-randomize


def test_stratified_quota_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SMP.stratified_fixed_n(docs, "lang", 7, "doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {k: min(7, v) for k, v in full.items()}


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, singletons {20}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], ["id"])
    out = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, nodes, "id").collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20)}


def test_cc_star_vs_minlabel_agree(spark):
    """Both engines behind connected_components produce identical labels
    on a mixed graph (chains + a clique + singletons)."""
    import random

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(0, 30)]  # chain 0..30
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(25)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 31)]
        + [(100 + i,) for i in range(6)]
        + [(i,) for i in range(200, 240)]
        + [(999,)],
        ["id"],
    )
    star = {
        (r.id, r.cluster_id)
        for r in D.connected_components(pairs, nodes, "id", algorithm="star").collect()
    }
    # minlabel needs O(diameter) rounds: the 30-hop chain exceeds the
    # default 25, which is exactly why star is the default
    minl = {
        (r.id, r.cluster_id)
        for r in D.connected_components(
            pairs, nodes, "id", max_iters=40, algorithm="minlabel"
        ).collect()
    }
    assert star == minl


def test_cc_star_logn_rounds_on_long_chain(spark):
    """VERDICT #9 acceptance: a 256-node chain (diameter 255) must
    converge in O(log n) large/small-star rounds — min-label would need
    ~255."""
    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    stats: dict = {}
    out = D.connected_components(
        pairs, nodes, "id", max_iters=20, algorithm="star", stats=stats
    )
    assert {r.cluster_id for r in out.collect()} == {0}
    assert stats["rounds"] <= 12  # ~2*log2(256)+slack, far under diameter


def test_clusters_catch_planted_duplicates(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.queries.dedup import (
        PLANT_OFFSET,
        _docs_with_planted,
    )

    docs = _docs_with_planted(spark, sf_dir)
    sig = D.minhash_signatures(docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sig, "doc_id").select("id_a", "id_b")
    clusters = D.connected_components(pairs, docs.select("doc_id"), "doc_id")

    # invariant: both endpoints of every pair share a cluster
    ca = clusters.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "cluster_id", "c_a"
    )
    cb = clusters.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "cluster_id", "c_b"
    )
    split_edges = (
        pairs.join(ca, "id_a").join(cb, "id_b").where(F.col("c_a") != F.col("c_b"))
    )
    assert split_edges.count() == 0

    # invariant: cluster_id is the component minimum (a member of the cluster)
    bad_rep = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("lo")).where(
        F.col("cluster_id") != F.col("lo")
    )
    assert bad_rep.count() == 0

    # recall: LSH banding is probabilistic, but the planted 3-word
    # truncations are near-identical — the vast majority must land in
    # their original's cluster (originals may legitimately merge further).
    planted = clusters.where(F.col("doc_id") >= PLANT_OFFSET)
    n_planted = planted.count()
    caught = planted.where(F.col("cluster_id") < PLANT_OFFSET).count()
    assert n_planted > 0
    assert caught >= 0.8 * n_planted


def test_hash_split_total_stable_proportional(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.operators.sampling import hash_split
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    splits = {"train": 8000, "valid": 9000, "test": 10000}
    out = hash_split(docs, "doc_id", splits)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    # every row lands in exactly one split
    assert sum(counts.values()) == total
    # proportions within a loose tolerance of 80/10/10
    assert abs(counts["train"] / total - 0.8) < 0.1
    # deterministic: re-running yields the identical assignment
    again = hash_split(docs, "doc_id", splits)
    assert (
        out.join(again.withColumnRenamed("split", "split2"), "doc_id")
        .where(F.col("split") != F.col("split2"))
        .count()
        == 0
    )
    # dict insertion order must not matter: a widest-bound-first dict
    # previously made the first CASE arm swallow every row
    shuffled = hash_split(
        docs, "doc_id", {"test": 10000, "train": 8000, "valid": 9000}
    )
    assert (
        out.join(shuffled.withColumnRenamed("split", "split2"), "doc_id")
        .where(F.col("split") != F.col("split2"))
        .count()
        == 0
    )


def test_keeper_election_known_clusters(spark):
    """Quality re-election on a known graph: the keeper is the max-
    (quality, n_chars, -id) member, keeper_changed marks disagreement
    with the min-id default, singletons never appear."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20]], ["doc_id"]
    )
    cc = D.connected_components(pairs, nodes, "doc_id")
    feats = spark.createDataFrame(
        [
            (1, 0.5, 5),
            (2, 0.9, 7),
            (3, 0.9, 9),  # quality tie with 2 -> n_chars breaks it
            (10, 0.2, 4),
            (11, 0.1, 4),
            (20, 1.0, 99),  # singleton: best quality overall, excluded
        ],
        ["doc_id", "quality_score", "n_chars"],
    )
    out = {
        r.cluster_id: r
        for r in D.keeper_election(
            cc, feats, "doc_id", ["quality_score", "n_chars"]
        ).collect()
    }
    assert set(out) == {1, 10}
    assert out[1].keeper_id == 3 and out[1].keeper_changed == 1
    assert out[1].n_members == 3
    assert out[1].keeper_quality_score == 0.9
    assert out[1].default_quality_score == 0.5
    assert out[10].keeper_id == 10 and out[10].keeper_changed == 0
    assert out[10].keeper_quality_score == out[10].default_quality_score


def test_keeper_election_invariants_on_planted_corpus(spark, sf_dir):
    """On the planted corpus: every elected keeper is a member of its
    cluster, never beats the default on (quality, n_chars, id) order,
    and at least one cluster elects a non-default keeper (the planted
    truncations shift alpha/digit/punct ratios both ways)."""
    from kafka_clickhouse_ingest_pipeline_spark import registry

    registry.load_all()
    rows = registry.REGISTRY["dedup_keeper_election"].fn(spark, sf_dir).collect()
    assert rows, "planted corpus must form multi-member clusters"
    assert all(r.n_members >= 2 for r in rows)
    for r in rows:
        assert r.keeper_quality_score >= r.default_quality_score
        assert r.keeper_changed == int(r.keeper_id != r.cluster_id)
        if r.keeper_changed:
            # strict improvement is not required (n_chars can break the
            # tie) but quality must never regress past the default
            assert r.keeper_quality_score >= r.default_quality_score
    assert any(r.keeper_changed for r in rows)
