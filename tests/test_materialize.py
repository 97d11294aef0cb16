"""The materialization seam (plans/materialize.py).

VERDICT r3 #1: the 31 localCheckpoint sites documented "on a cluster,
write the table to storage instead" without any code path that could.
These tests force mode="storage" end-to-end over the dedup/ANN query
families and pin the write-once-reuse contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import (
    materialize,
    reset_reuse_cache,
)
from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.registry import REGISTRY

registry.load_all()

# the query families whose operators route through materialize()
STORAGE_QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_hamming_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_clusters",
    "ivf_kmeans_cells",
    "pq_adc_topk",
    "bpe_train_merges",
]


@pytest.fixture()
def storage_mode(spark, tmp_path):
    spark.conf.set("spark.graft.materialize.mode", "storage")
    spark.conf.set("spark.graft.materialize.path", str(tmp_path / "mat"))
    reset_reuse_cache()
    yield str(tmp_path / "mat")
    spark.conf.unset("spark.graft.materialize.mode")
    spark.conf.unset("spark.graft.materialize.path")
    reset_reuse_cache()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("qname", STORAGE_QUERIES)
def test_storage_mode_matches_local_mode(spark, sf_dir, storage_mode, qname):
    """Every materialize-routed query gives identical rows in both modes."""
    if qname not in REGISTRY:
        pytest.skip(f"{qname} not registered")
    fn = REGISTRY[qname].fn
    got_storage = _rows(fn(spark, sf_dir))
    spark.conf.set("spark.graft.materialize.mode", "local")
    got_local = _rows(fn(spark, sf_dir))
    assert got_storage == got_local
    # the storage base must actually have been used
    assert os.path.isdir(storage_mode) and os.listdir(storage_mode)


def test_storage_mode_writes_parquet_and_reads_back(spark, storage_mode):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = materialize(df, "unit_basic")
    assert _rows(out) == _rows(df)
    dirs = os.listdir(storage_mode)
    assert any(d.startswith("unit_basic-") for d in dirs)
    # plan of the returned frame scans parquet, not the range lineage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan


def test_default_mode_is_local_checkpoint(spark, tmp_path):
    # no conf set -> localCheckpoint; nothing written anywhere
    df = spark.range(10)
    out = materialize(df, "unit_local", path=str(tmp_path / "never"))
    assert out.count() == 10
    assert not (tmp_path / "never").exists()


def test_unique_dirs_prevent_repointing(spark, storage_mode):
    """reuse=False (default): same name twice → two dirs; the first
    returned frame is never silently repointed at the second write."""
    a = materialize(spark.range(5).withColumn("v", F.lit("a")), "unit_u")
    b = materialize(spark.range(5).withColumn("v", F.lit("b")), "unit_u")
    assert {r["v"] for r in a.collect()} == {"a"}
    assert {r["v"] for r in b.collect()} == {"b"}
    assert sum(d.startswith("unit_u-") for d in os.listdir(storage_mode)) == 2


def test_reuse_writes_once_and_reuses(spark, storage_mode):
    """reuse=True: the index table is written once; later calls (even
    with new lineage) probe the already-written table — the
    write-the-signature-table-once contract at 100 TB."""
    first = materialize(
        spark.range(7).withColumn("tag", F.lit("first")), "unit_idx", reuse=True
    )
    # second call passes DIFFERENT data under the same name: must NOT
    # rewrite — caller opted into "this name is the index, probe it"
    second = materialize(
        spark.range(3).withColumn("tag", F.lit("second")), "unit_idx", reuse=True
    )
    assert _rows(first) == _rows(second)
    assert {r["tag"] for r in second.collect()} == {"first"}
    # exactly one physical table, no -uuid suffix
    assert os.path.isdir(os.path.join(storage_mode, "unit_idx"))
    assert sum(d.startswith("unit_idx") for d in os.listdir(storage_mode)) == 1
    # both frames are plain parquet scans of that one table
    plan = second._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan and "Range" not in plan


def test_reuse_requires_name(spark, storage_mode):
    with pytest.raises(ValueError):
        materialize(spark.range(1), reuse=True)


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError):
        materialize(spark.range(1), "x", mode="cache")


def test_partition_by_storage_layout(spark, storage_mode):
    df = spark.range(20).withColumn("part", (F.col("id") % 2).cast("int"))
    out = materialize(df, "unit_part", partition_by=["part"], reuse=True)
    assert out.count() == 20
    target = os.path.join(storage_mode, "unit_part")
    subdirs = [d for d in os.listdir(target) if d.startswith("part=")]
    assert sorted(subdirs) == ["part=0", "part=1"]


def test_local_reuse_returns_cached_frame(spark):
    from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import (
        materialize as mat,
    )

    reset_reuse_cache()
    a = mat(spark.range(9), "unit_local_reuse", reuse=True)
    b = mat(spark.range(9), "unit_local_reuse", reuse=True)
    assert a is b  # in-session cache: no second checkpoint job
    reset_reuse_cache()


def test_bm25_index_built_once_probed_many(spark, sf_dir):
    """VERDICT r3 #6: repeated BM25 queries probe the stored index
    instead of re-tokenizing the corpus."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_query_indexed,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    reset_reuse_cache()
    docs = load_table(spark, sf_dir, "documents")
    i1 = bm25_build_index(docs, corpus_tag="t_bm25")
    i2 = bm25_build_index(docs, corpus_tag="t_bm25")
    # all three index tables come back from the reuse cache
    assert all(a is b for a, b in zip(i1, i2))
    r1 = bm25_query_indexed(i1, ("data", "query"), k_top=5).collect()
    r2 = bm25_query_indexed(i2, ("merge", "stream"), k_top=5).collect()
    assert len(r1) == 5 and len(r2) == 5
    # the probe plan reads the checkpointed index, not documents.parquet
    plan = (
        bm25_query_indexed(i2, ("data",), k_top=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents" not in plan
    reset_reuse_cache()


def test_bm25_incremental_merge_equals_full_rebuild(spark, sf_dir):
    """VERDICT r7 #5: merging a new-doc increment into a frozen index
    must be VALUE-IDENTICAL to rebuilding from the full corpus —
    postings, df, and dl compare as exact sets (counts are integer-in-
    double, so equality is exact), and re-crawled ids already in the
    frozen index are dropped (first-owner), never double-counted."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_index_merge_increment,
        bm25_query_indexed,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    reset_reuse_cache()
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    inc = docs.where(F.col("doc_id") % 7 == 0)
    frozen = bm25_build_index(corpus, corpus_tag="t_inc_base")
    merged = bm25_index_merge_increment(frozen, inc, corpus_tag="t_inc_base")
    full = bm25_build_index(docs, corpus_tag="t_inc_full")
    for m, f, cols in zip(
        merged, full, (("term", "doc_id", "tf"), ("term", "df"), ("doc_id", "dl"))
    ):
        ms = {tuple(r) for r in m.select(*cols).collect()}
        fs = {tuple(r) for r in f.select(*cols).collect()}
        assert ms == fs, cols
    # first-owner: merging an increment containing ALREADY-INDEXED docs
    # is a no-op (the anti-join drops them; df/dl never double-count)
    recrawl = bm25_index_merge_increment(
        (merged[0], merged[1], merged[2]),
        docs.where(F.col("doc_id") % 7 == 0),
        corpus_tag="t_inc_recrawl",
    )
    assert recrawl[2].count() == full[2].count()
    assert {tuple(r) for r in recrawl[1].collect()} == {
        tuple(r) for r in full[1].collect()
    }
    # and the query path over the merged index matches the full index
    a = bm25_query_indexed(merged, ("data", "stream"), k_top=10).collect()
    b = bm25_query_indexed(full, ("data", "stream"), k_top=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    reset_reuse_cache()


def test_bm25_incremental_merge_is_associative(spark, sf_dir):
    """Successive micro-batch merges equal one bulk merge: merging
    increment A then increment B into a frozen index produces the same
    tables as merging A ∪ B at once (df sums over disjoint doc sets are
    associative), so the operator composes with a foreachBatch loop the
    same way every other frozen-state incremental does."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_index_merge_increment,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    reset_reuse_cache()
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 > 1)
    inc_a = docs.where(F.col("doc_id") % 5 == 0)
    inc_b = docs.where(F.col("doc_id") % 5 == 1)
    frozen = bm25_build_index(corpus, corpus_tag="t_assoc_base")
    # Deliberately the SAME tag for every merge: round-8 ADVICE medium —
    # fixed `{tag}_inc` reuse names made the second merge silently return
    # the first's tables. The per-call suffix must make both land.
    step1 = bm25_index_merge_increment(frozen, inc_a, corpus_tag="t_assoc_base")
    step2 = bm25_index_merge_increment(step1, inc_b, corpus_tag="t_assoc_base")
    bulk = bm25_index_merge_increment(
        frozen, inc_a.unionByName(inc_b), corpus_tag="t_assoc_base"
    )
    for m, f, cols in zip(
        step2, bulk, (("term", "doc_id", "tf"), ("term", "df"), ("doc_id", "dl"))
    ):
        ms = {tuple(r) for r in m.select(*cols).collect()}
        fs = {tuple(r) for r in f.select(*cols).collect()}
        assert ms == fs, cols
    reset_reuse_cache()


def test_bm25_merge_default_tag_successive_and_batch_id_replay(spark, sf_dir):
    """Round-8 ADVICE medium, pinned: (a) two successive merges under the
    DEFAULT corpus_tag both take effect (doc counts grow twice — the old
    fixed `_inc` reuse names silently dropped the second increment);
    (b) with an explicit batch_id, replaying the SAME batch is idempotent
    (returns the already-merged tables), while the NEXT batch_id lands as
    a new merge — the contract the foreachBatch at-least-once path needs."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_index_merge_increment,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    reset_reuse_cache()
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 > 1)
    inc_a = docs.where(F.col("doc_id") % 5 == 0)
    inc_b = docs.where(F.col("doc_id") % 5 == 1)
    n_corpus, n_a, n_b = corpus.count(), inc_a.count(), inc_b.count()

    # (a) default tag, no batch_id: both merges must land
    frozen = bm25_build_index(corpus)
    m1 = bm25_index_merge_increment(frozen, inc_a)
    assert m1[2].count() == n_corpus + n_a
    m2 = bm25_index_merge_increment(m1, inc_b)
    assert m2[2].count() == n_corpus + n_a + n_b

    # (b) explicit batch_id: same id replays idempotently, next id lands
    f2 = bm25_build_index(corpus, corpus_tag="t_bid")
    s1 = bm25_index_merge_increment(f2, inc_a, corpus_tag="t_bid", batch_id=0)
    s1_replay = bm25_index_merge_increment(
        f2, inc_a, corpus_tag="t_bid", batch_id=0
    )
    assert all(a is b for a, b in zip(s1, s1_replay))
    s2 = bm25_index_merge_increment(s1, inc_b, corpus_tag="t_bid", batch_id=1)
    assert s2[2].count() == n_corpus + n_a + n_b
    reset_reuse_cache()


def test_bm25_index_storage_mode_writes_tables(spark, sf_dir, storage_mode):
    import os as _os

    from kafka_clickhouse_ingest_pipeline_spark.operators.text import (
        bm25_build_index,
        bm25_query_indexed,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    index = bm25_build_index(docs, corpus_tag="t_store")
    out = bm25_query_indexed(index, ("data", "query", "merge"), k_top=10)
    assert out.count() == 10
    names = _os.listdir(storage_mode)
    for t in ("bm25_postings_t_store", "bm25_df_t_store", "bm25_dl_t_store"):
        assert t in names, names
