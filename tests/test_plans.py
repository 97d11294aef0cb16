"""Physical-plan assertions: the 100 TB design properties SURVEY.md §4
promises — pushdown, pruning, broadcast joins, whole-stage codegen, partial
aggregation. Correctness tests prove the small-SF answer; these prove the
plan would survive the scale-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

registry.load_all()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = _executed_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45" in plan


def test_column_pruning_reads_only_projected_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _executed_plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_star_join_broadcasts_every_dimension(spark):
    df = registry.REGISTRY["join_multiway_star"].fn(spark, "/root/testdata/sf0.001")
    plan = _executed_plan(df)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_agg_has_partial_and_final_stages(spark, sf_dir):
    df = registry.REGISTRY["agg_pricing_summary"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # partial_ prefix = map-side combine before the shuffle
    assert "partial_sum" in plan and "partial_count" in plan


def test_hot_path_stays_in_wholestage_codegen(spark, sf_dir):
    df = registry.REGISTRY["agg_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan only at execution
    plan = _executed_plan(df)
    # codegen'd operators carry the "*(n)" stage marker in the final plan
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    df = registry.REGISTRY["topk_orders"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_semi_join_prunes_columns_before_broadcast(spark, sf_dir):
    # auth gate only needs key + predicate columns from the dimension side;
    # the parquet scan must not read the rest (c_name, c_mktsegment, ...)
    df = registry.REGISTRY["auth_semi_join"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReadSchema: struct<c_custkey:bigint,c_acctbal:double>" in plan


def test_q18_shape_broadcasts_filtered_aggregate(spark, sf_dir):
    """having_large_orders: the HAVING-filtered order-grain aggregate (a
    tiny key set) must broadcast into orders/customer rather than
    shuffling the fact side, and top-100 must be a TakeOrdered heap."""
    df = registry.REGISTRY["having_large_orders"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_mixture_rate_table_broadcasts(spark, sf_dir):
    """mix_corpus_by_lang: the 5-row rate table joins back to documents
    as a broadcast — the corpus side is never shuffled."""
    df = registry.REGISTRY["mix_corpus_by_lang"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiprobe_probe_list_broadcasts(spark, sf_dir):
    """Multi-probe ANN: the probe list (planes+1 rows) is the broadcast
    side; the corpus is never shuffled for the probe join, and top-k
    avoids a global sort."""
    df = registry.REGISTRY["ann_lsh_multiprobe_topk"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_kmeans_assignment_is_broadcast_with_partial_argmin(spark, sf_dir):
    """kmeans_cells: every assignment joins the corpus against a
    BROADCAST of k centroid vectors, and the argmin runs as a partial
    (map-side) min — never a corpus self-join, never a window over the
    n*k expansion."""
    df = registry.REGISTRY["ivf_kmeans_cells"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan
    assert "partial_min" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_incremental_dedup_joins_stay_hashed(spark, sf_dir):
    """Incremental dedup: exact and near checks are semi-joins (digest /
    band key); nothing sorts the corpus and no Python stage appears."""
    df = registry.REGISTRY["dedup_incremental_new_batch"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tokenize_vocab_broadcasts(spark, sf_dir):
    """tokenize_corpus_to_ids: the 1000-row vocab is the broadcast side of
    the id-assignment join — the exploded corpus side is never shuffled
    for it."""
    df = registry.REGISTRY["tokenize_corpus_to_ids"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_signatures_have_no_shuffle(spark, sf_dir):
    """The HOF signature path is a pure projection: zero Exchange nodes
    between the parquet scan and the signature output."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = D.minhash_signatures(docs, "text", "doc_id")
    plan = _executed_plan(sig)
    assert "Exchange" not in plan


def test_user_activity_similarity_pairs_on_bucket_equijoin(spark, sf_dir):
    """The profile pairing is BLOCKED on the LSH bucket: the physical
    plan must contain a hash equi-join keyed on (pbucket, bucket) with
    user_a != user_b only as a residual — never an unconditioned
    nested-loop self-join over the profile table (the round-2 scale
    killer)."""
    df = registry.REGISTRY["user_activity_similarity"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # equi-join on the probe/bucket key, hash or sort-merge either way
    import re

    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[pbucket", plan)
