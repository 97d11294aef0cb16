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


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """File-level min/max stats under a z-ordered layout admit pruning on
    BOTH key dimensions; a time-sorted layout cannot prune the user dim."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.plans import layout as ZL
    from kafka_clickhouse_ingest_pipeline_spark.functions.temporal import epoch_ms
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    keyed = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("ua"),
        (F.floor(epoch_ms("ts") / F.lit(1000)).cast("long") % 65536).alias("ub"),
    )
    bounds = keyed.agg(
        F.min("ua").alias("mina"),
        F.max("ua").alias("maxa"),
        F.min("ub").alias("minb"),
        F.max("ub").alias("maxb"),
    )
    ev = keyed.crossJoin(F.broadcast(bounds)).select(
        ZL.scale_to_bits("ua", "mina", "maxa", 16).alias("a"),
        ZL.scale_to_bits("ub", "minb", "maxb", 16).alias("b"),
    )
    lin = str(tmp_path / "linear")
    zor = str(tmp_path / "zorder")
    # time-sorted layout (the reference's ORDER BY receivedAt analog)
    ev.repartitionByRange(16, "b").sortWithinPartitions("b").write.parquet(lin)
    ZL.write_zordered(ev, zor, "a", "b", bits=16, target_partitions=16)

    def file_stats(d):
        out = []
        for root, _dirs, files in os.walk(d):
            for f in files:
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                mins, maxs = {}, {}
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    for ci in range(row.num_columns):
                        col = row.column(ci)
                        name = col.path_in_schema
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
                if mins:
                    out.append((mins, maxs))
        return out

    def candidates(stats, col, lo, hi):
        return sum(1 for mn, mx in stats if not (mx[col] < lo or mn[col] > hi))

    lin_stats, zor_stats = file_stats(lin), file_stats(zor)
    assert len(lin_stats) > 8 and len(zor_stats) > 8

    # narrow user-range predicate: time-sorted layout scans everything,
    # z-order confines the range to a minority of files
    a_lo, a_hi = 10000, 14000
    assert candidates(lin_stats, "a", a_lo, a_hi) == len(lin_stats)
    assert candidates(zor_stats, "a", a_lo, a_hi) <= len(zor_stats) // 2

    # time-range predicate: z-order still prunes (coarser than the
    # time-sorted optimum, but never the full scan)
    bs = sorted(b for mn, _mx in zor_stats for b in [mn["b"]])
    b_lo, b_hi = bs[0], bs[0] + 2000
    assert candidates(zor_stats, "b", b_lo, b_hi) < len(zor_stats)


def test_bloom_probe_is_broadcast_never_nested_loop(spark, sf_dir):
    df = registry.REGISTRY["decontaminate_bloom_eval"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # sketch (<=2048 rows) and bench-gram dim both broadcast; the corpus
    # gram side is never the build side and never a cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_scores_only_query_term_postings(spark, sf_dir):
    df = registry.REGISTRY["bm25_search_topk"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # the 3-term query table broadcasts into the postings scan, and the
    # top-20 compiles to TakeOrderedAndProject (no global sort)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_joins_are_broadcast_lookups(spark, sf_dir):
    df = registry.REGISTRY["pq_adc_topk"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes; training materializations run here
    plan = _executed_plan(df)
    # code->distance lookup table is a broadcast; corpus never self-joins
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_register_agg_is_partial(spark, sf_dir):
    df = registry.REGISTRY["hll_distinct_portable"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # register table: partial max per partition before the shuffle — the
    # map-side combine that makes the sketch O(m) per partition
    assert "partial_max" in plan


def test_ivfadc_cell_prune_and_code_lookups_are_broadcast(spark, sf_dir):
    df = registry.REGISTRY["ivfadc_topk"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes; coarse/PQ training materializes here
    plan = _executed_plan(df)
    # the (cell, m, code) ADC distance table join is the cell prune AND
    # the code lookup in one broadcast hash join; no corpus self-join,
    # no cartesian product over data
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # final top-k is a heap, not a global sort of the estimates
    assert "TakeOrderedAndProject" in plan


# --- B7 bucketed layout: the persisted shuffle -------------------------


def test_bucketed_join_reads_colocated_data(spark, sf_dir):
    """Both sides hash-bucketed on the join key at write time: the SMJ's
    hashpartitioning requirement is satisfied by the scan itself, so the
    join subtree contains NO Exchange at all — the one-time-write,
    many-time-join layout for recurring fact⨝fact joins at 100 TB."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        bucketed_orders_customer,
    )

    o, c = bucketed_orders_customer(spark, sf_dir)
    j = o.hint("merge").join(c, o.o_custkey == c.c_custkey)
    j.collect()
    plan = _executed_plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") >= 2
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_bucketed_groupby_on_bucket_key_has_no_shuffle(spark, sf_dir):
    """Aggregating on the bucket key reuses the persisted placement too:
    partial and final HashAggregate fuse into one codegen stage over the
    scan, with no Exchange between them."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        bucketed_orders_customer,
    )

    o, _ = bucketed_orders_customer(spark, sf_dir)
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    agg.collect()
    plan = _executed_plan(agg)
    assert "Exchange" not in plan
    assert "partial_sum" in plan


def test_bucketed_query_shuffles_only_the_final_aggregate(spark, sf_dir):
    """The registered query's only exchange is the tiny post-join
    mktsegment rollup — neither fact side shuffles on custkey."""
    df = registry.REGISTRY["bucketed_colocated_join"].fn(spark, sf_dir)
    df.collect()
    plan = _executed_plan(df)
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert "SortMergeJoin" in plan


def test_bucketed_point_filter_prunes_to_one_bucket(spark, sf_dir):
    """Bucket pruning: an equality filter on the bucket key reads ONE of
    the 8 bucket files — the hash-placement twin of partition pruning.
    (autoBucketedScan must be off for a bare filter scan: with nothing
    needing the distribution the planner otherwise reverts to a plain
    scan; joins/aggs keep bucketed reads automatically.)"""
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        bucketed_orders_customer,
    )

    o, _ = bucketed_orders_customer(spark, sf_dir)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        df = o.where(F.col("o_custkey") == 37)
        df.collect()
        plan = _executed_plan(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(key, old)


def test_hilbert_key_is_bijective_and_stepwise_adjacent(spark):
    """The Hilbert curve's defining property: over a full 32x32 grid the
    key is a bijection onto [0, 1024) and every consecutive key pair is
    grid-adjacent (manhattan distance exactly 1) — the no-seams
    guarantee Z-order lacks, and the reason consecutive-key file ranges
    stay in tight bounding boxes."""
    from kafka_clickhouse_ingest_pipeline_spark.plans import layout as L

    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r.d
        for r in grid.select(
            "x", "y", L.hilbert_key("x", "y", 5).alias("d")
        ).collect()
    }
    assert sorted(got.values()) == list(range(n * n))
    inv = {d: xy for xy, d in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_buckets_are_no_looser_than_zorder(spark):
    """The locality claim, measured: on the same events keying, the mean
    per-bucket bounding-box area under the Hilbert key must not exceed
    the Z-order key's (Z-curve seams inflate its boxes)."""
    from kafka_clickhouse_ingest_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    h = registry.REGISTRY["hilbert_locality_stats"].fn(spark, sf).collect()
    z = registry.REGISTRY["zorder_locality_stats"].fn(spark, sf).collect()
    mean_h = sum(r.bbox_area for r in h) / len(h)
    mean_z = sum(r.bbox_area for r in z) / len(z)
    assert mean_h <= mean_z, (mean_h, mean_z)


def test_hilbert_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """write_hilbert's file-level min/max stats admit 2-d pruning at
    least as selectively as the z-ordered layout on the same data and
    predicate — the write-path proof that the tighter Hilbert boxes
    (see test_hilbert_buckets_are_no_looser_than_zorder) turn into
    fewer candidate files."""
    import os

    import pyarrow.parquet as pq

    from kafka_clickhouse_ingest_pipeline_spark.plans import layout as ZL
    from kafka_clickhouse_ingest_pipeline_spark.functions.temporal import epoch_ms
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    keyed = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("ua"),
        (F.floor(epoch_ms("ts") / F.lit(1000)).cast("long") % 65536).alias("ub"),
    )
    bounds = keyed.agg(
        F.min("ua").alias("mina"),
        F.max("ua").alias("maxa"),
        F.min("ub").alias("minb"),
        F.max("ub").alias("maxb"),
    )
    ev = keyed.crossJoin(F.broadcast(bounds)).select(
        ZL.scale_to_bits("ua", "mina", "maxa", 16).alias("a"),
        ZL.scale_to_bits("ub", "minb", "maxb", 16).alias("b"),
    )
    zor, hil = str(tmp_path / "zorder"), str(tmp_path / "hilbert")
    ZL.write_zordered(ev, zor, "a", "b", bits=16, target_partitions=16)
    ZL.write_hilbert(ev, hil, "a", "b", bits=16, target_partitions=16)

    def file_stats(d):
        out = []
        for root, _dirs, files in os.walk(d):
            for f in files:
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                mins, maxs = {}, {}
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    for ci in range(row.num_columns):
                        col = row.column(ci)
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        name = col.path_in_schema
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
                if mins:
                    out.append((mins, maxs))
        return out

    def candidates(stats, col, lo, hi):
        return sum(1 for mn, mx in stats if not (mx[col] < lo or mn[col] > hi))

    zs, hs = file_stats(zor), file_stats(hil)
    assert len(zs) > 8 and len(hs) > 8
    a_lo, a_hi = 10000, 14000
    # both prune the user dimension; Hilbert at least as selectively
    assert candidates(hs, "a", a_lo, a_hi) <= candidates(zs, "a", a_lo, a_hi)
    assert candidates(hs, "a", a_lo, a_hi) <= len(hs) // 2
    # and the time dimension still prunes under Hilbert too
    bs = sorted(mn["b"] for mn, _mx in hs)
    assert candidates(hs, "b", bs[0], bs[0] + 2000) < len(hs)


def test_q7_double_dimension_path_broadcasts(spark, sf_dir):
    """Q7's topology: the fact table reaches nation twice (via customer
    and via supplier); at this SF every dimension side broadcasts and
    the shipdate range reaches the lineitem scan."""
    df = registry.REGISTRY["q7_binational_trade_volume"].fn(spark, sf_dir)
    df.collect()
    plan = _executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q10_top20_is_a_heap(spark, sf_dir):
    df = registry.REGISTRY["q10_returned_item_reporting"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan  # pushed to the scan


def test_hilbert_arrow_kernel_matches_jvm_fold_exactly(spark):
    """hilbert_key now emits the Arrow kernel; the JVM struct fold it
    replaced survives as hilbert_key_expr. Pure integer math — the two
    must agree on EVERY point of a full grid, not statistically."""
    from kafka_clickhouse_ingest_pipeline_spark.plans import layout as L

    n = 1 << 5
    pts = spark.range(n * n).selectExpr(
        "id % 32 AS x", "id DIV 32 AS y"
    )
    cmp = pts.select(
        L.hilbert_key("x", "y", 5).alias("arrow"),
        L.hilbert_key_expr("x", "y", 5).alias("jvm"),
    )
    assert cmp.where("arrow != jvm").count() == 0


def test_index_self_joins_never_broadcast_corpus_sized_sides(spark, sf_dir):
    """Round-9 regression pin for the 256x-probe finding: checkpointed
    index tables inherit underestimated stats, so without explicit
    shuffle_hash hints Catalyst broadcast the ENTIRE shingle inverted
    index / signature table / first-owner aggregate as a join build
    side (>1 GB driver collect at depth; fatal on a cluster). The final
    plans of the pair-generating queries must contain NO
    BroadcastExchange at all — their only legitimate broadcasts
    (1-row stats, eval probes) don't appear in these plans — and the
    shingle self-join must be a shuffle join (merge-hinted spillable
    SortMergeJoin since the r11 256x OOM finding; the r12 size-carry
    removed the two ShuffledHashJoin size joins that used to also
    appear in this plan — set sizes now ride the index rows)."""
    jac = registry.REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, sf_dir)
    plan = _executed_plan(jac)
    assert "BroadcastExchange" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan
    for q in ("dedup_minhash_lsh_pairs", "doc_novelty_scores"):
        p = _executed_plan(registry.REGISTRY[q].fn(spark, sf_dir))
        assert "BroadcastExchange" not in p, (q, p[:2000])


def _join_lines(plan: str, node: str) -> list[str]:
    return [ln for ln in plan.splitlines() if node in ln]


def test_lpa_step_never_broadcasts_checkpointed_sides(spark):
    """Round-10 operator-level pin (round-9 VERDICT #1): LPA's
    per-iteration joins execute INSIDE materialize(), so query-level
    plan pins can't see them. Built from checkpointed inputs — the
    exact mid-loop state whose underestimated LogicalRDD stats made
    Catalyst broadcast the graph-sized label table — the step plan
    must contain no broadcast at all: every side is graph-sized."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.graph import _lpa_step

    nodes = spark.range(600).select(F.col("id").alias("node"))
    edges = spark.range(1200).select(
        (F.col("id") % 600).alias("src"), ((F.col("id") * 7 + 1) % 600).alias("dst")
    )
    und = (
        edges.union(edges.select(F.col("dst"), F.col("src")))
        .where("src != dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    lbl = nodes.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    step = _lpa_step(und, lbl)
    plan = _executed_plan(step)
    assert "BroadcastExchange" not in plan, plan[:2000]
    assert "ShuffledHashJoin" in plan


def test_logreg_step_broadcasts_only_bounded_sides(spark):
    """Round-10 operator-level pin (round-9 VERDICT #2): one gradient
    step built from checkpointed feats/labels/weights. The corpus-sized
    joins (keyed on doc_id) must be ShuffledHashJoins; the only
    broadcasts allowed are the genuinely-bounded sides — the
    (n_dims+1)-row weight table (keyed on dim) and the 1-row doc count
    (the BroadcastNestedLoopJoin cross join)."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import classifier as C

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 37).cast("string"),
                 F.lit(" word"), (F.col("id") % 11).cast("string")).alias("text"),
        (F.col("id") % 2).cast("double").alias("y"),
    )
    feats = C.hashed_features(docs, "text", "doc_id").localCheckpoint(eager=True)
    labels = docs.select("doc_id", "y").localCheckpoint(eager=True)
    n = labels.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = feats.select("dim").distinct().select(
        "dim", F.lit(0.0).alias("wt")
    ).localCheckpoint(eager=True)
    _p, new_w = C._logreg_step(feats, labels, w, n, "doc_id", 0.5)
    plan = _executed_plan(new_w)
    doc_joins = [
        ln for ln in _join_lines(plan, "ShuffledHashJoin") if "doc_id#" in ln
    ]
    assert len(doc_joins) >= 2, plan[:3000]
    for ln in _join_lines(plan, "BroadcastHashJoin"):
        assert "dim#" in ln, (ln, plan[:3000])


def test_ivf_budgeted_corpus_join_not_broadcast(spark):
    """Round-10 pin (round-9 ADVICE #5): ivf_budgeted_topk's
    candidate->corpus join. Under a corpus-scale budget (the
    drift-recovery query uses ceil(N/8)) the candidate side is
    corpus-sized and derives from the aggregate-shaped assignment
    table, so it must shuffle — broadcasts are only legitimate on the
    bounded probe (cell) and query (q_id) sides."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import similarity as S

    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 13).cast("double"),
            (F.col("id") % 7).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    )
    _asg, cents = S.kmeans_cells(emb, k=4, iters=2, with_centroids=True)
    cents = cents.localCheckpoint(eager=True)  # bounded (k rows); cut the
    # seeding lineage so the audit sees only the budgeted-topk joins
    assign = S.ivf_assign(emb, cents).localCheckpoint(eager=True)
    queries = emb.where("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    topk = S.ivf_budgeted_topk(
        emb, assign, cents, queries, nprobe=2, budget=50, k=5
    )
    plan = _executed_plan(topk)
    for ln in _join_lines(plan, "BroadcastHashJoin"):
        assert "cell#" in ln or "q_id#" in ln, (ln, plan[:3000])
    assert any(
        "vec_id#" in ln for ln in _join_lines(plan, "ShuffledHashJoin")
    ), plan[:3000]


def test_drift_verdict_join_never_broadcasts_verdict_sides(spark, sf_dir):
    """Round-11 operator-level pin, hardened in round 12 (r11 ADVICE
    low): curation_drift_report's iverd x rverd verdict join. Both
    sides are increment-scaled and derive from materialize()d frames
    (underestimated LogicalRDD stats — the auto-broadcast bug class),
    and the final query plan can't be audited because jd is itself
    eagerly checkpointed. Built at the operator, and asserted under
    BOTH the default config AND spark.sql.adaptive.enabled=false —
    the rverd side now carries an explicit merge hint, so the
    spillable SortMergeJoin shape no longer depends on stats clearing
    the broadcast threshold or on AQE demotion. The only
    BroadcastHashJoins allowed are dim-keyed (the HT_DIM+1-row weight
    tables, bounded by construction)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        _frozen_nightly_state,
        _judge_increment,
        _rebuild_verdicts,
    )

    for aqe in ("true", "false"):
        old = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        try:
            state = _frozen_nightly_state(spark, sf_dir)
            incr = state["corpus"].where(F.col("doc_id") % 10 == 0)
            j = (
                _judge_increment(incr, state)
                .alias("i")
                .join(
                    _rebuild_verdicts(spark, sf_dir).alias("r").hint("merge"),
                    "doc_id",
                )
            )
            plan = _executed_plan(j)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
        for ln in _join_lines(plan, "BroadcastHashJoin"):
            assert "dim#" in ln, (aqe, ln, plan[:3000])
        doc_joins = [
            ln
            for ln in _join_lines(plan, "SortMergeJoin")
            if "doc_id#" in ln
        ]
        assert doc_joins, (aqe, plan[:3000])


def test_rewrite_tail_is_spillable_merge_join(spark):
    """Round-12 pin (VERDICT r11 #1): the span-removal rewrite tail's
    final joins carry corpus-sized rows WITH the rebuilt text — the
    exact ShuffledHashJoin build side the 256x probe killed with
    `SparkOutOfMemoryError: not enough memory to build hash map` at the
    default 32 partitions. The tail must be a spillable SortMergeJoin
    chain (two SMJs on doc_id reusing one sort order), still with zero
    BroadcastExchange (the checkpoint-stats auto-broadcast class)."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D

    docs = spark.range(800).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta word"),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    for out in (
        D.remove_boilerplate_spans(docs, "text", "doc_id", k=5, min_docs=20),
        D.remove_suffix_duplicate_spans(docs, "text", "doc_id", k=5),
        D.remove_duplicate_spans(docs, "text", "doc_id", 5),
    ):
        plan = _executed_plan(out)
        assert "BroadcastExchange" not in plan, plan[:3000]
        smj = [
            ln for ln in _join_lines(plan, "SortMergeJoin")
            if "doc_id#" in ln and "LeftOuter" in ln
        ]
        assert len(smj) == 2, plan[:3000]
        # no hash join may build on a text-carrying side: doc_id-keyed
        # SHJs are allowed only as the covered-positions anti/semi join
        # (narrow build); dig/chunk-keyed SHJs build narrow gram rows.
        # Key off the first bracket (the join keys) — non-equi residual
        # conditions may mention doc_id on gram-keyed joins.
        for ln in _join_lines(plan, "ShuffledHashJoin"):
            keys = ln.split("[", 1)[1].split("]", 1)[0]
            if "doc_id#" in keys and ("Inner" in ln or "Outer" in ln):
                raise AssertionError((ln, plan[:3000]))


def test_pipeline_stage_joins_build_only_narrow_sides(spark):
    """Round-12 pin (VERDICT r11 #1): curation_pipeline_report's stage-4
    and stage-5 joins execute inside eager checkpoints, so the query
    plan can't be audited — rebuild the join shapes at the operator
    level. The text-carrying side (s3/s4) must NEVER be the hash-join
    build side; hinting only the narrow side (scores / srcmap) still
    forces the SHJ (no broadcast of the underestimated checkpoint
    side) while the hash map holds 16-byte rows."""
    s_text = spark.range(700).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body word "), F.col("id").cast("string")).alias("text"),
    ).localCheckpoint(eager=True)
    scores = (
        s_text.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
        .localCheckpoint(eager=True)
    )
    j4 = s_text.join(
        scores.where(F.col("score") < 2.0).hint("shuffle_hash"), "doc_id"
    ).select("doc_id", "text")
    srcmap = spark.range(700).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    j5 = s_text.join(srcmap.hint("shuffle_hash"), "doc_id")
    for j in (j4, j5):
        plan = _executed_plan(j)
        assert "BroadcastExchange" not in plan, plan[:3000]
        shj = [
            ln for ln in _join_lines(plan, "ShuffledHashJoin")
            if "doc_id#" in ln
        ]
        assert shj and all("BuildRight" in ln for ln in shj), plan[:3000]


def test_bucketed_band_table_scan_needs_no_exchange(spark, sf_dir):
    """Round-12 (VERDICT r11 #5): the nightly LSH band/signature tables
    written through plans/layout.write_bucketed arrive pre-partitioned —
    the increment probe join must show exactly ONE band-key exchange
    (the increment side meeting the bucketed layout) and the corpus
    FileScans must feed their joins with no Exchange above them. This is
    the property that makes the stored-table serving path 2.8x the
    in-session rebuild (tools/band_probe.py)."""
    from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
    from kafka_clickhouse_ingest_pipeline_spark.plans.layout import (
        write_bucketed,
    )
    from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import (
        materialize,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    csig = materialize(
        D.minhash_signatures(docs, "text", "doc_id"), "tb_csig"
    )
    write_bucketed(
        D.lsh_band_table(csig, "doc_id"),
        "tb_band",
        32,
        ("band", "k0", "k1", "k2", "k3"),
    )
    write_bucketed(csig, "tb_sig", 32, ("doc_id",))
    new = docs.where("doc_id % 10 = 0")
    nsig = materialize(
        D.minhash_signatures(new, "text", "doc_id"), "tb_nsig"
    )
    out = D.lsh_pairs_against_corpus(
        nsig, spark.table("tb_band"), spark.table("tb_sig"), "doc_id"
    )
    plan = _executed_plan(out)
    band_ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "band#" in ln
    ]
    assert len(band_ex) == 1, (band_ex, plan[:3000])
    # no exchange directly above either bucketed corpus scan: walk up
    # from each FileScan line — the nearest enclosing Exchange (less
    # indented) must not exist before a Join boundary
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "FileScan" in ln and ("tb_band" in ln or "tb_sig" in ln):
            indent = len(ln) - len(ln.lstrip(" :+-"))
            for j in range(i - 1, -1, -1):
                up = lines[j]
                up_indent = len(up) - len(up.lstrip(" :+-"))
                if up_indent < indent:
                    assert "Exchange" not in up, (ln, up)
                    if "Join" in up:
                        break
                    indent = up_indent


def test_keeper_election_join_is_narrow_shuffle_hash(spark, sf_dir):
    """Round-12 pin: keeper_election joins the checkpoint-derived CC
    label frame (LogicalRDD with underestimated stats — the CLAUDE.md
    auto-broadcast trap) against the projected quality features. Both
    sides are corpus-scaled and NARROW, so the plan must be a
    ShuffledHashJoin with no BroadcastExchange anywhere; the election
    window runs over the cluster key after the join."""
    df = registry.REGISTRY["dedup_keeper_election"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastExchange" not in plan, plan[:2000]
    assert "ShuffledHashJoin" in plan
    assert "Window" in plan


def test_best_keeper_curation_never_broadcasts_and_builds_narrow(spark, sf_dir):
    """Round-12 pin for the quality-keeper curation composite: every
    post-CC join (keeper join, reps semi-join, lang join) is a
    ShuffledHashJoin; the text-carrying planted frame is only ever a
    semi-join STREAM side (the LeftSemi builds the narrow reps side),
    and no BroadcastExchange appears anywhere in the executed plan."""
    df = registry.REGISTRY["curate_training_corpus_best_keeper"].fn(
        spark, sf_dir
    )
    df.collect()  # AQE finalizes the physical plan at execution
    plan = _executed_plan(df)
    assert "BroadcastExchange" not in plan, plan[:2000]
    semis = _join_lines(plan, "LeftSemi")
    assert semis and all("BuildRight" in ln for ln in semis), semis
    assert "ShuffledHashJoin" in plan


def test_image_queries_feed_only_distinct_residues_to_python(spark, sf_dir):
    """Round-12 optimization pin: the synthetic-image queries run their
    encode+decode kernel over the DISTINCT pixel residues (bounded by
    the mod-256/768 seed domain, whatever the corpus size) and
    broadcast-join the features back onto the doc rows — exactly one
    Python node, sitting on the bounded side of a BroadcastHashJoin, so
    the doc rows themselves never cross the Python boundary."""
    for q in (
        "multimodal_jpeg_pixel_features",
        "multimodal_png_pixel_features",
        "multimodal_bmp_pixel_features",
    ):
        df = registry.REGISTRY[q].fn(spark, sf_dir)
        plan = _executed_plan(df)
        assert plan.count("MapInPandas") == 1, q
        assert "BroadcastHashJoin" in plan, q
        assert "pmod" in plan, q
    # The dhash-pair composites reuse the same distinct-residue kernel for
    # their fingerprint subplans (ADVICE r12: a revert to per-doc Python
    # passed the pixel-feature pins alone). The fp frame is materialize()d,
    # so the query plan only shows the checkpoint scan — audit at the
    # operator, not the query (CLAUDE.md): bypass materialize to expose
    # the fp subplan and assert exactly one MapInPandas on the bounded
    # side of a BroadcastHashJoin keyed on the pmod residue.
    import kafka_clickhouse_ingest_pipeline_spark.queries.multimodal as QM

    orig = QM.materialize
    QM.materialize = lambda df, name, **kw: df
    try:
        for q in (
            "multimodal_image_dhash_pairs",
            "multimodal_crossformat_dhash_pairs",
        ):
            df = registry.REGISTRY[q].fn(spark, sf_dir)
            plan = _executed_plan(df)
            # the un-checkpointed fp subtree replicates per consumer, so
            # the node COUNT is shape-dependent — the invariant is that
            # EVERY Python node consumes only the residue column `r`
            # (a per-doc revert would feed it doc_id/payload columns)
            # and the features re-attach through a broadcast join on
            # the pmod residue key
            mip = [ln for ln in plan.splitlines() if "MapInPandas" in ln]
            assert mip and all("(r#" in ln for ln in mip), (q, mip)
            assert "BroadcastHashJoin" in plan, q
            assert "pmod" in plan, q
    finally:
        QM.materialize = orig


def test_range_join_broadcasts_the_bounded_probe_side(spark, sf_dir):
    """Round-12 optimization pin: range_join_order_windows broadcasts
    the per-day probe aggregate (bounded by calendar days), never the
    orders-scaled exploded-interval side — the join must be BuildLeft
    with a single BroadcastExchange."""
    df = registry.REGISTRY["range_join_order_windows"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    # Scope the build-side assertion to the range join itself (the BHJ
    # lines keyed on _bin) so an unrelated future join or AQE naming
    # drift can't fail the pin (ADVICE r12).
    bin_joins = [
        ln for ln in _join_lines(plan, "BroadcastHashJoin") if "_bin#" in ln
    ]
    assert bin_joins, plan[:2000]
    assert all("BuildLeft" in ln for ln in bin_joins), bin_joins


def test_scalar_math_repartition_only_when_underpartitioned(spark, sf_dir):
    """Round-13 pin (VERDICT r12 "What's wrong" #1): scalar_math_funcs'
    repartition-after-read exists for the single-row-group local
    testdata; on a scan that is already split (production parquet is
    splittable) the query must NOT pay a full-table exchange before a
    map-only projection."""
    df = registry.REGISTRY["scalar_math_funcs"].fn(spark, sf_dir)
    assert "Exchange" in _executed_plan(df)  # local 1-split scan: spread

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024))
    try:
        df_split = registry.REGISTRY["scalar_math_funcs"].fn(spark, sf_dir)
        assert "Exchange" not in _executed_plan(df_split)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
