"""Asserted scale probe (VERDICT r3 #2): linearity is the load-bearing
100 TB claim — this test FAILS if a future change reintroduces a
quadratic plan in any probed family, instead of just reporting it.

Corpus: sf0.01 documents/embeddings scaled 1x -> 16x with the same
perturbed-union scheme as tools/scale_probe.py (duplicate structure held
constant, so pair counts grow linearly by construction). Bound:
time(16x) <= 1.5 * 16 * max(time(1x), floor) — a quadratic pair plan
grows ~256x and clears the bound by an order of magnitude even on this
noisy box; the floor keeps sub-second 1x timings from making the bound
flaky-tight.
"""

from __future__ import annotations

import time

import pytest

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table
from tools.scale_probe import _write_chunked, scaled_docs, scaled_emb

registry.load_all()

SF = "/root/testdata/sf0.01"
SCALES = (1, 16)
BOUND_FACTOR = 1.5  # time growth allowed per unit of data growth
FLOOR_S = 0.5  # amortizes fixed job/stage overhead at tiny 1x timings

PROBED = [
    # the pair-generating family — where a quadratic would hide
    "dedup_ngram_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_semdedup_keep",
    # shuffle/agg families
    "text_top_terms",
    "dedup_exact_docs",
    "dedup_minhash_lsh_pairs",
    "ann_lsh_topk",
    "bm25_search_topk",
    "bm25_indexed_topk",
    # round 4 cont.: gram min-ownership novelty, batched multi-probe ANN
    "doc_novelty_scores",
    "ann_batch_topk",
    # round 5: first-owner vocabulary + broadcast checkpoint grid
    "vocab_growth_heaps",
]


@pytest.fixture(scope="module")
def scaled_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scaleprobe")
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    emb = emb.select(
        *[c for c in ("vec_id", "embedding", "label") if c in emb.columns]
    )
    dirs = {}
    for s in SCALES:
        d = base / f"x{s}"
        d.mkdir()
        scaled_docs(docs, s).repartition(8).write.parquet(
            str(d / "documents.parquet")
        )
        scaled_emb(emb, s).repartition(8).write.parquet(
            str(d / "embeddings.parquet")
        )
        dirs[s] = str(d)
    return dirs


def _best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


@pytest.mark.parametrize("qname", PROBED)
def test_time_growth_is_at_most_linear(spark, scaled_dirs, qname):
    times = {}
    for s in SCALES:
        df = registry.REGISTRY[qname].fn(spark, scaled_dirs[s])
        run = lambda: df.write.mode("overwrite").format("noop").save()
        run()  # warm (plan + shuffle files + any index build)
        times[s] = _best_of(run)
    data_growth = SCALES[-1] / SCALES[0]
    bound = BOUND_FACTOR * data_growth * max(times[SCALES[0]], FLOOR_S)
    assert times[SCALES[-1]] <= bound, (
        f"{qname}: {times[SCALES[0]]:.2f}s @1x -> "
        f"{times[SCALES[-1]]:.2f}s @{SCALES[-1]}x exceeds the "
        f"{BOUND_FACTOR}x-linear bound {bound:.2f}s — a super-linear "
        "plan crept in"
    )


# --- 256x extension (VERDICT r8 #5) ----------------------------------------
# The pair-generating families grew fastest at 64x; this pins one more
# 16x (16x -> 256x of sf0.01) with the same at-or-below-data-growth
# criterion, so a DF-cap or suffix-index regression that only bends at
# depth fails CI, not just the SCALEPROBE report. Baseline is 16x (not
# 1x) so fixed job overhead is already amortized on both sides.
SCALES_256 = (16, 256)
PAIR_PROBED = [
    "dedup_ngram_jaccard_pairs",
    "dedup_containment_pairs",
    "doc_novelty_scores",
    "dedup_suffix_spans",
    "dedup_suffix_remove",
]


@pytest.fixture(scope="module")
def scaled_dirs_256(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scaleprobe256")
    docs = load_table(spark, SF, "documents")
    dirs = {}
    for s in SCALES_256:
        d = base / f"x{s}"
        d.mkdir()
        # chunked appends, not one s-way union plan: a single 256-way
        # union OOMed the 24g probe JVM during shuffle write (round-9
        # ADVICE low — keep the CI fixture on the same write path
        # tools/scale_probe.py uses)
        _write_chunked(scaled_docs, docs, s, str(d / "documents.parquet"))
        dirs[s] = str(d)
    return dirs


@pytest.mark.parametrize("qname", PAIR_PROBED)
def test_pair_families_hold_at_256x(spark, scaled_dirs_256, qname):
    times = {}
    for s in SCALES_256:
        df = registry.REGISTRY[qname].fn(spark, scaled_dirs_256[s])
        run = lambda: df.write.mode("overwrite").format("noop").save()
        run()  # warm
        times[s] = _best_of(run)
    data_growth = SCALES_256[-1] / SCALES_256[0]
    bound = BOUND_FACTOR * data_growth * max(times[SCALES_256[0]], FLOOR_S)
    assert times[SCALES_256[-1]] <= bound, (
        f"{qname}: {times[SCALES_256[0]]:.2f}s @16x -> "
        f"{times[SCALES_256[-1]]:.2f}s @256x exceeds the "
        f"{BOUND_FACTOR}x-linear bound {bound:.2f}s — the pair family "
        "bends super-linear at depth"
    )


# --- iterative families (round-9 VERDICT #2) --------------------------------
# The graph/classifier loops do their per-round work EAGERLY at plan-build
# time (materialize() checkpoints each round), so these probes time a FRESH
# build + execution per run — re-running a built frame would time only the
# final checkpoint read and hide a super-linear loop entirely (the same
# blind spot that hid the checkpoint-stats auto-broadcast). 16x -> 256x
# with the same at-or-below-data-growth criterion as the pair families.
ITER_PROBED = [
    "pagerank_doc_quality",
    "label_propagation_communities",
    "dedup_minhash_clusters",
    "graph_triangle_counts",
    "quality_classifier_scores",
    # round 12: keeper re-election = CC + one narrow hinted join + one
    # cluster-key window; rides the same fixture and rebuild-per-run
    # discipline so a super-linear election plan fails CI like any loop
    "dedup_keeper_election",
]


@pytest.mark.parametrize("qname", ITER_PROBED)
def test_iterative_families_hold_at_256x(spark, scaled_dirs_256, qname):
    fn = registry.REGISTRY[qname].fn
    times = {}
    for s in SCALES_256:
        run = lambda: fn(spark, scaled_dirs_256[s]).write.mode(
            "overwrite"
        ).format("noop").save()
        run()  # warm
        times[s] = _best_of(run)
    data_growth = SCALES_256[-1] / SCALES_256[0]
    bound = BOUND_FACTOR * data_growth * max(times[SCALES_256[0]], FLOOR_S)
    assert times[SCALES_256[-1]] <= bound, (
        f"{qname}: {times[SCALES_256[0]]:.2f}s @16x -> "
        f"{times[SCALES_256[-1]]:.2f}s @256x exceeds the "
        f"{BOUND_FACTOR}x-linear bound {bound:.2f}s — the iterative "
        "family bends super-linear at depth"
    )


# --- composed pipeline (round-11 VERDICT #3) --------------------------------
# The six-stage nightly pipeline, end to end: stage interactions (scrub
# shrinking the dedup input, the classifier training on survivors,
# packing over the survivor set) could bend at depth where each stage
# alone stays linear — so the COMPOSITION gets its own 16x -> 256x
# rebuild-per-run bound, same discipline as the iterative families
# (stages checkpoint eagerly at plan-build time).
def test_composed_pipeline_holds_at_256x(spark, scaled_dirs_256):
    fn = registry.REGISTRY["curation_pipeline_report"].fn
    times = {}
    for s in SCALES_256:
        run = lambda: fn(spark, scaled_dirs_256[s]).write.mode(
            "overwrite"
        ).format("noop").save()
        run()  # warm
        times[s] = _best_of(run)
    data_growth = SCALES_256[-1] / SCALES_256[0]
    bound = BOUND_FACTOR * data_growth * max(times[SCALES_256[0]], FLOOR_S)
    assert times[SCALES_256[-1]] <= bound, (
        f"curation_pipeline_report: {times[SCALES_256[0]]:.2f}s @16x -> "
        f"{times[SCALES_256[-1]]:.2f}s @256x exceeds the "
        f"{BOUND_FACTOR}x-linear bound {bound:.2f}s — the composed "
        "pipeline bends super-linear at depth"
    )


# --- events-based families (round-12, VERDICT r11 #3) ------------------------
# The one family with no growth data until round 12: funnel,
# sessionization, asof join, rolling median, HLL all read events (and
# orders), which every other probe mode pins at 1x. Scaled by id-offset
# copies (user_id/event_id/o_custkey/o_orderkey per-copy disjoint, ts
# untouched) so per-copy temporal structure is identical and the bound
# measures the engine, not merged sessions.
EVENTS_PROBED = [
    "funnel_view_click_purchase",
    "session_window_agg",
    "asof_join_latest_order",
    "window_rolling_median",
    "hll_distinct_portable",
]


@pytest.fixture(scope="module")
def scaled_event_dirs(spark, tmp_path_factory):
    from pathlib import Path

    from tools.scale_probe import scaled_events, scaled_orders

    base = tmp_path_factory.mktemp("scaleprobe_events")
    ev = load_table(spark, SF, "events")
    orders = spark.read.parquet(str(Path(SF) / "orders.parquet"))
    dirs = {}
    for s in SCALES:
        d = base / f"x{s}"
        d.mkdir()
        scaled_events(ev, s).repartition(8).write.parquet(
            str(d / "events.parquet")
        )
        scaled_orders(orders, s).repartition(8).write.parquet(
            str(d / "orders.parquet")
        )
        for p in Path(SF).glob("*.parquet"):
            if p.stem not in ("events", "orders"):
                (d / p.name).symlink_to(p)
        dirs[s] = str(d)
    return dirs


@pytest.mark.parametrize("qname", EVENTS_PROBED)
def test_events_families_growth_is_at_most_linear(
    spark, scaled_event_dirs, qname
):
    times = {}
    for s in SCALES:
        df = registry.REGISTRY[qname].fn(spark, scaled_event_dirs[s])
        run = lambda: df.write.mode("overwrite").format("noop").save()
        run()  # warm
        times[s] = _best_of(run)
    data_growth = SCALES[-1] / SCALES[0]
    bound = BOUND_FACTOR * data_growth * max(times[SCALES[0]], FLOOR_S)
    assert times[SCALES[-1]] <= bound, (
        f"{qname}: {times[SCALES[0]]:.2f}s @1x -> "
        f"{times[SCALES[-1]]:.2f}s @{SCALES[-1]}x exceeds the "
        f"{BOUND_FACTOR}x-linear bound {bound:.2f}s — a super-linear "
        "events plan crept in"
    )
