"""Sketch-family invariants: Bloom decontamination and Count-Min heavy
hitters. The oracle gate pins exact values; these tests pin the *structural*
guarantees the sketches must satisfy at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
    decontaminate_bloom_eval,
)
from kafka_clickhouse_ingest_pipeline_spark.queries.text import (
    cms_heavy_hitters_eval,
)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    df = decontaminate_bloom_eval(spark, sf_dir).cache()
    try:
        # every true hit is also a bloom hit, per doc
        assert df.where(F.col("n_bloom_hits") < F.col("n_true_hits")).count() == 0
        # flag-level implication: contaminated_exact -> contaminated_bloom
        assert (
            df.where(
                (F.col("contaminated_exact") == 1) & (F.col("contaminated_bloom") == 0)
            ).count()
            == 0
        )
        # the planted contamination (every 97th doc's grams) is detected
        assert df.where(F.col("contaminated_exact") == 1).count() > 0
    finally:
        df.unpersist()


def test_bloom_false_positive_rate_is_small(spark, sf_dir):
    # m=65536 bits, k=5, |bench grams| well under 2000 at sf0.001 ->
    # theoretical FP rate ~(1-e^(-kn/m))^k is far below 1e-3; assert a loose
    # per-gram ceiling via the per-doc counts.
    df = decontaminate_bloom_eval(spark, sf_dir)
    agg = df.agg(
        F.sum("n_false_pos").alias("fp"), F.sum("n_bloom_hits").alias("hits")
    ).collect()[0]
    assert agg.fp <= max(2, 0.01 * (agg.hits or 1))


def test_cms_overestimates_only(spark, sf_dir):
    df = cms_heavy_hitters_eval(spark, sf_dir).cache()
    try:
        rows = df.collect()
        assert len(rows) == 20
        for r in rows:
            assert r.cms_estimate >= r.exact_freq  # one-sided error
            assert r.overestimate == r.cms_estimate - r.exact_freq
        # heavy hitters are heavy: the CMS error bound eps*N with
        # eps = e/1024 should keep top-term estimates within ~2% of exact
        # at this fixture's token mass; assert a loose 25% ceiling.
        for r in rows:
            assert r.overestimate <= max(5, 0.25 * r.exact_freq)
    finally:
        df.unpersist()


def test_hll_estimate_within_std_error_envelope(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        hll_distinct_portable,
    )

    rows = hll_distinct_portable(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # m=256 -> typical rel. error 1.04/sqrt(256) = 6.5%; 20% is ~3 sigma
        assert r.within_20pct == 1
        assert r.hll_estimate > 0


def test_zorder_key_is_a_bijection_on_the_bit_domain(spark):
    """Interleaving must be information-preserving: distinct (a, b) pairs
    map to distinct z-values, and de-interleaving the bits recovers both
    coordinates exactly."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.plans import layout as ZL

    pairs = spark.range(512).select(
        (F.col("id") % 23 * 89).alias("a"), (F.col("id") * 131 % 65536).alias("b")
    )
    z = pairs.select("a", "b", ZL.zorder_key("a", "b", 16).alias("z"))
    rows = z.collect()
    assert len({r.z for r in rows}) == len({(r.a, r.b) for r in rows})
    for r in rows:
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


def test_double_hash_positions_stay_in_range(spark):
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.functions import hashing as HS

    keys = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    for j in (0, 4):
        stats = keys.select(
            HS.double_hash_pos(F.col("k"), j, HS.BLOOM_BITS).alias("p")
        ).agg(F.min("p"), F.max("p")).collect()[0]
        assert 0 <= stats[0] and stats[1] < HS.BLOOM_BITS


def test_hll_rank_bounds_and_distribution(spark):
    """Rank in [1, 53]; geometric decay means rank 1 covers ~half the
    keys — a sanity check that bin-length arithmetic matches the spec."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.functions import hashing as HS

    keys = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    ranks = keys.select(HS.hll_rank(F.col("k")).alias("r"))
    lo, hi = ranks.agg(F.min("r"), F.max("r")).collect()[0]
    assert 1 <= lo and hi <= 53
    share_r1 = ranks.where(F.col("r") == 1).count() / 4000
    assert 0.4 < share_r1 < 0.6


def test_cms_counters_merge_by_sum_across_partitions(spark, sf_dir):
    """SCALE.md claims CMS counters merge by elementwise SUM — prove it:
    building one sketch per half of the corpus and summing them must give
    the whole-corpus sketch exactly (so per-day/per-partition sketches
    compose without re-reading the data)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.functions import hashing as HS
    from kafka_clickhouse_ingest_pipeline_spark.operators import text as T
    from kafka_clickhouse_ingest_pipeline_spark.queries.text import _CMS_D, _CMS_W
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def sketch(df):
        tf = T.term_frequencies(df, "text")
        rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        HS.double_hash_pos(F.col("term"), r, _CMS_W).alias(
                            "bucket"
                        ),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rb")
        return (
            tf.select(rows, "freq")
            .select("rb.r", "rb.bucket", "freq")
            .groupBy("r", "bucket")
            .agg(F.sum("freq").alias("counter"))
        )

    whole = {(r.r, r.bucket): r.counter for r in sketch(docs).collect()}
    lo = sketch(docs.where(F.col("doc_id") % 2 == 0))
    hi = sketch(docs.where(F.col("doc_id") % 2 == 1))
    merged = {
        (r.r, r.bucket): r.total
        for r in lo.unionByName(hi)
        .groupBy("r", "bucket")
        .agg(F.sum("counter").alias("total"))
        .collect()
    }
    assert merged == whole


def test_quantile_hist_state_merges_by_sum_and_estimates_match(spark, sf_dir):
    """The quantile sketch's merge law, executed: bin-count states built
    on two disjoint halves of lineitem merge by elementwise SUM into
    exactly the single-pass state, and the quantile estimates from the
    merged state equal the single-pass estimates bit-for-bit. This is
    what makes the sketch a per-day/per-micro-batch aggregate at 100 TB:
    no pass ever revisits old data."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.relational import (
        hist_bin_counts,
        hist_quantile_estimates,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    stats, full_counts = hist_bin_counts(li, "l_extendedprice", "l_returnflag")
    # NOTE: the halves must bin against the SAME global (mn, mx) bounds —
    # that is the sketch's one global input, exactly like HLL's hash seed
    half_a = li.where(F.col("l_orderkey") % 2 == 0)
    half_b = li.where(F.col("l_orderkey") % 2 == 1)

    def counts_with_fixed_bounds(part):
        joined = part.select(
            F.col("l_returnflag").alias("flag"), "l_extendedprice"
        ).join(F.broadcast(stats), "flag")
        width = (F.col("mx") - F.col("mn")) / 64.0
        raw = F.floor(
            (F.col("l_extendedprice") - F.col("mn")) / width
        ).cast("long")
        bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
            F.least(F.lit(63), F.greatest(F.lit(0), raw))
        )
        return joined.groupBy("flag", bin_.alias("bin")).agg(
            F.count(F.lit(1)).alias("c")
        )

    merged = (
        counts_with_fixed_bounds(half_a)
        .unionByName(counts_with_fixed_bounds(half_b))
        .groupBy("flag", "bin")
        .agg(F.sum("c").alias("c"))
    )
    full = {
        (r.flag, r.bin): r.c for r in full_counts.collect()
    }
    got = {(r.flag, r.bin): r.c for r in merged.collect()}
    assert got == full

    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    est_full = {
        (r.flag, r.q): r.est_v
        for r in hist_quantile_estimates(stats, full_counts, qs).collect()
    }
    est_merged = {
        (r.flag, r.q): r.est_v
        for r in hist_quantile_estimates(stats, merged, qs).collect()
    }
    assert est_merged == est_full  # bit-identical, not just close
