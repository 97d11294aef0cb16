"""Relational-operator properties not expressible through the DuckDB
oracle: approximate-distinct error bounds, rollup totals, set-op algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

registry.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) lands within a conservative 3×rsd
    of the exact count (HLL++ guarantee is probabilistic; 6% is ~3σ)."""
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = registry.REGISTRY["approx_distinct"].fn(spark, sf_dir).first()[0]
    assert abs(approx - exact) <= max(1, 0.06 * exact), (approx, exact)


def test_rollup_contains_grand_total(spark, sf_dir):
    rows = registry.REGISTRY["rollup_sales"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    assert grand[0].n == li.count()


def test_set_ops_algebra(spark, sf_dir):
    """|A∪B| = |A∩B| + |A\\B| + |B\\A| on the query's own outputs."""
    row = registry.REGISTRY["set_union_intersect_except"].fn(spark, sf_dir).first()
    # n_union = n_intersect + n_except + |building \ big_spenders|
    assert row.n_union >= row.n_intersect + row.n_except
    assert row.n_intersect >= 0 and row.n_except >= 0


def test_topk_is_subset_of_full_sort(spark, sf_dir):
    top = registry.REGISTRY["topk_orders"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    true_top = (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey")
        .collect()
    )
    assert [r.o_orderkey for r in top] == [r.o_orderkey for r in true_top]


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile tracks the exact interpolated percentile within
    a few percent — the sketch path for p99 at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.percentile("l_extendedprice", F.lit(0.9))).first()[0]
    approx = li.select(
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000))
    ).first()[0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_hll_sketch_union_matches_direct(spark, sf_dir):
    """Partial HLL sketches unioned across splits == one whole-table sketch.

    This is the 100 TB distinct-count story: per-partition (or per-day)
    sketches are mergeable state, so distinct counts compose incrementally
    without reshuffling raw keys (SCALE.md section 2).
    """
    from pyspark.sql import functions as F
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).first()["n"]
    merged = (
        o.withColumn("part", F.col("o_orderkey") % 7)
        .groupBy("part")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()["n"]
    )
    assert whole == merged
    exact = o.select("o_custkey").distinct().count()
    assert abs(whole - exact) / exact < 0.05


def test_equidepth_approx_bounds_match_exact(spark, sf_dir):
    """The documented 100 TB swap for histogram_equidepth_prices: cut
    points from percentile_approx (mergeable sketch, no full-column
    buffer in the reducer) give the same bucketing as exact percentile
    at high accuracy — and the bucket depths stay near-equal."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.registry import REGISTRY
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    fracs = [i / 8.0 for i in range(1, 8)]
    bounds = orders.agg(
        F.percentile_approx(
            F.col("o_totalprice"),
            F.array(*[F.lit(q) for q in fracs]),
            F.lit(100000),
        ).alias("bs")
    )
    p = F.col("o_totalprice")
    bucket = F.size(F.filter(F.col("bs"), lambda x: p > x))
    depths = [
        r["n"]
        for r in orders.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
        .collect()
    ]
    n = sum(depths)
    assert len(depths) == 8
    # equi-depth within sketch tolerance: every bucket within 10% of n/8
    assert all(abs(d - n / 8) <= 0.1 * n / 8 + 2 for d in depths), depths


def test_data_quality_rules_fire_on_violations(spark):
    """The report's rule shapes must detect real violations, not just
    report zeros on clean data: range, uniqueness, and FK breaks on a
    corrupted fixture each surface a non-zero count."""
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(1, 10.0), (1, 99.0), (2, -3.0), (7, 5.0)],
        "l_orderkey long, l_quantity double",
    )
    orders = spark.createDataFrame([(1,), (1,), (2,)], "o_orderkey long")

    n_range = li.agg(
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long"))
    ).collect()[0][0]
    assert n_range == 2  # 99.0 and -3.0

    n_dupe = orders.agg(
        F.count(F.lit(1)) - F.countDistinct("o_orderkey")
    ).collect()[0][0]
    assert n_dupe == 1  # o_orderkey 1 twice

    n_fk = (
        li.join(orders.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .count()
    )
    assert n_fk == 1  # orderkey 7 has no parent
