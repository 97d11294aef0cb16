"""Temporal joins: as-of (union-sentinel) and binned range join.

Each operator is cross-checked against the naive formulation built from
plain Spark joins — same engine, independent plan — on sf0.001, plus plan
assertions that the scale-relevant shape holds (one shuffle / no cartesian).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import temporal_join as TJ
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def _probe(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", TJ.probe_timestamp(F.col("event_id")).alias("pts")
    )


def _orders(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .withColumnRenamed("o_custkey", "user_id")
    )


def _naive_asof(probe, build):
    """Inequality join + row_number — the quadratic reference semantics."""
    j = probe.join(
        build, (probe.user_id == build.user_id) & (build.o_orderdate <= probe.pts), "left"
    ).select(
        probe.event_id, probe.user_id, probe.pts,
        build.o_orderkey, build.o_totalprice, build.o_orderdate,
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def test_asof_matches_naive_inequality_join(spark, sf_dir):
    probe, build = _probe(spark, sf_dir), _orders(spark, sf_dir)
    fast = (
        TJ.asof_join(
            probe, build,
            key="user_id", probe_ts="pts", build_ts="o_orderdate",
            payload_cols=["o_orderkey", "o_totalprice", "o_orderdate"],
            tiebreak_col="o_orderkey",
        )
        .select(
            "event_id",
            F.col("matched.o_orderkey").alias("o_orderkey"),
            F.col("matched.o_totalprice").alias("o_totalprice"),
        )
    )
    slow = _naive_asof(probe, build).select("event_id", "o_orderkey", "o_totalprice")
    assert fast.count() == probe.count()
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_asof_left_semantics_yields_nulls(spark, sf_dir):
    """Probes before a customer's first order must survive with a null match."""
    probe, build = _probe(spark, sf_dir), _orders(spark, sf_dir)
    out = TJ.asof_join(
        probe, build,
        key="user_id", probe_ts="pts", build_ts="o_orderdate",
        payload_cols=["o_orderkey"], tiebreak_col="o_orderkey",
    )
    n_null = out.where(F.col("matched").isNull()).count()
    first_order = build.groupBy("user_id").agg(F.min("o_orderdate").alias("d0"))
    expected = (
        probe.join(first_order, "user_id", "left")
        .where(F.col("d0").isNull() | (F.col("pts") < F.col("d0")))
        .count()
    )
    assert n_null == expected
    assert n_null > 0  # the fixture genuinely exercises the null path


def test_asof_plan_has_single_shuffle_and_no_join(spark, sf_dir):
    probe, build = _probe(spark, sf_dir), _orders(spark, sf_dir)
    out = TJ.asof_join(
        probe, build,
        key="user_id", probe_ts="pts", build_ts="o_orderdate",
        payload_cols=["o_orderkey"], tiebreak_col="o_orderkey",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_matches_naive_inequality_join(spark, sf_dir):
    probe = _probe(spark, sf_dir).select("event_id", "pts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        .select("o_orderkey", "o_orderdate")
    )
    fast = TJ.range_join_binned(
        probe, orders, probe_ts="pts", interval_start="o_orderdate", width_days=3
    ).select("event_id", "o_orderkey")
    slow = probe.join(
        orders,
        (probe.pts >= orders.o_orderdate)
        & (probe.pts < F.date_add(orders.o_orderdate, 3).cast("timestamp")),
    ).select("event_id", "o_orderkey")
    assert fast.count() == slow.count()
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    assert fast.count() > 0


def test_ivf_topk_recall_against_bruteforce(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    exact = {r.vec_id for r in S.brute_force_topk(emb, q, k=10).collect()}
    ivf_all_cells = S.ivf_topk(
        emb, q, nprobe=emb.select("label").distinct().count(), k=10
    )
    # probing every cell must reduce to the exact result
    assert {r.vec_id for r in ivf_all_cells.collect()} == exact
    # the pruned search returns k rows from <= nprobe cells
    pruned = S.ivf_topk(emb, q, nprobe=2, k=10).collect()
    assert len(pruned) == 10
    assert len({r.label for r in pruned}) <= 2
