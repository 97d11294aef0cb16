"""PageRank operator properties (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators.graph import pagerank


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src long, dst long")


def test_rank_mass_is_conserved(spark):
    # damped PageRank with dangling completion is a stochastic matrix:
    # total rank must stay 1 every run
    nodes = _nodes(spark, range(6))
    edges = _edges(spark, [(0, 1), (1, 2), (2, 0), (3, 4)])  # 4,5 dangling
    pr = pagerank(nodes, edges, iterations=4)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_uniform_cycle_is_the_fixpoint(spark):
    # a directed cycle is already stationary: every node keeps 1/n
    n = 5
    nodes = _nodes(spark, range(n))
    edges = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    pr = pagerank(nodes, edges, iterations=3)
    vals = {r.node: r.pr for r in pr.collect()}
    for v in vals.values():
        assert v == pytest.approx(1.0 / n, abs=1e-9)


def test_sink_hub_outranks_spokes(spark):
    # star pointing at node 0: the hub must end up with the highest rank
    nodes = _nodes(spark, range(5))
    edges = _edges(spark, [(i, 0) for i in range(1, 5)])
    pr = pagerank(nodes, edges, iterations=5)
    vals = {r.node: r.pr for r in pr.collect()}
    assert vals[0] == max(vals.values())
    spokes = [vals[i] for i in range(1, 5)]
    assert max(spokes) == pytest.approx(min(spokes), abs=1e-12)


def test_multi_edges_weight_contributions(spark):
    # double edge 0->1 vs single 0->2: node 1 gets twice node 2's share
    nodes = _nodes(spark, range(3))
    edges = _edges(spark, [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)])
    pr = pagerank(nodes, edges, iterations=8)
    vals = {r.node: r.pr for r in pr.collect()}
    assert vals[1] > vals[2]


def test_all_dangling_graph_stays_uniform(spark):
    """No edges at all: every node is dangling, mass redistributes
    uniformly each round, so ranks stay exactly 1/n."""
    import pytest as _pt

    nodes = _nodes(spark, range(4))
    edges = spark.createDataFrame([], "src long, dst long")
    pr = pagerank(nodes, edges, iterations=3)
    for r in pr.collect():
        assert r.pr == _pt.approx(0.25, abs=1e-9)
