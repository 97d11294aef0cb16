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


def test_label_propagation_separates_disjoint_cliques(spark):
    """Two disjoint triangles must converge to exactly two communities,
    each labeled by its smallest member (the deterministic tie-break);
    an isolated node keeps its own label."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_clickhouse_ingest_pipeline_spark.operators.graph import (
        label_propagation,
    )

    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]  # noqa: E731
    edges = spark.createDataFrame(
        tri(0, 1, 2) + tri(3, 4, 5), "src long, dst long"
    )
    out = {r.node: r.label for r in label_propagation(nodes, edges, 4).collect()}
    assert {out[0], out[1], out[2]} == {0}
    assert {out[3], out[4], out[5]} == {3}
    assert out[6] == 6  # isolated: keeps its own label


def test_label_propagation_is_deterministic_across_runs(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        label_propagation_communities,
    )

    a = [tuple(r) for r in label_propagation_communities(spark, sf_dir).collect()]
    b = [tuple(r) for r in label_propagation_communities(spark, sf_dir).collect()]
    assert a == b
    assert len(a) > 0


def test_triangle_counts_hand_checked(spark):
    """K4 plus a pendant path: K4 has C(4,3)=4 triangles, each K4 node
    sits in exactly 3; path nodes sit in none (omitted). Duplicate,
    reversed, and self-loop edges must not change counts."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 10), (10, 11)]  # pendant path
    edges += [(1, 0), (2, 2), (0, 1)]  # reversed dup + self-loop + dup
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_star_has_none(spark):
    """A hub star has no triangles — and under degree-ordered
    orientation the hub generates no wedges either (every edge points
    INTO it), which is exactly the skew property the operator exists
    for."""
    from kafka_clickhouse_ingest_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    star = [(0, i) for i in range(1, 30)]
    df = spark.createDataFrame(star, "src long, dst long")
    assert triangle_counts(df).count() == 0


def test_pagerank_convergence_curve_decays_geometrically(spark, sf_dir):
    """The convergence trace's healthy signature: the per-round L1 rank
    change strictly decreases, and the decay between consecutive rounds
    is at most ~damping (power iteration contracts by the damping
    factor on the subdominant eigenvalue)."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.curation import (
        pagerank_convergence_curve,
    )

    rows = pagerank_convergence_curve(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
    vals = [r.l1_delta_scaled for r in rows]
    assert all(v > 0 for v in vals)
    assert all(a > b for a, b in zip(vals, vals[1:])), vals
    # contraction: each round shrinks to <= damping (+ slack for the
    # snapped grid) of the previous delta
    assert all(b <= 0.9 * a for a, b in zip(vals, vals[1:])), vals
