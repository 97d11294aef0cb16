"""Iterative graph algorithms on DataFrames: PageRank.

Connected components (operators/dedup.py:large-star/small-star) covered
the union-find-shaped fixpoint; PageRank covers the other canonical
iterative shape — a damped power iteration where each round is one
join + one aggregation. In a training-data pipeline this is the
link-graph quality signal (rank domains/documents by citation mass
before sampling), the same role it plays in web-crawl curation.

Scale shape per round (nodes=|V|, edges=|E|):
- contributions: edges ⋈ ranks on src (shuffle on src, both sides
  partitioned identically every round — a co-partitioned join at
  scale), then groupBy dst with partial aggregation: O(|E|) with
  map-side combine.
- dangling mass: a 1-row aggregate broadcast back — O(|V|) scan,
  constant-size result, never a collect.
- ranks materialize once per round (plans/materialize seam): the
  iterative-lineage cut, storage-backed on a cluster.

Float parity: every round's rank is snapped to a portable 1e-10 grid
(floor(x*1e10 + 0.5 + 1e-4)/1e10 — same construction as
functions/rounding.round4, epsilon far above aggregation-order ulp
noise and far below the kept resolution), so Spark's partial-agg sums
and DuckDB's sequential sums land on identical doubles and the chained
CTE oracle can replay all rounds exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize

ROUND10_SQL = "(FLOOR(({expr}) * 1e10 + 0.5 + 0.0001) / 1e10)"


def _round10(col):
    return F.floor(col * F.lit(1e10) + F.lit(0.5) + F.lit(1e-4)) / F.lit(1e10)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
) -> DataFrame:
    """Damped PageRank over (src, dst) edges for the given node set.

    Multi-edges contribute once each (out-degree counts edges, not
    distinct targets); dangling nodes (no out-edges) spread their mass
    uniformly — the standard stochastic-matrix completion, computed as a
    single-row aggregate broadcast into the update, never a collect.
    Returns (node, pr) with pr snapped to the portable 1e-10 grid.
    """
    n_nodes = nodes.count()  # scalar cardinality, not data, to the driver
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(1.0 / n_nodes).alias("pr")
    )
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("mass"))
        )
        dangling = (
            ranks.join(deg, F.col("node") == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        ranks = materialize(
            nodes.select(F.col(node_col).alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                _round10(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("mass"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("pr"),
            ),
            f"pagerank_iter_{i}",
        )
    return ranks
