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
    with_trace: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Damped PageRank over (src, dst) edges for the given node set.

    Multi-edges contribute once each (out-degree counts edges, not
    distinct targets); dangling nodes (no out-edges) spread their mass
    uniformly — the standard stochastic-matrix completion, computed as a
    single-row aggregate broadcast into the update, never a collect.
    Returns (node, pr) with pr snapped to the portable 1e-10 grid.

    ``with_trace=True`` returns (ranks, curve) where curve is the
    per-round convergence trace (round, l1_delta_scaled): the L1 norm
    of the rank change that round, scaled by n so the numbers are
    O(1), round4-snapped. Completes the convergence-dashboard family
    (classifier loss curve, k-means inertia curve): a graph change
    that stops converging within the fixed round count becomes visible
    instead of silently shipping stale ranks. Each point is one 1-row
    aggregate joining two already-materialized rank vectors.
    """
    n_nodes = nodes.count()  # scalar cardinality, not data, to the driver
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(1.0 / n_nodes).alias("pr")
    )
    base = (1.0 - damping) / n_nodes
    traces: list[DataFrame] = []
    for i in range(iterations):
        prev = ranks
        # shuffle_hash (256x-probe finding class): deg/ranks/contrib are
        # NODE-sized and the checkpointed rank vector carries
        # underestimated stats — without hints Catalyst may broadcast a
        # graph-sized side
        contrib = (
            edges.join(deg.hint("shuffle_hash"), "src")
            .join(ranks.hint("shuffle_hash"), F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("mass"))
        )
        dangling = (
            ranks.join(
                deg.hint("shuffle_hash"), F.col("node") == F.col("src"),
                "left_anti",
            )
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        ranks = materialize(
            nodes.select(F.col(node_col).alias("node"))
            .join(
                contrib.hint("shuffle_hash"),
                F.col("node") == F.col("dst"),
                "left",
            )
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
        if with_trace:
            from ..functions.rounding import round4

            delta = (
                ranks.alias("a")
                .join(prev.hint("shuffle_hash").alias("b"), "node")
                .agg(
                    round4(
                        F.sum(F.abs(F.col("a.pr") - F.col("b.pr")))
                        * F.lit(float(n_nodes))
                    ).alias("l1_delta_scaled")
                )
                .select(
                    F.lit(i + 1).cast("long").alias("round"),
                    "l1_delta_scaled",
                )
            )
            traces.append(delta)
    if with_trace:
        curve = traces[0]
        for t in traces[1:]:
            curve = curve.unionByName(t)
        return ranks, curve
    return ranks


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iterations: int = 4
) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al. 2007),
    made deterministic: every node starts labeled with its own id; each
    round it adopts the label most frequent among its (undirected,
    deduplicated) neighbors, ties broken by the SMALLEST label; isolated
    nodes keep their current label. Synchronous updates + integer-only
    state mean the oracle replays every round exactly as chained CTEs —
    no float, no randomness (the classic async/random-tie LPA is
    unreplayable by design; this variant trades a little convergence
    speed for portability).

    Scale shape per round: one |E| join of edges to the label table
    (co-partitioned on the node key), one (node, label) partial-agg
    count, one bounded per-node argmax window (rows per node = distinct
    neighbor labels <= degree), and a left join back to carry isolated
    nodes — all linear in |E|; labels materialize per round to cut the
    iterative lineage exactly like `pagerank`.

    Returns (node, label) after ``iterations`` rounds.
    """
    und = (
        edges.select("src", "dst")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = materialize(und, "lpa_edges")
    lbl = nodes.select("node", F.col("node").alias("label"))
    for i in range(iterations):
        lbl = materialize(_lpa_step(und, lbl), f"lpa_iter_{i}")
    return lbl


def _lpa_step(und: DataFrame, lbl: DataFrame) -> DataFrame:
    """One synchronous LPA round: (node, label) -> (node, label).

    Factored out so the per-iteration JOIN PLAN is auditable from
    checkpointed inputs (tests/test_plans.py) — the round-9 VERDICT
    found the loop's joins hidden inside materialize() where final-plan
    pins can't see them. Both joins carry shuffle_hash on their
    graph-sized, checkpoint/aggregate-derived sides (the 256x-probe bug
    class: localCheckpoint copies underestimated stats into the
    LogicalRDD, so Catalyst silently broadcasts a node-sized label
    table each round — >1 GB driver collect at depth, no shuffle
    boundary for AQE to demote)."""
    from pyspark.sql import Window

    neigh = und.join(
        lbl.select(F.col("node").alias("dst"), "label").hint("shuffle_hash"),
        "dst",
    ).select(F.col("src").alias("v"), "label")
    cnts = neigh.groupBy("v", "label").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("label"))
    new = (
        cnts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("v").alias("node"), F.col("label").alias("nl"))
    )
    return lbl.hint("shuffle_hash").join(
        new.hint("shuffle_hash"), "node", "left"
    ).select(
        "node", F.coalesce(F.col("nl"), F.col("label")).alias("label")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected simple graph:
    (node, n_triangles), nodes in no triangle omitted.

    The classic distributed formulation (Suri & Vassilvitskii 2011):
    canonicalize to undirected simple edges, then ORIENT each edge from
    its lower-(degree, id) endpoint to the higher one. Every node's
    out-adjacency is then O(sqrt(|E|))-bounded on any graph, so the
    wedge self-join (two out-edges sharing an apex) does
    sum(outdeg^2) = O(|E|^1.5) work instead of the O(sum(deg^2))
    blowup a naive adjacency join hits on hub nodes — the hub's edges
    all point INTO it and generate no wedges at it. Each triangle
    {x,y,z} with rank x<y<z is found exactly once: only x has two
    out-edges in the triangle, and the closing edge is oriented y→z by
    the same rank order the wedge pair uses.

    Shuffles: one distinct on the canonical edge, one degree aggregate
    (partial-agg), the wedge join on apex, the closure join on (u, v).
    All equi-joins — AQE handles residual skew; the orientation is what
    removes the structural hub skew up front.

    Deliberately UN-hinted (the CLAUDE.md AQE-recoverable exception,
    measured round 10): every join side here is aggregate-derived but
    sits behind a genuine shuffle boundary IN THIS PLAN (the distinct's
    exchange, the degree groupBy's exchange) — AQE re-optimizes the
    join strategy from the exchange's RUNTIME size, so a node-sized
    degree table broadcasts only while it actually fits and demotes
    itself at scale. Forcing shuffle_hash here was measured at +253%
    shuffle bytes at sf0.1 (0.86 MB -> 3.0 MB, tools/shuffle_probe.py,
    docs/ROUND10_NOTES.md) because it shuffles the full edge table to
    meet a small degree table. Contrast label_propagation/_lpa_step:
    there the big side is a checkpointed LogicalRDD with NO shuffle
    boundary below it, AQE cannot intervene, and the hint is mandatory.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("dega")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("degb")), "b"
    )
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("ddst"),
    )
    o1 = oriented.select(
        F.col("src").alias("apex"), F.col("dst").alias("u"),
        F.col("ddst").alias("du"),
    )
    o2 = oriented.select(
        F.col("src").alias("apex"), F.col("dst").alias("v"),
        F.col("ddst").alias("dv"),
    )
    wedges = o1.join(o2, "apex").where(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    )
    closing = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    tris = wedges.join(closing, ["u", "v"]).select("apex", "u", "v")
    return (
        tris.select(F.col("apex").alias("node"))
        .unionAll(tris.select(F.col("u").alias("node")))
        .unionAll(tris.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
