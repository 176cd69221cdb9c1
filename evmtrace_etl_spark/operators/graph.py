"""Iterative graph analytics: fixed-point PageRank on DataFrame machinery.

The reference engine derives a caller→callee contract graph and
first/second-degree neighborhoods (``/root/reference/src/transformer/zk/
mod.rs`` — the J2/J3 operators); ranking nodes of that graph by
link-structure importance is the natural next analytics step a user asks
of an engine that already materializes the edges.  PageRank is the
canonical such ranking and the canonical *iterative* distributed
computation — each round is one equi-join (edges ⋈ ranks) plus one
keyed aggregation, which is exactly the workload shape Spark's shuffle
machinery is built for.

Determinism strategy — fixed-point integer arithmetic
-----------------------------------------------------
Floating-point PageRank is doubly nondeterministic here: Spark's
partition-order-dependent double summation varies run to run, and
double→decimal quantization differs between engines (Spark casts via
the shortest string representation, DuckDB via binary scaling).  Both
problems vanish if the iteration never leaves BIGINT:

- ranks are scaled integers (``SCALE = 10**12`` ≈ picorank units);
- the damping factor 0.85 is the exact rational 17/20, applied as
  ``(17 * sum) div 20``;
- per-edge contributions are ``rank div outdeg`` (integer floor
  division — identical in Spark ``div`` and DuckDB ``//`` for
  non-negative operands);
- the teleport term is ``(3 * SCALE) div (20 * N)``.

Every operation is exact 64-bit integer arithmetic: sums are
order-independent, so the result is bit-identical across partitionings,
retries, AQE re-plans, and engines.  Max intermediate is
``17 * SCALE < 2**63`` — no overflow at any graph size (total system
mass is ≤ SCALE).  The floor divisions leak mass: distributing a rank
over ``outdeg`` edges loses up to ``outdeg − 1`` units per node per
round, plus ≤ 2 to the teleport/damping floors — total leak ≤
``rounds · (E + 2N)`` units (measured 13.5 M over a 9.7 M-edge
3-round run: ~1e-5 % of total mass, far below any ranking-relevant
difference; pinned by ``tests/test_graph.py``'s stress test).  That
bounded leak is the standard price of fixed-point iteration, and the
reason SCALE is large.

Scale design
------------
- Each round shuffles edges by ``src`` (join) and contributions by
  ``dst`` (aggregate) — the unavoidable minimum for distributed
  PageRank.  The rank table is node-sized, never edge-sized.
- The driver never sees data: no collects anywhere; the loop is a
  fixed, small number of rounds (power iteration converges
  geometrically at rate ≈ damping, and ranking stabilizes long before
  values do — 3–10 rounds is the production norm).
- Lineage grows linearly in rounds; callers running >~8 rounds should
  ``localCheckpoint`` the rank table every few rounds, the same
  containment strategy ``dedup.connected_components`` pins for its
  pointer-jumping loop.
- Dangling nodes (out-degree 0) are not part of the rank universe:
  the node set is defined as the distinct edge sources, so callers
  must either orient the graph so every node has an out-edge (an
  undirected graph emitted as two directed edges, as the registered
  query does) or pre-trim sinks.  This keeps the per-round plan free
  of the global dangling-mass scalar; the loss is documented rather
  than silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import materialize as _materialize

#: Rank scale: 1.0 of probability mass == 10**12 integer units.
SCALE = 10**12

#: Damping factor 0.85 as an exact rational.
DAMP_NUM, DAMP_DEN = 17, 20


def pagerank_fixed_point(
    edges: DataFrame, rounds: int = 3, materialize: bool = True
) -> DataFrame:
    """Power-iteration PageRank in exact BIGINT fixed-point arithmetic.

    ``edges`` must have string/integral columns ``src`` and ``dst``;
    parallel edges are meaningful (they weight the contribution, so
    callers wanting an unweighted graph should ``distinct()`` first).
    Returns ``(node, rank)`` where ``rank`` is in units of
    ``SCALE`` (i.e. ``rank/SCALE`` ≈ the PageRank probability).

    The node universe is the distinct ``src`` set (see module
    docstring on dangling nodes).

    ``materialize`` (default on) repartitions the edge list by ``src``
    and ``localCheckpoint``s it before iterating: every round's
    edges⋈ranks join then reuses ONE materialized, already-src-
    partitioned edge table instead of re-deriving the upstream edge
    plan per round (measured 6.3 → 4.1 s at sf0.1 for the registered
    trade-graph query; the win grows with rounds × edge-derivation
    cost).  On a multi-executor cluster the same role is played by
    ``checkpoint``/persist-to-replicated-storage; callers composing
    PageRank into a larger cached plan can pass ``materialize=False``.
    """
    if materialize:
        edges = _materialize(edges.repartition("src"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # N is a broadcast scalar via a cross-joined 1-row aggregate: the
    # plan stays fully lazy/distributed — no driver-side collect.
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        "outdeg",
        "n",
        F.expr(f"CAST({SCALE} AS BIGINT) div n").alias("rank"),
    )
    for _ in range(rounds):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            ranks.select("node", "outdeg", "n")
            .join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                "n",
                F.expr(
                    f"CAST({3 * SCALE} AS BIGINT) div (CAST({DAMP_DEN} AS BIGINT) * n)"
                    f" + (CAST({DAMP_NUM} AS BIGINT) * coalesce(m, CAST(0 AS BIGINT)))"
                    f" div CAST({DAMP_DEN} AS BIGINT)"
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle membership counts via degree-ordered edge
    orientation (Schank's algorithm, the MapReduce formulation of
    Suri & Vassilvitskii 2011).

    ``edges`` must be the canonical undirected edge list: distinct
    rows ``(a, b)`` with ``a < b``.  Returns ``(node, n_triangles)``
    for every node that closes at least one triangle.

    Scale design: the naive wedge join explodes around high-degree
    hubs (a degree-d node contributes d²/2 wedges).  Orienting every
    edge toward its higher-``(degree, id)`` endpoint caps effective
    out-degree at O(√m), so total wedge volume is O(m^1.5) — the
    best-known bound — and skew collapses: a celebrity hub receives
    edges but generates no wedges.  Each triangle is then discovered
    exactly once (at its lowest-ordered corner) by one equi-join of
    the wedge list against the edge list; per-corner counts come from
    exploding the three corners into one keyed aggregate.  No
    broadcasts of node-sized tables, no cartesian products.
    """
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        edges.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    # a < b already, so on a degree tie the canonical direction is a→b.
    a_first = (F.col("da") < F.col("db")) | (F.col("da") == F.col("db"))
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(
        F.col("o1.src").alias("corner"),
        F.least("o1.dst", "o2.dst").alias("a"),
        F.greatest("o1.dst", "o2.dst").alias("b"),
    )
    triangles = wedges.join(edges, ["a", "b"])
    corners = triangles.select(
        F.explode(F.array("corner", "a", "b")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node: ``2·T(v) / (d(v)·(d(v)−1))``
    — the fraction of a node's neighbor pairs that are themselves
    connected (Watts–Strogatz 1998), the standard per-node cohesion
    measure on top of triangle counts.

    ``edges`` is the canonical undirected list (``a < b``, distinct).
    Returns ``(node, degree, n_triangles, clustering)`` for every node;
    degree-1 nodes have no neighbor pair and get clustering 0.0 by
    convention.  ``clustering`` is exact-integer ratio → one double
    division, rounded to 6.

    Scale: composes the two keyed aggregates this module already has
    (degree rollup + oriented-wedge triangle counts) with ONE node-keyed
    left join — triangle output is sparse (only triangle members), so
    the join's right side is at most node-sized.
    """
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges)
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                (F.lit(2) * F.coalesce("n_triangles", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                6,
            )
        )
        .alias("clustering"),
    )
