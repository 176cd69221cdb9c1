"""Graph-operator properties: fixed-point PageRank and oriented-wedge
triangle counting (``operators/graph.py``).  Oracle parity for the
registered queries is covered by ``test_driver_contract.py``; these pin
the algorithmic invariants a refactor could silently break."""

from __future__ import annotations

from pyspark.sql import functions as F

from evmtrace_etl_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a: long, b: long")


def _directed(spark, pairs):
    return spark.createDataFrame(pairs, "src: string, dst: string")


def test_pagerank_conserves_mass(spark):
    """Total rank stays within N units of SCALE: each of the N nodes
    loses < 1 unit to the teleport floor div and < 1 per in-edge sum —
    floor-division leakage is bounded, never amplified."""
    # 5-node directed graph, every node has an out-edge (no dangling).
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "e"), ("e", "a"), ("a", "c"),
    ]
    ranks = pagerank_fixed_point(_directed(spark, pairs), rounds=4)
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert set(rows) == {"a", "b", "c", "d", "e"}
    total = sum(rows.values())
    # Mass only leaks downward, a few units per node per round.
    assert SCALE - 5 * 5 * 4 <= total <= SCALE


def test_pagerank_symmetry_and_order(spark):
    """On a star (hub ↔ 3 leaves, both directions), the leaves are
    exchangeable — identical ranks — and the hub dominates."""
    pairs = []
    for leaf in ("x", "y", "z"):
        pairs += [("hub", leaf), (leaf, "hub")]
    rows = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(_directed(spark, pairs), rounds=3).collect()
    }
    assert rows["x"] == rows["y"] == rows["z"]
    assert rows["hub"] > rows["x"]


def test_pagerank_is_deterministic_across_partitionings(spark):
    """Fixed-point integer arithmetic ⇒ bit-identical results no matter
    how the edges are partitioned (the whole point of the design)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")]
    e1 = _directed(spark, pairs).repartition(1)
    e7 = _directed(spark, pairs).repartition(7)
    r1 = sorted(pagerank_fixed_point(e1, rounds=3).collect())
    r7 = sorted(pagerank_fixed_point(e7, rounds=3).collect())
    assert r1 == r7


def test_triangle_counts_k4(spark):
    """K4: every node sits in C(3,2) = 3 triangles."""
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    rows = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_square_with_diagonal(spark):
    """Square 1-2-3-4 plus diagonal 1-3: two triangles sharing the
    diagonal; nodes on the diagonal count 2, the others 1."""
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    rows = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert rows == {1: 2, 2: 1, 3: 2, 4: 1}


def test_triangle_counts_triangle_free(spark):
    """A path graph has no triangles → empty result."""
    pairs = [(1, 2), (2, 3), (3, 4)]
    assert triangle_counts(_edges(spark, pairs)).count() == 0


def test_triangle_plan_has_no_cartesian(spark):
    """The wedge join is an equi-join on src (the inequality is a join
    filter, not the join condition): planner must never fall back to
    CartesianProduct or BroadcastNestedLoop."""
    pairs = [(1, 2), (2, 3), (1, 3)]
    plan = triangle_counts(
        _edges(spark, pairs)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_pagerank_hub_absorbs_rank(spark):
    """All roads lead to the hub (hub's out-edge returns to one node):
    the hub outranks every other node."""
    pairs = [("a", "h"), ("b", "h"), ("c", "h"), ("h", "a")]
    rows = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(_directed(spark, pairs), rounds=5).collect()
    }
    assert rows["h"] == max(rows.values())


def test_triangle_counts_total_via_sum(spark):
    """Sum of per-node counts = 3 × number of triangles (each triangle
    has exactly three corners) — pins the explode-corners contract."""
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]  # triangles: 123, 234
    total = (
        triangle_counts(_edges(spark, pairs))
        .agg(F.sum("n_triangles").alias("s"))
        .collect()[0]["s"]
    )
    assert total == 6


def test_clustering_coefficients_known_values(spark):
    """K4 → every node fully clustered (1.0); a path graph → all 0.0
    (degree-1 endpoints by convention, middle nodes by no closure)."""
    from evmtrace_etl_spark.operators.graph import clustering_coefficients

    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    rows = {r["node"]: r for r in clustering_coefficients(k4).collect()}
    assert all(r["clustering"] == 1.0 and r["degree"] == 3 for r in rows.values())

    path = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    rows = {r["node"]: r["clustering"] for r in clustering_coefficients(path).collect()}
    assert rows == {1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}

    # square + one diagonal: diagonal nodes see 2 closed of C(3,2)=3
    # neighbor pairs (2/3), the others 1 of 1
    sq = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    rows = {r["node"]: r["clustering"] for r in clustering_coefficients(sq).collect()}
    assert rows == {1: round(2 / 3, 6), 2: 1.0, 3: round(2 / 3, 6), 4: 1.0}
