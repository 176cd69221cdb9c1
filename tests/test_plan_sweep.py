"""Global physical-plan sweep — the anti-pattern floor enforced over
EVERY registered query, not just the individually-pinned ones.

``tests/test_plan_shapes.py`` pins the *positive* plan properties of
specific operators (shuffle-free assignment, broadcast joins, pruned
scans).  This module is the complementary *negative* guard: it walks the
full registry at sf0.001 and asserts the three anti-patterns that sink a
100 TB run are absent from every plan —

- ``CartesianProduct``: O(n*m) row pairing; never acceptable.
- ``BatchEvalPython``: row-at-a-time Python in the plan; the repo's
  Python escape hatches are all Arrow-batched (``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas``), which remain allowed.
- ``BroadcastNestedLoopJoin`` beyond the sanctioned budget: the repo
  convention (SURVEY §4) allows one-row *scalar* joins (a corpus size,
  a quantile cutoff, a threshold row) to plan as BNLJ because a one-row
  build side is O(n); anything joining real relations this way is a bug.
  The default budget is 1; the pagerank family legitimately uses one
  scalar (the redistributed dangling-mass row) per unrolled iteration.

A new query added to the registry is covered automatically with zero
test code, same contract as ``tests/test_driver_contract.py``.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest

import __spark_entry__ as contract

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Queries allowed >1 BroadcastNestedLoopJoin, with the reason the extra
# ones are still one-row build sides (audited 2026-08-15; counts are
# ceilings, so an improvement never fails this test).
BNLJ_BUDGET = {
    # 4 unrolled pagerank iterations x 1 dangling-mass scalar each
    "inv_trade_pagerank": 4,
    "zk_callgraph_rank": 4,
    # r15: the IVF/PQ codebooks arrive as broadcast ONE-ROW tables
    # (VERDICT r14 ask #1 — BroadcastExchange instead of kilo-literal
    # inlined arrays), so every ANN plan carries one-row-scalar BNLJs:
    # one per codebook attachment, times the subtree sharing of the
    # serve shape (assigned + probes both derive from the with-cells
    # projection).  Counts audited 2026-08-18 from the captured plans;
    # every build side is a single-row LocalTableScan by construction.
    "llm_cell_purity_clustered": 2,
    "llm_ivf_recall": 4,
    "llm_ivf_recall_clustered": 4,
    "llm_ivf_topk": 2,
    "llm_ivf_trained_topk": 4,
    "llm_ivfpq_recall_clustered": 8,
    "llm_ivfpq_topk": 4,
    # 2 legs x (2 PQ-codebook scalars + the one-row ADC normalizer its
    # standalone row budgeted in r14)
    "llm_pq_recall": 6,
    "llm_pq_topk": 3,
    "llm_pq_trained_topk": 3,
}


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(contract.queries()))
def test_plan_has_no_scale_antipatterns(spark, name):
    plan = _plan_of(contract.queries()[name](spark, SF_DIR))
    assert plan.count("CartesianProduct") == 0, f"{name}: cartesian join"
    assert plan.count("BatchEvalPython") == 0, (
        f"{name}: row-at-a-time Python in the plan (use a pandas UDF)"
    )
    budget = BNLJ_BUDGET.get(name, 1)
    got = plan.count("BroadcastNestedLoopJoin")
    assert got <= budget, (
        f"{name}: {got} BroadcastNestedLoopJoin (budget {budget}) — "
        "a non-scalar relation is being nested-loop joined"
    )
