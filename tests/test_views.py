"""The SQL surface: every non-effectful registered query is reachable
from spark.sql, composes with further SQL, and matches the Python API."""

from __future__ import annotations

from evmtrace_etl_spark import registry
from evmtrace_etl_spark.views import EFFECTFUL, TABLES, register_views
import pytest

# r15: deep scenario module — full-tier only (see tests/conftest.py)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


def test_register_views_covers_registry(spark):
    names = register_views(spark, SF)
    lazy = set(registry.queries()) - EFFECTFUL
    assert set(TABLES) <= set(names)
    assert lazy <= set(names)
    # compose SQL over a query view and a source view
    out = spark.sql(
        "SELECT d.source, count(*) AS n FROM llm_exact_dup_groups g "
        "JOIN documents d ON d.doc_id = g.keep_doc_id GROUP BY d.source"
    )
    assert out.count() >= 0
    # view result == direct API result
    direct = registry.queries()["inv_pricing_summary"](spark, SF)
    via_sql = spark.sql("SELECT * FROM inv_pricing_summary")
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_sql.collect())
    )


def test_views_are_lazy_plan_aliases(spark):
    """Registration itself must run nothing: a predicate written in SQL
    over a view lands in the parquet scan (pushdown through the view)."""
    register_views(spark, SF)
    plan = spark.sql(
        "SELECT doc_id FROM documents WHERE doc_id = 7"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan
