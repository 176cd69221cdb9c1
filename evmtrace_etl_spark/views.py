"""SQL surface: every input table and every registered query result as
Spark temp views, so a ``spark.sql`` user can work against the engine
without touching the Python API.

The reference has no SQL layer (its one "query" is a hard-wired
dataflow, SURVEY §3); on Spark a SQL surface is idiomatic and free —
views are LAZY plan aliases (``createOrReplaceTempView`` stores the
logical plan, nothing runs until a SQL query references it).  The
exception is parameter FITTING at plan-BUILD time: the ANN/Bloom
queries run their fitting jobs while constructing the plan (codebook
collects and, for the trained/Bloom variants, the corpus-scan
assignment/bitmap aggregates those need; PageRank likewise
materializes its src-partitioned edge table), so registering the full
surface costs real Spark jobs — seconds at bench scale, proportional
to the corpus for the fitted queries.  Table scans and everything
downstream of registration stay lazy; pass ``skip`` to leave the
expensive fitted surfaces out when registration latency matters.  Catalyst folds
view references into the enclosing query plan, meaning filters a user
writes over a view push down into the underlying parquet scans exactly
as they would through the DataFrame API.

Usage::

    from evmtrace_etl_spark.views import register_views
    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM zk_transactions WHERE chain_id = 1")
    spark.sql("SELECT * FROM documents JOIN llm_exact_dup_groups USING ()")

Side-effecting queries (streaming runs, sink replays — anything whose
``queries()`` callable executes work at BUILD time rather than
returning a lazy plan) are excluded by default; pass
``include_effectful=True`` to materialize those too, accepting their
build cost at registration."""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import registry

#: Source tables the driver testdata provides.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Queries whose builder RUNS side-effecting machinery (structured
#: streams, sink replay cycles, executor-side DB writers) instead of
#: returning a lazy plan — registering them eagerly would execute all
#: of that at view-registration time.
def _effectful() -> frozenset[str]:
    from .plans import sink_parity

    return frozenset(sink_parity.QUERIES)


EFFECTFUL = _effectful()


def register_views(
    spark: SparkSession,
    sf_dir: str,
    include_effectful: bool = False,
    skip: frozenset[str] | set[str] = frozenset(),
) -> list[str]:
    """Register source-table and query views; returns the view names.

    Table views read the parquet lazily; query views are the lazy
    DataFrames the registry builds (each a pure function of the table
    scans, so the SQL user composes on top of the same Catalyst plans
    the driver verifies).  A query whose builder fails raises — a
    silently missing view would surface later as a confusing
    TABLE_OR_VIEW_NOT_FOUND with the real defect hidden; use ``skip``
    to exclude queries deliberately."""
    registered: list[str] = []
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
            registered.append(t)
    for name, fn in registry.queries().items():
        if name in skip or (name in EFFECTFUL and not include_effectful):
            continue
        fn(spark, sf_dir).createOrReplaceTempView(name)
        registered.append(name)
    return registered
