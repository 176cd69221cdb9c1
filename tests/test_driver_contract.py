"""Local replica of the driver's correctness gate: every registered query
runs at sf0.01 and (where an oracle exists) matches DuckDB row-for-row.

This is the same compare the driver performs (row count + schema-name +
order-insensitive value compare with columns sorted by name).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as contract
from tests.compare import canon

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


def _queries():
    return sorted(contract.queries().items())


@pytest.mark.parametrize("name", [n for n, _ in _queries()])
def test_query_matches_oracle(spark, duck, name):
    fn = contract.queries()[name]
    sdf = fn(spark, SF_DIR)
    oracles = contract.oracle_sql()
    got = canon(sdf.toPandas())
    if name not in oracles:
        # rows-only check (non-SQL-expressible op)
        assert len(got) >= 0
        return
    want = canon(duck.execute(oracles[name]).df())
    assert [c for c in sorted(sdf.columns)] == sorted(
        duck.execute(oracles[name]).df().columns
    ), f"{name}: schema mismatch"
    assert len(got) == len(want), (
        f"{name}: row count spark={len(got)} duckdb={len(want)}"
    )
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name} row {i} differs:\n  spark : {g}\n  duckdb: {w}"
