"""Edge-case parity pin for typed JSON extraction (S3 batch analog).

Spark's ``from_json('k BIGINT')`` is a strict typed parse: a field
extracts only when the JSON value is an integral *number*.  The DuckDB
oracle must null the exact same inputs — quoted numbers, floats, bools,
arrays, missing keys, malformed JSON — or `props_json_stats` breaks the
moment real data exercises one of these shapes.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from evmtrace_etl_spark.plans.inventory import PROPS_K_SQL_EXPR

CASES = [
    '{"k": 5}',
    '{"k": -3}',
    '{"k": 0}',
    '{"k": 2147483648000}',   # > int32: must survive the BIGINT schema
    '{"k": -2147483648000}',
    '{"k": "5"}',             # quoted number: strict parse nulls it
    '{"k": 5.5}',
    '{"k": 5.0}',             # float-typed integral: still nulled
    '{"k": true}',
    '{"k": [1]}',
    '{"k": {"x": 1}}',
    '{"k": null}',
    '{"other": 1}',
    '{}',
    'garbage',
    '',
    None,
]


def test_from_json_bigint_matches_duckdb_expr(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "props string")
    got = [
        r.k
        for r in df.select(
            F.from_json("props", "k BIGINT")["k"].alias("k")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INTEGER, props VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(CASES))
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {PROPS_K_SQL_EXPR} FROM t ORDER BY id"
        ).fetchall()
    ]
    assert got == want, list(zip(CASES, got, want))
    # sanity: the integral cases actually extracted
    assert got[:5] == [5, -3, 0, 2147483648000, -2147483648000]
    assert all(v is None for v in got[5:])
