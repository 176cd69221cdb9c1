"""Order-insensitive Spark-vs-DuckDB result comparison — a local stand-in
for the driver's correctness gate (row count + schema + value hash with
columns sorted by name)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df: DataFrame, oracle_sql: str) -> None:
    got = canon(spark_df.toPandas())
    want = canon(duckdb.sql(oracle_sql).df())
    assert len(got) == len(want), (
        f"row count: spark={len(got)} duckdb={len(want)}\n"
        f"spark sample: {got[:5]}\nduckdb sample: {want[:5]}"
    )
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i} differs:\n  spark : {g}\n  duckdb: {w}"
