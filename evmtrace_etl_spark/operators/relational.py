"""Generic relational operators: keyed dedup (keep-first / keep-last) and
small helpers shared across plans (SURVEY §2.5).

The reference dedups each sink batch in-memory before INSERT: transactions
and blocks keep the LAST occurrence of a key (reverse→dedup→reverse,
reference src/types/etl_result.rs:205-209, 303-307), contracts keep the
FIRST (etl_result.rs:246-248).  Stream arrival order becomes an explicit
``order_col`` here — ``monotonically_increasing_id`` is only monotonic per
partition, so the order must come from the source (Kafka offset / fixture
``seq``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """D1/D3 — one row per key, the one with the greatest ``order_col``.

    Implemented as a window row_number rather than a self-join: one shuffle
    on the keys, and AQE handles skewed keys.  Ties broken arbitrarily but
    deterministically only if ``order_col`` is unique per key.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """D2 — one row per key, the one with the smallest ``order_col``."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Order-free dedup (pure batch, D2 when arrival order is moot) —
    ``dropDuplicates`` compiles to a hash aggregate with map-side partials,
    cheaper than a window at scale; prefer it when any representative row
    will do."""
    return df.dropDuplicates(list(keys))
