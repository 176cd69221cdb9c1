"""Driver-contract registry: aggregates every implemented query and its
DuckDB oracle SQL from the plan modules.

``__spark_entry__.py`` (the driver contract at the repo root) is a thin
shim over this module.  Each plans module contributes a
``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and an
``ORACLES: dict[str, str]`` (oracle omitted → driver runs a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from .plans import geth, inventory, llm_data, sink_parity, zk_parity

    return (zk_parity, sink_parity, geth, inventory, llm_data)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
