"""Driver-contract registry: aggregates every implemented query and its
DuckDB oracle SQL from the plan modules.

``__spark_entry__.py`` (the driver contract at the repo root) is a thin
shim over this module.  Each plans module contributes a
``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and an
``ORACLES: dict[str, str]`` (oracle omitted → driver runs a weaker
rows-only check).

Verification rotation
---------------------
The driver's correctness harness checks only the first
``_DRIVER_WINDOW`` entries of ``queries()`` per round, while the
registry has grown past that.  To keep *union* coverage at 100% across
rounds, ``queries()`` orders names least-recently-driver-verified
first: we parse the ``CORRECTNESS_r{N}.json`` files the driver itself
writes at the repo root, compute the last round each query had a green
row, and sort ascending on that round (ties broken by registration
order, which keeps the zk flagship plans early).  Never-verified and
newly-registered queries therefore always land inside the window, and
previously-green queries rotate back in on a fixed cadence with no
manual bookkeeping.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Size of the per-round driver correctness window (observed: every
# CORRECTNESS_r{N}.json holds exactly this many rows).  Informational —
# the rotation works for any window size.
_DRIVER_WINDOW = 50

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _modules():
    from .plans import geth, inventory, llm_data, sink_parity, zk_parity

    return (zk_parity, sink_parity, geth, inventory, llm_data)


#: ``_last_verified`` cache, keyed by the repo root it was computed
#: from (the round files are immutable within a process; tests swap
#: ``_REPO_ROOT`` to a temp dir and must not see a stale cache).
_VERIFIED_CACHE: dict[str, dict[str, int]] = {}


def _last_verified() -> dict[str, int]:
    """Last round each query name got a FULLY green driver row.

    A row counts as verified only when every recorded check passed —
    row count, schema, and (when an oracle exists) the value hash —
    with no error.  A failed, hash-mismatched, or errored row keeps the
    query at the front of the rotation so the next round re-checks it.
    """
    cached = _VERIFIED_CACHE.get(_REPO_ROOT)
    if cached is not None:
        return cached
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            # absent keys (weaker rows-only checks) don't fail the row;
            # an explicit False on ANY check does
            if any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                continue
            if row.get("rows_match"):
                out[name] = max(out.get(name, 0), rnd)
    _VERIFIED_CACHE[_REPO_ROOT] = out
    return out


def _rotated(names: list[str]) -> list[str]:
    seen = _last_verified()
    index = {name: i for i, name in enumerate(names)}
    return sorted(names, key=lambda n: (seen.get(n, 0), index[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return {name: out[name] for name in _rotated(list(out))}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return {name: out[name] for name in _rotated(list(out))}
