"""Gated multi-executor smoke (VERIFIES the cluster promises in the
iterative operators' docstrings instead of just documenting them).

Runs ``cluster_smoke_script.py`` in a subprocess — a second
SparkContext (master ``local-cluster[2,4,2048]``: two real executor
JVMs) cannot coexist with the session-scoped test fixture.  Gated
behind ``SPARK_GRAFT_CLUSTER=1`` because spawning executor JVMs costs
~1 min; run it whenever the checkpoint/broadcast machinery changes.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_CLUSTER"),
    reason="2-executor smoke: set SPARK_GRAFT_CLUSTER=1 (adds ~1 min)",
)
def test_two_executor_smoke():
    script = os.path.join(os.path.dirname(__file__), "cluster_smoke_script.py")
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "CLUSTER_SMOKE_OK" in proc.stdout
