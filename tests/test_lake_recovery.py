"""Lease-scoped ``_TXN`` intent adjudication (r14): crash recovery at
the head of every maintenance op runs under the table's cross-process
``_CommitLease``, and every intent-logged commit re-verifies its intent
token under the same lease.  Contract pinned here:

- two maintenance actors racing the SAME crashed intent adjudicate it
  EXACTLY once (the loser re-checks under the lease and no-ops);
- an adjudication can never interleave with the victim's commit: a
  writer whose live intent was rolled back as crashed refuses with
  ``SnapshotConflict`` at its commit point (intent token mismatch)
  instead of committing a manifest over its deleted files, and the
  plain retry lands;
- the two-actor deployment the ``maintain_every`` streaming sinks made
  normal — an in-band maintainer racing a cron vacuum in ANOTHER
  process, over a crashed writer's intent — converges with exactly-once
  adjudication, no lost rows, no lingering intent, no orphans.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from evmtrace_etl_spark import sinks
from evmtrace_etl_spark.sinks import (
    append_files,
    read_table,
    retry_on_conflict,
)

# r15: deep scenario module — full-tier only (see tests/conftest.py)
pytestmark = pytest.mark.slow


def _seed(spark, tmp_path, n=100, files=2) -> str:
    tbl = str(tmp_path / "tbl")
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    append_files(
        spark, df.coalesce(files), tbl, cols=["k"], keep_versions=10
    )
    return tbl


def _plant_crashed_intent(spark, tbl: str) -> str:
    """Simulate a writer that died between move-in and commit: one
    orphan data file inside the table dir plus a ``_TXN`` intent whose
    expected_version never committed.  Returns the orphan path."""
    mdir = tbl + "/_stats_manifest"
    src = sorted(glob.glob(tbl + "/*.parquet"))[0]
    orphan = os.path.join(tbl, "part-99999-deadbeef.c000.snappy.parquet")
    shutil.copy(src, orphan)
    head = sinks.manifest_version(spark, mdir)
    with open(os.path.join(mdir, "_TXN"), "w") as f:
        json.dump(
            {
                "expected_version": int(head) + 1,
                "added": [orphan],
                "removed": [],
                "intent": "dead-writer-token",
            },
            f,
        )
    return orphan


def test_two_actors_adjudicate_intent_exactly_once(spark, tmp_path):
    """Two concurrent recoveries of one crashed intent (same table,
    barrier-released simultaneously — the lease is the only thing
    between them, ``_log_lock`` is NOT held on this path): exactly one
    adjudicates (rolls the orphan back), the other re-checks under the
    lease and no-ops.  Without the lease both read the marker and both
    delete files/marker — the double-adjudication the r13 verdict
    flagged."""
    tbl = _seed(spark, tmp_path)
    mdir = tbl + "/_stats_manifest"
    orphan = _plant_crashed_intent(spark, tbl)

    barrier = threading.Barrier(2)
    results: list = [None, None]
    errors: list = []

    def actor(i: int) -> None:
        try:
            barrier.wait(timeout=30)
            results[i] = sinks._recover_txn(spark, mdir)
        except Exception as exc:  # pragma: no cover - fails the test
            errors.append(exc)

    ts = [threading.Thread(target=actor, args=(i,)) for i in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors
    adjudicated = [r for r in results if r is not None]
    assert len(adjudicated) == 1  # exactly once — never zero, never two
    assert adjudicated[0]["rolled"] == "back"
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(mdir, "_TXN"))
    assert not os.path.exists(os.path.join(mdir, "_LOCK"))  # released
    assert read_table(spark, tbl).count() == 100


def test_commit_refuses_after_live_intent_adjudication(
    spark, tmp_path, monkeypatch
):
    """Adjudication-vs-commit interleave — the data-loss window the
    token check closes: a cross-process maintenance actor adjudicates
    the victim's LIVE intent (rolling its moved-in files back) between
    the victim's move-in and its commit, and commits NOTHING itself,
    so the victim's expected version is still free.  Without the
    intent-token verification the victim's commit would land a
    manifest referencing the deleted files — silent corruption.  With
    it: ``SnapshotConflict``, clean rollback, and the plain retry
    lands the batch."""
    tbl = _seed(spark, tmp_path)
    mdir = tbl + "/_stats_manifest"
    real = sinks._commit_manifest
    state = {"fired": False}

    def hook(spark_, mdir_, *a, **kw):
        if not state["fired"] and kw.get("intent_token") is not None:
            state["fired"] = True
            # the foreign actor adjudicates the victim's live intent
            # as crashed — NO commit of its own, version stays free
            got = sinks._recover_txn(spark_, mdir_)
            assert got is not None and got["rolled"] == "back"
        return real(spark_, mdir_, *a, **kw)

    monkeypatch.setattr(sinks, "_commit_manifest", hook)
    batch = spark.range(500, 560).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )
    with pytest.raises(sinks.SnapshotConflict, match="adjudicated"):
        append_files(spark, batch.coalesce(1), tbl)
    monkeypatch.undo()

    # nothing corrupted: the head snapshot reads clean, no intent, no
    # orphan from the rolled-back attempt
    assert read_table(spark, tbl).count() == 100
    assert not os.path.exists(os.path.join(mdir, "_TXN"))
    led = sinks.update_stats_index(spark, tbl, None)
    assert led["files_new"] == 0  # no orphans adopted
    # the plain retry lands against the fresh snapshot
    led = retry_on_conflict(
        lambda: append_files(spark, batch.coalesce(1), tbl)
    )
    assert led["rows"] == 60
    assert read_table(spark, tbl).count() == 160


def test_cross_process_maintain_vs_vacuum_over_crashed_intent(
    spark, tmp_path
):
    """The two-actor deployment shape: this driver runs in-band-style
    ``maintain_table`` rounds while a SEPARATE JVM loops
    ``vacuum_table(min_age_s=0)`` — both arriving at a table carrying a
    crashed writer's intent plus real DV debt and fragmentation.  The
    crashed intent is adjudicated exactly once (between the two
    processes), every maintenance round converges or loses cleanly via
    ``SnapshotConflict``+retry, and the end state is exact: no lost
    rows, no resurrected orphan, no lingering ``_TXN``, no lease left
    behind."""
    import subprocess
    import sys

    tbl = _seed(spark, tmp_path, n=200, files=4)
    mdir = tbl + "/_stats_manifest"
    # real maintenance work: tombstone debt + small-file fragmentation
    for i in range(3):
        sinks.delete_where(
            spark, tbl, None, {"k": (i * 10, i * 10 + 4)},
            strategy="merge-on-read", keys=["k"],
        )
    orphan = _plant_crashed_intent(spark, tbl)

    script = os.path.join(
        os.path.dirname(__file__), "lake_two_process_script.py"
    )
    repo = os.path.dirname(os.path.dirname(__file__))
    env = dict(os.environ, PYTHONPATH=repo)
    child = subprocess.Popen(
        [sys.executable, script, tbl, "0", "4", "vacuum_loop"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    parent_rolled = 0
    try:
        # race the child's vacuums with in-band-style maintenance
        for _ in range(4):
            got = sinks._recover_txn(spark, mdir)
            if got is not None:
                parent_rolled += 1
            retry_on_conflict(
                lambda: sinks.maintain_table(
                    spark, tbl, target_bytes=1 << 20,
                    dv_files_threshold=1, min_age_s=0,
                ),
                attempts=10,
            )
        out, _ = child.communicate(timeout=240)
    finally:
        if child.poll() is None:  # pragma: no cover - hung child
            child.kill()
    assert "CHILD_DONE" in out
    assert child.returncode == 0

    # exactly-once adjudication across both processes: the orphan is
    # gone, and at most one actor can have deleted it (idempotent
    # file-deletes can't double-fire under the lease re-check)
    assert not os.path.exists(orphan)
    assert parent_rolled <= 1
    assert not os.path.exists(os.path.join(mdir, "_TXN"))
    assert not os.path.exists(os.path.join(mdir, "_LOCK"))
    # no rows lost, the three erasures applied, orphan never adopted
    t = read_table(spark, tbl)
    assert t.count() == 200 - 15
    assert t.filter(
        "(k >= 0 and k <= 4) or (k >= 10 and k <= 14) "
        "or (k >= 20 and k <= 24)"
    ).count() == 0
    # follow-up maintenance converges: the racing rounds already
    # compacted and materialized, so the next run rewrites nothing
    led = sinks.maintain_table(
        spark, tbl, target_bytes=1 << 20, min_age_s=0
    )
    assert (led["compact"] or {"files_rewritten": 0})[
        "files_rewritten"
    ] == 0
    assert led["materialize"] is None  # no dv debt past threshold


def test_intent_token_primitives_ownership_contract(spark, tmp_path):
    """Unit contract of the r14 intent-token primitives:
    ``_write_txn_intent`` stamps a fresh token per call (restamps
    replace the marker), and ``_clear_txn_intent`` deletes the marker
    only under a MATCHING token — a stale owner cannot delete a
    foreign writer's live intent; tokenless clears keep the legacy
    unconditional behavior; clearing an absent marker is a no-op."""
    tbl = _seed(spark, tmp_path)
    mdir = tbl + "/_stats_manifest"
    tpath = os.path.join(mdir, "_TXN")

    a = sinks._write_txn_intent(
        spark, mdir, {"expected_version": 5, "added": [], "removed": []}
    )
    b = sinks._write_txn_intent(  # restamp: marker replaced, new token
        spark, mdir, {"expected_version": 6, "added": [], "removed": []}
    )
    assert a != b and os.path.exists(tpath)
    with open(tpath) as f:
        assert json.load(f)["intent"] == b

    sinks._clear_txn_intent(spark, mdir, a)  # stale owner: must NOT delete
    assert os.path.exists(tpath)
    sinks._clear_txn_intent(spark, mdir, b)  # current owner: deletes
    assert not os.path.exists(tpath)
    sinks._clear_txn_intent(spark, mdir, b)  # absent: no-op, no raise
    sinks._clear_txn_intent(spark, mdir, None)  # legacy: no-op on absent
    assert not os.path.exists(os.path.join(mdir, "_LOCK"))  # lease released
