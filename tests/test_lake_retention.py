"""Removed-file retention (``append_files(retain_removed=True)``):
a rewrite's replaced data files stay on disk until their snapshot
falls out of ``keep_versions``, so time travel (version AND
timestamp) and RESTORE work ACROSS rewrite commits — Delta's VACUUM
retention window, driven by retained versions instead of wall-clock
age.  Default tables keep the zero-retention shape (replaced files
swept at the rewrite's commit) byte-for-byte: their markers still
carry bare-path pending lists."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from evmtrace_etl_spark.sinks import (
    add_table_constraint,
    append_files,
    commit_timestamp,
    merge_into,
    read_table,
    restore_table,
    table_history,
    update_stats_index,
    vacuum_table,
    version_at_timestamp,
)


def _data_files(tbl: str) -> set[str]:
    return {
        p
        for p in glob.glob(os.path.join(tbl, "**", "*.parquet"), recursive=True)
        if "_stats_manifest" not in p and "_changes" not in p
    }


def _seed(spark, tmp_path, retain: bool, keep_versions: int = 10) -> str:
    tbl = str(tmp_path / ("ret" if retain else "plain"))
    for lo in (0, 100):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        append_files(
            spark, df.coalesce(1), tbl, cols=["k"],
            keep_versions=keep_versions,
            retain_removed=retain if lo == 0 else None,  # stamped once
        )
    return tbl


def test_time_travel_across_rewrite(spark, tmp_path):
    """On a retention table a copy-on-write merge keeps the replaced
    files, so both forms of time travel serve the pre-rewrite state;
    a default table swept them at the rewrite commit and raises."""
    tbl = _seed(spark, tmp_path, retain=True)
    before = _data_files(tbl)
    hist = table_history(spark, tbl)
    pre_v, pre_ts = hist[-1]["version"], hist[-1]["ts"]

    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    led = merge_into(spark, src, tbl, keys=["k"], keep_versions=10)
    assert led["files_rewritten"] >= 1
    # replaced files still on disk
    assert before <= _data_files(tbl)

    old = read_table(spark, tbl, version=pre_v)
    assert old.count() == 200 and old.filter("v = -1").count() == 0
    assert version_at_timestamp(spark, tbl, pre_ts) == pre_v
    old_ts = read_table(spark, tbl, as_of_timestamp=pre_ts)
    assert old_ts.filter("v = -1").count() == 0
    # the head still serves the merged state
    assert read_table(spark, tbl).filter("v = -1").count() == 50

    # default table: same merge sweeps the candidates at commit
    plain = _seed(spark, tmp_path, retain=False)
    pv = table_history(spark, plain)[-1]["version"]
    pre_files = _data_files(plain)
    merge_into(spark, src, plain, keys=["k"], keep_versions=10)
    assert not (pre_files <= _data_files(plain))  # something was swept
    with pytest.raises(Exception):
        read_table(spark, plain, version=pv).filter("v = -1").count()


def test_default_marker_wire_shape_unchanged(spark, tmp_path):
    """Zero-retention tables keep the legacy bare-path pending list in
    their commit markers (old readers and the two-process script parse
    it), and never stamp the retain flag."""
    plain = _seed(spark, tmp_path, retain=False)
    merge_into(
        spark,
        spark.range(5).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        ),
        plain,
        keys=["k"],
        keep_versions=10,
    )
    mdir = os.path.join(plain, "_stats_manifest")
    head = max(
        int(d[1:]) for d in os.listdir(mdir) if d.startswith("v")
    )
    marker = json.loads(
        open(os.path.join(mdir, f"v{head}", "_COMMIT")).read()
    )
    assert "retain" not in marker
    assert all(isinstance(e, str) for e in marker.get("pending", []))


def test_restore_across_rewrite_readds_and_unpends(spark, tmp_path):
    """RESTORE to a pre-rewrite snapshot on a retention table: the
    replaced files still exist, the restore re-adds them, and they
    LEAVE the sweep backlog — later maintenance must not reclaim files
    the restored head references."""
    tbl = _seed(spark, tmp_path, retain=True)
    pre_v = table_history(spark, tbl)[-1]["version"]
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(spark, src, tbl, keys=["k"], keep_versions=10)

    led = restore_table(spark, tbl, version=pre_v, keep_versions=10)
    assert led["files_readded"] >= 1
    assert read_table(spark, tbl).filter("v = -1").count() == 0
    # maintenance after the restore must not eat the re-added files
    vacuum_table(spark, tbl)
    append_files(
        spark,
        spark.range(200, 210).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).coalesce(1),
        tbl,
        keep_versions=10,
    )
    t = read_table(spark, tbl)
    assert t.count() == 210 and t.filter("v = -1").count() == 0


def test_stats_index_does_not_adopt_retained_history(spark, tmp_path):
    """The maintenance rebuild's "unknown file on disk == new ingest"
    rule must NOT adopt a retention table's pending backlog — those
    files are known-removed history kept for time travel, and
    re-adopting them would resurrect pre-merge rows into the head."""
    tbl = _seed(spark, tmp_path, retain=True)
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(spark, src, tbl, keys=["k"], keep_versions=10)
    before = read_table(spark, tbl)
    assert before.count() == 200 and before.filter("v = -1").count() == 50

    led = update_stats_index(spark, tbl, keep_versions=10)
    assert led["files_new"] == 0  # the retained file is NOT new ingest
    after = read_table(spark, tbl)
    assert after.count() == 200
    assert after.filter("v = -1").count() == 50  # nothing resurrected


def test_version_at_timestamp_respects_retention_floor(spark, tmp_path):
    """Chain-link version dirs below the stamped retention floor are
    not servable snapshots (their removed files were reclaimed) —
    timestamp resolution refuses them instead of resolving to a
    snapshot that would die mid-read."""
    tbl = _seed(spark, tmp_path, retain=True, keep_versions=2)
    ts_v1 = commit_timestamp(spark, tbl, 1)
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(spark, src, tbl, keys=["k"], keep_versions=2)  # v2
    for lo in (300, 400):  # advance the floor past the rewrite
        append_files(
            spark,
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ).coalesce(1),
            tbl,
            keep_versions=2,
        )
    vacuum_table(spark, tbl)
    with pytest.raises(ValueError, match="predates"):
        version_at_timestamp(spark, tbl, ts_v1)


def test_metadata_ddl_carries_retention_window(spark, tmp_path):
    """A metadata-only DDL (add_table_constraint) with no explicit
    keep_versions carries the table's stamped window instead of
    collapsing it to the default — retained history survives."""
    tbl = _seed(spark, tmp_path, retain=True, keep_versions=10)
    pre_v = table_history(spark, tbl)[-1]["version"]
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(spark, src, tbl, keys=["k"], keep_versions=10)
    add_table_constraint(spark, tbl, "v_any", "v IS NOT NULL OR v IS NULL")
    vacuum_table(spark, tbl)
    old = read_table(spark, tbl, version=pre_v)
    assert old.count() == 200 and old.filter("v = -1").count() == 0


def test_retain_false_is_unspecified(spark, tmp_path):
    """retain_removed=False on a later append must NOT strip the
    table's retention flag (or flatten the backlog's rm_v stamps) —
    only True enables, anything else carries."""
    tbl = _seed(spark, tmp_path, retain=True)
    append_files(
        spark,
        spark.range(500, 510).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).coalesce(1),
        tbl,
        keep_versions=10,
        retain_removed=False,
    )
    pre_v = table_history(spark, tbl)[-1]["version"]
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    merge_into(spark, src, tbl, keys=["k"], keep_versions=10)
    # the rewrite's replaced files were retained: pre-merge still reads
    old = read_table(spark, tbl, version=pre_v)
    assert old.count() == 210 and old.filter("v = -1").count() == 0


def test_retention_reclaims_past_the_floor(spark, tmp_path):
    """Retention is bounded by keep_versions: once the pre-rewrite
    snapshot falls out of the retained window the next sweep reclaims
    the replaced files, and travel to it refuses (the manifest chain
    itself is gone)."""
    tbl = _seed(spark, tmp_path, retain=True, keep_versions=2)
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    led = merge_into(spark, src, tbl, keys=["k"], keep_versions=2)
    rewrite_v = led["version"]
    n_after_merge = len(_data_files(tbl))
    # push the floor past the rewrite version
    for lo in (300, 400):
        append_files(
            spark,
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ).coalesce(1),
            tbl,
            keep_versions=2,
        )
    vacuum_table(spark, tbl)
    # the replaced files are gone: merge added 1 file and swept >=1,
    # the two appends added one each
    assert len(_data_files(tbl)) < n_after_merge + 2
    with pytest.raises(Exception):
        read_table(spark, tbl, version=rewrite_v - 1).count()
    # the head is intact
    assert read_table(spark, tbl).count() == 220


def test_vacuum_dry_run_lists_without_deleting(spark, tmp_path):
    """VACUUM DRY RUN: the dry run returns exactly the paths the real
    vacuum then deletes — stale temp siblings, orphan sidecars, and
    the due pending backlog — while touching nothing itself (no
    deletes, no intent recovery)."""
    import glob as _glob

    from evmtrace_etl_spark.sinks import merge_into

    tbl = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    append_files(spark, df.coalesce(1), tbl, cols=["k"], keep_versions=10)
    # debris: a crashed pre-intent temp sibling + an orphan sidecar
    stale = tbl + "._append_deadbeef"
    os.makedirs(stale)
    open(stale + "/part-zzz.parquet", "wb").write(b"x")
    os.makedirs(tbl + "/_deletes/v99-orphan")
    open(tbl + "/_deletes/v99-orphan/part-0.parquet", "w").close()

    files_before = set(_glob.glob(tbl + "*/**/*", recursive=True))
    listed = vacuum_table(spark, tbl, min_age_s=0, dry_run=True)
    assert any("_append_deadbeef" in p for p in listed)
    assert any("v99-orphan" in p for p in listed)
    # nothing moved: dry run is a pure listing
    assert set(_glob.glob(tbl + "*/**/*", recursive=True)) == files_before
    assert os.path.exists(stale)

    deleted = vacuum_table(spark, tbl, min_age_s=0)
    assert set(listed) == set(deleted)
    assert not os.path.exists(stale)
    # and a second dry run is now clean
    assert vacuum_table(spark, tbl, min_age_s=0, dry_run=True) == []
    # read path unaffected throughout
    assert read_table(spark, tbl).count() == 100
    # keep merge_into imported-use explicit for flake tools
    assert callable(merge_into)


def test_history_rows_carry_operation_metrics(spark, tmp_path):
    """DESCRIBE HISTORY's operationMetrics analog: every write op
    stamps its ledger-grade counts into the commit marker and
    table_history surfaces them."""
    from evmtrace_etl_spark.sinks import (
        delete_where,
        merge_into,
        table_history,
    )

    tbl = str(tmp_path / "m")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    append_files(spark, df.coalesce(1), tbl, cols=["k"], keep_versions=10)
    merge_into(
        spark,
        spark.range(50, 120).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        ),
        tbl, keys=["k"], keep_versions=10,
    )
    delete_where(
        spark, tbl, None, {"v": -1}, strategy="merge-on-read",
        keys=["k"], keep_versions=10,
    )
    hist = {h["op"]: h["metrics"] for h in table_history(spark, tbl)}
    assert hist["append"] == {"rows_written": 100, "files_added": 1}
    m = hist["merge (update, copy-on-write)"]
    assert m["rows_source"] == 70 and m["files_removed"] == 1
    assert m["rows_written"] == 120
    d = hist["delete (merge-on-read)"]
    assert d == {"rows_deleted": 70, "dv_files": 1}
