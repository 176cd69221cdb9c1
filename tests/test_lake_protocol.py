"""Protocol feature-level stamps on the commit marker (Delta's
protocol action re-expressed): commits that first use column mapping,
type widening, or consolidated per-row deletion vectors stamp
``features`` + ``protocol`` (min_reader/min_writer), the stamp carries
forward monotonically, and every read/write entry point REFUSES a
table stamped above this build's supported level instead of silently
misreading physical names / narrow types / per-row tombstones."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from evmtrace_etl_spark import sinks
from evmtrace_etl_spark.sinks import (
    ProtocolUnsupported,
    append_files,
    delete_where,
    merge_into,
    read_table,
    rename_column,
    table_changes,
)

# r15: deep scenario module — full-tier only (see tests/conftest.py)
pytestmark = pytest.mark.slow


def _seed(spark, tmp_path, name="tbl") -> str:
    tbl = str(tmp_path / name)
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("int").alias("v")
    )
    append_files(spark, df.coalesce(1), tbl, cols=["k"], keep_versions=10)
    return tbl


def _head_marker(tbl: str) -> dict:
    mdir = tbl + "/_stats_manifest"
    vs = sorted(
        int(n[1:])
        for n in os.listdir(mdir)
        if n.startswith("v")
        and os.path.exists(os.path.join(mdir, n, "_COMMIT"))
    )
    with open(os.path.join(mdir, f"v{vs[-1]}", "_COMMIT")) as f:
        return json.load(f)


def _stamp_protocol(tbl: str, min_reader: int, min_writer: int) -> None:
    """Hand-edit the head marker to a future protocol level — the
    older-build-meets-newer-table simulation."""
    mdir = tbl + "/_stats_manifest"
    m = _head_marker(tbl)
    vdir = os.path.join(mdir, f"v{m['version']}")
    m["protocol"] = {"min_reader": min_reader, "min_writer": min_writer}
    m["features"] = ["from-the-future"]
    with open(os.path.join(vdir, "_COMMIT"), "w") as f:
        f.write(json.dumps(m))
    crc = os.path.join(vdir, "._COMMIT.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_plain_table_stamps_no_protocol(spark, tmp_path):
    """Level-1 tables keep the pre-protocol wire shape byte-stable:
    no ``protocol``/``features`` keys at all."""
    tbl = _seed(spark, tmp_path)
    m = _head_marker(tbl)
    assert "protocol" not in m and "features" not in m


def test_feature_commits_stamp_and_carry_protocol(spark, tmp_path):
    """Column mapping and type widening each bump the stamp, the
    feature set accumulates, and a later plain append CARRIES it —
    protocol never downgrades."""
    tbl = _seed(spark, tmp_path)
    rename_column(spark, tbl, "v", "amount")
    m = _head_marker(tbl)
    assert m["protocol"] == {"min_reader": 2, "min_writer": 2}
    assert m["features"] == ["column-mapping"]
    # widening append: int -> long
    append_files(
        spark,
        spark.range(100, 103).select(
            F.col("id").alias("k"),
            (F.lit(5_000_000_000) + F.col("id")).alias("amount"),
        ).coalesce(1),
        tbl,
    )
    m = _head_marker(tbl)
    assert set(m["features"]) == {"column-mapping", "type-widening"}
    # plain append afterwards: stamp carries forward unchanged
    append_files(
        spark,
        spark.range(200, 203).select(
            F.col("id").alias("k"), F.col("id").cast("long").alias("amount")
        ).coalesce(1),
        tbl,
    )
    m = _head_marker(tbl)
    assert m["protocol"] == {"min_reader": 2, "min_writer": 2}
    assert set(m["features"]) == {"column-mapping", "type-widening"}
    # the table still reads fine at this build's level
    assert read_table(spark, tbl).count() == 56


def test_dv_consolidation_stamps_per_row_feature(spark, tmp_path):
    """The checkpoint DV fold writes per-row-versioned sidecars — a
    pre-fold build would ignore __dv_v — so the folding commit stamps
    the dv-per-row feature."""
    tbl = _seed(spark, tmp_path)
    for i in range(10):  # v1..v10; v10 checkpoints + consolidates
        delete_where(
            spark, tbl, None, {"k": (i, i)},
            strategy="merge-on-read", keys=["k"],
        )
    m = _head_marker(tbl)
    assert any(d.get("per_row") for d in m["dvs"])
    assert "dv-per-row" in m["features"]
    assert m["protocol"]["min_reader"] == 2


def test_future_protocol_refuses_reads_and_writes(spark, tmp_path):
    """A marker stamped above this build's level raises a NAMED error
    on every entry point — read_table, table_changes, the lake_changes
    stream source, and (through the one commit choke point) every
    write path."""
    tbl = _seed(spark, tmp_path)
    _stamp_protocol(tbl, min_reader=99, min_writer=99)
    with pytest.raises(ProtocolUnsupported, match="reader feature level"):
        read_table(spark, tbl)
    with pytest.raises(ProtocolUnsupported, match="reader feature level"):
        table_changes(spark, tbl, since_version=0).collect()
    from evmtrace_etl_spark.sources.lake_changes import lake_changes_stream

    with pytest.raises(Exception, match="feature level"):
        lake_changes_stream(spark, tbl).schema
    batch = spark.range(500, 510).select(
        F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
    )
    with pytest.raises(ProtocolUnsupported, match="writer feature level"):
        append_files(spark, batch.coalesce(1), tbl)
    with pytest.raises(ProtocolUnsupported, match="writer feature level"):
        merge_into(spark, batch, tbl, keys=["k"])
    with pytest.raises(ProtocolUnsupported, match="writer feature level"):
        delete_where(spark, tbl, None, {"k": (0, 5)})
    with pytest.raises(ProtocolUnsupported, match="writer feature level"):
        rename_column(spark, tbl, "v", "vv")


def test_writer_only_future_level_still_reads(spark, tmp_path):
    """min_writer above the build with min_reader within it: reads
    keep working (forward-compatible readers — Delta's split levels),
    writes refuse."""
    tbl = _seed(spark, tmp_path)
    _stamp_protocol(tbl, min_reader=1, min_writer=99)
    assert read_table(spark, tbl).count() == 50
    with pytest.raises(ProtocolUnsupported, match="writer feature level"):
        append_files(
            spark,
            spark.range(2).select(
                F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
            ).coalesce(1),
            tbl,
        )


def test_explicit_protocol_upgrade(spark, tmp_path):
    """upgrade_table_protocol raises the floor as a metadata-only
    commit BEFORE any feature is used, carries forward, never
    downgrades, no-ops at-or-below the current stamp, and refuses
    levels above the build's own support."""
    tbl = _seed(spark, tmp_path)
    got = sinks.upgrade_table_protocol(spark, tbl, min_writer=2)
    assert got["protocol"] == {"min_reader": 1, "min_writer": 2}
    m = _head_marker(tbl)
    assert m["protocol"] == {"min_reader": 1, "min_writer": 2}
    assert m["op"].startswith("upgrade-protocol")
    # carried by a plain append, never downgraded
    append_files(
        spark,
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
        ).coalesce(1),
        tbl,
    )
    assert _head_marker(tbl)["protocol"] == {
        "min_reader": 1, "min_writer": 2,
    }
    # at-or-below request: commit-free no-op
    v = _head_marker(tbl)["version"]
    got = sinks.upgrade_table_protocol(spark, tbl, min_writer=1)
    assert got["version"] == v
    # above the build's support: refused
    with pytest.raises(ValueError, match="this build supports"):
        sinks.upgrade_table_protocol(spark, tbl, min_reader=99)
    # the table still reads and writes at this build's level
    assert read_table(spark, tbl).count() == 53
    # history surfaces the stamp per snapshot
    hist = sinks.table_history(spark, tbl)
    assert hist[-1]["protocol"] == {"min_reader": 1, "min_writer": 2}
    assert hist[0]["protocol"] is None  # pre-upgrade snapshot


def test_future_protocol_refuses_before_any_data_work(spark, tmp_path):
    """The writer-side gate fires at the HEAD of every locked
    write/maintenance entry point, not just at the commit choke point:
    a lower-level build running compact/materialize/vacuum/maintain on
    an upgraded table must refuse BEFORE scanning, rewriting, or moving
    any file in — no live ``_TXN`` intent, no moved-in files, every
    data file byte-untouched (the late commit-time refusal left debris
    for the next op's recovery to clean)."""
    import glob

    tbl = _seed(spark, tmp_path)
    # a second small file so compact_table has real work to refuse
    append_files(
        spark,
        spark.range(100, 120).select(
            F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
        ).coalesce(1),
        tbl,
    )
    # a little DV debt so materialize/maintain would have real work
    delete_where(
        spark, tbl, None, {"k": (0, 4)},
        strategy="merge-on-read", keys=["k"],
    )
    _stamp_protocol(tbl, min_reader=1, min_writer=99)
    mdir = tbl + "/_stats_manifest"
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(tbl + "/**/*.parquet", recursive=True)
    }

    # a crashed (future-build) writer's intent: the gate must refuse
    # BEFORE intent recovery — adjudicating a newer build's intent or
    # sweeping its backlog under this build's stale semantics could
    # destroy files a higher-level snapshot references
    orphan = os.path.join(tbl, "part-99999-feedface.c000.snappy.parquet")
    import shutil as _shutil

    _shutil.copy(glob.glob(tbl + "/*.parquet")[0], orphan)
    import json as _json

    with open(os.path.join(mdir, "_TXN"), "w") as f:
        _json.dump(
            {"expected_version": 99, "added": [orphan], "removed": []},
            f,
        )

    ops = [
        lambda: sinks.compact_table(spark, tbl, target_bytes=1 << 20),
        lambda: sinks.materialize_deletes(spark, tbl),
        lambda: sinks.vacuum_table(spark, tbl, min_age_s=0),
        lambda: sinks.maintain_table(spark, tbl, min_age_s=0),
        lambda: sinks.update_stats_index(spark, tbl, None),
        lambda: sinks.restore_table(spark, tbl, version=0),
        lambda: sinks.add_table_constraint(spark, tbl, "v_ok", "v >= 0"),
        lambda: delete_where(spark, tbl, None, {"k": (5, 9)}),
        lambda: delete_where(
            spark, tbl, None, {"k": (5, 9)},
            strategy="merge-on-read", keys=["k"],
        ),
        lambda: append_files(
            spark,
            spark.range(900, 910).select(
                F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
            ).coalesce(1),
            tbl,
        ),
        lambda: merge_into(
            spark,
            spark.range(900, 910).select(
                F.col("id").alias("k"), F.lit(1).cast("int").alias("v")
            ),
            tbl, keys=["k"],
        ),
        lambda: rename_column(spark, tbl, "v", "vv"),
        lambda: sinks.drop_column(spark, tbl, "v"),
        lambda: sinks.drop_table_constraint(spark, tbl, "v_ok"),
        lambda: sinks.upgrade_table_protocol(spark, tbl, min_writer=2),
    ]
    for op in ops:
        with pytest.raises(ProtocolUnsupported, match="feature level"):
            op()
        # the future writer's intent was NOT adjudicated: marker and
        # its referenced file both survive every refused entry point
        assert os.path.exists(os.path.join(mdir, "_TXN"))
        assert os.path.exists(orphan)

    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(tbl + "/**/*.parquet", recursive=True)
        if p != orphan
    }
    assert after == before  # zero data work happened
