"""File-skipping stats index (``sinks.parquet_stats_index`` /
``prune_files`` / ``read_file_pruned``): the manifest half of a
lakehouse table format — footer-only per-file min/max, file-level
pruning BEFORE the scan plan, result-identical to the unpruned read.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from evmtrace_etl_spark.sinks import (
    cluster_parquet,
    parquet_stats_index,
    prune_files,
    read_file_pruned,
)


def _build(spark, tmp_path, n_files: int = 8):
    """Events-like table linearly clustered on ``k`` into ~n_files files
    so the files tile disjoint k-ranges — the layout file skipping is
    exact on."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "clustered")
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    df.repartition(5).write.parquet(src)
    sz = sum(
        os.path.getsize(p) for p in glob.glob(src + "/part-*.parquet")
    )
    cluster_parquet(
        spark, src, dst, ["k"], target_bytes=max(1, sz // n_files)
    )
    return dst


def test_index_one_row_per_file_and_exact_counts(spark, tmp_path):
    dst = _build(spark, tmp_path)
    idx = parquet_stats_index(spark, dst, ["k", "v"]).cache()
    files = glob.glob(dst + "/part-*.parquet")
    rows = idx.collect()
    assert len(rows) == len(files)
    assert sum(r["n_rows"] for r in rows) == 20_000
    # spans cover the data exactly
    assert min(r["k_min"] for r in rows) == 0
    assert max(r["k_max"] for r in rows) == 19_999
    # typed as the source columns
    assert dict(idx.dtypes)["k_min"] == "bigint"
    assert dict(idx.dtypes)["v_max"] == "double"


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    dst = _build(spark, tmp_path)
    idx = parquet_stats_index(spark, dst, ["k"]).cache()
    total = idx.count()
    assert total >= 4  # the skipping claim needs >1 file
    pred = {"k": (3_000, 4_000)}
    kept = prune_files(idx, pred)
    assert 0 < len(kept) < total, (len(kept), total)
    got = sorted(
        tuple(r) for r in read_file_pruned(spark, dst, idx, pred).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(dst)
        .filter(F.col("k").between(3_000, 4_000))
        .collect()
    )
    assert got == want and len(got) == 1_001


def test_zero_matching_files_yields_empty_with_schema(spark, tmp_path):
    dst = _build(spark, tmp_path)
    idx = parquet_stats_index(spark, dst, ["k"])
    out = read_file_pruned(spark, dst, idx, {"k": (10**9, 10**9 + 5)})
    assert out.count() == 0
    assert out.columns == ["k", "grp", "v"]


def test_multi_column_predicates_intersect(spark, tmp_path):
    dst = _build(spark, tmp_path)
    idx = parquet_stats_index(spark, dst, ["k", "v"]).cache()
    # v = 2k, so k in [3000, 4000] & v in [0, 6500] -> k in [3000, 3250]
    pred = {"k": (3_000, 4_000), "v": (0.0, 6_500.0)}
    got = read_file_pruned(spark, dst, idx, pred)
    assert got.count() == 251
    assert len(prune_files(idx, pred)) <= len(
        prune_files(idx, {"k": (3_000, 4_000)})
    )


def test_timestamp_columns_get_real_parquet_stats(spark, tmp_path):
    """Engine sessions write TIMESTAMP_MICROS: Spark's INT96 default is
    a deprecated parquet type that gets NO min/max statistics, which
    silently disables BOTH row-group pruning and file skipping on every
    time column — measured as all-NULL manifest spans before the
    session conf pinned the encoding."""
    dst = str(tmp_path / "ts")
    spark.sql(
        "SELECT timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) AS ts"
        " FROM range(1000)"
    ).repartition(2).write.parquet(dst)
    rows = parquet_stats_index(spark, dst, ["ts"]).collect()
    assert rows and all(r["ts_min"] is not None for r in rows)
    assert min(r["ts_min"] for r in rows).year == 2024


def test_update_stats_index_incremental(spark, tmp_path):
    """Incremental manifest maintenance: new files get footer-read,
    already-indexed rows carry byte-identical, deleted files drop, and
    the updated manifest equals a from-scratch rebuild."""
    dst = _build(spark, tmp_path)
    manifest = str(tmp_path / "manifest")
    from evmtrace_etl_spark.sinks import update_stats_index

    led = update_stats_index(spark, dst, manifest, ["k"])
    assert led["files_new"] == led["files_total"] >= 4
    assert led["files_removed"] == led["files_carried"] == 0

    original = set(glob.glob(dst + "/part-*.parquet"))
    # append two files outside the existing key range
    spark.range(100_000, 101_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).cast("double").alias("v"),
    ).repartition(2).write.mode("append").parquet(dst)
    # and remove one ORIGINAL file (a compaction would do this)
    os.remove(sorted(original)[0])

    led = update_stats_index(spark, dst, manifest, ["k"])
    assert led["files_new"] == 2
    assert led["files_removed"] == 1
    assert led["files_carried"] == led["files_total"] - 2

    got = sorted(
        tuple(r) for r in spark.read.parquet(manifest).collect()
    )
    want = sorted(
        tuple(r) for r in parquet_stats_index(spark, dst, ["k"]).collect()
    )
    assert got == want
    # and the maintained manifest prunes correctly for the new range
    kept = prune_files(
        spark.read.parquet(manifest), {"k": (100_000, 200_000)}
    )
    assert 0 < len(kept) <= 2


def test_delete_where_rewrites_only_overlapping_files(spark, tmp_path):
    """Manifest-pruned row-level delete: files outside the predicate
    range stay byte-untouched (same inode), only overlapping files are
    rewritten minus the matching rows, and the manifest refresh equals
    a from-scratch rebuild."""
    dst = _build(spark, tmp_path)  # k linearly clustered, 0..19999
    manifest = str(tmp_path / "manifest")
    from evmtrace_etl_spark.sinks import delete_where, update_stats_index

    update_stats_index(spark, dst, manifest, ["k"])
    inodes_before = {
        f: os.stat(f).st_ino for f in glob.glob(dst + "/part-*.parquet")
    }
    total_files = len(inodes_before)

    led = delete_where(spark, dst, manifest, {"k": (5_000, 7_000)})
    assert led["rows_deleted"] == 2_001
    assert 0 < led["files_rewritten"] < total_files

    # survivors of the dataset: exact complement
    got = sorted(
        r["k"] for r in spark.read.parquet(dst).select("k").collect()
    )
    assert len(got) == 20_000 - 2_001
    assert all(not (5_000 <= k <= 7_000) for k in got)
    # untouched files kept their inodes (never rewritten)
    untouched = [
        f for f, ino in inodes_before.items()
        if os.path.exists(f) and os.stat(f).st_ino == ino
    ]
    assert len(untouched) == total_files - led["files_rewritten"]
    # manifest refreshed == rebuild, and the deleted range prunes to 0
    got_m = sorted(
        tuple(r) for r in spark.read.parquet(manifest).collect()
    )
    want_m = sorted(
        tuple(r) for r in parquet_stats_index(spark, dst, ["k"]).collect()
    )
    assert got_m == want_m
    # no-op delete: zero candidates, nothing changes
    led2 = delete_where(spark, dst, manifest, {"k": (10**8, 10**9)})
    assert led2["files_rewritten"] == 0 and led2["rows_deleted"] == 0


def test_delete_where_refuses_partitioned_layout(spark, tmp_path):
    """In-place file surgery on a hive layout would inline or lose the
    directory-encoded partition values — refused loudly."""
    import pytest

    from evmtrace_etl_spark.sinks import delete_where, update_stats_index

    part = str(tmp_path / "part")
    spark.range(100).selectExpr("id % 3 as p", "id as k").write.partitionBy(
        "p"
    ).parquet(part)
    manifest = str(tmp_path / "m")
    update_stats_index(spark, part, manifest, ["k"])
    with pytest.raises(ValueError, match="hive-partitioned"):
        delete_where(spark, part, manifest, {"k": (0, 10)})


def test_read_file_pruned_keeps_partition_values(spark, tmp_path):
    """Pruned reads of a hive-partitioned dataset keep the
    directory-encoded partition column (basePath) — without it the
    values silently read back NULL."""
    from evmtrace_etl_spark.sinks import parquet_stats_index

    part = str(tmp_path / "part")
    spark.range(1000).selectExpr("id % 4 as p", "id as k").write.partitionBy(
        "p"
    ).parquet(part)
    idx = parquet_stats_index(spark, part, ["k"])
    got = read_file_pruned(spark, part, idx, {"k": (100, 200)})
    rows = got.collect()
    assert len(rows) == 101
    assert all(r["p"] is not None and r["p"] == r["k"] % 4 for r in rows)


def test_index_is_footer_only_no_data_scan(spark, tmp_path):
    """The index job's scan reads the PATH LIST, not the table: pin by
    job-group scan metrics — the parquet files' rows never appear as
    any stage's input because only footers are opened (pyarrow,
    executor-side)."""
    dst = _build(spark, tmp_path)
    idx = parquet_stats_index(spark, dst, ["k"])
    plan = idx._jdf.queryExecution().executedPlan().toString()
    # the only scan in the plan is the in-memory path list
    assert "FileScan parquet" not in plan
