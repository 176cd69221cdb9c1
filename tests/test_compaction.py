"""Small-file compaction (``sinks.compact_parquet``): the file-count
math, exact content preservation, and both layout strategies
(round-robin repartition vs shuffle-free coalesce)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from evmtrace_etl_spark.sinks import compact_parquet


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not (f.startswith("_") or f.startswith(".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def test_compact_repartition_even_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(20_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)

    target = -(-_dir_bytes(src) // 4)  # aim for ~4 output files
    stats = compact_parquet(spark, src, dst, target_bytes=target)

    assert stats["files_in"] == 64
    assert stats["n_target_files"] in (4, 5)  # ceil of measured bytes
    # round-robin repartition writes exactly n non-empty files
    assert stats["files_out"] == stats["n_target_files"]
    assert stats["files_out"] < stats["files_in"]

    # content preserved exactly
    got = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_compact_coalesce_no_shuffle(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(5_000).write.mode("overwrite").parquet(src)
    # huge target → everything coalesces into one file, zero shuffle
    stats = compact_parquet(
        spark, src, dst, target_bytes=1 << 40, shuffle=False
    )
    assert stats["n_target_files"] == 1
    assert stats["files_out"] == 1
    assert spark.read.parquet(dst).count() == 5_000


def test_compact_partitioned_preserves_layout_and_budgets(spark, tmp_path):
    src, dst = str(tmp_path / "psrc"), str(tmp_path / "pdst")
    df = spark.range(8_000).select(
        (F.col("id") % 4).alias("chain_id"),
        F.col("id").alias("v"),
        (F.col("id") * 3).alias("w"),
    )
    # 16 small files in each of the 4 partition dirs
    df.repartition(16).write.partitionBy("chain_id").parquet(src)
    from evmtrace_etl_spark.sinks import compact_partitioned_parquet

    # target = half a partition's bytes → per-partition budget n_i == 2
    per_part = max(
        _dir_bytes(os.path.join(src, f"chain_id={c}")) for c in range(4)
    )
    stats = compact_partitioned_parquet(
        spark, src, dst, ["chain_id"], target_bytes=-(-per_part // 2)
    )
    assert stats["files_in"] == 64
    assert stats["n_partitions"] == 4
    assert stats["n_target_files"] <= 8
    # hive layout preserved, each dir within its budget (salt may leave
    # a value empty, never over-full), and far fewer files than before
    for c in range(4):
        d = os.path.join(dst, f"chain_id={c}")
        assert os.path.isdir(d)
        n = sum(
            1
            for f in os.listdir(d)
            if not (f.startswith("_") or f.startswith("."))
        )
        assert 1 <= n <= 2, (c, n)
    assert stats["files_out"] < stats["files_in"]

    # content (including the partition column) preserved exactly
    got = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    want = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    assert got == want

    # and a filter on the partition column still prunes directories
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.read.parquet(dst).filter(F.col("chain_id") == 2).explain(
            mode="formatted"
        )
    assert "PartitionFilters" in buf.getvalue()
