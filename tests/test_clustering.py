"""Data-layout clustering (``sinks.cluster_parquet``): round-trip
exactness, and MEASURED row-group skipping — both statically (parquet
footer min/max disjointness via pyarrow) and at RUNTIME (the Spark
scan node's ``numOutputRows`` after a pushed range filter, i.e. the
rows the vectorized parquet reader actually decoded after stats
pruning).  The three layouts bracket the design space:

- scattered: every row group spans the full key range → zero skipping;
- linear (lexicographic): near-perfect skipping on the LEADING key,
  zero on the trailing key;
- z-order: partial-but-real skipping on BOTH keys (~sqrt of the
  selectivity benefit each) — the multi-dimensional trade.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from evmtrace_etl_spark.sinks import cluster_parquet


def _dir_bytes(path: str) -> int:
    import os

    return sum(
        os.path.getsize(p) for p in glob.glob(path + "/part-*.parquet")
    )


def _touched_row_groups(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(row groups a [lo, hi] predicate must read, total row groups)
    computed from footer min/max stats — the exact arithmetic the
    parquet reader's stats pruning performs."""
    hit = tot = 0
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            tot += 1
            if st is None or (st.min <= hi and st.max >= lo):
                hit += 1
    return hit, tot


def _scan_output_rows(df) -> int:
    """Rows the parquet scan node emitted for an executed query — the
    runtime measure of row-group skipping (rows in pruned groups are
    never decoded, so they never count)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    rows = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            rows += m.apply("numOutputRows").value()
    return rows


def _fixture(spark, tmp_path):
    """Two independent uniform keys; written scattered (8 files),
    linear-clustered (8 files), z-order-clustered (32 files — z-runs
    must be shorter than a one-bucket slab's cell spacing for the
    low-bit dimension to skip at all, the granularity knob a real lake
    turns with target_bytes)."""
    src = str(tmp_path / "src")
    lin = str(tmp_path / "lin")
    zo = str(tmp_path / "zo")
    df = spark.range(200_000).select(
        (F.hash(F.col("id")) % 1000).alias("a"),
        (F.hash(F.col("id") + 7) % 1000).alias("b"),
        F.col("id").alias("v"),
    )
    df.repartition(8).write.parquet(src)
    sz = _dir_bytes(src)
    s1 = cluster_parquet(spark, src, lin, ["a", "b"], target_bytes=-(-sz // 8))
    s2 = cluster_parquet(
        spark,
        src,
        zo,
        ["a", "b"],
        target_bytes=-(-sz // 32),
        zorder=True,
        n_buckets=8,
    )
    return src, lin, zo, s1, s2


def test_cluster_roundtrip_and_ledger(spark, tmp_path):
    src, lin, zo, s1, s2 = _fixture(spark, tmp_path)
    assert s1["files_out"] == s1["n_target_files"] == 8
    assert s2["files_out"] == s2["n_target_files"] == 32
    assert s2["zorder"] and s2["n_buckets"] == 8
    want = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    for path in (lin, zo):
        got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert got == want


def test_footer_stats_skipping_three_layouts(spark, tmp_path):
    src, lin, zo, _s1, _s2 = _fixture(spark, tmp_path)
    # a 5%-of-range slab on each key ([-100, -1] of roughly [-999, 999])
    for col in ("a", "b"):
        hit, tot = _touched_row_groups(src, col, -100, -1)
        assert hit == tot, (col, hit, tot)  # scattered skips nothing
    lh, lt = _touched_row_groups(lin, "a", -100, -1)
    assert lh / lt <= 0.3, (lh, lt)  # leading key: near-perfect
    lh, lt = _touched_row_groups(lin, "b", -100, -1)
    assert lh == lt  # trailing key: nothing — why z-order exists
    for col in ("a", "b"):  # z-order: real skipping on BOTH keys
        zh, zt = _touched_row_groups(zo, col, -100, -1)
        assert zh / zt <= 0.55, (col, zh, zt)


def test_runtime_scan_rows_measure_skipping(spark, tmp_path):
    """The reader actually skips: after clustering, a pushed range
    filter decodes ≤ half the rows the scattered layout decodes (the
    scan node's own numOutputRows, not a proxy)."""
    src, lin, zo, _s1, _s2 = _fixture(spark, tmp_path)
    n = 200_000
    pred_a = (F.col("a") >= -100) & (F.col("a") < 0)
    pred_b = (F.col("b") >= -100) & (F.col("b") < 0)

    def rows(path, pred):
        return _scan_output_rows(spark.read.parquet(path).filter(pred))

    assert rows(src, pred_a) == n  # scattered decodes everything
    assert rows(lin, pred_a) <= 0.3 * n  # leading-key clustering
    assert rows(lin, pred_b) == n  # trailing key unhelped
    assert rows(zo, pred_a) <= 0.55 * n  # z-order helps both keys
    assert rows(zo, pred_b) <= 0.55 * n

    # and the filter really is pushed to the scan (stats pruning rides
    # on pushdown — without it the measure above would be meaningless)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.read.parquet(zo).filter(pred_a).explain(mode="formatted")
    txt = buf.getvalue()
    assert "PushedFilters" in txt and "GreaterThanOrEqual(a," in txt


def test_zorder_skew_proof_quantile_buckets(spark, tmp_path):
    """A heavy-tailed key still clusters: quantile bucketing spreads a
    zipf-ish key across the full z-range, so a slab over the DENSE
    region (where uniform min/max bucketing would dump ~all rows into
    one mega-bucket and skip nothing) still skips row groups."""
    src = str(tmp_path / "skew_src")
    dst = str(tmp_path / "skew_dst")
    # value = floor(1/u) - 1: ~half the mass at 0, long tail upward
    df = spark.range(100_000).select(
        F.floor(1.0 / (F.rand(seed=1) + 1e-9) - 1.0).alias("heavy"),
        (F.hash(F.col("id")) % 1000).alias("u"),
        F.col("id").alias("v"),
    )
    df.repartition(8).write.parquet(src)
    sz = _dir_bytes(src)
    cluster_parquet(
        spark,
        src,
        dst,
        ["heavy", "u"],
        target_bytes=-(-sz // 32),
        zorder=True,
        n_buckets=8,
    )
    # tail slab: tiny row fraction, and most groups skippable
    hit, tot = _touched_row_groups(dst, "heavy", 100, 10_000_000)
    assert hit / tot <= 0.55, (hit, tot)
    # dense-region slab (heavy == 0 holds ~half the rows): still skips
    hit, tot = _touched_row_groups(dst, "heavy", 0, 0)
    assert hit / tot <= 0.8, (hit, tot)
