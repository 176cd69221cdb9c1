"""Model-based differential test of the whole lake tier: seeded random
PROGRAMS of mixed operations (appends, copy-on-write and merge-on-read
merges/deletes/updates, compaction, materialize, column rename, type
widening, the maintain_table composite, vacuum, protocol upgrade, and
RESTORE to a random retained snapshot) run against both the
snapshot-logged table and a plain Python dict model — after EVERY
operation the visible table must equal the model exactly (on restore,
the model rolls back to its recorded state for that version, column
name and value type included).
This is the catch-all for cross-feature interactions no single-feature
test enumerates (a tombstone surviving a compaction, a rename breaking
DV suppression, a merge resurrecting a deleted key, a restore across a
DV fold or rename, an upgraded protocol floor breaking a later op...).

Seeds are OPS-LIST-PINNED: changing the ``ops`` list re-maps every
random draw — re-pin the parametrized seeds and the long-program seed
(which must cross the every-10-commits DV consolidation) whenever the
op mix changes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from evmtrace_etl_spark import sinks
from evmtrace_etl_spark.sinks import (
    append_files,
    compact_table,
    delete_where,
    materialize_deletes,
    merge_into,
    read_table,
    rename_column,
    update_where,
)

# r15: deep scenario module — full-tier only (see tests/conftest.py)
pytestmark = pytest.mark.slow


def _df(spark, rows, val_col="v", val_type="int"):
    return spark.createDataFrame(
        [(k, u, v) for k, (u, v) in sorted(rows.items())],
        f"k long, u long, {val_col} {val_type}",
    )


def _check(spark, tbl, model, val_col):
    got = sorted(
        (r["k"], r["u"], r[val_col])
        for r in read_table(spark, tbl).collect()
    )
    want = sorted((k, u, v) for k, (u, v) in model.items())
    assert got == want, (len(got), len(want))


def _run_program(spark, tmp_path, seed: int, n_ops: int = 12) -> list:
    rng = random.Random(seed)
    tbl = str(tmp_path / f"t{seed}")
    val_col = "v"
    val_type = "int"  # widened to long mid-program by the widen op
    model: dict[int, tuple[int, int]] = {
        k: (k % 7, k * 10) for k in range(100)
    }
    # retain_removed so RESTORE stays valid across the program's
    # copy-on-write rewrites (replaced files kept until their snapshot
    # leaves keep_versions — the retention contract restore rides)
    append_files(
        spark, _df(spark, model).coalesce(2), tbl, cols=["k"],
        keep_versions=10, retain_removed=True,
    )
    next_k = 100
    trace = []
    ops = [
        "append", "merge_cow", "merge_mor", "delete_mor", "update_mor",
        "delete_cow", "update_cow", "compact", "materialize", "rename",
        "widen", "maintain", "vacuum", "upgrade", "restore",
    ]
    renamed = False
    mdir = tbl + "/_stats_manifest"
    # model snapshots per committed version, for RESTORE: the model
    # rolls back with the table (column name and value type included)
    history: dict[int, tuple[dict, str, str]] = {
        sinks.manifest_version(spark, mdir): (dict(model), val_col, val_type)
    }
    for step in range(n_ops):
        op = rng.choice(ops)
        trace.append(op)
        if op == "append":  # fresh keys only (keyed-table contract)
            n = rng.randint(1, 20)
            fresh = {
                k: (k % 7, k * 10) for k in range(next_k, next_k + n)
            }
            next_k += n
            append_files(
                spark,
                _df(spark, fresh, val_col, val_type).coalesce(1),
                tbl,
            )
            model.update(fresh)
        elif op in ("merge_cow", "merge_mor"):
            keys = rng.sample(sorted(model), min(len(model), 15)) + list(
                range(next_k, next_k + rng.randint(0, 5))
            )
            next_k += 5
            rows = {k: (k % 7, rng.randint(-999, 999)) for k in keys}
            merge_into(
                spark, _df(spark, rows, val_col, val_type), tbl, keys=["k"],
                strategy=(
                    "merge-on-read" if op == "merge_mor" else "copy-on-write"
                ),
            )
            model.update(rows)
        elif op == "delete_mor":
            r = rng.randint(0, 6)
            delete_where(
                spark, tbl, None, {"u": r}, strategy="merge-on-read",
                keys=["k"],
            )
            model = {k: t for k, t in model.items() if t[0] != r}
        elif op == "delete_cow":
            lo = rng.randint(0, next_k)
            hi = lo + rng.randint(0, 50)
            delete_where(spark, tbl, None, {"k": (lo, hi)})
            model = {k: t for k, t in model.items() if not lo <= k <= hi}
        elif op == "update_mor":
            r = rng.randint(0, 6)
            d = rng.randint(1, 1000)
            update_where(
                spark, tbl, None, {"u": r}, {val_col: f"{val_col} + {d}"},
                strategy="merge-on-read", keys=["k"],
            )
            model = {
                k: (u, v + d if u == r else v)
                for k, (u, v) in model.items()
            }
        elif op == "update_cow":
            lo = rng.randint(0, next_k)
            hi = lo + rng.randint(0, 50)
            d = rng.randint(1, 1000)
            update_where(
                spark, tbl, None, {"k": (lo, hi)},
                {val_col: f"{val_col} + {d}"},
            )
            model = {
                k: (u, v + d if lo <= k <= hi else v)
                for k, (u, v) in model.items()
            }
        elif op == "compact":
            compact_table(spark, tbl, target_bytes=1 << 20)
        elif op == "materialize":
            materialize_deletes(spark, tbl)
        elif op == "maintain":
            # the one-call nightly upkeep (threshold low enough to
            # fire its materialize leg sometimes) must NEVER change
            # visible rows — the model stays untouched
            sinks.maintain_table(
                spark, tbl, target_bytes=1 << 20,
                dv_files_threshold=2, min_age_s=0,
            )
        elif op == "vacuum":
            sinks.vacuum_table(spark, tbl, min_age_s=0)
        elif op == "rename" and not renamed:
            rename_column(spark, tbl, val_col, "val")
            val_col = "val"
            renamed = True
        elif op == "widen" and val_type == "int":
            # a batch whose values exceed int range widens the stored
            # type in its own commit (old files upcast at read)
            n = rng.randint(1, 5)
            fresh = {
                k: (k % 7, 5_000_000_000 + k)
                for k in range(next_k, next_k + n)
            }
            next_k += n
            append_files(
                spark,
                _df(spark, fresh, val_col, "long").coalesce(1),
                tbl,
            )
            model.update(fresh)
            val_type = "long"
        elif op == "upgrade":
            # explicit protocol floor raise mid-program: a metadata-
            # only commit every later op must keep working under
            sinks.upgrade_table_protocol(
                spark, tbl, min_reader=2, min_writer=2
            )
        elif op == "restore":
            # RESTORE to a random RETAINED recorded snapshot (possibly
            # across a DV fold, a rename, or a widen) — the model, the
            # column name, and the value type all roll back with it
            committed = set(sinks._committed_versions(spark, mdir))
            candidates = sorted(v for v in history if v in committed)
            if candidates:
                target = rng.choice(candidates[-5:])
                sinks.restore_table(spark, tbl, version=target)
                model, val_col, val_type = history[target]
                model = dict(model)
                renamed = val_col != "v"
        _check(spark, tbl, model, val_col)
        history[sinks.manifest_version(spark, mdir)] = (
            dict(model), val_col, val_type,
        )
    return trace


# seeds re-pinned for the r14 ops list (upgrade/restore added): 2/3/9
# collectively cover restore-after-rename, repeated upgrades, restore
# across maintain, and every pre-existing op class
@pytest.mark.parametrize("seed", [2, 3, 9])
def test_random_lake_program_matches_model(spark, tmp_path, seed):
    trace = _run_program(spark, tmp_path, seed)
    assert len(trace) == 12
    assert "restore" in trace or "upgrade" in trace  # new ops exercised


def test_long_lake_program_crosses_dv_consolidation(spark, tmp_path):
    """A 24-op program (seed chosen so the random walk stacks enough
    merge-on-read commits to cross the every-10-commits checkpoint
    with >1 active deletion vector) drives the model-based check
    ACROSS the checkpoint DV fold: the consolidated per-row sidecar
    must serve byte-identical visibility to the per-commit sidecars
    it replaced, through every later op of the program — which for
    this seed also includes a mid-program protocol upgrade, a restore,
    and a rename BEFORE the fold."""
    import glob

    trace = _run_program(spark, tmp_path, seed=101, n_ops=24)
    assert len(trace) == 24
    assert "upgrade" in trace and "restore" in trace and "rename" in trace
    tbl = str(tmp_path / "t101")
    # the program really crossed the fold (seed-pinned — revisit the
    # seed if the op mix ever changes)
    assert glob.glob(tbl + "/_deletes/consolidated-*")


def test_streamed_lake_program_matches_model(spark, tmp_path):
    """Streaming leg of the model test: fresh keys arrive through a
    REAL checkpointed lake-append stream (txn-stamped exactly-once,
    in-band maintain_every=2) interleaved with randomly drawn
    non-append lake ops on the same table — after EVERY step the
    visible table must equal the dict model.  This composes streaming
    ingest with MOR erasure/rectification, keyed merge, compaction,
    and vacuum in one random walk, which no single-feature streaming
    test exercises.  (Separate from ``_run_program`` so its op-mix
    changes never invalidate the pinned batch-program seeds.)"""
    import glob as _glob

    from evmtrace_etl_spark.sinks import start_lake_append_stream

    rng = random.Random(17)
    tbl = str(tmp_path / "stream_tbl")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    import os as _os

    _os.makedirs(src)
    model: dict[int, tuple[int, int]] = {
        k: (k % 7, k * 10) for k in range(100)
    }
    append_files(
        spark, _df(spark, model).coalesce(2), tbl, cols=["k"],
        keep_versions=10,
    )
    next_k = 100

    def stream_in(fresh: dict) -> None:
        # one availableNow drain over the shared checkpoint: only the
        # newly staged file lands, as ONE txn-stamped commit, with the
        # in-band maintenance cadence live
        _df(spark, fresh).coalesce(1).write.mode("append").parquet(src)
        q = start_lake_append_stream(
            spark.readStream.schema("k long, u long, v int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            tbl, ckpt, cols=["k"], app_id="model_stream",
            maintain_every=2, maintain_kwargs={"min_age_s": 0},
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        q.stop()
        # Spark 4 guards a checkpoint against concurrent query
        # instances; deregistration is async — wait until this drain
        # leaves the active list before the next one reuses the ckpt
        import time as _t

        deadline = _t.time() + 30
        while (
            any(x.id == q.id for x in spark.streams.active)
            and _t.time() < deadline
        ):
            _t.sleep(0.2)

    for step in range(8):
        if step % 2 == 0:  # every other step: streamed arrival
            n = rng.randint(5, 25)
            fresh = {
                k: (k % 7, k * 10) for k in range(next_k, next_k + n)
            }
            next_k += n
            stream_in(fresh)
            model.update(fresh)
        else:
            op = rng.choice(
                ["delete_mor", "update_mor", "merge_cow", "compact",
                 "vacuum"]
            )
            if op == "delete_mor":
                r = rng.randint(0, 6)
                delete_where(
                    spark, tbl, None, {"u": r},
                    strategy="merge-on-read", keys=["k"],
                )
                model = {k: t for k, t in model.items() if t[0] != r}
            elif op == "update_mor":
                r = rng.randint(0, 6)
                d = rng.randint(1, 1000)
                update_where(
                    spark, tbl, None, {"u": r}, {"v": f"v + {d}"},
                    strategy="merge-on-read", keys=["k"],
                )
                model = {
                    k: (u, v + d if u == r else v)
                    for k, (u, v) in model.items()
                }
            elif op == "merge_cow":
                keys = rng.sample(sorted(model), min(len(model), 10))
                rows = {k: (k % 7, rng.randint(-999, 999)) for k in keys}
                merge_into(spark, _df(spark, rows), tbl, keys=["k"])
                model.update(rows)
            elif op == "compact":
                compact_table(spark, tbl, target_bytes=1 << 20)
            elif op == "vacuum":
                sinks.vacuum_table(spark, tbl, min_age_s=0)
        _check(spark, tbl, model, "v")

    # force a REAL redelivery of the last batch: removing its commit
    # marker from the checkpoint (offsets kept) makes Spark re-run
    # that batch on restart — the (app_id, batch_id) txn stamp must
    # then skip it, or the table double-counts.  (A restart over an
    # up-to-date checkpoint would drain zero batches and prove
    # nothing.)
    commits = sorted(
        int(f) for f in _os.listdir(_os.path.join(ckpt, "commits"))
        if f.isdigit()
    )
    _os.remove(_os.path.join(ckpt, "commits", str(commits[-1])))
    crc = _os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if _os.path.exists(crc):  # stale checksum breaks the atomic rewrite
        _os.remove(crc)
    before = sorted(
        (r["k"], r["u"], r["v"])
        for r in read_table(spark, tbl).collect()
    )
    q = start_lake_append_stream(
        spark.readStream.schema("k long, u long, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        tbl, ckpt, cols=["k"], app_id="model_stream",
        maintain_every=2, maintain_kwargs={"min_age_s": 0},
    )
    assert q.awaitTermination(120)
    assert q.exception() is None
    q.stop()
    after = sorted(
        (r["k"], r["u"], r["v"])
        for r in read_table(spark, tbl).collect()
    )
    assert after == before
