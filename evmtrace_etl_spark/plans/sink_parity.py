"""Sink/streaming-tier parity queries — the S-tier and T-tier as
driver-checkable rows, not just local tests.

Each query drives REAL side-effecting machinery (file-source structured
stream, ``foreachBatch``, the versioned parquet upsert sink) end-to-end
inside the ``queries()`` callable and returns the final sink table; the
DuckDB oracle expresses the equivalent batch semantics:

- ``zk_stream_transactions`` — S3 (strict-schema file stream) + T1–T3
  (micro-batch sessionization, availableNow trigger, checkpoint) + S7/S9
  (foreachBatch fan-out into the upsert sink).  A single availableNow
  pass over the fixture must equal the pure-batch pipeline, so the
  oracle is the zk_transactions SQL (reference EP1,
  src/consumer/kafka/trace/mod.rs:53-80 → src/dumper/postgres.rs:41-92).
- ``zk_upsert_replay`` — S8/D4 cross-batch dedup via insert-if-absent:
  batch 1 = chain-1 traces, batch 2 = a full replay.  Keys already
  inserted are skipped (the reference's Redis GET + ON CONFLICT DO
  NOTHING, src/dumper/postgres.rs:53-66, etl_result.rs:159), so the
  final table equals the one-shot batch result.
- ``zk_upsert_blocks`` — D3/D5 keep-last across two micro-batches with
  DO-UPDATE semantics (etl_result.rs:267-281): the later batch's
  duplicate (chain_id, number) rows overwrite the earlier batch's.
- ``inv_event_windows`` — T5's "optionally watermark on timestamp"
  leg made real: an event-time tumbling-window aggregate
  (``withWatermark`` + ``window``) in update mode, every window update
  DO-UPDATE-upserted by key — the standard Spark pattern for
  late-data-tolerant rollups that the reference's punctuation model
  cannot express.  The oracle is the batch date_trunc equivalent.

EIP-55 checksumming (P9) is disabled on these paths because the oracle
is pure SQL; the checksum leg is covered by unit vectors in
tests/test_keccak_batch.py and the streaming tests.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSACTION_SCHEMA
from ..session import materialize as _materialize
from ..sinks import LakeUpsertSink, ParquetUpsertSink
from ..sources import fixtures
from ..streaming import runner, sources
from . import zk_parity


#: Age past which a scratch dir is reaped even if its pid is alive —
#: pid reuse would otherwise shield a stale dir forever.  Far above any
#: single run's lifetime, so a live owner is never raced.
_WORKDIR_MAX_AGE_S = 24 * 3600

#: Bound on the recursive-mtime walk, so a pathological scratch tree
#: can't stall startup; hitting the cap counts as "recently written"
#: (reaping stays conservative).
_WORKDIR_WALK_CAP = 10_000

_reaped = False


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (inclusive), walking at most
    ``_WORKDIR_WALK_CAP`` entries.  A live owner writes into NESTED dirs
    (stream checkpoints, warehouse versions) without refreshing the top-
    level dir's mtime, so the age gate must look at the whole tree."""
    try:
        newest = os.stat(path).st_mtime
    except OSError:
        return _time.time()  # vanished/unstatable: treat as fresh
    seen = 0
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            seen += 1
            if seen > _WORKDIR_WALK_CAP:
                return _time.time()
            try:
                newest = max(
                    newest, os.stat(os.path.join(root, name)).st_mtime
                )
            except OSError:
                continue
    return newest


def _reap_stale_workdirs() -> None:
    """Remove scratch dirs left by evmtrace processes that no longer
    exist (crashed or killed runs), so pid-suffixed dirs don't pile up
    in /tmp across rounds.  Dirs whose pid is alive are reaped only when
    NOTHING in the tree was written for ``_WORKDIR_MAX_AGE_S`` (the pid
    was reused by an unrelated process) — a genuinely long-lived owner,
    e.g. a streaming run, keeps writing into nested checkpoint/warehouse
    dirs and is therefore never raced.  Called lazily from ``_workdir``
    on first use — importing this module has no filesystem side
    effects."""
    tmp = tempfile.gettempdir()
    for entry in os.listdir(tmp):
        if not entry.startswith("evmtrace_"):
            continue
        pid_part = entry.rsplit("_", 1)[-1]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        path = os.path.join(tmp, entry)
        try:
            os.kill(int(pid_part), 0)
        except ProcessLookupError:
            shutil.rmtree(path, ignore_errors=True)
            continue
        except PermissionError:
            pass  # pid alive under another user — fall through to age
        if _time.time() - _newest_mtime(path) > _WORKDIR_MAX_AGE_S:
            shutil.rmtree(path, ignore_errors=True)


def _workdir(name: str) -> str:
    """Per-query scratch dir, recreated on every call so repeated runs
    in one process do not accumulate state.  The pid suffix keeps
    concurrent runs (driver verify racing a local pytest) from
    rmtree-ing each other's live stream checkpoints; stale dirs from
    dead (or pid-reused, past the age limit) processes are reaped on
    this process's first scratch-dir request — in a daemon thread,
    because deleting another process's checkpoint trees is housekeeping
    that must not bill wall-clock to whichever query happens to ask for
    scratch space first (it only touches dirs this process can never
    own, so there is no race with the dir being created here)."""
    global _reaped
    if not _reaped:
        _reaped = True
        threading.Thread(
            target=_reap_stale_workdirs, daemon=True
        ).start()
    base = os.path.join(
        tempfile.gettempdir(), f"evmtrace_{name}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base


def spark_stream_transactions(
    spark: SparkSession, sf_dir: str = ""
) -> DataFrame:
    """Fixture → JSON files → structured stream → foreachBatch zk pipeline
    → parquet upsert sink → final transactions table."""
    base = _workdir("stream_tx")
    src = os.path.join(base, "src")
    fixtures.traces_df(spark).coalesce(1).write.json(src)
    sink = ParquetUpsertSink(os.path.join(base, "sink"))

    def _process(batch: DataFrame, _batch_id: int) -> None:
        runner.process_trace_batch(batch, sink, checksum=False)

    q = (
        sources.file_trace_stream(spark, src)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        # availableNow should always terminate; a hang would otherwise
        # surface as a confusing partial-sink oracle mismatch
        q.stop()
        raise TimeoutError(
            "zk_stream_transactions: stream not finished after 120 s"
        )
    return zk_parity.project_tx(sink.read(spark, "transactions"))


#: Memoized zk pipeline outputs for the upsert-pair queries (see
#: ``_replay_batches``).
_replay_cache: list | None = None


def _replay_batches(spark: SparkSession) -> list:
    """The upsert-pair queries' shared input: the zk pipeline outputs
    for batch 1 (chain-1 traces) and batch 2 (the full replay),
    computed ONCE per process and materialized via ``localCheckpoint``
    (verification-scale fixture results — a few dozen rows; a cluster
    harness would use reliable checkpoints).

    ``zk_upsert_replay`` and ``zk_upsert_partition`` test the SINK
    machinery — conflict handling, partition pruning, the executor-side
    writer — on identical batches; recomputing the identical upstream
    pipeline per query billed ~4 full pipeline cycles of fixed harness
    overhead to the pair per bench run.  Sharing the computed batches
    keeps both sink legs fully real while the pair pays the pipeline
    cost once.

    Returns ``[(tx, contracts, touched_partitions), ...]`` in batch
    order (insert-if-absent semantics require batch 1 first).
    """
    global _replay_cache
    if _replay_cache is None:
        from ..plans.pipeline import (
            ZkParts,
            zk_contracts_deduped,
            zk_transactions,
        )

        traces = fixtures.traces_df(spark)
        out = []
        for batch in (traces.filter("chain_id = 1"), traces):
            parts = ZkParts(batch)
            try:
                tx = _materialize(zk_transactions(batch, parts))
                contracts = _materialize(
                    zk_contracts_deduped(batch, parts)
                )
            finally:
                parts.unpersist()
            touched = runner._touched_chains(batch)
            out.append((tx, contracts, touched))
        _replay_cache = out
    return _replay_cache


def _upsert_replay_cycles(sink, spark: SparkSession) -> None:
    """Run the two insert-if-absent cycles of the replay scenario
    against ``sink`` from the shared materialized batches — the sink
    side of ``runner.process_trace_batch`` (checksum=False), with the
    partition-pruning hint honored exactly as the runner does."""
    hints = getattr(sink, "uses_partition_hints", True)
    for tx, contracts, touched in _replay_batches(spark):
        sink.upsert(
            tx, "transactions", runner.TX_KEYS, mode="ignore",
            touched_partitions=touched if hints else None,
        )
        sink.upsert(
            contracts, "contracts", runner.CONTRACT_KEYS, mode="ignore",
            touched_partitions=touched if hints else None,
        )


def spark_upsert_replay(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Two foreachBatch cycles: chain-1 traces, then a full replay.  The
    insert-if-absent sink must keep the first insert of every key."""
    base = _workdir("upsert_replay")
    # the UNIFIED storage path (r9 verdict ask #3): keyed insert-if-
    # absent through the snapshot log (merge_into mode='ignore'), same
    # commit protocol as streaming appends / compaction / deletes
    sink = LakeUpsertSink(os.path.join(base, "sink"))
    _upsert_replay_cycles(sink, spark)
    return zk_parity.project_tx(sink.read(spark, "transactions"))


def _flat_ddl(schema) -> str:
    """DDL string for a declared output schema AFTER the DB-API
    round-trip: arrays are comma-joined and decimals stringified by the
    sink's ``_flatten_for_sql``, everything else keeps its type.
    Derived from the schema rather than hand-written, so a field
    added/renamed in ``schemas.py`` flows through automatically."""
    parts = []
    for f in schema.fields:
        t = f.dataType.typeName()
        sql_t = "string" if t in ("array", "decimal") else f.dataType.simpleString()
        parts.append(f"{f.name} {sql_t}")
    return ", ".join(parts)


#: project_tx's output schema after the DB-API round-trip.
_TX_FLAT_SCHEMA = _flat_ddl(TRANSACTION_SCHEMA)


def spark_upsert_partition(
    spark: SparkSession, sf_dir: str = ""
) -> DataFrame:
    """``zk_upsert_replay`` routed through the EXECUTOR-SIDE DB writer
    (S7/D5 scale leg, reference src/dumper/postgres.rs:41-92): two
    ``process_trace_batch`` cycles — chain-1 traces, then a full replay —
    through ``DbApiPartitionUpsertSink``, whose ``foreachPartition``
    opens one sqlite connection per Spark partition and streams batched
    ``INSERT … ON CONFLICT DO NOTHING`` ``executemany`` calls with no
    driver materialization.  The replay batch must be rejected row-for-
    row by the conflict clause, so the final table equals the one-shot
    batch result (same oracle as ``zk_upsert_replay``).

    The read-back at the end is the ORACLE-verification path, not the
    write path: at scale the table lives in the database and is never
    collected.  ``max_parallelism=1`` because sqlite's file lock admits
    one writer anyway — extra partitions only queue on the lock
    (timeout=60 made them wait, not fail, but the wait is pure
    serialization overhead); the ``foreachPartition`` executor-side leg
    stays real with one partition, and a server database raises the cap
    to write genuinely in parallel.
    """
    import sqlite3

    from ..schemas import CONTRACT_SCHEMA
    from ..sinks import DbApiPartitionUpsertSink

    base = _workdir("upsert_partition")
    db = os.path.join(base, "sink.db")
    # DDL straight from the declared output schemas — analyzing the
    # builder plans just for .columns costs ~1 s of Catalyst work and
    # leaks their ZkParts persists
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE transactions "
            f"({', '.join(f.name for f in TRANSACTION_SCHEMA.fields)}, "
            "PRIMARY KEY (chain_id, transaction_hash))"
        )
        conn.execute(
            "CREATE TABLE contracts "
            f"({', '.join(f.name for f in CONTRACT_SCHEMA.fields)}, "
            "PRIMARY KEY (chain_id, address, function_signatures))"
        )

    sink = DbApiPartitionUpsertSink(
        lambda: sqlite3.connect(db, timeout=60), max_parallelism=1
    )
    _upsert_replay_cycles(sink, spark)

    # the hash-safe projection's column order, straight from the
    # declared flat schema (field name = first token of each pair)
    cols = [p.strip().split()[0] for p in _TX_FLAT_SCHEMA.split(",")]
    with sqlite3.connect(db) as conn:
        rows = conn.execute(
            f"SELECT {', '.join(cols)} FROM transactions"
        ).fetchall()
    return spark.createDataFrame(rows, _TX_FLAT_SCHEMA)


def spark_upsert_blocks(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Two block micro-batches with a cross-batch duplicate (chain 1,
    block 100): DO-UPDATE upsert keeps the later batch's row."""
    base = _workdir("upsert_blocks")
    # DO-UPDATE keep-last through the snapshot log (merge_into
    # mode='update') — the reference's blocks upsert on the lake tier
    sink = LakeUpsertSink(os.path.join(base, "sink"))
    blocks = fixtures.blocks_df(spark)
    runner.process_block_batch(
        blocks.filter("seq <= 2"), sink, checksum=False
    )
    runner.process_block_batch(
        blocks.filter("seq >= 3"), sink, checksum=False
    )
    return sink.read(spark, "blocks")


def stream_throughput(
    spark: SparkSession,
    replicate: int = 3000,
    n_files: int = 16,
    files_per_trigger: int = 4,
) -> dict:
    """Streaming throughput probe for the bench harness — the missing
    rows/sec figure for the R3/R4/T1/T2 streaming legs (correctness is
    driver-verified; this measures sustained micro-batch rate).

    The 33-row trace fixture is replicated ``replicate``× with distinct
    transaction hashes (whole tx trees stay intact, so the per-tx
    sessionization does real work), written as ``n_files`` JSON files,
    and drained by an ``availableNow`` stream paced to
    ``files_per_trigger`` files per micro-batch — the file-source analog
    of Kafka ``maxOffsetsPerTrigger`` — through the full foreachBatch zk
    pipeline into the parquet upsert sink.

    Returns ``{rows, seconds, rows_per_sec, micro_batches, ...}`` for
    the bench JSON line.  Fixture-building and source-file writing are
    NOT timed; the stream (decode → sessionize → derive → upsert) is.
    """
    base = _workdir("stream_tput")
    src, n_rows = _tput_fixture(spark, base, replicate, n_files)
    point = _tput_drain(spark, base, src, n_rows, files_per_trigger)
    point["rows"] = n_rows
    point["files"] = n_files
    return point


def stream_throughput_curve(
    spark: SparkSession,
    replicate: int = 3000,
    n_files: int = 16,
    points: tuple = (4, 8, 16),
) -> dict:
    """The SCALING CURVE the single-point probe can't show: the same
    replicated fixture drained once per ``files_per_trigger`` pacing
    point, isolating how much of the single-point figure is fixed
    per-trigger overhead (checkpoint commit, plan setup, sink version
    swap) vs per-row work.  Fixture replication/writing is untimed and
    paid ONCE; each point gets a fresh checkpoint + sink so the drains
    are independent.

    Returns ``{rows, files, points: [{files_per_trigger, seconds,
    rows_per_sec, micro_batches}, ...]}``."""
    base = _workdir("stream_tput_curve")
    src, n_rows = _tput_fixture(spark, base, replicate, n_files)
    return {
        "rows": n_rows,
        "files": n_files,
        "points": [
            _tput_drain(spark, base, src, n_rows, fpt) for fpt in points
        ],
    }


def _tput_fixture(
    spark: SparkSession, base: str, replicate: int, n_files: int
) -> tuple:
    """Write the replicated trace fixture as ``n_files`` JSON files
    (untimed harness setup shared by every pacing point)."""
    src = os.path.join(base, "src")
    traces = fixtures.traces_df(spark)
    keep_hash = F.col("transaction_hash").isNotNull()
    wide = (
        traces.crossJoin(
            spark.range(replicate).select(F.col("id").alias("_rep"))
        )
        .withColumn(
            "transaction_hash",
            F.when(
                keep_hash,
                F.concat_ws("_", "transaction_hash", "_rep"),
            ),
        )
        .drop("_rep")
    )
    wide.repartition(n_files).write.json(src)
    n_rows = traces.count() * replicate  # untimed: fixture-sized count
    return src, n_rows


def _tput_drain(
    spark: SparkSession,
    base: str,
    src: str,
    n_rows: int,
    files_per_trigger: int,
) -> dict:
    """One timed availableNow drain of ``src`` through the full
    foreachBatch zk pipeline into a fresh parquet upsert sink."""
    tag = f"fpt{files_per_trigger}"
    sink = ParquetUpsertSink(os.path.join(base, f"sink_{tag}"))
    batches = [0]

    def _process(batch: DataFrame, _batch_id: int) -> None:
        batches[0] += 1
        runner.process_trace_batch(batch, sink, checksum=False)

    t0 = _time.perf_counter()
    q = (
        sources.file_trace_stream(
            spark, src, max_files_per_trigger=files_per_trigger
        )
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(base, f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("stream_throughput: not finished after 600 s")
    dt = _time.perf_counter() - t0
    return {
        "seconds": round(dt, 3),
        "rows_per_sec": round(n_rows / dt, 1),
        "micro_batches": batches[0],
        "files_per_trigger": files_per_trigger,
    }


def spark_event_windows(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """events → file stream → watermarked 1-hour tumbling windows
    (update mode) → DO-UPDATE upsert keyed (window_start, event_type) →
    final windows table.

    The watermark bounds streaming state: windows older than
    max(event_time) - delay are finalized and evicted, so state size is
    O(active windows), not O(stream history) — the property that keeps
    an unbounded stream's aggregation memory flat at scale.  Note the
    late-DROP guarantee lags eviction by one micro-batch: Spark >= 3.4
    filters late input with the previous batch's watermark
    (``watermarkForLateEvents``) while evicting state with the current
    one, so a row for a just-closed window may still be aggregated in
    the first batch after closure and is only guaranteed dropped from
    the second (pinned in ``tests/test_streaming.py``
    ``test_watermark_drops_closed_windows_keeps_open_ones``).  Update-mode
    emission + the idempotent DO-UPDATE sink means every re-emission of
    a window converges to the final count (the same T3/T5 idempotency
    contract as the zk sinks).

    ``state_partitions`` sizes the state store (fixed per checkpoint at
    first start): stateful-agg parallelism should track the KEY space
    (active windows × event types — small here), not the input volume —
    map-side partials absorb the volume before the state shuffle, and
    every state partition costs a store instance + per-batch commit.
    """
    from .inventory import _t

    base = _workdir("event_windows")
    src = os.path.join(base, "src")
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    # one file → one micro-batch: deterministic (no cross-batch arrival
    # order, so the watermark can never drop fixture rows)
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact, order-independent sum (double sums are neither)
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("decimal(38,6)")
            .cast("string")
            .alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    sink = ParquetUpsertSink(
        os.path.join(base, "sink"), partition_cols=("event_type",)
    )

    def _process(batch: DataFrame, _batch_id: int) -> None:
        # availableNow runs one final empty batch to commit the advanced
        # watermark (state eviction); skipping it saves the sink a full
        # persist + probe + merge cycle over zero rows
        if batch.isEmpty():
            return
        sink.upsert(
            batch, "windows", ["window_start", "event_type"], mode="update"
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            agg.writeStream.foreachBatch(_process)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "inv_event_windows: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink.read(spark, "windows")


def spark_stream_dedup_docs(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """Streaming corpus ingestion with cross-batch exact dedup — the
    LLM-data tier's S8 analog: documents → 2-file stream (batch 2 is a
    FULL REPLAY of batch 1, the re-ingested-dump case) → streaming
    ``dropDuplicates`` on the normalized-text fingerprint → append-mode
    foreachBatch into the insert-if-absent sink.

    The state store carries every fingerprint from batch 1 into batch
    2 and must reject the entire replay, so the final table holds each
    distinct fingerprint exactly once — the oracle is a plain DISTINCT
    over the batch table.  Output: fingerprint (doc identity is
    intentionally dropped: ``dropDuplicates`` keeps an arbitrary member
    of each duplicate class, so only the fingerprint set is
    deterministic).

    Scale note: no watermark → state is O(distinct corpus), the right
    semantics for bounded dump ingestion; an unbounded feed would use
    ``dropDuplicatesWithinWatermark`` to bound state by the dedup
    horizon instead.
    """
    from .inventory import _t
    from ..functions.text import fingerprint as _fp

    base = _workdir("stream_dedup_docs")
    src = os.path.join(base, "src")
    os.makedirs(src)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def _stage(name: str, mtime: float) -> None:
        d = os.path.join(base, "stage_" + name)
        docs.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(
            p for p in os.listdir(d) if p.endswith(".parquet")
        )
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(d, part), dst)
        os.utime(dst, (mtime, mtime))

    now = _time.time()
    _stage("b1", now - 100)
    _stage("b2_replay", now - 50)  # full replay, older-first ordering

    sink = ParquetUpsertSink(os.path.join(base, "sink"), partition_cols=())
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = (
        stream.select(_fp("text").alias("fingerprint"))
        .dropDuplicates(["fingerprint"])
    )

    def _process(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():  # replay batch dedupes to zero rows
            return
        sink.upsert(batch, "fps", ["fingerprint"], mode="ignore")

    # state store sized like the other streaming legs (fixed per
    # checkpoint at first start; ``state_partitions`` is the knob a
    # production deployment sizes to state volume — the fingerprint set
    # here is corpus-distinct-sized, nowhere near one task per core)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            deduped.writeStream.foreachBatch(_process)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "llm_stream_dedup_docs: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink.read(spark, "fps")


STREAM_DEDUP_DOCS_SQL = """
SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
       AS fingerprint
FROM documents
"""


def spark_stream_dedup_within_wm(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """L1's BOUNDED-STATE streaming dedup leg made observable —
    ``dropDuplicatesWithinWatermark`` with its eviction contract as
    data, not just documentation.

    Four staged micro-batches (paced 1 file/trigger, mtime-ordered):
    the corpus at T0; two disjoint "watermark pusher" rows at T0+9h
    and T0+11h; the corpus REPLAYED at T0+12h.  With a 1-hour delay
    the replay is NOT deduplicated: the pushers advance the watermark
    past the original fingerprints' expiry (state eviction is lazy —
    end-of-batch against the batch-START watermark, which is why TWO
    pushers are needed: the first advances the watermark, the second's
    batch-end applies it), so every corpus fingerprint arrives exactly
    TWICE and each pusher once.  That arrival-count table is the
    oracle-checkable signature of bounded state: unbounded
    ``dropDuplicates`` would emit every fingerprint exactly once.

    This is the unbounded-feed trade the plain leg
    (``llm_stream_dedup_docs``) documents: state size O(keys within
    the horizon) instead of O(all distinct keys ever), bought by
    re-admitting duplicates that recur beyond the horizon — downstream
    idempotent sinks absorb them (here the append sink COUNTS them,
    to pin the semantics).

    Output: fingerprint, n_arrivals.
    """
    from .inventory import _t
    from ..functions.text import fingerprint as _fp

    base = _workdir("stream_dedup_wm")
    src = os.path.join(base, "src")
    os.makedirs(src)
    # deterministic 1-in-20 subset: the eviction contract is per-key
    # and needs corpus-shaped keys, not corpus-sized volume — staging
    # the full table 2x through 4 micro-batches billed ~13 s at sf0.1
    # for zero extra signal
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select(_fp("text").alias("fingerprint"))
    )
    # JVM-side one-row frames: a createDataFrame-sourced local relation
    # pays a ~4-5 s Python-runner write path PER WRITE in this session
    # shape; range+lit writes in ~0.1 s
    pusher1 = spark.range(1).select(F.lit("pusher1").alias("fingerprint"))
    pusher2 = spark.range(1).select(F.lit("pusher2").alias("fingerprint"))

    def _stage(name: str, df: DataFrame, hours: int, mtime: float) -> None:
        staged = df.withColumn(
            "ts",
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                f" + INTERVAL {hours} HOURS"
            ),
        )
        d = os.path.join(base, "stage_" + name)
        staged.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(d, part), dst)
        os.utime(dst, (mtime, mtime))

    now = _time.time()
    _stage("b1", docs, 0, now - 400)
    _stage("b2_push", pusher1, 9, now - 300)
    _stage("b3_push", pusher2, 11, now - 200)
    _stage("b4_replay", docs, 12, now - 100)

    out = os.path.join(base, "arrivals")
    stream = (
        spark.readStream.schema("fingerprint string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )

    def _process(batch: DataFrame, _batch_id: int) -> None:
        batch.select("fingerprint").write.mode("append").parquet(out)

    # state store sized like the other streaming legs (four paced
    # micro-batches each pay the state stage; 8 partitions matches the
    # state volume — measured 6.7 -> 3.6 s at sf0.1, identical output)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "llm_stream_dedup_within_wm: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(out)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).cast("long").alias("n_arrivals"))
    )


STREAM_DEDUP_WITHIN_WM_SQL = """
WITH fps AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         AS fingerprint
  FROM documents WHERE doc_id % 20 = 0)
SELECT fingerprint, CAST(2 AS BIGINT) AS n_arrivals FROM fps
UNION ALL SELECT 'pusher1', CAST(1 AS BIGINT)
UNION ALL SELECT 'pusher2', CAST(1 AS BIGINT)
"""


EVENT_WINDOWS_SQL = """
WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DECIMAL(38,6))
            AS VARCHAR) AS value_sum
FROM ev GROUP BY 1, 2
"""



def spark_stream_sessions(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """T1's time-based leg with Spark's NATIVE session windows: the
    events stream aggregated by ``session_window(ts, 30 min)`` per user
    in APPEND mode (the only mode session-window aggregation supports —
    an open session could still merge with later events, so nothing is
    emitted until the watermark closes it, and closed sessions never
    need retraction) → insert-once upsert keyed
    (user_id, session_start_us) → final sessions table.

    ``session_window`` is the built-in the reference's punctuation
    sessionizer has no equivalent for: windows MERGE as events arrive,
    state holds one open window per (user, gap-island), and the
    watermark finalizes+evicts sessions whose end precedes it.  With a
    zero-delay watermark the stream's final watermark is max(ts), so
    exactly the sessions with end <= max(ts) are emitted; each user's
    still-open tail session (last event within the gap of stream end)
    correctly stays in state — the oracle applies the same closure
    predicate.

    Session semantics (pinned by the oracle): events < gap apart merge;
    a gap of EXACTLY 30 min splits (Spark merges while
    ``next.start < prev.end``), so the oracle's new-session predicate is
    ``>=``, not the ``>`` of the batch gap-sessionizer in
    ``inventory.user_sessions`` — the two differ only on exact-boundary
    rows.  window.start = first event ts, window.end = last ts + gap.
    """
    from .inventory import _t

    base = _workdir("stream_sessions")
    src = os.path.join(base, "src")
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("decimal(38,6)")
            .cast("string")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start"))
            .alias("session_start_us"),
            F.unix_micros(F.col("session_window.end"))
            .alias("session_end_us"),
            "n_events",
            "value_sum",
        )
    )
    sink = ParquetUpsertSink(os.path.join(base, "sink"), partition_cols=())

    def _process(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink.upsert(
            batch, "sessions", ["user_id", "session_start_us"],
            mode="ignore",  # append emissions are final — insert once
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            agg.writeStream.foreachBatch(_process)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "inv_stream_sessions: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink.read(spark, "sessions")


STREAM_SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
),
flagged AS (
  SELECT user_id, ts, value, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS _ns
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessioned AS (
  SELECT user_id, ts, value,
    sum(_ns) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
  epoch_us(min(ts)) AS session_start_us,
  epoch_us(max(ts)) + 1800000000 AS session_end_us,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DECIMAL(38,6))
       AS VARCHAR) AS value_sum
FROM sessioned GROUP BY user_id, sid
HAVING epoch_us(max(ts)) + 1800000000 <=
       (SELECT epoch_us(max(CAST(ts AS TIMESTAMP))) FROM events)
"""



def spark_stream_attribution(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the Structured
    Streaming join family the reference's single-stream model has no
    counterpart for: the purchases stream inner-joins the clicks stream
    of the same user with a time-bound condition (click within the hour
    before the purchase).  Both sides are watermarked and the range
    predicate bounds the join state: a buffered click can be evicted
    once the purchase-side watermark passes click_ts + 1 hour — without
    the time bound the state would grow with the stream, which is why
    Spark requires one for append-mode range joins at scale.

    One staged file → both streams see the fixture in a single
    micro-batch; inner-join emission is eager, so the sink (insert-once
    by pair key) holds ALL qualifying pairs — the oracle is the plain
    batch inequality join.  Output: purchase_id, click_id, gap_us.
    """
    from .inventory import _t

    base = _workdir("stream_attr")
    src_dir = os.path.join(base, "src")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    ev.coalesce(1).write.parquet(src_dir)

    def _leg(etype: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, event_type string"
            )
            .parquet(src_dir)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "0 seconds")
        )

    purchases = _leg("purchase", "purchase")
    clicks = _leg("click", "click")
    joined = purchases.join(
        clicks,
        F.expr(
            "purchase_user = click_user AND "
            "click_ts >= purchase_ts - INTERVAL 1 HOUR AND "
            "click_ts <= purchase_ts"
        ),
    ).select(
        "purchase_id",
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .alias("gap_us"),
    )
    sink = ParquetUpsertSink(os.path.join(base, "sink"), partition_cols=())

    def _process(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink.upsert(
            batch, "attribution", ["purchase_id", "click_id"], mode="ignore"
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            joined.writeStream.foreachBatch(_process)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "inv_stream_attribution: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink.read(spark, "attribution")


STREAM_ATTRIBUTION_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p JOIN c ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
"""



def spark_stream_attribution_outer(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """LEFT OUTER leg of the stream-stream interval join: purchases
    with no qualifying click must still come out, null-extended — but
    only once the watermark proves no match can still arrive.  Matched
    pairs emit eagerly (same as the inner leg); an unmatched purchase
    is held in state until BOTH streams' watermarks (Spark's
    ``min`` multiple-watermark policy) pass its timestamp, then emits
    with a null click in the next micro-batch.  With the zero-delay
    watermark and one staged file, that is exactly: unmatched purchases
    with ``purchase_ts < least(max(click_ts), max(purchase_ts))`` —
    the single latest purchase correctly stays open in state, and the
    oracle applies the same closure predicate (probed and pinned: 33
    matched + 1947 of 1948 unmatched at sf0.01).

    ``click_id`` is coalesced to -1 in the output so the insert-once
    sink keys on non-null columns (a NULL in an upsert key never
    equals itself, which would void replay idempotency).
    """
    from .inventory import _t

    base = _workdir("stream_attr_outer")
    src_dir = os.path.join(base, "src")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    ev.coalesce(1).write.parquet(src_dir)

    def _leg(etype: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, event_type string"
            )
            .parquet(src_dir)
            .filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "0 seconds")
        )

    joined = (
        _leg("purchase", "purchase")
        .join(
            _leg("click", "click"),
            F.expr(
                "purchase_user = click_user AND "
                "click_ts >= purchase_ts - INTERVAL 1 HOUR AND "
                "click_ts <= purchase_ts"
            ),
            "leftOuter",
        )
        .select(
            "purchase_id",
            F.coalesce("click_id", F.lit(-1)).alias("click_id"),
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            .alias("gap_us"),
        )
    )
    sink = ParquetUpsertSink(os.path.join(base, "sink"), partition_cols=())

    def _process(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink.upsert(
            batch, "attribution", ["purchase_id", "click_id"], mode="ignore"
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            joined.writeStream.foreachBatch(_process)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "inv_stream_attribution_outer: stream not finished after 120 s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sink.read(spark, "attribution")


STREAM_ATTRIBUTION_OUTER_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
  FROM events
),
p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
matched AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
),
wm AS (
  SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p)) AS w
)
SELECT purchase_id, click_id, gap_us FROM matched
UNION ALL
SELECT p.event_id AS purchase_id, CAST(-1 AS BIGINT) AS click_id,
       CAST(NULL AS BIGINT) AS gap_us
FROM p, wm
WHERE p.ts < wm.w
  AND p.event_id NOT IN (SELECT purchase_id FROM matched)
"""


QUERIES = {
    "zk_stream_transactions": spark_stream_transactions,
    "zk_upsert_replay": spark_upsert_replay,
    "zk_upsert_partition": spark_upsert_partition,
    "zk_upsert_blocks": spark_upsert_blocks,
    "inv_event_windows": spark_event_windows,
    "inv_stream_sessions": spark_stream_sessions,
    "inv_stream_attribution": spark_stream_attribution,
    "inv_stream_attribution_outer": spark_stream_attribution_outer,
    "llm_stream_dedup_docs": spark_stream_dedup_docs,
    "llm_stream_dedup_within_wm": spark_stream_dedup_within_wm,
}

ORACLES = {
    "zk_stream_transactions": zk_parity.zk_transactions_oracle_sql(),
    "zk_upsert_replay": zk_parity.zk_transactions_oracle_sql(),
    "zk_upsert_partition": zk_parity.zk_transactions_oracle_sql(),
    "zk_upsert_blocks": zk_parity.blocks_oracle_sql(),
    "inv_event_windows": EVENT_WINDOWS_SQL,
    "inv_stream_sessions": STREAM_SESSIONS_SQL,
    "inv_stream_attribution": STREAM_ATTRIBUTION_SQL,
    "inv_stream_attribution_outer": STREAM_ATTRIBUTION_OUTER_SQL,
    "llm_stream_dedup_docs": STREAM_DEDUP_DOCS_SQL,
    "llm_stream_dedup_within_wm": STREAM_DEDUP_WITHIN_WM_SQL,
}
