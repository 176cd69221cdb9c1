"""Streaming source over a snapshot-logged lake table's commit history
— Delta's "streaming source from a table" re-expressed through the
PySpark Python Data Source API (pyspark.sql.datasource, Spark 4):
offsets are committed MANIFEST VERSIONS, each micro-batch serves the
commits in ``(start, end]``, and Structured Streaming's checkpoint
makes consumption resumable — paired with txn-stamped lake writes
downstream, the whole source→sink pipeline is exactly-once.

Two modes:

- plain rows (default): appended rows per commit — the streaming twin
  of ``sinks.table_changes``'s append-span read; a rewrite commit in
  the span fails the batch (file arithmetic cannot reconstruct it).
- ``change_feed=true``: row-level CDC — rows carry ``_change_type`` /
  ``_commit_version``; rewrite commits are served from their
  change-data files (tables with the cdf flag), appends synthesize
  inserts.

Scale shape: ``partitions()`` is a driver-side marker walk (one JSON
per commit in the span — O(span), never O(table)); each added/change
FILE becomes one input partition, so the read fans out across
executors and a poll touches only the new batches.  The log layout is
the plain-file one ``sinks._commit_manifest`` writes, read here with
the standard library + pyarrow so executors need no JVM filesystem.

The reference's consumer loop (src/consumer/kafka/trace/mod.rs:24-51)
is the analogous poll-and-feed surface; this source replaces the
broker with the table's own commit log.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: format name under which the source registers
FORMAT_NAME = "lake_changes"


# ---------------------------------------------------------------------------
# Plain-file log access (no SparkSession — runs on the driver inside
# the stream reader, and the same helpers serve the executors' reads)
# ---------------------------------------------------------------------------


def _local_path(p: str) -> str:
    """Strip a ``file:`` scheme; other URI schemes are rejected (this
    source reads the log with the standard library — a real deployment
    on object storage routes through a pyarrow filesystem here)."""
    if p.startswith("file:"):
        return re.sub(r"^file:/+", "/", p)
    if "://" in p:
        raise ValueError(
            f"lake_changes reads local/file: paths, got {p!r}"
        )
    return p


def _mdir(options: dict) -> str:
    path = _local_path(options["path"])
    override = options.get("manifest")
    if override:
        # the sinks API accepts file:-scheme manifest paths — strip the
        # scheme the same way the table path is stripped
        return _local_path(override)
    return path.rstrip("/") + "/_stats_manifest"


def _committed_versions(mdir: str) -> list[int]:
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if re.fullmatch(r"v\d+", name) and os.path.exists(
            os.path.join(mdir, name, "_COMMIT")
        ):
            out.append(int(name[1:]))
    return sorted(out)


def _marker(mdir: str, version: int) -> dict:
    with open(os.path.join(mdir, f"v{version}", "_COMMIT")) as f:
        return json.load(f)


def _dir_value(fpath: str, col: str) -> str | None:
    for seg in fpath.split("/")[:-1]:
        if seg.startswith(col + "="):
            v = unquote(seg[len(col) + 1:])
            return None if v == "__HIVE_DEFAULT_PARTITION__" else v
    return None


# ---------------------------------------------------------------------------
# The data source
# ---------------------------------------------------------------------------


class LakeChangesPartition(InputPartition):
    """One parquet file of one commit: ``kind`` is ``data`` (an added
    file — synthesize an insert in cdf mode) or ``change`` (a
    change-data sidecar, rows already typed)."""

    def __init__(self, file: str, kind: str, version: int):
        self.file = file
        self.kind = kind
        self.version = version


class LakeChangesStreamReader(DataSourceStreamReader):
    """Offsets = committed manifest versions; batch = the commits in
    ``(start, end]``.  ``partitions`` walks only the span's markers on
    the driver; ``read`` opens one parquet file per partition with
    pyarrow on the executor and aligns it to the declared schema
    (missing columns NULL-fill — add-only evolution — and hive
    partition values parse from the path)."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._options = dict(options)
        self._mdir = _mdir(self._options)
        self._cdf = (
            str(self._options.get("change_feed", "false")).lower() == "true"
        )
        self._start = int(self._options.get("starting_version", 0))
        self._pcols = self._options.get("partition_cols", "")

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        # clamped to the requested start: a head BELOW starting_version
        # must not regress the checkpointed offset, or the skipped span
        # would flow downstream once those versions commit
        vs = _committed_versions(self._mdir)
        head = vs[-1] if vs else self._start - 1
        return {"version": max(head, self._start - 1)}

    def commit(self, end: dict) -> None:  # log retention is the knob
        return

    # -- planning ----------------------------------------------------------
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[LakeChangesPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        committed = set(_committed_versions(self._mdir))
        parts: list[LakeChangesPartition] = []
        for v in range(lo + 1, hi + 1):
            if v not in committed:
                raise ValueError(
                    f"commit v{v} is no longer retained at {self._mdir} — "
                    "raise keep_versions on the table's writers to hold "
                    "the stream's replay window"
                )
            m = _marker(self._mdir, v)
            changes = m.get("changes")
            if self._cdf and changes is not None:
                parts += [
                    LakeChangesPartition(_local_path(f), "change", v)
                    for f in changes
                ]
                continue
            # plain mode: a pure append serves its added files even on
            # a CDF table (whose appends ALWAYS carry change sidecars —
            # raising on `changes` alone would make a CDF table
            # unstreamable in plain mode); only a genuine rewrite or a
            # deletion-vector visibility change is unservable here
            if m.get("removed") or m.get("dvs_delta"):
                raise ValueError(
                    f"commit v{v} rewrote files or changed deletion "
                    "vectors — "
                    + (
                        "enable the change-data feed "
                        "(append_files(enable_cdf=True)) before rewrites "
                        "to stream across them"
                        if not self._cdf
                        else "the commit carries no change-data files "
                        "(it predates the table's CDF flag)"
                    )
                )
            parts += [
                LakeChangesPartition(_local_path(f), "data", v)
                for f in m.get("added", [])
            ]
        return parts

    # -- execution ---------------------------------------------------------
    def read(self, partition: LakeChangesPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        table = pq.read_table(partition.file)
        cols = []
        n = table.num_rows
        have = {f.lower(): i for i, f in enumerate(table.column_names)}
        pcols = {c for c in self._pcols.split(",") if c}
        for field in target:
            name = field.name
            if name == "_change_type" and partition.kind == "data":
                cols.append(pa.array(["insert"] * n, type=field.type))
            elif name == "_commit_version" and partition.kind == "data":
                cols.append(
                    pa.array([partition.version] * n, type=field.type)
                )
            elif name.lower() in have:
                cols.append(
                    table.column(have[name.lower()]).cast(field.type)
                )
            elif name in pcols:
                raw = _dir_value(partition.file, name)
                if raw is None:
                    cols.append(pa.nulls(n, type=field.type))
                else:
                    # hive dir values are strings; decode per the
                    # declared type (mirrors sinks._py_cast — bool and
                    # date partitions must not reach pa.array as str)
                    if pa.types.is_integer(field.type):
                        py = int(raw)
                    elif pa.types.is_floating(field.type):
                        py = float(raw)
                    elif pa.types.is_boolean(field.type):
                        py = str(raw).lower() == "true"
                    elif pa.types.is_date(field.type):
                        import datetime

                        py = datetime.date.fromisoformat(str(raw))
                    else:
                        py = raw
                    cols.append(pa.array([py] * n, type=field.type))
            else:  # add-only evolution: older files NULL-fill
                cols.append(pa.nulls(n, type=field.type))
        out = pa.table(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)


class LakeChangesDataSource(DataSource):
    """``spark.readStream.format("lake_changes").option("path", tbl)``
    — options: ``path`` (the table), ``manifest`` (override the log
    dir), ``starting_version`` (default 0 = from table creation),
    ``change_feed`` (serve row-level CDC with ``_change_type`` /
    ``_commit_version``), ``partition_cols`` (comma list; defaults to
    the commit marker's stamp)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        mdir = _mdir(self.options)
        vs = _committed_versions(mdir)
        if not vs:
            raise ValueError(
                f"no committed snapshot at {mdir} — create the table "
                "with append_files first"
            )
        m = _marker(mdir, vs[-1])
        sj = m.get("schema")
        if sj is None:
            raise ValueError(
                f"the snapshot at {mdir} carries no schema stamp — "
                "commit once through append_files/merge_into first"
            )
        schema = T.StructType.fromJson(sj)
        if str(self.options.get("change_feed", "false")).lower() == "true":
            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_change_type", T.StringType(), True),
                    T.StructField("_commit_version", T.LongType(), True),
                ]
            )
        return schema

    def streamReader(self, schema: T.StructType) -> LakeChangesStreamReader:
        opts = dict(self.options)
        if "partition_cols" not in opts:
            mdir = _mdir(opts)
            vs = _committed_versions(mdir)
            pby = _marker(mdir, vs[-1]).get("partition_by") if vs else None
            opts["partition_cols"] = ",".join(pby or [])
        return LakeChangesStreamReader(schema, opts)


def lake_changes_stream(
    spark: SparkSession,
    path: str,
    manifest_path: str | None = None,
    change_feed: bool = False,
    starting_version: int = 0,
    starting_timestamp: float | None = None,
) -> DataFrame:
    """A streaming DataFrame over the table's commit log (see module
    docstring).  Registers the data source once per session.
    ``starting_timestamp`` (epoch seconds — Delta's startingTimestamp
    stream option) resolves on the driver to the snapshot current at
    that instant and streams the commits strictly AFTER it — the same
    contract as ``table_changes(since_timestamp=…)``; it overrides
    ``starting_version`` and raises if the instant predates the oldest
    retained commit."""
    if starting_timestamp is not None:
        from ..sinks import version_at_timestamp

        starting_version = (
            version_at_timestamp(
                spark, path, starting_timestamp, manifest_path
            )
            + 1
        )
    if not getattr(spark, "_lake_changes_registered", False):
        spark.dataSource.register(LakeChangesDataSource)
        spark._lake_changes_registered = True
    reader = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", path)
        .option("starting_version", str(int(starting_version)))
        .option("change_feed", "true" if change_feed else "false")
    )
    if manifest_path is not None:
        reader = reader.option("manifest", manifest_path)
    return reader.load()


def start_lake_changes_stream(
    spark: SparkSession,
    path: str,
    process,
    checkpoint_dir: str,
    manifest_path: str | None = None,
    change_feed: bool = False,
    starting_version: int = 0,
    available_now: bool = True,
    starting_timestamp: float | None = None,
):
    """Poll the table's retained versions and feed each span to
    ``process(batch_df, batch_id)`` through a checkpointed
    ``foreachBatch`` — the downstream half writes through txn-stamped
    lake commits (``append_files(txn=…)``) and the pipeline is
    exactly-once across restarts: offsets ride the stream checkpoint,
    replays short-circuit on the txn map."""
    stream = lake_changes_stream(
        spark,
        path,
        manifest_path=manifest_path,
        change_feed=change_feed,
        starting_version=starting_version,
        starting_timestamp=starting_timestamp,
    )
    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
