"""Sink tier (S7/S8, D4/D5): idempotent upserts mirroring the reference's
batch `INSERT … ON CONFLICT` dumper (src/dumper/postgres.rs:41-92,
src/dumper/postgres/insert_tree.rs:16-31; conflict policies from
src/types/etl_result.rs:159, 216, 269-281 — transactions/contracts DO
NOTHING, blocks DO UPDATE all columns).

Two implementations:

- ``ParquetUpsertSink`` — versioned parquet directories with
  insert-if-absent / upsert merge semantics, fully testable locally and
  the semantic stand-in for a lakehouse ``MERGE INTO`` (Delta/Iceberg),
  which is the real 100 TB path.  Anti-join + union is exactly the merge
  a MERGE INTO performs; at scale the table side is pruned by partition
  (chain_id/block range) before the join.
- ``DbApiUpsertSink`` — generates the reference's multi-row
  ``INSERT … ON CONFLICT`` against any DB-API connection (Postgres in
  production, sqlite in tests; the syntax is shared).  Rows are
  collected per micro-batch like the reference's bounded dumper buffer
  (flush ≤ 100k rows, src/main.rs:99-121) — the JDBC-per-partition
  variant drops in behind the same interface when batches outgrow the
  driver.

Cross-batch dedup (S8/D4, the reference's Redis GET/MSET cache) falls
out of insert-if-absent: a key inserted by batch N is silently skipped
in batch N+1, no side cache needed — Spark's checkpointing plus an
idempotent sink replaces offset bookkeeping (T3).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Versioned-directory parquet tables with upsert merge semantics."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def _current(self, table: str) -> str | None:
        marker = os.path.join(self.base_dir, table, "_VERSION")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return fh.read().strip()

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        v = self._current(table)
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.base_dir, table, v))

    def upsert(
        self,
        df: DataFrame,
        table: str,
        keys: Sequence[str],
        mode: str = "ignore",
    ) -> None:
        """mode='ignore' → insert-if-absent (DO NOTHING); mode='update' →
        replace existing rows with the batch's (DO UPDATE all columns)."""
        spark = df.sparkSession
        existing = self.read(spark, table)
        if existing is None:
            out = df
        elif mode == "ignore":
            fresh = df.join(existing, on=list(keys), how="left_anti")
            out = existing.unionByName(fresh)
        elif mode == "update":
            kept = existing.join(df, on=list(keys), how="left_anti")
            out = kept.unionByName(df)
        else:  # pragma: no cover
            raise ValueError(f"unknown upsert mode {mode!r}")

        cur = self._current(table)
        nxt = "v0" if cur is None else f"v{int(cur[1:]) + 1}"
        tdir = os.path.join(self.base_dir, table)
        out.write.mode("overwrite").parquet(os.path.join(tdir, nxt))
        with open(os.path.join(tdir, "_VERSION"), "w") as fh:
            fh.write(nxt)
        if cur is not None:
            shutil.rmtree(os.path.join(tdir, cur), ignore_errors=True)


class DbApiUpsertSink:
    """Reference-parity SQL upsert over a DB-API connection factory."""

    def __init__(self, connection_factory: Callable):
        self._connect = connection_factory

    @staticmethod
    def _sql(
        table: str, columns: Sequence[str], keys: Sequence[str], mode: str
    ) -> str:
        cols = ", ".join(columns)
        params = ", ".join(["?"] * len(columns))
        conflict = ", ".join(keys)
        if mode == "ignore":
            # etl_result.rs:159/216 — ON CONFLICT (…) DO NOTHING
            action = "DO NOTHING"
        else:
            # etl_result.rs:269-281 — DO UPDATE SET every non-key column
            sets = ", ".join(
                f"{c} = excluded.{c}" for c in columns if c not in keys
            )
            action = f"DO UPDATE SET {sets}"
        return (
            f"INSERT INTO {table} ({cols}) VALUES ({params}) "
            f"ON CONFLICT ({conflict}) {action}"
        )

    def upsert(
        self,
        df: DataFrame,
        table: str,
        keys: Sequence[str],
        mode: str = "ignore",
    ) -> None:
        # array columns are serialized to comma-joined strings (the
        # reference renders sets the same way into its SQL literals)
        cols = []
        for f_ in df.schema.fields:
            if f_.dataType.typeName() == "array":
                cols.append(
                    F.array_join(
                        F.transform(
                            F.col(f_.name), lambda x: x.cast("string")
                        ),
                        ",",
                    ).alias(f_.name)
                )
            elif f_.dataType.typeName() == "decimal":
                cols.append(F.col(f_.name).cast("string").alias(f_.name))
            else:
                cols.append(F.col(f_.name))
        flat = df.select(*cols)
        rows = [tuple(r) for r in flat.collect()]
        if not rows:
            return
        sql = self._sql(table, flat.columns, keys, mode)
        conn = self._connect()
        try:
            conn.executemany(sql, rows)
            conn.commit()
        finally:
            conn.close()
