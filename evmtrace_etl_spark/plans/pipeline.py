"""End-to-end domain plans: traces → transactions / contracts, blocks
passthrough (SURVEY §3 EP1/EP2 restated as pure batch DataFrame functions).

Each builder is ``DataFrame -> DataFrame`` and runs identically under
``spark.read`` and inside ``foreachBatch`` (streaming reuses these plans,
see evmtrace_etl_spark.streaming).

Scale shape: ONE full-data shuffle (edge_aggregate on
chain/tx/from/to), then every downstream groupBy/join shuffles the reduced
edge table on (chain_id, transaction_hash)-prefixed keys.  Catalyst reuses
exchanges across the branches that share the edge table within one action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import dedup_keep_last
from ..operators.trace_tree import (
    TX_KEY,
    degree_address_sets,
    degree_gas_totals,
    edge_aggregate,
    first_degree_callers,
    gas_by_caller,
    pairing_sizes_by_caller,
    precompile_counts_by_caller,
    root_traces,
    second_degree_callers,
    signatures_by_callee,
    transaction_rollup,
)

def _empty_str_array() -> F.Column:
    return F.array().cast("array<string>")


def _empty_int_array() -> F.Column:
    return F.array().cast("array<int>")


class ZkParts:
    """The shared single-pass intermediates of the zk pipeline.

    ``edges`` (the ONE full-data shuffle) and ``roots`` are persisted so
    the transaction and contract outputs — two actions in any real run,
    exactly like the reference emitting both from one TraceTree commit
    (src/types/trace_tree.rs:115-245) — scan and shuffle the raw traces
    once instead of twice (VERDICT r1 'What's wrong #4').  Within one
    action Catalyst's ReusedExchange already dedups the shuffle; the
    persist extends that across actions.

    ``persist=True`` callers own the cache and MUST call ``unpersist()``
    when done (``process_trace_batch`` does).  Single-output standalone
    paths pass ``persist=False`` — one action evaluates one DataFrame,
    so ReusedExchange already covers it and nothing is left cached
    behind the caller's back.
    """

    def __init__(self, traces: DataFrame, persist: bool = True):
        self.edges = edge_aggregate(traces)
        self.roots = root_traces(traces)
        self._persisted = persist
        if persist:
            self.edges = self.edges.persist()
            self.roots = self.roots.persist()
        self.rollup = transaction_rollup(self.edges)
        self.fd = first_degree_callers(self.edges)
        self.sd = second_degree_callers(self.edges, self.fd, self.roots)

    def unpersist(self) -> None:
        if self._persisted:
            self.edges.unpersist()
            self.roots.unpersist()


def zk_results(traces: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Single-pass dual output: (transactions, contracts_deduped) sharing
    one edge aggregate — the Spark restatement of the reference emitting
    Transaction + Contract rows from one commit."""
    parts = ZkParts(traces)
    return zk_transactions(traces, parts), zk_contracts_deduped(traces, parts)


def zk_transactions(traces: DataFrame, parts: ZkParts | None = None) -> DataFrame:
    """EP1 transaction output (reference Transaction assembly,
    src/types/trace_tree.rs:177-239), schema per
    ``schemas.TRANSACTION_SCHEMA`` (sink column order,
    etl_result.rs:153-159).

    closest_address (J4): second-degree callers if any survive the EOA
    exclusion, else first-degree callers (trace_tree.rs:182-187).
    """
    parts = parts or ZkParts(traces, persist=False)
    edges, rollup, roots = parts.edges, parts.rollup, parts.roots
    fd, sd = parts.fd, parts.sd
    gas_sent = gas_by_caller(edges)

    fd_set = degree_address_sets(fd, "_fd_set")
    sd_set = degree_address_sets(sd, "_sd_set")
    fd_gas = degree_gas_totals(gas_sent, fd, "_fd_gas")
    sd_gas = degree_gas_totals(gas_sent, sd, "_sd_gas")

    from ..functions.evm import selector  # P5, unmasked at tx level

    return (
        roots.join(rollup.filter(F.col("has_zk")), on=TX_KEY)  # J1 gate
        .join(fd_set, on=TX_KEY, how="left")
        .join(sd_set, on=TX_KEY, how="left")
        .join(fd_gas, on=TX_KEY, how="left")
        .join(sd_gas, on=TX_KEY, how="left")
        .select(
            F.col("chain_id"),
            F.col("transaction_hash"),
            F.col("from_address"),
            F.col("to_address"),
            F.when(
                F.size(F.coalesce(F.col("_sd_set"), _empty_str_array())) > 0,
                F.col("_sd_set"),
            )
            .otherwise(F.coalesce(F.col("_fd_set"), _empty_str_array()))
            .alias("closest_address"),
            selector("input").alias("function_signature"),
            F.col("transaction_index"),
            F.col("block_number"),
            F.col("block_timestamp"),
            F.col("block_hash"),
            F.coalesce(F.col("value"), F.lit(0).cast("decimal(38,0)")).alias(
                "value"
            ),
            F.coalesce(F.col("input"), F.lit("0x")).alias("input"),
            F.coalesce(F.col("gas_used"), F.lit(0)).alias("gas_used_total"),
            F.coalesce(F.col("_fd_gas"), F.lit(0)).alias(
                "gas_used_first_degree"
            ),
            F.coalesce(F.col("_sd_gas"), F.lit(0)).alias(
                "gas_used_second_degree"
            ),
            F.col("ec_recover_count"),
            F.col("ec_add_count"),
            F.col("ec_mul_count"),
            F.col("ec_pairing_count"),
            F.col("ec_pairing_input_sizes"),
            F.col("ec_recover_addresses"),
            F.col("error"),
        )
    )


def zk_contracts(traces: DataFrame, parts: ZkParts | None = None) -> DataFrame:
    """EP1 contract output (reference Contract assembly J5,
    src/types/trace_tree.rs:115-163), schema per ``schemas.CONTRACT_SCHEMA``.

    Union of first-degree (degree 0) and second-degree (degree 1) callers,
    gated on committed transactions (J1 + P11), enriched with the selector
    set called ON the address (A3), its per-precompile call counts (A8) and
    its pairing input sizes (A4).
    """
    parts = parts or ZkParts(traces, persist=False)
    edges, rollup, roots = parts.edges, parts.rollup, parts.roots
    fd, sd = parts.fd, parts.sd

    committed = roots.join(
        rollup.filter(F.col("has_zk")).select(*TX_KEY), on=TX_KEY
    ).select(*TX_KEY, F.col("seq").alias("_root_seq"))

    callers = fd.unionByName(sd)  # U1
    sigs = signatures_by_callee(edges)
    counts = precompile_counts_by_caller(edges)
    pair_sizes = pairing_sizes_by_caller(edges)

    return (
        callers.join(committed, on=TX_KEY)  # gate: only committed txs emit
        .join(sigs, on=[*TX_KEY, "address"], how="left")
        .join(counts, on=[*TX_KEY, "address"], how="left")
        .join(pair_sizes, on=[*TX_KEY, "address"], how="left")
        .select(
            F.col("chain_id"),
            F.col("address"),
            F.coalesce(
                F.col("function_signatures"), _empty_str_array()
            ).alias("function_signatures"),
            F.col("degree").cast("int").alias("degree"),
            F.coalesce(F.col("ec_recover_count"), F.lit(0)).alias(
                "ec_recover_count"
            ),
            F.coalesce(F.col("ec_add_count"), F.lit(0)).alias("ec_add_count"),
            F.coalesce(F.col("ec_mul_count"), F.lit(0)).alias("ec_mul_count"),
            F.coalesce(F.col("ec_pairing_count"), F.lit(0)).alias(
                "ec_pairing_count"
            ),
            F.coalesce(
                F.col("ec_pairing_input_sizes"), _empty_int_array()
            ).alias("ec_pairing_input_sizes"),
            F.col("call"),
            F.col("_root_seq"),  # arrival order; dropped by sink dedup
        )
    )


def zk_contracts_deduped(
    traces: DataFrame, parts: ZkParts | None = None
) -> DataFrame:
    """Contracts after the sink-level keep-first dedup D2 on
    (chain_id, address, function_signatures) — reference
    etl_result.rs:246-248.  'First' = the reference's buffer arrival
    order: commits happen in stream order (root seq) and within one
    commit first-degree rows precede second-degree (trace_tree.rs:115-118)
    — so the order is (root seq, degree), not transaction-hash order.
    """
    from pyspark.sql import Window

    c = zk_contracts(traces, parts)
    w = Window.partitionBy(
        "chain_id", "address", "function_signatures"
    ).orderBy(F.col("_root_seq").asc(), F.col("degree").asc())
    return (
        c.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_root_seq")
    )


def blocks_passthrough(blocks: DataFrame) -> DataFrame:
    """EP2 — blocks flow through untransformed; the upsert key is
    (chain_id, number) with keep-last semantics (D3, reference
    etl_result.rs:303-307 + ON CONFLICT DO UPDATE at 267-281)."""
    deduped = dedup_keep_last(blocks, ["chain_id", "number"], "seq")
    return deduped.drop("seq")
