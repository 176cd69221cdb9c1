"""J6 — block enrichment lookup join (reference src/consumer/ws/mod.rs:50-76).

The WS head subscription delivers block headers whose
``transaction_count`` and ``size`` are missing/zero; the reference
re-fetches the block over RPC and merges those two fields in.  As a
dataflow this is a left equi-join of the head stream against a fetched
detail table on (chain_id, number) — at scale the detail side is a
broadcast (heads per trigger ≪ detail lookup results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENRICHED_FIELDS = ["transaction_count", "size"]


def enrich_blocks(heads: DataFrame, details: DataFrame) -> DataFrame:
    """Fill ENRICHED_FIELDS of ``heads`` from ``details`` (broadcast),
    keeping every head row (left join) and preferring the detail value
    (ws/mod.rs:60-76 overwrites from the re-fetched block)."""
    det = details.select(
        "chain_id",
        "number",
        *[F.col(c).alias(f"_det_{c}") for c in ENRICHED_FIELDS],
    )
    out = heads.join(F.broadcast(det), on=["chain_id", "number"], how="left")
    for c in ENRICHED_FIELDS:
        out = out.withColumn(c, F.coalesce(F.col(f"_det_{c}"), F.col(c)))
    return out.drop(*[f"_det_{c}" for c in ENRICHED_FIELDS]).select(
        *heads.columns
    )
