"""LLM-training-data pipeline queries (dedup / similarity / text /
multimodal) over ``documents.parquet`` and ``embeddings.parquet``.

Populated by the operators in ``evmtrace_etl_spark.operators.{text,dedup,
similarity,multimodal}``; registered here for the driver contract.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
