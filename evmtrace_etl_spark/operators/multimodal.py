"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is
stubbed (``decode_media`` raises ``NotImplementedError`` unless a
decoder is importable; the pipeline uses a deterministic fake feature
instead).  Everything Spark-side is real and tested: the schema, the
binary column, the Arrow batch shape, the ``mapInPandas`` signature,
and the partition behavior.

Scale notes: media blobs ride in parquet binary columns; feature
extraction is a narrow ``mapInPandas`` (one pass, no shuffle, Arrow
batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``).
At 100 TB the only metadata shuffle is the final small rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_feature", DoubleType()),
    ]
)


def decode_media(blob: bytes, media_type: str):
    """Real decode hook — requires PIL/librosa/av, none of which ship in
    this container.  STUB: callers use the deterministic fake path."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; use extract_media_features' deterministic path"
    )


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for the blob; media_type cycles by doc_id.

    Output: doc_id, media (binary), media_type, meta (struct<n_bytes>).
    """
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        mt.alias("media_type"),
        F.struct(F.length(media).cast("long").alias("n_bytes")).alias("meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The per-blob 'feature' is a deterministic fake — ``(n_bytes % 997) /
    997.0`` — standing in for a decoder output so the plumbing (batch
    iteration, binary handling, schema) is fully exercised and
    oracle-checkable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n_bytes = pdf["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": pdf["media"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_feature": (n_bytes % 997) / 997.0,
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


def media_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-media-type rollup of the extracted features."""
    feats = extract_media_features(as_media_table(docs, text_col))
    # fake_feature is a double; sum via decimal so the aggregate is exact
    # and order-independent (double sums are neither).
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("content_md5").alias("n_unique"),
        F.sum(F.col("fake_feature").cast("decimal(20,6)"))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("feature_sum"),
    )
