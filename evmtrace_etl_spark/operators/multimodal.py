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


MEDIA_PART_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("part_kind", StringType()),
        StructField("part_idx", LongType()),
        StructField("part_md5", StringType()),
        StructField("part_bytes", LongType()),
    ]
)


def decode_media_parts(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """1→N media decode (frame-sample / resize / clip), Arrow-batched.

    Per media row: video → ``n_frames`` sampled frame rows, image → one
    resized-thumbnail row, audio → one clip row.  The actual decoders
    (PIL/av/librosa) are not in this container, so each part's payload is
    a deterministic stand-in — md5 of the blob plus a part tag — while
    the Spark-side shape is the real one: a ``mapInPandas`` UDTF that
    fans one binary row out to N typed part rows, no shuffle.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MEDIA_PART_SCHEMA}

            def emit(doc_id, mt, kind, idx, blob):
                tag = f"#{idx}" if kind == "frame" else f"#{kind}"
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["part_kind"].append(kind)
                out["part_idx"].append(idx)
                out["part_md5"].append(
                    hashlib.md5(blob + tag.encode()).hexdigest()
                )
                out["part_bytes"].append(len(blob))

            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                b = bytes(blob)
                if mt == "video/mp4":
                    for i in range(n_frames):
                        emit(doc_id, mt, "frame", i, b)
                elif mt == "image/png":
                    emit(doc_id, mt, "thumb", 0, b)
                else:
                    emit(doc_id, mt, "clip", 0, b)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=MEDIA_PART_SCHEMA)


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
