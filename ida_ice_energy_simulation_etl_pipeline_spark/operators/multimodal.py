"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

Real at this layer: schema, partitioning, Arrow-batched ``mapInPandas``
feature extraction, and the driver-contract query.  Stubbed (clearly):
actual image/audio/video decoding — the codec libraries are not in this
container, so ``decode_image``/``decode_audio`` raise NotImplementedError
and ``frame_sample`` produces a deterministic fake, while the Spark-side
batch shape is fully exercised.

At 100 TB the payload column dominates IO: feature extraction is map-only
(no shuffle), and `spark.sql.files.maxPartitionBytes` bounds the Arrow
batch memory per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.core import QuerySpec, ensure_parallelism, load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("source", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("source", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("head_byte", LongType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB — real decode needs PIL/opencv (not in this container)."""
    raise NotImplementedError(
        "image decode requires an imaging library; payload plumbing is real, "
        "decode is intentionally stubbed"
    )


def decode_audio(payload: bytes) -> object:
    """STUB — real decode needs soundfile/ffmpeg (not in this container)."""
    raise NotImplementedError(
        "audio decode requires an audio library; payload plumbing is real, "
        "decode is intentionally stubbed"
    )


def frame_sample(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Deterministic fake frame sampler: n equal byte-slices of the payload
    (stands in for video frame extraction; same batch shape)."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i : i + step] for i in range(0, len(payload), step)][:n_frames]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Lift the documents table into the media schema (text bytes stand in
    for an opaque payload — same binary column semantics)."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        "source",
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each task processes whole Arrow batches — the
    pattern a real decoder would use (decode → feature vector per row).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "source": pdf["source"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "head_byte": payloads.map(
                        lambda b: int(b[0]) if b else None
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: media plumbing end-to-end, rolled up per
    source so the oracle is pure SQL (byte lengths of utf-8 payloads)."""
    docs = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    feats = extract_features(documents_as_media(docs))
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
        F.min("head_byte").cast("long").alias("min_head_byte"),
    )


MULTIMODAL_FEATURES_SQL = """
SELECT source,
       count(*)                                         AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT)  AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT)  AS max_bytes,
       CAST(min(ascii(substr(text, 1, 1))) AS BIGINT)   AS min_head_byte
FROM documents
GROUP BY source
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "multimodal_features",
        multimodal_features,
        MULTIMODAL_FEATURES_SQL,
        "ext:multimodal",
    ),
]
