"""Continuous corpus ingestion — the streaming half of corpus/pipeline.py.

New document files landing under a directory become micro-batches that
flow through the SAME map-side operators the batch pipeline (and its
DuckDB-verified registry queries) use: language+quality filter, PII
scrub, deterministic split assignment.  Exact dedup runs as
``dropDuplicatesWithinWatermark`` on the content hash — state is bounded
by the watermark horizon instead of growing with corpus history, the
standard trade for a continuous pipeline (a duplicate arriving AFTER the
horizon re-enters; the periodic batch dedup pass sweeps those).

Everything here is watermark-bounded or map-side: at 100 TB/day the only
state is the in-horizon hash set, and the sink appends split-partitioned
parquet exactly once per epoch (checkpointed file-sink semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..corpus.pipeline import CorpusConfig, _keep_pred
from ..operators.text import scrub_pii, split_col

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingest_ts", TimestampType(), False),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """File-source document stream (new files under ``path`` become
    micro-batches) with the declared ingest schema."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    return reader.json(path) if fmt == "json" else reader.parquet(path)


def corpus_ingest_stream(
    docs: DataFrame,
    config: CorpusConfig | None = None,
    *,
    dedup_watermark: str = "1 hour",
) -> DataFrame:
    """filter → exact-dedup-within-watermark → scrub → split, streaming.

    Returns the transformed stream (append output mode); wire it to a
    parquet sink with ``writeStream.partitionBy("split")`` or the
    exactly-once helpers in streaming/sink.py.
    """
    cfg = config or CorpusConfig()
    kept = docs.filter(_keep_pred(cfg))
    kept = kept.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
    # Bounded-state exact dedup: the first in-horizon copy wins; state is
    # (hashes seen within the watermark), NOT the whole corpus history.
    kept = kept.withWatermark("ingest_ts", dedup_watermark)
    kept = kept.dropDuplicatesWithinWatermark(["text_hash"])
    if cfg.scrub:
        kept = (
            scrub_pii(kept)
            .withColumn(
                "pii_redactions",
                F.col("n_email") + F.col("n_ip") + F.col("n_phone"),
            )
            .drop("text", "n_email", "n_ip", "n_phone")
            .withColumnRenamed("scrubbed", "text")
        )
    return kept.withColumn("split", split_col(F.col("doc_id")))


def run_incremental_dedup_stream(
    stream_docs: DataFrame,
    index_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous incremental dedup: each micro-batch of incoming docs
    probes a STATIC indexed corpus — the streaming twin of
    ``operators/dedup.py::incremental_dedup``, run through
    ``foreachBatch`` so every micro-batch executes the SAME
    oracle-verified probe plan (``incremental_flags``: content-hash
    left join on the index's distinct-hash table + asymmetric LSH band
    join, batch-bounded work).  foreachBatch rather than a stream-side
    aggregation because the near layer's per-doc countDistinct over
    index hits is a distinct aggregate, which Structured Streaming
    forbids — and per-micro-batch probing is exactly equivalent anyway:
    flags depend only on (doc, index), never on other stream docs.
    Exactly-once: the flags land through the staged-rename
    ``idempotent_batch_writer`` (streaming/sink.py), so a replayed
    epoch is skipped, never double-appended.

    Returns the started StreamingQuery (availableNow trigger — drains
    what exists, then stops; production swaps a processing-time
    trigger).
    """
    from ..operators.dedup import incremental_flags
    from .sink import idempotent_batch_writer

    write = idempotent_batch_writer(out_dir)

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write(incremental_flags(batch_df, index_docs), epoch_id)

    return (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
