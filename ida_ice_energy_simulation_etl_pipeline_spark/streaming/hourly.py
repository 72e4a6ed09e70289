"""Streaming hourly rollup + dedup over an event feed.

Mirrors the batch ``hourly_event_rollup`` plan (plans/relational.py) under
``readStream`` semantics: the SAME aggregation expressed as a windowed
stateful aggregate, with a watermark bounding state so a 100 TB/day feed
doesn't accumulate unbounded hash state.  State size ≈ (#event_types ×
watermark-hours) regardless of input volume; late rows beyond the
watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """File-source event stream with the declared schema (new files under
    ``path`` become micro-batches)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    return reader.json(path) if fmt == "json" else reader.parquet(path)


def hourly_rollup_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).

    The watermark bounds aggregation state AND defines the late-data
    contract: an event older than (max seen ts - watermark) no longer
    updates its window.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event identity.

    ``dropDuplicatesWithinWatermark`` keeps state only inside the watermark
    horizon — the streaming analog of the batch hash-dedup, with bounded
    memory at any feed rate.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream: DataFrame, query_name: str, *, output_mode: str = "append"
) -> "object":
    """Drain all currently-available input into an in-memory table (test /
    debug harness; production sinks are parquet/Kafka via writeStream)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
