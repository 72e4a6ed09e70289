"""Watermarked stream-stream interval join.

The streaming twin of the batch banded range join
(operators/temporal.py::banded_range_join): pair each error event with
the same user's clicks in the following ``window``, continuously, as
both feeds arrive.

Spark's stream-stream join buffers both sides in state; the two
watermarks plus the time-interval join condition are what make that
state BOUNDED — the engine can prove a buffered error row can never
match once the click watermark passes ``e_ts + window`` (and vice
versa), and evicts it.  Without the interval bounds the state would
grow with the full history of both feeds.  This is the same
state-size-over-correctness contract as the windowed rollup: late rows
beyond the watermark stop matching, deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    errors: DataFrame,
    clicks: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join each error to same-user clicks with
    ``c_ts ∈ (e_ts, e_ts + window]`` — event-time range condition on both
    watermarked sides, so join state is evicted as watermarks advance.

    Both inputs must carry (event_id, ts, user_id, value); use
    ``read_event_stream`` + a filter to split one feed into the two roles.
    """
    e = errors.withWatermark("ts", watermark).select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("e_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return e.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("e_ts"))
        & (F.col("c_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {window}")),
    ).select("err_id", "user_id", "e_ts", "c_ts", "c_value")


def enriched_rollup_stream(
    events: DataFrame,
    dim: DataFrame,
    *,
    on: str = "user_id",
    group_col: str = "segment",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup.

    The standard serving-layer shape: a watermarked event stream joins a
    STATIC dimension (no watermark needed — static sides hold no state;
    Spark plans a broadcast/hash join against the batch relation and
    re-resolves it per micro-batch, so a dim refresh is picked up on the
    next trigger) and rolls up per (dim attribute, event-time window).
    State is bounded by the watermark exactly as in the plain windowed
    rollup; the join itself adds none.  At 100 TB the dim side follows
    the same broadcast rules as batch: ≤ threshold broadcasts, larger
    dims shuffle the micro-batch (never the stream history).
    """
    enriched = events.withWatermark("ts", watermark).join(
        F.broadcast(dim.select(on, group_col)), on
    )
    return enriched.groupBy(
        F.window("ts", window).alias("win"), F.col(group_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        group_col,
        "n_events",
        "sum_value",
    )
