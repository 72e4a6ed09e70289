"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming twin of the batch ``sessionize`` query
(plans/analytics.py): gap-based sessions per user over the event feed.
Where the batch plan uses lag + cumulative-sum windows, the stream keeps
ONE open session per user as explicit state and closes it either

* **in-batch**, when a later event for the same user arrives more than
  ``gap_min`` after the previous one, or
* **by event-time timeout**, when the watermark passes
  ``last_ts + gap_min`` — i.e. no event can arrive that would extend the
  session (late rows beyond the watermark are dropped, so the close is
  deterministic).

State is one fixed-width row per user (start/last epoch-micros, count,
value sum) — bounded by |active users within the watermark horizon|, not
by feed volume; the 100 TB/day shape.  Arrow batches in/out; the pandas
kernel only ever sees one user's events per call.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# (start_us, last_us, n_events, sum_value) — epoch micros as plain longs so
# the state row stays schema-stable and timezone-free.
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

US = 1_000_000


def _emit(user_id: int, start_us: int, last_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "sum_value": [sv],
        }
    )


def make_sessionizer(gap_min: int = 30):
    """Build the per-group state-update function for a given gap."""
    gap_us = gap_min * 60 * US

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n, sv)
            return

        events = pd.concat(list(pdfs))
        events = events.sort_values("ts")
        # unit-safe datetime → epoch-micros (Arrow may hand us ns or us)
        ts_us = pd.Series(
            events["ts"].values.astype("datetime64[us]").astype("int64")
        )
        values = events["value"].fillna(0.0)

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = None, None, 0, 0.0

        closed: list[pd.DataFrame] = []
        for t, v in zip(ts_us.tolist(), values.tolist()):
            if start_us is None:
                start_us, last_us, n, sv = t, t, 1, float(v)
            elif t - last_us > gap_us:
                closed.append(_emit(user_id, start_us, last_us, n, sv))
                start_us, last_us, n, sv = t, t, 1, float(v)
            else:
                last_us, n, sv = t, n + 1, sv + float(v)

        state.update((int(start_us), int(last_us), int(n), float(sv)))
        # Close via timeout once the watermark passes last event + gap.
        state.setTimeoutTimestamp((last_us + gap_us) // 1_000)  # ms
        for frame in closed:
            yield frame

    return update


def sessionize_stream(
    events: DataFrame, *, gap_min: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Gap-sessionize a streaming event feed (schema: streaming.EVENT_SCHEMA).

    Emits one row per CLOSED session; open sessions live in state until
    their event-time timeout fires.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_min),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
