"""Stateful streaming conversion funnel — ``applyInPandasWithState``.

The streaming twin of the batch ``event_funnel`` query
(plans/analytics.py): per user, first 'view' (t1), first 'click' in
(t1, t1 + W], first 'purchase' in (t2, t2 + W].  A funnel is only FINAL
once no in-watermark event can change it, so the state machine emits one
row per user at the event-time timeout ``t1 + 2W`` — after that point an
earlier view (which would shift t1 left) and any window-eligible
click/purchase are all below the watermark and can no longer arrive.

State is bounded by construction:

* ``t1_us`` only decreases, so upper-bound pruning is always safe:
  clicks above ``t1 + W`` and purchases above ``t1 + 2W`` can never be
  window-eligible under any final (smaller) t1;
* the LOWER bound is watermark-guarded: a candidate at or below BOTH t1
  and the watermark is dead (any future, earlier view must still have
  ``t1' > watermark``, so nothing at/below the watermark can sit above
  it), but a candidate merely below the CURRENT t1 is kept while it is
  above the watermark — a later-arriving earlier view may still claim it;
* a user with buffered clicks/purchases but NO view yet keeps only
  events above the current watermark (same argument) and
  garbage-collects by timeout when the watermark passes its newest
  buffered event.

Emission is one row per funnel EPISODE: after a user's funnel finalizes
and its state is removed, activity arriving later (necessarily above the
watermark, i.e. ≥ 2W after the first view) starts a NEW episode with its
own row.  For feeds where each user's first view precedes the rest of
their activity by less than the watermark horizon — the batch-replay
test's regime — episodes and users coincide and the stream reproduces
the batch query exactly; otherwise a downstream ``min_by(t_view)`` per
user reduces episodes to the batch's global-first-view semantics.

Output: ``(user_id, t_view, t_click, t_purchase, step)`` — step ∈ {1,2,3},
nullable click/purchase timestamps.  Conversion rates are a trivial batch
aggregate over the emitted rows (or a downstream streaming count).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # mirror of analytics.FUNNEL_WINDOW_US

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_view", TimestampType()),
        StructField("t_click", TimestampType()),
        StructField("t_purchase", TimestampType()),
        StructField("step", LongType()),
    ]
)

FUNNEL_STATE = StructType(
    [
        StructField("t1_us", LongType()),  # min view ts; -1 = none yet
        StructField("clicks", ArrayType(LongType())),
        StructField("purchases", ArrayType(LongType())),
    ]
)


def _finalize(
    user_id: int, t1: int, clicks: list[int], purchases: list[int], w_us: int
) -> pd.DataFrame:
    t2 = min((c for c in clicks if t1 < c <= t1 + w_us), default=None)
    t3 = (
        min((p for p in purchases if t2 < p <= t2 + w_us), default=None)
        if t2 is not None
        else None
    )
    step = 3 if t3 is not None else (2 if t2 is not None else 1)
    ts = lambda us: pd.Timestamp(us, unit="us") if us is not None else None  # noqa: E731
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "t_view": [ts(t1)],
            "t_click": [ts(t2)],
            "t_purchase": [ts(t3)],
            "step": [step],
        }
    )


def make_funnel(window_us: int = FUNNEL_WINDOW_US):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            t1, clicks, purchases = state.get
            state.remove()
            if t1 >= 0:
                yield _finalize(
                    user_id, t1, list(clicks), list(purchases), window_us
                )
            return

        events = pd.concat(list(pdfs))
        ts_us = (
            events["ts"].values.astype("datetime64[us]").astype("int64").tolist()
        )
        types = events["event_type"].tolist()

        if state.exists:
            t1, clicks, purchases = state.get
            clicks, purchases = list(clicks), list(purchases)
        else:
            t1, clicks, purchases = -1, [], []

        for t, e in zip(ts_us, types):
            if e == "view":
                t1 = t if t1 < 0 else min(t1, t)
            elif e == "click":
                clicks.append(t)
            elif e == "purchase":
                purchases.append(t)

        wm_us = state.getCurrentWatermarkMs() * 1_000
        if t1 >= 0:
            # upper bounds are final under a decreasing t1; the lower
            # bound may only drop candidates ALSO at/below the watermark
            # (an earlier view could still arrive with wm < t1' < c)
            live = lambda x: x > t1 or x > wm_us  # noqa: E731
            clicks = [c for c in clicks if live(c) and c <= t1 + window_us]
            purchases = [
                p for p in purchases if live(p) and p <= t1 + 2 * window_us
            ]
            state.update((int(t1), clicks, purchases))
            horizon = t1 + 2 * window_us
            state.setTimeoutTimestamp(max(horizon // 1_000, wm_us // 1_000 + 1))
        else:
            # no view yet: a future view has t1 > watermark, so buffered
            # events at/below the watermark can never be window-eligible
            clicks = [c for c in clicks if c > wm_us]
            purchases = [p for p in purchases if p > wm_us]
            if clicks or purchases:
                state.update((-1, clicks, purchases))
                gc_us = max(clicks + purchases)
                state.setTimeoutTimestamp(max(gc_us // 1_000, wm_us // 1_000 + 1))
            elif state.exists:
                state.remove()

    return update


def funnel_stream(
    events: DataFrame,
    *,
    window_us: int = FUNNEL_WINDOW_US,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user funnel finalization over a streaming event feed.

    Emits one row per user once the watermark proves the funnel final
    (event-time timeout at first-view + 2·window).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel(window_us),
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
