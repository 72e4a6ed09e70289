"""Stateful streaming conversion funnel — ``applyInPandasWithState``.

The streaming twin of the batch funnel queries (plans/analytics.py).
Emission is one row per funnel EPISODE, in the exact event-time semantics
of the batch ``funnel_episodes`` query: per user, the first view anchors
an episode at ``a``; every view in ``(a, a + 2W]`` is absorbed by that
episode (it can never anchor); the first view AFTER ``a + 2W`` anchors
the next episode (the ≥2W-resumption rule).  Within an episode, ``t2`` is
the first click in ``(a, a + W]`` and ``t3`` the first purchase in
``(t2, t2 + W]``.  An episode is only FINAL once no in-watermark event
can change it — the watermark must pass ``a + 2W``, after which an
earlier view (which would re-segment the chain), an absorbable view, and
any window-eligible click/purchase are all at or below the watermark and
can no longer arrive.

State is a per-user buffer of (views, clicks, purchases) event-time
arrays, bounded by construction:

* **finalized episodes leave**: once the watermark passes the earliest
  anchor's horizon the episode row is emitted and everything at or below
  ``a + 2W`` is consumed (later episodes' windows all start above it);
  the emission loop drains EVERY ripe episode per invocation, so a
  single no-data micro-batch after a watermark jump finalizes the whole
  backlog;
* **absorbed views compress away early**: when the earliest view ``a``
  is at or below the watermark its anchorhood is already final (a future
  view must arrive above the watermark, hence above ``a``, so the chain
  below ``a`` cannot change), and views in ``(a, a + 2W]`` — absorbed
  under every possible future — are dropped before the episode is even
  ripe;
* **dead candidates prune by watermark**: a click at or below BOTH the
  watermark and the earliest buffered view can never fall in any
  window (pending anchors sit at or above the earliest view; a future
  view sits above the watermark), and a click at or below the watermark
  but above ``max(views) + W`` has no pending window left to land in —
  purchases prune the same way against the ``+ 2W`` horizon;
* a user with buffered clicks/purchases but NO views keeps only events
  above the watermark (a future view's window opens above the
  watermark) and garbage-collects by timeout when the watermark passes
  its newest buffered event.

For feeds where each user's activity arrives in one micro-batch before
finalization — the batch-replay test regime — the earliest episode per
user reproduces the batch ``event_funnel`` global-first-view row, and
the full emission reproduces ``funnel_episodes`` row-for-row (asserted
in tests/test_streaming.py both ways).

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
        StructField("views", ArrayType(LongType())),
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


def _advance(
    user_id: int,
    views: list[int],
    clicks: list[int],
    purchases: list[int],
    wm_us: int,
    w_us: int,
) -> tuple[list[pd.DataFrame], list[int], list[int], list[int]]:
    """Emit every ripe episode, compress finally-absorbed views, prune
    dead click/purchase candidates.  Pure function of (state, watermark)
    so the update and timeout branches share it exactly."""
    horizon = 2 * w_us
    out: list[pd.DataFrame] = []
    views = sorted(views)
    # drain ripe episodes: watermark strictly past the earliest horizon
    # (an event at exactly the watermark may still arrive)
    while views and wm_us > views[0] + horizon:
        a = views[0]
        out.append(_finalize(user_id, a, clicks, purchases, w_us))
        views = [v for v in views if v > a + horizon]
        clicks = [c for c in clicks if c > a + horizon]
        purchases = [p for p in purchases if p > a + horizon]
    # compress: an earliest view at/below the watermark is the final
    # next anchor (no future view can precede it), so views it absorbs
    # are droppable NOW; repeat while the next surviving anchor is also
    # watermark-fixed
    fixed: list[int] = []
    while views and views[0] <= wm_us:
        a = views[0]
        fixed.append(a)
        views = [v for v in views if v > a + horizon]
    views = fixed + views
    if views:
        lo, hi = views[0], views[-1]
        live = lambda x, span: x > wm_us or (lo < x <= hi + span)  # noqa: E731
        clicks = [c for c in clicks if live(c, w_us)]
        purchases = [p for p in purchases if live(p, horizon)]
    else:
        # no pending anchor: a future view opens its window above the
        # watermark, so only above-watermark candidates can ever qualify
        clicks = [c for c in clicks if c > wm_us]
        purchases = [p for p in purchases if p > wm_us]
    return out, views, clicks, purchases


def make_funnel(window_us: int = FUNNEL_WINDOW_US):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1_000

        if state.hasTimedOut:
            views, clicks, purchases = (list(x) for x in state.get)
            out, views, clicks, purchases = _advance(
                user_id, views, clicks, purchases, wm_us, window_us
            )
            yield from out
        else:
            events = pd.concat(list(pdfs))
            ts_us = (
                events["ts"].values.astype("datetime64[us]")
                .astype("int64")
                .tolist()
            )
            types = events["event_type"].tolist()
            if state.exists:
                views, clicks, purchases = (list(x) for x in state.get)
            else:
                views, clicks, purchases = [], [], []
            for t, e in zip(ts_us, types):
                if e == "view":
                    views.append(t)
                elif e == "click":
                    clicks.append(t)
                elif e == "purchase":
                    purchases.append(t)
            out, views, clicks, purchases = _advance(
                user_id, views, clicks, purchases, wm_us, window_us
            )
            yield from out

        if views:
            state.update((views, clicks, purchases))
            horizon = views[0] + 2 * window_us
            state.setTimeoutTimestamp(
                max(horizon // 1_000, wm_us // 1_000 + 1)
            )
        elif clicks or purchases:
            state.update(([], clicks, purchases))
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
    """Per-user funnel-episode finalization over a streaming event feed.

    Emits one row per episode once the watermark proves it final
    (event-time timeout at anchor + 2·window).
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
