"""Threshold-transition alerting — ``transformWithStateInPandas``.

The monitoring twin of the batch ``rolling_anomaly`` query: per key,
classify each event against a threshold and emit a row ONLY when the
level CHANGES (OK→ALERT on crossing up, ALERT→OK on recovery).  An
always-emit design would re-announce a stuck-high sensor every event;
transition-only output is what pagers want, and it needs exactly one
remembered level per key — explicit keyed state.

Two implementations, one semantics (same vectorized kernel):

* :func:`threshold_alert_stream` — Spark 4's arbitrary-state API
  (``StatefulProcessor`` / ``transformWithStateInPandas``), the
  successor of ``applyInPandasWithState``: state is declared as named,
  schema'd, individually TTL-able slots on the processor handle instead
  of one opaque per-key tuple.  Requires the RocksDB state store
  provider AND the ``protobuf`` Python package (the new API's
  state-server protocol) — absent in this container, so its test is
  import-gated exactly like the PIL decode path.
* :func:`threshold_alert_stream_legacy` — the same operator on
  ``applyInPandasWithState`` (no extra runtime deps); this is the
  path the container's tests actually execute.

Scale shape: one exchange on the key (the grouping transformWithState
always needs), state = ONE fixed-width row per key — bounded by key
cardinality, independent of event volume; an optional TTL evicts keys
silent longer than the horizon.  The per-batch kernel is vectorized
numpy over the key's Arrow batch, never per-row Python in the hot loop.

Ordering: events are processed in (ts, event_id) order WITHIN each
micro-batch; cross-batch order is the file/source arrival order, the
standard contract for processing-time stateful operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ALERT_THRESHOLD = 90.0

ALERT_OUTPUT = (
    "user_id bigint, ts timestamp, value double, "
    "level string, prev_level string"
)


def _transition_frame(chunks, prev: str, threshold: float, key):
    """Vectorized transition kernel shared by both state APIs: concat
    the key's Arrow chunks, ONE global (ts, event_id) sort, classify,
    return (transitions-DataFrame-or-None, new last level).  The concat
    happens BEFORE the sort — chunk-local sorting would classify an
    out-of-order later chunk against the wrong running level
    (sessions.py idiom).  Per-key per-batch memory, the same bound the
    sessionizer accepts."""
    import numpy as np

    chunks = list(chunks)
    if not chunks:
        return None, prev
    pdf = pd.concat(chunks, ignore_index=True)
    if pdf.empty:
        return None, prev
    pdf = pdf.sort_values(["ts", "event_id"])
    levels = np.where(pdf["value"].to_numpy() > threshold, "ALERT", "OK")
    before = np.concatenate(([prev], levels[:-1]))
    mask = levels != before
    out = None
    if mask.any():
        out = pd.DataFrame(
            {
                "user_id": np.full(int(mask.sum()), key, dtype="int64"),
                "ts": pdf["ts"].to_numpy()[mask],
                "value": pdf["value"].to_numpy()[mask],
                "level": levels[mask],
                "prev_level": before[mask],
            }
        )
    return out, str(levels[-1])


class ThresholdAlertProcessor(StatefulProcessor):
    """Emit (level, prev_level) transition rows per key; remember the
    last level in a one-column ValueState slot."""

    def __init__(self, threshold: float = ALERT_THRESHOLD,
                 state_ttl_ms: int | None = None):
        self._threshold = threshold
        self._ttl = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState(
            "last_level", "level string", ttlDurationMs=self._ttl
        )

    def handleInputRows(
        self, key, rows, timer_values
    ) -> Iterator[pd.DataFrame]:
        prev = self._last.get()[0] if self._last.exists() else "OK"
        out, prev = _transition_frame(rows, prev, self._threshold, key[0])
        if out is not None:
            yield out
        self._last.update((prev,))

    def close(self) -> None:
        pass


def threshold_alert_stream(
    events: DataFrame,
    *,
    threshold: float = ALERT_THRESHOLD,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Transition-only alert stream over (user_id, ts, event_id, value).

    Works on a streaming OR batch ``events`` frame — the batch run is the
    parity harness for the streaming semantics."""
    return events.groupBy("user_id").transformWithStateInPandas(
        ThresholdAlertProcessor(threshold, state_ttl_ms),
        ALERT_OUTPUT,
        "Append",
        "None",
    )


def threshold_alert_stream_legacy(
    events: DataFrame, *, threshold: float = ALERT_THRESHOLD
) -> DataFrame:
    """Identical semantics on ``applyInPandasWithState`` (the API the
    container can execute) — one (level string) tuple of state per key,
    no timeout (the TTL knob is the new API's addition)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StringType, StructField, StructType

    state_schema = StructType([StructField("level", StringType())])

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else "OK"
        out, prev = _transition_frame(pdfs, prev, threshold, key[0])
        if out is not None:
            yield out
        state.update((prev,))

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_OUTPUT,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
