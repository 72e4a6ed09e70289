"""Streaming operator tests: windowed rollup parity with batch, and
watermarked dedup."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from ida_ice_energy_simulation_etl_pipeline_spark.streaming import (
    dedup_stream,
    hourly_rollup_stream,
    read_event_stream,
)
from ida_ice_energy_simulation_etl_pipeline_spark.streaming.hourly import (
    run_to_memory,
)

BASE_TS = datetime(2024, 3, 1, 0, 0, 0)


def _event(i: int, minutes: int, etype: str = "click", value: float = 1.5):
    return {
        "event_id": i,
        "ts": (BASE_TS + timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S"),
        "user_id": i % 7,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


@pytest.fixture()
def event_dir(tmp_path):
    rows = [
        *(_event(i, 5 * i, "click", 2.0) for i in range(12)),      # hours 0..1
        *(_event(100 + i, 60 + 5 * i, "view", 1.0) for i in range(6)),
    ]
    (tmp_path / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return tmp_path


def test_hourly_rollup_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, str(event_dir))
    rollup = hourly_rollup_stream(stream)
    run_to_memory(rollup, "rollup_t", output_mode="complete")
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("rollup_t").collect()
    }
    # hour 0: 12 clicks at 5-min spacing = minutes 0..55
    assert got[(0, "click")] == (12, 24.0)
    # hour 1: 6 views at minutes 60..85
    assert got[(1, "view")] == (6, 6.0)


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    rows = [_event(1, 0), _event(1, 1), _event(2, 2), _event(2, 3), _event(3, 4)]
    (tmp_path / "dups.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = read_event_stream(spark, str(tmp_path))
    run_to_memory(dedup_stream(stream), "dedup_t")
    ids = sorted(r["event_id"] for r in spark.table("dedup_t").collect())
    assert ids == [1, 2, 3]
