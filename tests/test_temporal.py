"""As-of join and banded range join: semantics on hand-built fixtures
(tie handling, tolerance, window boundaries) and plan-shape pins (the
as-of join must be join-operator-free; the range join must stay an
equi-join, never a cross product)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.operators.temporal import (
    ASOF_STRUCT,
    asof_join,
    banded_range_join,
)


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def quote_trade(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 10.0),
            ("A", _ts(5), 11.0),
            ("A", _ts(9), 12.0),
            ("B", _ts(2), 20.0),
        ],
        "sym string, ts timestamp, quote double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(5), 100),   # tie with the 11.0 quote → must match it
            ("A", _ts(7), 101),   # between quotes → 11.0
            ("A", _ts(30), 102),  # far after → 12.0 (or null with tolerance)
            ("B", _ts(1), 103),   # before any B quote → null
            ("C", _ts(4), 104),   # key with no quotes at all → null
        ],
        "sym string, ts timestamp, trade_id int",
    )
    return quotes, trades


def _asof_map(quotes, trades, **kw):
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        payload=[F.col("quote")],
        **kw,
    )
    rows = out.select(
        "trade_id", F.col(ASOF_STRUCT)["quote"].alias("q")
    ).collect()
    return {r.trade_id: r.q for r in rows}


def test_asof_backward_semantics(quote_trade):
    quotes, trades = quote_trade
    got = _asof_map(quotes, trades)
    assert got == {100: 11.0, 101: 11.0, 102: 12.0, 103: None, 104: None}


def test_asof_tolerance(quote_trade):
    quotes, trades = quote_trade
    # 10-minute tolerance: trade 102 (21 min after the last quote) drops out
    got = _asof_map(quotes, trades, tolerance_us=10 * 60 * 1_000_000)
    assert got == {100: 11.0, 101: 11.0, 102: None, 103: None, 104: None}


def test_asof_plan_has_no_join(quote_trade, spark):
    quotes, trades = quote_trade
    out = asof_join(trades, quotes, on=["sym"], payload=[F.col("quote")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # single-shuffle merge shape, not join+argmax
    assert "Window" in plan


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [("u", _ts(10), 1)], "k string, l_ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(10), 0),      # equal to left ts → excluded (lower open)
            ("u", _ts(10, 1), 1),   # just inside
            ("u", _ts(15), 2),      # inside, next bucket
            ("u", _ts(20), 3),      # exactly window end → included (upper closed)
            ("u", _ts(20, 1), 4),   # just outside
            ("v", _ts(12), 5),      # wrong key
        ],
        "k string, r_ts timestamp, rid int",
    )
    got = banded_range_join(
        left, right, on=["k"], left_ts="l_ts", right_ts="r_ts",
        window_us=10 * 60 * 1_000_000,
    )
    assert sorted(r.rid for r in got.collect()) == [1, 2, 3]


def test_range_join_stays_equi_join(spark):
    left = spark.createDataFrame(
        [("u", _ts(1), 1)], "k string, l_ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("u", _ts(2), 2)], "k string, r_ts timestamp, rid int"
    )
    out = banded_range_join(
        left, right, on=["k"], left_ts="l_ts", right_ts="r_ts",
        window_us=60_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# Gap-fill (grid densify + forward fill)
def test_gap_fill_densifies_and_ffills(spark, tmp_path):
    # Hours 0,1,3 present for type A (hour 2 missing); hour 1 only for B.
    def _h(hour: int):
        return datetime(2024, 1, 1, hour, 30)

    rows = [
        (1, _h(0), 1, "A", 10.0, None),
        (2, _h(1), 1, "A", 20.0, None),
        (3, _h(3), 1, "A", 40.0, None),
        (4, _h(1), 2, "B", 5.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.temporal import gap_fill

    out = gap_fill(spark, str(tmp_path))
    got = {
        (r.event_type, r.hour_ts.hour): (r.is_gap, r.value_ffill)
        for r in out.collect()
    }
    # Full 2-type × 4-hour grid.
    assert len(got) == 8
    # A: hour 2 is a gap, forward-filled from hour 1.
    assert got[("A", 0)] == (0, 10.0)
    assert got[("A", 2)] == (1, 20.0)
    assert got[("A", 3)] == (0, 40.0)
    # B: leading gap stays null (nothing to carry), later gaps carry 5.0.
    assert got[("B", 0)] == (1, None)
    assert got[("B", 1)] == (0, 5.0)
    assert got[("B", 3)] == (1, 5.0)
