"""Record-linkage operator semantics (operators/linkage.py)."""

from __future__ import annotations

from ida_ice_energy_simulation_etl_pipeline_spark.operators.linkage import (
    fuzzy_matches,
)


def _records(spark):
    rows = [
        # block X: "red widget" ×2 and "ted widget" ×1 are distance 1;
        # "blue bolt" is far from both.
        ("X", "red widget"),
        ("X", "red widget"),
        ("X", "ted widget"),
        ("X", "blue bolt"),
        # block Y: same names as X but blocked apart → must NOT pair with X.
        ("Y", "red widget"),
        # exact duplicates within Y: identical names are NOT emitted.
        ("Y", "ted widget"),
        ("Y", "ted widget"),
    ]
    return spark.createDataFrame(rows, "blk string, name string")


def test_fuzzy_matches_blocked_pairs(spark):
    out = fuzzy_matches(_records(spark), "blk", "name", max_dist=2)
    got = {
        (r.block, r.name_a, r.name_b): (r.edit_dist, r.n_record_pairs)
        for r in out.collect()
    }
    assert got == {
        # 2 "red widget" records × 1 "ted widget" record = 2 record pairs
        ("X", "red widget", "ted widget"): (1, 2),
        ("Y", "red widget", "ted widget"): (1, 2),
    }


def test_fuzzy_matches_excludes_identical_and_distant(spark):
    out = fuzzy_matches(_records(spark), "blk", "name", max_dist=20)
    names = {(r.name_a, r.name_b) for r in out.collect()}
    # identical-name pairs never appear even at a permissive threshold
    assert ("red widget", "red widget") not in names
    assert ("ted widget", "ted widget") not in names
    # the distant pair appears only once the threshold allows it
    assert ("blue bolt", "red widget") in names


def test_fuzzy_matches_value_grain_collapse_reuses_exchange(spark):
    """The two join sides are one aggregate — the plan must reuse the
    exchange, not re-aggregate the records twice."""
    out = fuzzy_matches(_records(spark), "blk", "name")
    # Exchange reuse is an AQE runtime decision — execute, then inspect
    # the final adaptive plan.
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
