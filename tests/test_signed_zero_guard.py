"""Signed-zero canonicalization guard (r14 verdict item 3).

The class bug this pins: Spark's ``round`` (BigDecimal HALF_UP) never
emits IEEE -0.0, DuckDB's float ``round`` preserves the sign, and the
driver's value hash is bitwise on floats — so a rounded-double surface
whose argument can go negative hash-mismatches whenever the fixture
lands a tiny negative value (the round-13 ``collocation_pmi`` red row).
The fix is ``round_pz`` (Spark: ``round(x, n) + 0.0``) mirrored by
``round_pz_sql`` / a hand-inlined ``+ 0.0`` on the oracle side — but
the two halves are canonicalized INDEPENDENTLY per query, so one
future edit dropping the ``+ 0.0`` on either side silently reopens the
class, and only a driver round (or a lucky fixture) would catch it.

This test closes the class mechanically: for every registry query
whose oracle SQL rounds anything, it pairs

* the Spark side — output columns whose ANALYZED plan expression is
  ``(round(...) + 0.0) AS col`` (what ``round_pz`` compiles to; read
  with a balanced-paren scan because the inner expression nests), with
* the oracle side — output columns aliased from ``round(...) + 0.0``
  in the SQL text,

and requires the two column sets to be identical per query.  Dropping
the canonicalization on either half (or adding it on only one) fails
here, without waiting for a -0.0 to show up in a fixture.  Plan-build
only — nothing executes, so the sweep stays cheap.

A coverage floor pins the detector itself: as of round 15 the registry
carries 23 canonicalized columns across 16 queries, so a regex-drift
regression that silently detects nothing also fails.
"""

from __future__ import annotations

import re

import pytest

from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES

# what round_pz compiles to in an analyzed-plan dump:
#   (round(<nested expr>, 4) + 0.0) AS colname#123
_SPARK_TAIL = r"\s*\+\s*0\.0\)\s+AS\s+(\w+)#"
# what round_pz_sql / the hand-inlined oracle sites emit:
#   round(<nested expr>, 4) + 0.0 AS colname   (alias may be next line)
_ORACLE_TAIL = r"\s*\+\s*0\.0\s+AS\s+(\w+)"

# detector floor at the time of writing (r15): 16 specs / 23 columns —
# growth is fine, silent shrinkage is the regression being guarded
_MIN_SPECS = 16
_MIN_COLS = 23


def _canonicalized_cols(text: str, tail_re: str) -> set[str]:
    """Output-column names aliased from a ``round(...) + 0.0`` in
    ``text``.  The inner expression nests parens (and, in plan dumps,
    ``#`` ids), so the round(...) span is walked with a balanced-paren
    scan rather than matched with a regex."""
    cols: set[str] = set()
    i = 0
    while True:
        j = text.find("round(", i)
        if j < 0:
            return cols
        k = j + len("round(")
        depth = 1
        while k < len(text) and depth:
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        m = re.match(tail_re, text[k:], re.S)
        if m:
            cols.add(m.group(1))
        i = j + len("round(")


_ROUNDING_SPECS = [
    name
    for name, spec in ALL_QUERIES.items()
    if spec.oracle and "round(" in spec.oracle
]


@pytest.mark.parametrize("name", _ROUNDING_SPECS)
def test_round_pz_pairing(spark, sf_dir, name):
    spec = ALL_QUERIES[name]
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    out_cols = set(df.columns)
    spark_side = _canonicalized_cols(plan, _SPARK_TAIL) & out_cols
    oracle_side = _canonicalized_cols(spec.oracle, _ORACLE_TAIL) & out_cols
    assert spark_side == oracle_side, (
        f"{name}: signed-zero canonicalization is one-sided — Spark "
        f"round_pz columns {sorted(spark_side)} vs oracle '+ 0.0' "
        f"columns {sorted(oracle_side)}.  Round through round_pz / "
        "round_pz_sql on BOTH halves (functions/columns.py) or on "
        "neither."
    )


def test_detector_floor(spark, sf_dir):
    """The pairing test is only as good as its detector: if the plan
    dump format or the regexes drift, every per-query check could pass
    vacuously.  Pin the known canonicalized surface as a floor."""
    specs_hit = 0
    cols_hit = 0
    for name in _ROUNDING_SPECS:
        spec = ALL_QUERIES[name]
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().analyzed().toString()
        found = _canonicalized_cols(plan, _SPARK_TAIL) & set(df.columns)
        if found:
            specs_hit += 1
            cols_hit += len(found)
    assert specs_hit >= _MIN_SPECS and cols_hit >= _MIN_COLS, (
        f"round_pz detector found only {specs_hit} specs / {cols_hit} "
        f"columns (expected >= {_MIN_SPECS}/{_MIN_COLS}) — the analyzed-"
        "plan format or the scan regex drifted; fix the detector before "
        "trusting the pairing test"
    )


def test_oracle_scanner_detects_dropped_canonicalization():
    """Negative control, no Spark needed: stripping the '+ 0.0' from a
    known-canonicalized oracle must empty its detected column set."""
    sql = ALL_QUERIES["collocation_pmi"].oracle
    assert _canonicalized_cols(sql, _ORACLE_TAIL) == {"pmi"}
    assert (
        _canonicalized_cols(sql.replace("+ 0.0", ""), _ORACLE_TAIL) == set()
    )
