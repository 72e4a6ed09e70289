"""Replicates the driver's t2 check: every registry query vs its DuckDB
oracle — row count, column names, and order-insensitive values.

Runs at sf0.001 by default for speed; set PARITY_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES
from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    """Sort columns by name, then rows — the driver's order-insensitive
    compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(row[i] for i in order) for row in rows]
    return sorted(out, key=repr), [columns[i] for i in order]


def _values_equal(a, b) -> bool:
    # STRICT equality (the driver hashes values): if a query fails only in
    # float last-bits, the query itself must round harder, not the test.
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


# Both tiers: the driver-facing set AND the demoted extras — local parity
# coverage must not shrink when a query leaves the driver window.
ORACLE_SPECS = [s for s in ALL_QUERIES.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in ALL_QUERIES.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, ddb, spec):
    sdf = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = ddb.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{spec.name}: row count spark={len(srows)} duckdb={len(drows)}"
    )

    s_norm, _ = _normalize(srows, scols)
    d_norm, _ = _normalize(drows, dcols)
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(s_norm, d_norm))
        if not all(_values_equal(x, y) for x, y in zip(a, b))
    ]
    assert not mismatches, f"{spec.name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spark, spec):
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
