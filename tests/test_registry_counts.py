"""Pins the README's registry counts to the actual registry — one source
of truth, so the prose numbers cannot drift (round-2 verdict item 7)."""

from __future__ import annotations

from pathlib import Path

from ida_ice_energy_simulation_etl_pipeline_spark.plans import (
    EXTRA_QUERIES,
    QUERIES,
)
from ida_ice_energy_simulation_etl_pipeline_spark.plans.registry import (
    DRIVER_WINDOW,
)

README = Path(__file__).resolve().parent.parent / "README.md"


def test_driver_tier_fits_verification_window():
    assert len(QUERIES) <= DRIVER_WINDOW


def test_readme_counts_match_registry():
    text = README.read_text()
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle is not None)
    assert f"{len(QUERIES)} driver-facing queries" in text
    assert f"{n_oracle} with full value-hash oracles" in text
    assert f"{len(EXTRA_QUERIES)} extra queries" in text
