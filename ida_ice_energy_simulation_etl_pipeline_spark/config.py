"""Config surface (C2): YAML-driven pipeline runs.

Mirrors the reference's ``config.yaml`` knobs (reference config.yaml:1-63 —
paths, building/scenario lists, generation span, validation ranges) plus
the Spark-specific scale knobs the reference has no equivalent for.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import yaml


@dataclass
class PipelineConfig:
    input_dir: str = "data/runs"
    output_dir: str = "artifacts"
    zipped: bool = False
    buildings: list[str] = field(default_factory=lambda: ["BLDG_01", "BLDG_02", "BLDG_03"])
    scenarios: list[str] = field(default_factory=lambda: ["BASE", "RETROFIT"])
    hours: int = 168
    n_zones: int = 5
    n_ahus: int = 2
    seed: int = 42
    # validation overrides: {table: {column: [lo, hi]}} (null = unchecked)
    validation_ranges: dict = field(default_factory=dict)
    force: bool = False
    to_warehouse: bool = False
    partition_facts: bool = False
    cluster_facts: bool = False
    time_key_strategy: str = "dense"
    scenario_id: str | None = None
    # Spark scale knobs
    shuffle_partitions: int | None = None


def load_config(path: str | Path) -> PipelineConfig:
    raw = yaml.safe_load(Path(path).read_text()) or {}
    known = {f for f in PipelineConfig.__dataclass_fields__}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)} (known: {sorted(known)})")
    return PipelineConfig(**raw)


def range_rules_from_config(cfg: PipelineConfig) -> dict | None:
    """Convert the YAML override block into validate.RANGE_RULES shape."""
    if not cfg.validation_ranges:
        return None
    return {
        table: [
            (col, bounds[0], bounds[1]) for col, bounds in cols.items()
        ]
        for table, cols in cfg.validation_ranges.items()
    }
