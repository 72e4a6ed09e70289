"""Deterministic reference-shaped fixture generator.

Produces the raw input layout the engine ingests (FIXTURES.md §1): one
bundle per run ``run_{building_id}_{scenario_id}`` containing
``metadata.json`` + 4 CSVs, either as a directory or zipped.  This is an
original generator written from the documented schema/value-range spec —
value ranges match the validator's expectations (air temp 10–35 °C,
CO₂ 400–2500 ppm, RH 0–100 %, non-negative energy, hourly UTC timestamps
with no gaps) so the validation suite passes on clean data and tests can
inject targeted violations.
"""

from __future__ import annotations

import json
import shutil
import zipfile
from datetime import datetime, timedelta, timezone
from pathlib import Path

import numpy as np
import pandas as pd

DEFAULT_BUILDINGS = ("BLDG_01", "BLDG_02", "BLDG_03")
DEFAULT_SCENARIOS = ("BASE", "RETROFIT")
DEFAULT_START = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _hours(start: datetime, n: int) -> pd.DatetimeIndex:
    return pd.DatetimeIndex(
        [start + timedelta(hours=i) for i in range(n)], tz=timezone.utc
    )


def generate_run(
    building_id: str,
    scenario_id: str,
    *,
    start: datetime = DEFAULT_START,
    hours: int = 168,
    n_zones: int = 5,
    n_ahus: int = 2,
    seed: int = 42,
) -> dict[str, object]:
    """One simulation run: metadata dict + 4 pandas frames (zones, hvac,
    meters, weather).  Weather is keyed only by the time span + seed, so
    every run of a dataset shares one series — the property the star
    schema's fact_weather build relies on."""
    rng = np.random.default_rng(
        abs(hash((building_id, scenario_id, seed))) % (2**32)
    )
    wrng = np.random.default_rng(seed)  # weather: shared across runs
    ts = _hours(start, hours)
    hour_of_day = np.array([t.hour for t in ts], dtype=float)
    daily = np.sin((hour_of_day - 6.0) / 24.0 * 2 * np.pi)
    retrofit = 0.85 if scenario_id != "BASE" else 1.0

    zones = []
    for z in range(1, n_zones + 1):
        air = 21.0 + 2.0 * daily + rng.normal(0, 0.4, hours) + 0.1 * z
        zones.append(
            pd.DataFrame(
                {
                    "timestamp": ts,
                    "building_id": building_id,
                    "scenario_id": scenario_id,
                    "zone_id": f"Z{z}",
                    "zone_name": f"Zone {z}",
                    "air_temp_C": np.clip(air, 10.0, 35.0),
                    "setpoint_C": 21.0 + rng.normal(0, 0.2, hours).round(2),
                    "co2_ppm": np.clip(
                        600 + 300 * np.maximum(daily, 0) + rng.normal(0, 40, hours),
                        400,
                        2500,
                    ),
                    "rh_pct": np.clip(45 + 10 * daily + rng.normal(0, 3, hours), 0, 100),
                }
            )
        )
    zones_df = pd.concat(zones, ignore_index=True)

    hvac = []
    for a in range(1, n_ahus + 1):
        power = np.clip(
            (20 + 8 * np.maximum(daily, 0) + rng.normal(0, 2, hours)) * retrofit,
            0,
            None,
        )
        hvac.append(
            pd.DataFrame(
                {
                    "timestamp": ts,
                    "building_id": building_id,
                    "scenario_id": scenario_id,
                    "ahu_id": f"AHU{a}",
                    "supply_temp_C": 19.0 + rng.normal(0, 0.5, hours),
                    "return_temp_C": 19.0 + 5.0 + rng.normal(0, 0.5, hours),
                    "power_kw": power,
                    "cooling_kw": np.clip(
                        12 * np.maximum(daily, 0) + rng.normal(0, 1.5, hours), 0, None
                    ),
                    "heating_kw": np.clip(
                        14 * np.maximum(-daily, 0) + rng.normal(0, 1.5, hours), 0, None
                    ),
                }
            )
        )
    hvac_df = pd.concat(hvac, ignore_index=True)

    heating = np.clip(
        (60 * np.maximum(-daily, 0.1) + rng.normal(0, 5, hours)) * retrofit, 0, None
    )
    cooling = np.clip(
        (40 * np.maximum(daily, 0.05) + rng.normal(0, 4, hours)) * retrofit, 0, None
    )
    electric = np.clip(
        0.4 * (heating + cooling) + 30 + rng.normal(0, 3, hours), 0, None
    )
    meters_df = pd.DataFrame(
        {
            "timestamp": ts,
            "building_id": building_id,
            "scenario_id": scenario_id,
            "electric_kwh": electric,
            "heating_kwh": heating,
            "cooling_kwh": cooling,
        }
    )

    weather_df = pd.DataFrame(
        {
            "timestamp": ts,
            "drybulb_C": np.clip(-2 + 6 * daily + wrng.normal(0, 1.5, hours), -30, 40),
            "relhum_pct": np.clip(70 - 15 * daily + wrng.normal(0, 5, hours), 0, 100),
            "ghi_W_m2": np.clip(600 * np.maximum(daily, 0) + wrng.normal(0, 30, hours), 0, 1500),
        }
    )

    metadata = {
        "building_id": building_id,
        "scenario_id": scenario_id,
        "building_name": f"Building {building_id}",
        "location": "Tallinn, Estonia",
        "floor_area_m2": int(3500 + (abs(hash(building_id)) % 1000)),
        "description": f"{scenario_id} scenario for {building_id}",
        "generated_at": start.strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    return {
        "run_id": f"run_{building_id}_{scenario_id}",
        "metadata": metadata,
        "zones": zones_df,
        "hvac": hvac_df,
        "meters": meters_df,
        "weather": weather_df,
    }


def write_run_dir(run: dict[str, object], out_dir: Path) -> Path:
    """Write one run bundle as a directory (the scale-friendly layout:
    Spark globs `runs/run_*/zones.csv` directly, no unzip step)."""
    run_dir = Path(out_dir) / str(run["run_id"])
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "metadata.json").write_text(json.dumps(run["metadata"], indent=2))
    for entity in ("zones", "hvac", "meters", "weather"):
        df: pd.DataFrame = run[entity]  # type: ignore[assignment]
        out = df.copy()
        # isoformat gives '+00:00' offsets — matches the reader's
        # timestampFormat "yyyy-MM-dd'T'HH:mm:ssXXX"
        out["timestamp"] = out["timestamp"].map(lambda t: t.isoformat())
        out.to_csv(run_dir / f"{entity}.csv", index=False)
    return run_dir


def write_run_zip(run: dict[str, object], out_dir: Path) -> Path:
    """Write one run bundle as ``run_{b}_{s}.zip`` (reference packaging)."""
    out_dir = Path(out_dir)
    staging = out_dir / f"_staging_{run['run_id']}"
    run_dir = write_run_dir(run, staging)
    zip_path = out_dir / f"{run['run_id']}.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(run_dir.rglob("*")):
            zf.write(f, arcname=f"{run['run_id']}/{f.name}")
    shutil.rmtree(staging)
    return zip_path


def generate_dataset(
    out_dir: Path,
    *,
    buildings: tuple[str, ...] = DEFAULT_BUILDINGS,
    scenarios: tuple[str, ...] = DEFAULT_SCENARIOS,
    hours: int = 168,
    n_zones: int = 5,
    n_ahus: int = 2,
    seed: int = 42,
    as_zip: bool = False,
) -> list[Path]:
    """Full dataset: one bundle per (building, scenario)."""
    paths = []
    for b in buildings:
        for s in scenarios:
            run = generate_run(
                b, s, hours=hours, n_zones=n_zones, n_ahus=n_ahus, seed=seed
            )
            writer = write_run_zip if as_zip else write_run_dir
            paths.append(writer(run, Path(out_dir)))
    return paths
