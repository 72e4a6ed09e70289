"""Explicit StructType catalog for every reference-shaped input and output.

The reference infers CSV dtypes at read time and validates post-hoc against
a hard-coded expected-schema dict (reference src/etl/extract/__init__.py:76-79
and src/etl/validate/__init__.py:248-258).  Here schemas are declared up
front — at 100 TB, inference means an extra full pass and silently drifting
types, so every reader takes one of these.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _fields(*specs: tuple[str, object, bool]) -> list[StructField]:
    return [StructField(n, t, nullable) for n, t, nullable in specs]


# ---------------------------------------------------------------------------
# Raw inputs — one bundle per run (FIXTURES.md §1; reference
# src/generate_synthetic_idaice.py:73-150).
ZONES_CSV = StructType(
    _fields(
        ("timestamp", TimestampType(), False),
        ("building_id", StringType(), False),
        ("scenario_id", StringType(), False),
        ("zone_id", StringType(), False),
        ("zone_name", StringType(), False),
        ("air_temp_C", DoubleType(), False),
        ("setpoint_C", DoubleType(), False),
        ("co2_ppm", DoubleType(), False),
        ("rh_pct", DoubleType(), False),
    )
)

HVAC_CSV = StructType(
    _fields(
        ("timestamp", TimestampType(), False),
        ("building_id", StringType(), False),
        ("scenario_id", StringType(), False),
        ("ahu_id", StringType(), False),
        ("supply_temp_C", DoubleType(), False),
        ("return_temp_C", DoubleType(), False),
        ("power_kw", DoubleType(), False),
        ("cooling_kw", DoubleType(), False),
        ("heating_kw", DoubleType(), False),
    )
)

METERS_CSV = StructType(
    _fields(
        ("timestamp", TimestampType(), False),
        ("building_id", StringType(), False),
        ("scenario_id", StringType(), False),
        ("electric_kwh", DoubleType(), False),
        ("heating_kwh", DoubleType(), False),
        ("cooling_kwh", DoubleType(), False),
    )
)

WEATHER_CSV = StructType(
    _fields(
        ("timestamp", TimestampType(), False),
        ("drybulb_C", DoubleType(), False),
        ("relhum_pct", DoubleType(), False),
        ("ghi_W_m2", DoubleType(), False),
    )
)

METADATA_JSON = StructType(
    _fields(
        ("building_id", StringType(), False),
        ("scenario_id", StringType(), False),
        ("building_name", StringType(), True),
        ("location", StringType(), True),
        ("floor_area_m2", LongType(), True),
        ("description", StringType(), True),
        ("generated_at", StringType(), True),
    )
)

RAW_SCHEMAS: dict[str, StructType] = {
    "zones": ZONES_CSV,
    "hvac": HVAC_CSV,
    "meters": METERS_CSV,
    "weather": WEATHER_CSV,
}

# ---------------------------------------------------------------------------
# Star-schema outputs (FIXTURES.md §2; expected columns mirror the
# reference's validator, src/etl/validate/__init__.py:248-258).
DIM_BUILDING = StructType(
    _fields(
        ("building_id", StringType(), False),
        ("building_name", StringType(), True),
        ("location", StringType(), True),
        ("floor_area_m2", LongType(), True),
    )
)

DIM_SCENARIO = StructType(
    _fields(
        ("scenario_id", StringType(), False),
        ("description", StringType(), True),
    )
)

DIM_ZONE = StructType(
    _fields(
        ("zone_key", LongType(), False),
        ("building_id", StringType(), False),
        ("zone_id", StringType(), False),
        ("zone_name", StringType(), True),
    )
)

DIM_AHU = StructType(
    _fields(
        ("ahu_key", LongType(), False),
        ("building_id", StringType(), False),
        ("ahu_id", StringType(), False),
    )
)

DIM_TIME = StructType(
    _fields(
        ("time_key", LongType(), False),
        ("timestamp", TimestampType(), False),
        ("year", LongType(), False),
        ("month", LongType(), False),
        ("day", LongType(), False),
        ("hour", LongType(), False),
        ("dow", LongType(), False),
        ("is_weekend", BooleanType(), False),
    )
)

FACT_ZONE_CONDITIONS = StructType(
    _fields(
        ("time_key", LongType(), True),
        ("zone_key", LongType(), True),
        ("scenario_id", StringType(), False),
        ("air_temp_C", DoubleType(), False),
        ("setpoint_C", DoubleType(), False),
        ("co2_ppm", DoubleType(), False),
        ("rh_pct", DoubleType(), False),
    )
)

FACT_HVAC = StructType(
    _fields(
        ("time_key", LongType(), True),
        ("ahu_key", LongType(), True),
        ("scenario_id", StringType(), False),
        ("supply_temp_C", DoubleType(), False),
        ("return_temp_C", DoubleType(), False),
        ("power_kw", DoubleType(), False),
        ("cooling_kw", DoubleType(), False),
        ("heating_kw", DoubleType(), False),
        ("cop_proxy", DoubleType(), True),  # the ONLY nullable measure
    )
)

FACT_METERS = StructType(
    _fields(
        ("time_key", LongType(), True),
        ("building_id", StringType(), False),
        ("scenario_id", StringType(), False),
        ("electric_kwh", DoubleType(), False),
        ("heating_kwh", DoubleType(), False),
        ("cooling_kwh", DoubleType(), False),
    )
)

FACT_WEATHER = StructType(
    _fields(
        ("time_key", LongType(), True),
        ("building_id", StringType(), False),
        ("drybulb_C", DoubleType(), False),
        ("relhum_pct", DoubleType(), False),
        ("ghi_W_m2", DoubleType(), False),
    )
)

STAR_SCHEMAS: dict[str, StructType] = {
    "dim_building": DIM_BUILDING,
    "dim_scenario": DIM_SCENARIO,
    "dim_zone": DIM_ZONE,
    "dim_ahu": DIM_AHU,
    "dim_time": DIM_TIME,
    "fact_zone_conditions": FACT_ZONE_CONDITIONS,
    "fact_hvac": FACT_HVAC,
    "fact_meters": FACT_METERS,
    "fact_weather": FACT_WEATHER,
}

# Columns allowed to contain nulls in the star schema (reference nullability
# whitelist, src/etl/validate/__init__.py:32-34).
NULLABLE_WHITELIST: dict[str, set[str]] = {"fact_hvac": {"cop_proxy"}}
