"""Dimensional transform: entity DataFrames → 5-dim / 4-fact star schema.

Re-expresses the reference's per-run pandas loops
(src/etl/transform/__init__.py:412-445) as declarative set operations:

* dims are dropDuplicates over ALL runs at once (D1–D3) — no seen-set
  loops;
* dense surrogate keys (D4, reference :106-173) are ``row_number`` windows,
  fine at dim cardinality.  For 100 TB fact feeds the ``derived`` strategy
  computes ``time_key`` arithmetically from the timestamp (hours since
  epoch) — order-preserving, join-stable, and shuffle-free (documented
  divergence from "enumerate 1..n");
* facts join dims with broadcast (J1–J3) and keep LEFT semantics: an
  unmatched key yields NULL, which the validator then counts — the
  reference's referential-integrity behavior (SURVEY §4 caveat 3);
* fact_weather dedups the shared weather series by timestamp and
  replicates per building via broadcast cross join (J4) instead of
  trusting ``runs[0]`` (reference :373-382, SURVEY §4 caveat 2);
* ``cop_proxy`` is NULL iff ``power_kw < 1.0`` — the load-bearing
  threshold (reference :267-274).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dow_monday0, is_weekend

COP_POWER_THRESHOLD_KW = 1.0


def _run_zip_name() -> Column:
    """The reference walks runs in ``sorted(glob('run_*.zip'))`` order
    (extract:116) — first-seen choices must use the FULL filename as the
    order key, '.zip' included: bare ids misorder prefix pairs ('B1' vs
    'B10': '0' < '_'), and without the extension a reconstructed name
    that is a strict prefix of another ('-' < '.') misorders too."""
    return F.concat(
        F.lit("run_"),
        F.col("building_id"),
        F.lit("_"),
        F.col("scenario_id"),
        F.lit(".zip"),
    )


def build_dim_building(metadata: DataFrame) -> DataFrame:
    """One row per building, first-seen in sorted run order (same
    determinism rule as build_dim_scenario below: dropDuplicates'
    survivor is partition-order-dependent; the reference's seen-set walk
    keeps the first zip's metadata)."""
    first = F.min_by(
        F.struct("building_name", "location", "floor_area_m2"), _run_zip_name()
    ).alias("f")
    return (
        metadata.groupBy("building_id")
        .agg(first)
        .select("building_id", "f.building_name", "f.location", "f.floor_area_m2")
        .orderBy("building_id")
    )


def build_dim_scenario(metadata: DataFrame) -> DataFrame:
    """One row per scenario, keeping the description of the FIRST run in
    sorted run order — the reference's seen-set walk over
    ``sorted(glob('run_*.zip'))`` (transform:45-73, extract:116) made
    that choice implicitly; a bare dropDuplicates would leave the
    survivor partition-order-dependent, which cross-implementation
    parity (and determinism under repartitioning) forbids.  The order
    key reconstructs the zip FILENAME, not the bare building_id: for ids
    where one is a prefix of the other ('B1' vs 'B10'), 'run_B10_…'
    sorts before 'run_B1_…' and min(building_id) would disagree."""
    return (
        metadata.groupBy("scenario_id")
        .agg(F.min_by("description", _run_zip_name()).alias("description"))
        .orderBy("scenario_id")
    )


def build_dim_zone(zones: DataFrame) -> DataFrame:
    w = Window.orderBy("building_id", "zone_id")
    return (
        zones.select("building_id", "zone_id", "zone_name")
        .dropDuplicates(["building_id", "zone_id", "zone_name"])
        .withColumn("zone_key", F.row_number().over(w).cast("long"))
        .select("zone_key", "building_id", "zone_id", "zone_name")
    )


def build_dim_ahu(hvac: DataFrame) -> DataFrame:
    w = Window.orderBy("building_id", "ahu_id")
    return (
        hvac.select("building_id", "ahu_id")
        .dropDuplicates(["building_id", "ahu_id"])
        .withColumn("ahu_key", F.row_number().over(w).cast("long"))
        .select("ahu_key", "building_id", "ahu_id")
    )


def build_dim_time(zones: DataFrame, key_strategy: str = "dense") -> DataFrame:
    """Time dimension over the distinct timestamp universe (reference uses
    zones' timestamps: src/etl/transform/__init__.py:161-170).

    key_strategy='dense'   — row_number over sorted timestamps (reference
                             parity; one small global sort).
    key_strategy='derived' — floor(epoch/3600): arithmetic, shuffle-free,
                             stable under incremental loads (the 100 TB
                             choice; keys are join-stable but not 1..n).
    """
    ts = zones.select("timestamp").distinct()
    if key_strategy == "derived":
        keyed = ts.withColumn(
            "time_key", (F.unix_timestamp("timestamp") / 3600).cast("long")
        )
    else:
        keyed = ts.withColumn(
            "time_key",
            F.row_number().over(Window.orderBy("timestamp")).cast("long"),
        )
    return keyed.select(
        "time_key",
        "timestamp",
        F.year("timestamp").cast("long").alias("year"),
        F.month("timestamp").cast("long").alias("month"),
        F.dayofmonth("timestamp").cast("long").alias("day"),
        F.hour("timestamp").cast("long").alias("hour"),
        dow_monday0(F.col("timestamp")).cast("long").alias("dow"),
        is_weekend(F.col("timestamp")).alias("is_weekend"),
    )


def _time_keyed(fact: DataFrame, dim_time: DataFrame) -> DataFrame:
    """J1: left join to dim_time on timestamp; broadcast — dim_time is
    bounded by the simulation span."""
    return fact.join(
        F.broadcast(dim_time.select("time_key", "timestamp")), "timestamp", "left"
    )


def build_fact_zone_conditions(
    zones: DataFrame, dim_time: DataFrame, dim_zone: DataFrame
) -> DataFrame:
    """Grain (timestamp, zone, scenario) — reference transform:203-241."""
    keyed = _time_keyed(zones, dim_time).join(
        F.broadcast(dim_zone.select("zone_key", "building_id", "zone_id")),
        ["building_id", "zone_id"],
        "left",
    )
    return keyed.select(
        "time_key", "zone_key", "scenario_id",
        "air_temp_C", "setpoint_C", "co2_ppm", "rh_pct",
    )


def build_fact_hvac(
    hvac: DataFrame, dim_time: DataFrame, dim_ahu: DataFrame
) -> DataFrame:
    """Grain (timestamp, AHU, scenario); cop_proxy NULL iff power < 1 kW
    (reference transform:258-307, threshold at :267-269)."""
    keyed = _time_keyed(hvac, dim_time).join(
        F.broadcast(dim_ahu.select("ahu_key", "building_id", "ahu_id")),
        ["building_id", "ahu_id"],
        "left",
    )
    cop = F.when(
        F.col("power_kw") >= COP_POWER_THRESHOLD_KW,
        (F.col("heating_kw") + F.col("cooling_kw")) / F.col("power_kw"),
    )
    return keyed.select(
        "time_key", "ahu_key", "scenario_id",
        "supply_temp_C", "return_temp_C", "power_kw", "cooling_kw", "heating_kw",
        cop.alias("cop_proxy"),
    )


def build_fact_meters(meters: DataFrame, dim_time: DataFrame) -> DataFrame:
    """Grain (timestamp, building, scenario) — reference transform:324-356."""
    return _time_keyed(meters, dim_time).select(
        "time_key", "building_id", "scenario_id",
        "electric_kwh", "heating_kwh", "cooling_kwh",
    )


def build_fact_weather(
    weather: DataFrame, dim_time: DataFrame, dim_building: DataFrame
) -> DataFrame:
    """Grain (timestamp, building) — the shared weather series replicated
    per building (J4).  Dedup by timestamp across runs (averaging is not
    needed: the series is identical; distinct is exact) instead of the
    reference's silent runs[0] pick (transform:373-409)."""
    shared = weather.dropDuplicates(["timestamp"])
    fanned = _time_keyed(shared, dim_time).crossJoin(
        F.broadcast(dim_building.select("building_id"))
    )
    return fanned.select(
        "time_key", "building_id", "drybulb_C", "relhum_pct", "ghi_W_m2"
    )


def transform_all(
    entities: dict[str, DataFrame], *, time_key_strategy: str = "dense"
) -> dict[str, DataFrame]:
    """Full star schema (reference transform_all, transform:412-445)."""
    dim_building = build_dim_building(entities["metadata"])
    dim_scenario = build_dim_scenario(entities["metadata"])
    dim_zone = build_dim_zone(entities["zones"])
    dim_ahu = build_dim_ahu(entities["hvac"])
    dim_time = build_dim_time(entities["zones"], key_strategy=time_key_strategy)
    return {
        "dim_building": dim_building,
        "dim_scenario": dim_scenario,
        "dim_zone": dim_zone,
        "dim_ahu": dim_ahu,
        "dim_time": dim_time,
        "fact_zone_conditions": build_fact_zone_conditions(
            entities["zones"], dim_time, dim_zone
        ),
        "fact_hvac": build_fact_hvac(entities["hvac"], dim_time, dim_ahu),
        "fact_meters": build_fact_meters(entities["meters"], dim_time),
        "fact_weather": build_fact_weather(
            entities["weather"], dim_time, dim_building
        ),
    }
