"""Validation suite: schema, nulls, ranges, temporal coverage, plausibility.

The reference runs one pandas filter per rule (src/etl/validate/__init__.py:
49-137) — a full scan each.  Here every table's rules collapse into ONE
conditional-aggregate pass (A7), and coverage checks are anti-joins (J8) —
at 100 TB the whole suite is a handful of scans, not dozens.

Report shape mirrors the reference (validate/__init__.py:242-296):
``{"is_valid": bool, "checks": {name: {"valid": bool, "errors": [...]}}}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import NULLABLE_WHITELIST, STAR_SCHEMAS

# Value-range rules (reference validate/__init__.py:77-137; FIXTURES.md §1).
# table -> [(column, lo, hi)] — None bound = unchecked side.
RANGE_RULES: dict[str, list[tuple[str, float | None, float | None]]] = {
    "fact_zone_conditions": [
        ("air_temp_C", 10.0, 35.0),
        ("co2_ppm", 400.0, 2500.0),
        ("rh_pct", 0.0, 100.0),
    ],
    "fact_weather": [
        ("drybulb_C", -30.0, 40.0),
        ("relhum_pct", 0.0, 100.0),
        ("ghi_W_m2", 0.0, None),
    ],
    "fact_hvac": [
        ("power_kw", 0.0, None),
        ("heating_kw", 0.0, None),
        ("cooling_kw", 0.0, None),
    ],
    "fact_meters": [
        ("electric_kwh", 0.0, None),
        ("heating_kwh", 0.0, None),
        ("cooling_kwh", 0.0, None),
    ],
}

FACT_TABLES = ("fact_zone_conditions", "fact_hvac", "fact_meters", "fact_weather")


def check_schema(star: dict[str, DataFrame]) -> dict:
    """Expected tables/columns present (reference validate:242-296)."""
    errors: list[str] = []
    for table, expected in STAR_SCHEMAS.items():
        if table not in star:
            errors.append(f"missing table: {table}")
            continue
        actual = set(star[table].columns)
        wanted = {f.name for f in expected.fields}
        if missing := wanted - actual:
            errors.append(f"{table}: missing columns {sorted(missing)}")
        if extra := actual - wanted:
            errors.append(f"{table}: unexpected columns {sorted(extra)}")
    return {"valid": not errors, "errors": errors}


def check_nulls(star: dict[str, DataFrame]) -> dict:
    """Every column non-null except the whitelist (cop_proxy) — one
    aggregate pass per table (reference validate:49-55, whitelist :32-34)."""
    errors: list[str] = []
    for table in STAR_SCHEMAS:
        df = star.get(table)
        if df is None:
            continue
        allowed = NULLABLE_WHITELIST.get(table, set())
        cols = [c for c in df.columns if c not in allowed]
        if not cols:
            continue
        aggs = [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
            for c in cols
        ]
        counts = df.agg(*aggs).collect()[0].asDict()
        errors.extend(
            f"{table}.{c}: {n} null values" for c, n in counts.items() if n
        )
    return {"valid": not errors, "errors": errors}


def check_ranges(
    star: dict[str, DataFrame],
    rules_by_table: dict[str, list[tuple[str, float | None, float | None]]]
    | None = None,
) -> dict:
    """All range/sign rules for a table in one conditional-aggregate scan
    (reference runs one filter per rule, validate:77-137).  ``rules_by_table``
    overrides the defaults (config surface, reference config.yaml:40-55)."""
    errors: list[str] = []
    for table, rules in (rules_by_table or RANGE_RULES).items():
        df = star.get(table)
        if df is None:
            continue
        aggs = []
        for col, lo, hi in rules:
            cond = F.lit(False)
            if lo is not None:
                cond = cond | (F.col(col) < lo)
            if hi is not None:
                cond = cond | (F.col(col) > hi)
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(col)
            )
        counts = star[table].agg(*aggs).collect()[0].asDict()
        for col, lo, hi in rules:
            if counts[col]:
                errors.append(
                    f"{table}.{col}: {counts[col]} rows outside [{lo}, {hi}]"
                )
    return {"valid": not errors, "errors": errors}


def check_temporal(star: dict[str, DataFrame]) -> dict:
    """Coverage: every fact covers every time_key (anti-join, reference
    validate:171-180); continuity: hourly with no gaps (lag window,
    reference validate:159-168)."""
    errors: list[str] = []
    dim_time = star["dim_time"]

    gaps = (
        dim_time.select("timestamp")
        .withColumn(
            "gap_s",
            F.unix_timestamp("timestamp")
            - F.unix_timestamp(
                F.lag("timestamp").over(Window.orderBy("timestamp"))
            ),
        )
        .filter(F.col("gap_s") != 3600)
        .count()
    )
    if gaps:
        errors.append(f"dim_time: {gaps} non-hourly gaps in timestamp sequence")

    keys = dim_time.select("time_key")
    for table in FACT_TABLES:
        df = star.get(table)
        if df is None:
            continue
        missing = keys.join(
            df.select("time_key").distinct(), "time_key", "left_anti"
        ).count()
        if missing:
            errors.append(f"{table}: {missing} time periods uncovered")
    return {"valid": not errors, "errors": errors}


def check_plausibility(star: dict[str, DataFrame]) -> dict:
    """Per-(building, scenario) energy sums must be physically plausible
    (reference validate:204-227): electric > 0, heating+cooling > 0,
    electric >= 0.2 × (heating+cooling)."""
    sums = (
        star["fact_meters"]
        .groupBy("building_id", "scenario_id")
        .agg(
            F.sum("electric_kwh").alias("electric"),
            F.sum("heating_kwh").alias("heating"),
            F.sum("cooling_kwh").alias("cooling"),
        )
    )
    bad = sums.filter(
        (F.col("electric") <= 0)
        | ((F.col("heating") + F.col("cooling")) <= 0)
        | (F.col("electric") < 0.2 * (F.col("heating") + F.col("cooling")))
    ).collect()
    errors = [
        f"({r['building_id']}, {r['scenario_id']}): implausible energy totals "
        f"electric={r['electric']:.1f} heating={r['heating']:.1f} "
        f"cooling={r['cooling']:.1f}"
        for r in bad
    ]
    return {"valid": not errors, "errors": errors}


def validate_all(
    star: dict[str, DataFrame],
    *,
    range_rules: dict[str, list[tuple[str, float | None, float | None]]]
    | None = None,
) -> dict:
    """Run all four check families (reference validate_all,
    validate:232-296).  This is the pipeline gate: load only proceeds when
    ``is_valid`` (or the caller explicitly overrides)."""
    checks = {
        "schema": check_schema(star),
        "nulls": check_nulls(star),
        "ranges": check_ranges(star, range_rules),
        "temporal": check_temporal(star),
        "plausibility": check_plausibility(star),
    }
    return {"is_valid": all(c["valid"] for c in checks.values()), "checks": checks}
