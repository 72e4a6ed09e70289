"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``ida_ice_energy_simulation_etl_pipeline_spark``;
this module just adapts the package's QuerySpec registry to the driver's
three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the multi-way star join + group-by that mirrors the
    reference's vw_hvac_with_meters view) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ALL_QUERIES: the flagship lives in the locally-verified extra tier
    # since the round-7 rotation (6 green driver rounds, r1–r6); entry()
    # keeps smoking it every round regardless of tier.
    return ALL_QUERIES["region_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for the
    non-SQL-expressible ops → driver records rows-only checks)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
