"""ETL pipeline tests over reference-shaped fixtures (SURVEY.md §5 model:
fixture-in / DataFrame-out assertions + mutation testing for validators)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.etl.export import (
    build_summary,
    validate_summary,
)
from ida_ice_energy_simulation_etl_pipeline_spark.etl.extract import (
    ExtractionError,
    check_run_coverage,
    extract_run_by_id,
    extract_runs,
    extract_runs_from_zips,
    parse_run_id,
)
from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
    load_to_parquet,
    query,
    register_temp_views,
)
from ida_ice_energy_simulation_etl_pipeline_spark.etl.pipeline import (
    ValidationGateError,
    run_pipeline,
)
from ida_ice_energy_simulation_etl_pipeline_spark.etl.transform import (
    build_dim_time,
    transform_all,
)
from ida_ice_energy_simulation_etl_pipeline_spark.etl.validate import validate_all
from ida_ice_energy_simulation_etl_pipeline_spark.fixtures import generate_dataset

HOURS = 48
N_ZONES = 3
N_AHUS = 2
BUILDINGS = ("BLDG_01", "BLDG_02")
SCENARIOS = ("BASE", "RETROFIT")
N_RUNS = len(BUILDINGS) * len(SCENARIOS)


@pytest.fixture(scope="module")
def runs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("runs")
    generate_dataset(
        d, buildings=BUILDINGS, scenarios=SCENARIOS, hours=HOURS,
        n_zones=N_ZONES, n_ahus=N_AHUS,
    )
    return d


@pytest.fixture(scope="module")
def entities(spark, runs_dir):
    return extract_runs(spark, runs_dir)


@pytest.fixture(scope="module")
def star(entities):
    return transform_all(entities)


def test_parse_run_id():
    assert parse_run_id("run_BLDG_01_BASE") == ("BLDG_01", "BASE")
    assert parse_run_id("run_B_RETROFIT") == ("B", "RETROFIT")


def test_extract_counts(entities):
    assert entities["zones"].count() == N_RUNS * HOURS * N_ZONES
    assert entities["hvac"].count() == N_RUNS * HOURS * N_AHUS
    assert entities["meters"].count() == N_RUNS * HOURS
    assert entities["metadata"].count() == N_RUNS
    # timestamps parsed, not strings
    assert dict(entities["zones"].dtypes)["timestamp"] == "timestamp"


def test_extract_zip_roundtrip(spark, tmp_path):
    generate_dataset(
        tmp_path, buildings=("BLDG_09",), scenarios=("BASE",), hours=12,
        n_zones=2, n_ahus=1, as_zip=True,
    )
    assert (tmp_path / "run_BLDG_09_BASE.zip").exists()
    ents = extract_runs_from_zips(spark, tmp_path, staging_dir=tmp_path / "staged")
    assert ents["zones"].count() == 12 * 2


def test_extract_missing_dir(spark, tmp_path):
    with pytest.raises(ExtractionError):
        extract_runs(spark, tmp_path / "nope")


def test_run_coverage_breaker(entities):
    meters = entities["meters"]
    # all expected runs present → no trip
    check_run_coverage(meters, ["run_BLDG_01_BASE"])
    # majority missing → trips with a bounded failure sample
    phantom = [f"run_PHANTOM_{i:02d}_BASE" for i in range(9)]
    with pytest.raises(ExtractionError, match="runs unreadable"):
        check_run_coverage(meters, ["run_BLDG_01_BASE", *phantom])


def test_run_coverage_empty_manifest(entities):
    # Empty expected set: nothing can have failed — must return cleanly,
    # not crash on createDataFrame schema inference (r3 advice item).
    check_run_coverage(entities["meters"], [])


def test_extract_run_by_id(spark, runs_dir):
    one = extract_run_by_id(spark, runs_dir, "BLDG_01", "BASE")
    assert one["meters"].count() == HOURS
    with pytest.raises(FileNotFoundError):
        extract_run_by_id(spark, runs_dir, "BLDG_99", "BASE")


def test_dims(star):
    assert star["dim_building"].count() == len(BUILDINGS)
    assert star["dim_scenario"].count() == len(SCENARIOS)
    assert star["dim_zone"].count() == len(BUILDINGS) * N_ZONES
    assert star["dim_ahu"].count() == len(BUILDINGS) * N_AHUS
    assert star["dim_time"].count() == HOURS
    # dense surrogate keys are 1..n
    keys = [r["zone_key"] for r in star["dim_zone"].orderBy("zone_key").collect()]
    assert keys == list(range(1, len(keys) + 1))


def test_dim_time_fields(star):
    row = star["dim_time"].orderBy("time_key").first()
    assert row["time_key"] == 1
    assert row["dow"] == 0  # 2024-01-01 is a Monday (pandas convention)
    assert row["is_weekend"] is False
    assert row["hour"] == 0


def test_dim_time_derived_strategy(entities):
    dt = build_dim_time(entities["zones"], key_strategy="derived")
    rows = dt.orderBy("timestamp").collect()
    # derived keys are consecutive hours since epoch: join-stable arithmetic
    assert rows[1]["time_key"] - rows[0]["time_key"] == 1
    assert rows[0]["time_key"] == rows[0]["timestamp"].timestamp() // 3600


def test_facts(star):
    assert star["fact_zone_conditions"].count() == N_RUNS * HOURS * N_ZONES
    assert star["fact_hvac"].count() == N_RUNS * HOURS * N_AHUS
    assert star["fact_meters"].count() == N_RUNS * HOURS
    assert star["fact_weather"].count() == len(BUILDINGS) * HOURS
    # no dangling dim keys (left-join RI preserved)
    assert star["fact_zone_conditions"].filter(F.col("zone_key").isNull()).count() == 0
    assert star["fact_hvac"].filter(F.col("time_key").isNull()).count() == 0


def test_cop_proxy_null_semantics(star):
    hv = star["fact_hvac"]
    assert hv.filter((F.col("power_kw") < 1.0) & F.col("cop_proxy").isNotNull()).count() == 0
    assert hv.filter((F.col("power_kw") >= 1.0) & F.col("cop_proxy").isNull()).count() == 0


def test_validate_clean(star):
    report = validate_all(star)
    assert report["is_valid"], json.dumps(report, indent=2)


def test_validate_mutations(spark, star):
    # out-of-range temperature
    bad = dict(star)
    bad["fact_zone_conditions"] = star["fact_zone_conditions"].withColumn(
        "air_temp_C", F.lit(99.0)
    )
    rep = validate_all(bad)
    assert not rep["is_valid"]
    assert not rep["checks"]["ranges"]["valid"]

    # nulls in a required column
    bad2 = dict(star)
    bad2["fact_meters"] = star["fact_meters"].withColumn(
        "electric_kwh", F.lit(None).cast("double")
    )
    rep2 = validate_all(bad2)
    assert not rep2["checks"]["nulls"]["valid"]

    # temporal gap: drop half the hours from one fact
    bad3 = dict(star)
    bad3["fact_meters"] = star["fact_meters"].filter(F.col("time_key") <= HOURS // 2)
    rep3 = validate_all(bad3)
    assert not rep3["checks"]["temporal"]["valid"]

    # implausible energy: electric zeroed
    bad4 = dict(star)
    bad4["fact_meters"] = star["fact_meters"].withColumn("electric_kwh", F.lit(0.0))
    rep4 = validate_all(bad4)
    assert not rep4["checks"]["plausibility"]["valid"]


def test_views_and_query(spark, star):
    register_temp_views(spark, star)
    zw = query(spark, "SELECT * FROM vw_zone_with_weather")
    assert zw.count() == N_RUNS * HOURS * N_ZONES
    assert "temp_deviation" in zw.columns and "drybulb_C" in zw.columns
    assert "is_weekend" in zw.columns and "building_name" in zw.columns

    hm = query(spark, "SELECT * FROM vw_hvac_with_meters")
    assert hm.count() == N_RUNS * HOURS * N_AHUS
    assert "electric_kwh" in hm.columns and "outdoor_rh_pct" in hm.columns

    es = query(
        spark,
        "SELECT * FROM vw_energy_summary ORDER BY building_id, scenario_id",
    ).collect()
    assert len(es) == N_RUNS
    assert all(r["num_hours"] == HOURS for r in es)
    assert all(r["total_electric_kwh"] > 0 for r in es)

    # README-style analysis queries run through the same entry point
    comfort = query(
        spark,
        """
        SELECT building_id, zone_id, scenario_id,
               SUM(CASE WHEN ABS(temp_deviation) > 1.0 THEN 1 ELSE 0 END) AS n_violations
        FROM vw_zone_with_weather
        GROUP BY building_id, zone_id, scenario_id
        """,
    )
    assert comfort.count() == len(BUILDINGS) * N_ZONES * len(SCENARIOS)

    cop = query(
        spark,
        """
        SELECT ROUND(outdoor_temp_C, 0) AS temp_bin, AVG(cop_proxy) AS avg_cop, COUNT(*) AS n
        FROM vw_hvac_with_meters WHERE power_kw > 0
        GROUP BY ROUND(outdoor_temp_C, 0) ORDER BY temp_bin
        """,
    )
    assert cop.count() > 0


def test_parquet_roundtrip(spark, star, tmp_path):
    paths = load_to_parquet(star, tmp_path, partition_facts=True)
    back = spark.read.parquet(paths["fact_meters"])
    assert back.count() == star["fact_meters"].count()
    assert "building_id" in back.columns  # partition column round-trips


def test_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    """sort_within range-clusters the table on the key: every output
    file's [min, max] key interval must be pairwise disjoint (that is
    what lets a pushed-down range predicate prune whole files), where an
    unclustered write leaves overlapping file ranges."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "value"
    )
    # round-robin partitions: the unclustered baseline layout
    scattered = events.repartition(4)

    def file_ranges(path):
        ranges = []
        for f in sorted(Path(path).glob("part-*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index("event_id")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        return sorted(ranges)

    def n_overlaps(ranges):
        return sum(
            1
            for i in range(len(ranges) - 1)
            if ranges[i + 1][0] <= ranges[i][1]
        )

    load_to_parquet({"ev_plain": scattered}, tmp_path)
    # at fixture size AQE rightly coalesces the tiny range shuffle to one
    # partition; disable coalescing so the multi-file layout is visible
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        load_to_parquet(
            {"ev_sorted": scattered},
            tmp_path,
            sort_within={"ev_sorted": ["event_id"]},
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    plain = file_ranges(tmp_path / "ev_plain")
    clustered = file_ranges(tmp_path / "ev_sorted")
    assert len(clustered) > 1, "need multiple files to show clustering"
    assert n_overlaps(clustered) == 0, f"clustered files overlap: {clustered}"
    assert n_overlaps(plain) > 0, "baseline already disjoint; test is vacuous"
    # row counts survive the re-layout
    assert (
        spark.read.parquet(str(tmp_path / "ev_sorted")).count() == events.count()
    )


def test_export_summary(star):
    doc = build_summary(star, scenario_id="BASE")
    assert validate_summary(doc) == []
    assert doc["scenario"]["name"] == "BASE"
    assert doc["annual"]["total_kwh"] > 0
    assert len(doc["monthly_breakdown"]) == 1  # 48h span = one month
    assert doc["kpis"]["peak_demand_kw"] > 0
    assert 0 <= doc["kpis"]["comfort_hours_percent"] <= 100
    # retrofit uses less energy than base (generator scales by 0.85)
    retro = build_summary(star, scenario_id="RETROFIT")
    assert retro["annual"]["total_kwh"] < doc["annual"]["total_kwh"]


def test_export_annual_includes_null_time_key_rows(spark, star):
    """fact_meters is time-keyed by a LEFT join, so rows can carry a null
    time_key; the annual figures must still count them (the reference's
    annual numbers are whole-table sums), while the monthly breakdown
    keeps only real months."""
    from pyspark.sql import functions as F

    base = build_summary(star, scenario_id="BASE")
    meters = star["fact_meters"]
    extra = (
        meters.filter(F.col("scenario_id") == "BASE")
        .limit(1)
        .withColumn("time_key", F.lit(None).cast(dict(meters.dtypes)["time_key"]))
        .withColumn("electric_kwh", F.lit(1000.0))
        .withColumn("heating_kwh", F.lit(0.0))
        .withColumn("cooling_kwh", F.lit(0.0))
    )
    doc = build_summary(
        dict(star, fact_meters=meters.unionByName(extra)), scenario_id="BASE"
    )
    assert doc["annual"]["electric_kwh"] == pytest.approx(
        base["annual"]["electric_kwh"] + 1000.0, abs=0.2
    )
    assert doc["monthly_breakdown"] == base["monthly_breakdown"]


def test_pipeline_end_to_end(spark, runs_dir, tmp_path):
    # cluster_facts exercises the range-clustered write path end-to-end
    result = run_pipeline(spark, runs_dir, tmp_path / "out", cluster_facts=True)
    assert result["validation"]["is_valid"]
    assert (tmp_path / "out" / "summary.json").exists()
    assert (tmp_path / "out" / "validation_report.json").exists()
    assert spark.read.parquet(result["parquet"]["fact_hvac"]).count() > 0


def test_pipeline_gate_blocks(spark, tmp_path):
    # a dataset whose meters are implausible (electric ~ 0) must be gated
    import pandas as pd

    from ida_ice_energy_simulation_etl_pipeline_spark.fixtures import (
        generate_run,
        write_run_dir,
    )

    run = generate_run("BLDG_BAD", "BASE", hours=12, n_zones=1, n_ahus=1)
    meters = run["meters"]
    assert isinstance(meters, pd.DataFrame)
    meters["electric_kwh"] = 0.0
    write_run_dir(run, tmp_path)
    with pytest.raises(ValidationGateError):
        run_pipeline(spark, tmp_path, tmp_path / "out")


def test_merge_upsert_parquet_touches_only_batch_partitions(spark, tmp_path):
    import os

    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        merge_upsert_parquet,
    )

    path = tmp_path / "meters"
    base = spark.createDataFrame(
        [
            ("B1", "t1", 10.0, "2026-01-01"),
            ("B1", "t2", 11.0, "2026-01-01"),
            ("B2", "t1", 20.0, "2026-01-02"),
            ("B2", "t2", 21.0, "2026-01-02"),
        ],
        ["building_id", "ts", "kwh", "ds"],
    )
    touched = merge_upsert_parquet(
        spark, base, path, keys=["building_id", "ts"], partition_col="ds"
    )
    assert touched == ["2026-01-01", "2026-01-02"]

    def files_of(ds):
        d = path / f"ds={ds}"
        return {
            f: os.path.getmtime(d / f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    day1_before = files_of("2026-01-01")
    # batch: update one key in day 2, insert one new key in day 2
    batch = spark.createDataFrame(
        [
            ("B2", "t2", 99.0, "2026-01-02"),  # update
            ("B2", "t3", 22.0, "2026-01-02"),  # insert
        ],
        ["building_id", "ts", "kwh", "ds"],
    )
    touched = merge_upsert_parquet(
        spark, batch, path, keys=["building_id", "ts"], partition_col="ds"
    )
    assert touched == ["2026-01-02"]
    # untouched partition: same files, same mtimes (no rewrite)
    assert files_of("2026-01-01") == day1_before
    got = {
        (r["building_id"], r["ts"]): r["kwh"]
        for r in spark.read.parquet(str(path)).collect()
    }
    assert got == {
        ("B1", "t1"): 10.0,
        ("B1", "t2"): 11.0,
        ("B2", "t1"): 20.0,  # survivor in the touched partition
        ("B2", "t2"): 99.0,  # updated
        ("B2", "t3"): 22.0,  # inserted
    }


def test_compact_parquet_binpacks_and_preserves_rows(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        compact_parquet,
    )

    path = tmp_path / "events_landing"
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    # simulate a fragmented streaming landing zone: 64 tiny files
    df.repartition(64).write.parquet(str(path))
    import os

    n_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert n_before >= 32
    stats = compact_parquet(spark, path, target_mb=128, sort_by=["id"])
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1  # tiny data -> one right-sized file
    out = spark.read.parquet(str(path))
    assert out.count() == 10000
    assert out.agg(F.sum("v")).first()[0] == 2 * sum(range(10000))


def test_zorder_narrows_file_stats_on_both_columns(spark, tmp_path):
    """Z-order vs linear sort on a 2-D uniform grid: the linear layout
    narrows per-file min/max only on its sort column, z-order on BOTH —
    the property parquet data skipping actually uses."""
    import pyarrow.parquet as pq

    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        zorder_cluster,
    )

    grid = (
        spark.range(0, 64)
        .withColumnRenamed("id", "x")
        .crossJoin(spark.range(0, 64).withColumnRenamed("id", "y"))
    )

    def mean_frac(path, col):
        """Mean fraction of the global [0,63] range a file's stats cover."""
        fracs = []
        for f in (tmp_path / path).rglob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            fracs.append((hi - lo) / 63.0)
        return sum(fracs) / len(fracs)

    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        str(tmp_path / "linear")
    )
    zorder_cluster(grid, ["x", "y"], n_files=16).write.parquet(
        str(tmp_path / "zorder")
    )
    # linear: x narrow, y full-range
    assert mean_frac("linear", "x") < 0.2
    assert mean_frac("linear", "y") > 0.9
    # z-order: BOTH columns substantially narrowed
    assert mean_frac("zorder", "x") < 0.5
    assert mean_frac("zorder", "y") < 0.5


def test_merge_upsert_preserves_null_partition_survivors(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        merge_upsert_parquet,
    )

    path = tmp_path / "t"
    base = spark.createDataFrame(
        [("A", 1.0, None), ("B", 2.0, None), ("C", 3.0, "2026-01-01")],
        "k string, v double, ds string",
    )
    merge_upsert_parquet(spark, base, path, keys=["k"], partition_col="ds")
    batch = spark.createDataFrame([("D", 4.0, None)], "k string, v double, ds string")
    merge_upsert_parquet(spark, batch, path, keys=["k"], partition_col="ds")
    got = {r["k"]: r["v"] for r in spark.read.parquet(str(path)).collect()}
    # A and B lived in the null partition the batch touched: they must
    # survive the dynamic overwrite of __HIVE_DEFAULT_PARTITION__
    assert got == {"A": 1.0, "B": 2.0, "C": 3.0, "D": 4.0}


def test_compact_parquet_preserves_hive_partition_layout(spark, tmp_path):
    import os

    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        compact_parquet,
        merge_upsert_parquet,
    )

    path = tmp_path / "t"
    base = spark.createDataFrame(
        [(f"k{i}", float(i), f"2026-01-0{1 + i % 2}") for i in range(20)],
        "k string, v double, ds string",
    ).repartition(8)
    base.write.partitionBy("ds").parquet(str(path))
    compact_parquet(spark, path, target_mb=128)
    # layout preserved: ds=... dirs remain, no root-level data files
    root_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert root_files == []
    assert sorted(d for d in os.listdir(path) if d.startswith("ds=")) == [
        "ds=2026-01-01",
        "ds=2026-01-02",
    ]
    # and a subsequent MERGE still works against the compacted table
    batch = spark.createDataFrame(
        [("k0", 99.0, "2026-01-01")], "k string, v double, ds string"
    )
    merge_upsert_parquet(spark, batch, path, keys=["k"], partition_col="ds")
    got = {r["k"]: r["v"] for r in spark.read.parquet(str(path)).collect()}
    assert len(got) == 20 and got["k0"] == 99.0


def test_vacuum_partitions_drops_expired_only(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        vacuum_partitions,
    )

    path = tmp_path / "t"
    spark.createDataFrame(
        [(i, f"2026-01-0{1 + i % 3}") for i in range(9)], "k long, ds string"
    ).write.partitionBy("ds").parquet(str(path))
    dropped = vacuum_partitions(path, "ds", keep=lambda ds: ds >= "2026-01-02")
    assert dropped == ["2026-01-01"]
    # Spark infers the partition dir values as DATE — compare as strings
    got = {str(r["ds"]) for r in spark.read.parquet(str(path)).collect()}
    assert got == {"2026-01-02", "2026-01-03"}


def test_compact_refuses_when_both_table_and_retired_exist(spark, tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        compact_parquet,
        merge_upsert_parquet,
    )

    path = tmp_path / "t"
    spark.range(10).write.parquet(str(path))
    retired = tmp_path / "t._retired"
    retired.mkdir()
    (retired / "stale.parquet").write_bytes(b"x")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="reconcile"):
        compact_parquet(spark, path)
    batch = spark.createDataFrame([(1, "a")], "k long, ds string")
    with _pytest.raises(RuntimeError, match="reconcile"):
        merge_upsert_parquet(spark, batch, path, keys=["k"], partition_col="ds")


def test_vacuum_decides_before_deleting_and_skips_missing(tmp_path):
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        vacuum_partitions,
    )

    assert vacuum_partitions(tmp_path / "absent", "ds", keep=lambda v: True) == []
    path = tmp_path / "t"
    for ds in ("2026-01-01", "__HIVE_DEFAULT_PARTITION__", "2026-03-01"):
        (path / f"ds={ds}").mkdir(parents=True)

    def raising_keep(v):
        if v.startswith("__"):
            raise ValueError(v)
        return v >= "2026-02-01"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        vacuum_partitions(path, "ds", keep=raising_keep)
    # decide-first: NOTHING was deleted despite 2026-01-01 failing keep
    assert sorted(d.name for d in path.iterdir()) == [
        "ds=2026-01-01",
        "ds=2026-03-01",
        "ds=__HIVE_DEFAULT_PARTITION__",
    ]


def test_compact_splits_oversized_partition_and_respects_sort(spark, tmp_path):
    """A single huge Hive partition must be rewritten by MULTIPLE tasks
    into multiple target-sized files, not one unbounded file."""
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        compact_parquet,
    )

    path = tmp_path / "t"
    df = (
        spark.range(0, 200_000)
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        .withColumn("ds", F.lit("2026-01-01"))
    )
    df.repartition(16).write.partitionBy("ds").parquet(str(path))
    # ~14 MB of payload in ONE partition; 1 MB target => many files
    stats = compact_parquet(spark, path, target_mb=1)
    import os

    part = path / "ds=2026-01-01"
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) >= 4, f"partition not split: {len(files)} file(s)"
    assert spark.read.parquet(str(path)).count() == 200_000


def test_snapshot_diff_classifies_added_removed_changed(spark, tmp_path):
    """CDC diff of two snapshots: keys only in new -> added, only in old
    -> removed, both-with-different-payload -> changed, else unchanged."""
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)], ["id", "s", "v"]
    )
    old.write.parquet(str(tmp_path / "old"))
    new.write.parquet(str(tmp_path / "new"))
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            spark, tmp_path / "old", tmp_path / "new", ["id"]
        ).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_swaps_and_schema_evolution(spark, tmp_path):
    """A NULL moving between adjacent columns is a CHANGE (a string-concat
    hash would silently drop the NULL and call it unchanged), and a column
    added in the new snapshot must not crash the diff — it is excluded
    from the default comparison set."""
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "same", "v")], ["id", "s", "v"]
    )
    new = spark.createDataFrame(
        [(1, "x", None, 9.0), (2, "same", "v", 9.0)], ["id", "s", "v", "w"]
    )
    old.write.parquet(str(tmp_path / "old"))
    new.write.parquet(str(tmp_path / "new"))
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            spark, tmp_path / "old", tmp_path / "new", ["id"]
        ).collect()
    }
    assert got == {1: "changed", 2: "unchanged"}


def _assert_columns_match(a, b, label):
    """Dtype-dispatched column-by-column equality for two row-aligned
    pandas frames (floats at atol=1e-9, timestamps tz-normalized) —
    shared by every cross-implementation parity test."""
    import pandas as pd

    assert len(a) == len(b), label
    for c in b.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(bv):
            pd.testing.assert_series_equal(
                av.astype("float64"), bv.astype("float64"),
                check_names=False, rtol=0, atol=1e-9, obj=f"{label}.{c}",
            )
        elif pd.api.types.is_datetime64_any_dtype(bv):
            # same UTC instants; the reference keeps pandas tz-aware UTC
            # while Spark->pandas yields naive UTC wall clock
            norm = lambda s: [  # noqa: E731
                t.tz_localize(None) if t.tzinfo else t
                for t in pd.to_datetime(s)
            ]
            assert norm(av) == norm(bv), f"{label}.{c}"
        else:
            assert list(av) == list(bv), f"{label}.{c}"


def _import_reference(*names):
    """Import symbols from the reference repo read-only, without leaving
    its 'src' package importable afterwards."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        mods = {
            "extract": importlib.import_module("src.etl.extract"),
            "transform": importlib.import_module("src.etl.transform"),
            "load": importlib.import_module("src.etl.load"),
            "validate": importlib.import_module("src.etl.validate"),
        }
        out = []
        for n in names:
            mod, attr = n.split(".")
            out.append(getattr(mods[mod], attr))
        return out
    finally:
        sys.path.remove("/root/reference")
        for m in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[m]


@pytest.fixture(scope="module")
def ref_star(tmp_path_factory):
    """The reference implementation's star schema, computed by RUNNING
    the reference pandas pipeline on a byte-identical zipped fixture
    (same generator params + seed as runs_dir)."""
    ref_extract_runs, ref_transform_all = _import_reference(
        "extract.extract_runs", "transform.transform_all"
    )
    zdir = tmp_path_factory.mktemp("ref_zips")
    generate_dataset(
        zdir, buildings=BUILDINGS, scenarios=SCENARIOS, hours=HOURS,
        n_zones=N_ZONES, n_ahus=N_AHUS, as_zip=True,
    )
    return ref_transform_all(ref_extract_runs(str(zdir)))


def test_star_schema_matches_reference_implementation(spark, star, ref_star):
    """Cross-IMPLEMENTATION parity: execute the reference's own pandas
    pipeline (imported read-only from /root/reference) on an identical
    fixture and compare every dim and fact table value-for-value.  This
    is the strongest parity statement the repo can make about the ETL
    surface — not "matches an oracle we wrote", but "matches the system
    being cloned, run live on the same input"."""
    import pandas as pd

    assert set(ref_star) == set(star)
    for name in sorted(ref_star):
        ref_pdf = ref_star[name]
        ours = star[name].toPandas()
        assert set(ours.columns) == set(ref_pdf.columns), name
        key_cols = [
            c for c in ref_pdf.columns
            if c.endswith("_key") or c.endswith("_id") or c == "timestamp"
        ]
        a = (
            ours[list(ref_pdf.columns)]
            .sort_values(key_cols)
            .reset_index(drop=True)
        )
        b = ref_pdf.sort_values(key_cols).reset_index(drop=True)
        _assert_columns_match(a, b, name)


_VIEWS = ["vw_zone_with_weather", "vw_hvac_with_meters", "vw_energy_summary"]


def test_views_match_reference_implementation(spark, star, ref_star, tmp_path):
    """View-layer cross-implementation parity (J5-J7): load the
    reference's star into DuckDB with the reference's OWN load_to_duckdb
    + create_views, query each view, and compare against our Spark views
    over our star — FULL column-set parity (every column the reference
    view exposes must exist under the same name in ours), value-for-value
    on every reference column."""
    import duckdb
    import pandas as pd

    (ref_load_to_duckdb,) = _import_reference("load.load_to_duckdb")
    db = tmp_path / "ref.duckdb"
    ref_load_to_duckdb(ref_star, str(db))

    register_temp_views(spark, star)
    with duckdb.connect(str(db)) as con:
        for view in _VIEWS:
            ref_pdf = con.execute(f"SELECT * FROM {view}").fetchdf()
            ours = spark.sql(f"SELECT * FROM {view}").toPandas()
            missing = set(ref_pdf.columns) - set(ours.columns)
            assert not missing, (
                f"{view}: reference columns missing from our view: {missing}"
            )
            cols = list(ref_pdf.columns)
            keys = [
                c for c in cols if c.endswith("_id") or c == "timestamp"
            ]
            a = ours[cols].sort_values(keys).reset_index(drop=True)
            b = ref_pdf.sort_values(keys).reset_index(drop=True)
            _assert_columns_match(a, b, view)


# Check-family name map: {reference check key: our check key}.
_VALIDATE_CHECKMAP = {
    "schema": "schema",
    "value_ranges": "ranges",
    "temporal_coverage": "temporal",
    "energy_plausibility": "plausibility",
}


def test_validate_verdicts_match_reference_implementation(spark, star, ref_star):
    """QA-layer cross-implementation parity: the reference's own
    validate_all (pandas) and ours (Spark) must agree check-for-check —
    all green on the clean star, and the SAME family flags under an
    identical planted mutation.  (Our extra 'nulls' family has no
    reference twin; the reference folds null checks into ranges.)"""
    (ref_validate_all,) = _import_reference("validate.validate_all")

    ref_clean = ref_validate_all(ref_star)
    our_clean = validate_all(star)
    assert ref_clean["is_valid"] and our_clean["is_valid"]
    for ref_k, our_k in _VALIDATE_CHECKMAP.items():
        assert ref_clean["checks"][ref_k]["valid"] is True, ref_k
        assert our_clean["checks"][our_k]["valid"] is True, our_k

    # identical mutation on both sides: impossible zone temperature
    ref_bad = dict(ref_star)
    ref_bad["fact_zone_conditions"] = ref_star["fact_zone_conditions"].assign(
        air_temp_C=99.0
    )
    our_bad = dict(star)
    our_bad["fact_zone_conditions"] = star["fact_zone_conditions"].withColumn(
        "air_temp_C", F.lit(99.0)
    )
    ref_rep = ref_validate_all(ref_bad)
    our_rep = validate_all(our_bad)
    assert not ref_rep["is_valid"] and not our_rep["is_valid"]
    assert ref_rep["checks"]["value_ranges"]["valid"] is False
    assert our_rep["checks"]["ranges"]["valid"] is False
    # and the mutation must not bleed into other families on either side
    for ref_k, our_k in _VALIDATE_CHECKMAP.items():
        if ref_k == "value_ranges":
            continue
        assert ref_rep["checks"][ref_k]["valid"] is True, ref_k
        assert our_rep["checks"][our_k]["valid"] is True, our_k


def test_dim_scenario_first_seen_matches_zip_sort_on_prefix_ids(spark):
    """'run_B10_BASE.zip' sorts before 'run_B1_BASE.zip' ('0' < '_'), so
    the reference's seen-set walk keeps B10's description; the min_by
    order key must reconstruct the filename, not compare bare ids."""
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.transform import (
        build_dim_scenario,
    )

    meta = spark.createDataFrame(
        [
            ("B1", "BASE", "BASE scenario for B1"),
            ("B10", "BASE", "BASE scenario for B10"),
        ],
        ["building_id", "scenario_id", "description"],
    )
    got = build_dim_scenario(meta).collect()
    assert len(got) == 1
    assert got[0]["description"] == "BASE scenario for B10"


def test_orc_star_roundtrip(spark, star, tmp_path):
    """file_format='orc': same loader, same layout levers, ORC's
    columnar min-max skipping — every table round-trips value-equal."""
    from ida_ice_energy_simulation_etl_pipeline_spark.etl.load import (
        load_to_parquet as load_star,
    )

    paths = load_star(star, tmp_path / "orc_out", file_format="orc")
    assert set(paths) == set(star)
    for table, path in paths.items():
        back = spark.read.orc(path)
        assert sorted(map(repr, back.collect())) == sorted(
            map(repr, star[table].collect())
        ), table
    with pytest.raises(ValueError, match="file_format"):
        load_star(star, tmp_path / "avro_out", file_format="avro")
