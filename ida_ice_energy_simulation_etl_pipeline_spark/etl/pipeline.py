"""Pipeline orchestration: extract → transform → validate (gate) → load →
export (reference run_pipeline.py:25-157).

The interactive continue-despite-validation prompt (run_pipeline.py:106-120)
has no place in a cluster job — only the explicit ``force`` flag overrides
the gate (the reference's ``--non-interactive`` abort semantics otherwise).
"""

from __future__ import annotations

import argparse
import json
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import SparkSession

from ..session import get_spark
from .export import export_summary
from .extract import (
    check_run_coverage,
    extract_runs,
    extract_runs_from_zips,
    list_runs,
)
from .load import load_to_parquet, load_to_warehouse, register_temp_views
from .transform import transform_all
from .validate import validate_all


class ValidationGateError(RuntimeError):
    def __init__(self, report: dict):
        self.report = report
        failed = [k for k, v in report["checks"].items() if not v["valid"]]
        super().__init__(f"validation failed: {failed}")


def run_pipeline(
    spark: SparkSession,
    input_dir: str | Path,
    output_dir: str | Path,
    *,
    zipped: bool = False,
    force: bool = False,
    to_warehouse: bool = False,
    partition_facts: bool = False,
    cluster_facts: bool = False,
    time_key_strategy: str = "dense",
    scenario_id: str | None = None,
    range_rules: dict | None = None,
) -> dict:
    """Full batch run; returns the validation report + artifact paths."""
    output_dir = Path(output_dir)
    extractor = extract_runs_from_zips if zipped else extract_runs
    # check_runs=False: the >50%-unreadable circuit breaker re-runs below
    # against the LANDED fact_meters — same gate, but the distinct runs on
    # pruned parquet instead of costing a dedicated full-CSV scan job.
    entities = extractor(spark, input_dir, check_runs=False)
    expected_run_ids = list_runs(input_dir)

    star = transform_all(entities, time_key_strategy=time_key_strategy)

    # Land → validate → publish.  The conformed star is computed EXACTLY
    # once — written straight to a staging directory — and every
    # downstream action (validation aggregates, views, export) reads the
    # landed parquet, which is columnar, pruned, and ~10× faster to
    # re-scan than re-running the CSV conform lineage per action.  The
    # validation gate then decides whether staging is PUBLISHED (atomic
    # directory rename) — same observable contract as the reference's
    # validate-before-load (run_pipeline.py:95-125): nothing appears at
    # the published path unless the gate passes.  This is also the shape
    # that survives 100 TB, where caching the star in executor memory is
    # not an option.
    staging = output_dir / "parquet._staging"
    # Dims sit in every fact's lineage (broadcast joins), so without
    # pinning, each fact write re-derives the distinct/window dim builds
    # from raw CSV.  Cache + materialize them up front (concurrently —
    # they are independent small jobs); they are dim-scale by construction
    # so executor memory is never a concern, 100 TB facts included.
    dims = [t for t in star if t.startswith("dim_")]
    for t in dims:
        star[t] = star[t].cache()
    with ThreadPoolExecutor(max_workers=len(dims) or 1) as pool:
        list(pool.map(lambda t: star[t].count(), dims))
    # Time-range queries dominate the analytic surface (monthly rollups,
    # gap scans, as-of lookups), so fact files are range-clustered on
    # time_key when requested: disjoint per-file min/max intervals let
    # pushed-down time predicates skip whole files (see load_to_parquet).
    sort_within = (
        {t: ["time_key"] for t in ("fact_meters", "fact_hvac", "fact_zone_conditions")}
        if cluster_facts
        else None
    )
    try:
        load_to_parquet(
            star, staging, partition_facts=partition_facts, sort_within=sort_within
        )
    finally:
        for t in dims:
            star[t].unpersist()
    landed = {t: spark.read.parquet(str(staging / t)) for t in star}

    check_run_coverage(landed["fact_meters"], expected_run_ids)
    report = validate_all(landed, range_rules=range_rules)
    if not report["is_valid"] and not force:
        raise ValidationGateError(report)  # staging left behind for triage

    final = output_dir / "parquet"
    if final.exists():
        shutil.rmtree(final)
    staging.rename(final)
    paths = {t: str(final / t) for t in star}
    published = {t: spark.read.parquet(p) for t, p in paths.items()}

    if to_warehouse:
        load_to_warehouse(spark, published)
    else:
        register_temp_views(spark, published)

    summary = export_summary(
        published, output_dir / "summary.json", scenario_id=scenario_id
    )
    (output_dir / "validation_report.json").write_text(json.dumps(report, indent=2))
    return {
        "validation": report,
        "parquet": paths,
        "summary": summary,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="IDA-ICE energy ETL (PySpark)")
    ap.add_argument("--config", default=None, help="YAML config (CLI flags override)")
    ap.add_argument("--input", default=None, help="directory of run_* bundles")
    ap.add_argument("--output", default=None, help="output directory")
    ap.add_argument("--zipped", action="store_true", help="inputs are run_*.zip")
    ap.add_argument("--force", action="store_true", help="load despite validation failures")
    ap.add_argument("--warehouse", action="store_true", help="saveAsTable instead of temp views")
    ap.add_argument("--partition-facts", action="store_true")
    ap.add_argument(
        "--cluster-facts",
        action="store_true",
        help="range-cluster time-keyed fact files on time_key (file-level skipping)",
    )
    ap.add_argument("--time-key-strategy", choices=("dense", "derived"), default=None)
    ap.add_argument("--scenario", default=None)
    args = ap.parse_args(argv)

    from ..config import PipelineConfig, load_config, range_rules_from_config

    cfg = load_config(args.config) if args.config else PipelineConfig()
    input_dir = args.input or cfg.input_dir
    output_dir = args.output or cfg.output_dir
    if not input_dir or not output_dir:
        ap.error("--input/--output required (directly or via --config)")

    spark = get_spark(
        app_name="ida-ice-etl", shuffle_partitions=cfg.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        result = run_pipeline(
            spark,
            input_dir,
            output_dir,
            zipped=args.zipped or cfg.zipped,
            force=args.force or cfg.force,
            to_warehouse=args.warehouse or cfg.to_warehouse,
            partition_facts=args.partition_facts or cfg.partition_facts,
            cluster_facts=args.cluster_facts or cfg.cluster_facts,
            time_key_strategy=args.time_key_strategy or cfg.time_key_strategy,
            scenario_id=args.scenario or cfg.scenario_id,
            range_rules=range_rules_from_config(cfg),
        )
    except ValidationGateError as exc:
        print(json.dumps(exc.report, indent=2))
        return 1
    print(json.dumps({"ok": True, "parquet": result["parquet"]}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
