"""Reference-parity ETL: extract → transform → validate → load → export.

Spark-first re-expression of the reference pipeline
(/root/reference/run_pipeline.py:25-157): instead of per-run pandas dicts
looped in Python, each entity (zones/hvac/meters/weather/metadata) is ONE
DataFrame across all runs, carrying run identity as columns — so the same
code ingests 6 runs or 6 million.
"""

from .extract import extract_run_by_id, extract_runs, extract_runs_from_zips
from .transform import transform_all
from .validate import validate_all
from .load import create_views, load_to_parquet, load_to_warehouse, query
from .export import build_summary, export_summary, validate_summary
from .pipeline import run_pipeline

__all__ = [
    "extract_runs",
    "extract_runs_from_zips",
    "extract_run_by_id",
    "transform_all",
    "validate_all",
    "load_to_parquet",
    "load_to_warehouse",
    "create_views",
    "query",
    "build_summary",
    "export_summary",
    "validate_summary",
    "run_pipeline",
]
