"""Analytical query plans + the driver-contract registry.

``registry.QUERIES`` maps query name → QuerySpec (PySpark builder +
equivalent DuckDB oracle SQL).  Every operator family from SURVEY.md §2 has
at least one entry here, expressed over the driver's TPC-H-ish fixture
tables.
"""

from .core import QuerySpec, load_table, register_views
from .registry import QUERIES

__all__ = ["QuerySpec", "QUERIES", "load_table", "register_views"]
