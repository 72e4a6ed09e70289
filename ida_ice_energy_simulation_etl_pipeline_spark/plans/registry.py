"""The merged driver-contract query registry.

Two tiers:

* ``QUERIES`` — the driver-facing set.  The driver verifies only the
  FIRST 50 entries of ``__spark_entry__.queries()``, so this tier is kept
  strictly ≤ 50 (asserted below): every driver-facing query gets a hard
  CORRECTNESS row every round.
* ``EXTRA_QUERIES`` — overlap/standalone-half queries demoted out of the
  driver window.  Same QuerySpec contract, still oracle-verified by
  tests/test_oracle_parity.py and runnable by bench.py; just not part of
  the driver contract (adding queries here can never evict a verified
  driver entry).
"""

from __future__ import annotations

from ..corpus import pipeline as _corpus
from ..operators import dedup as _dedup
from ..operators import graph as _graph
from ..operators import linkage as _linkage
from ..operators import multimodal as _multimodal
from ..operators import similarity as _similarity
from ..operators import skew as _skew
from ..operators import temporal as _temporal
from ..operators import text as _text
from . import analytics as _analytics
from . import relational as _relational
from .core import QuerySpec

DRIVER_WINDOW = 50

_MODULES = (
    _relational,
    _analytics,
    _dedup,
    _graph,
    _similarity,
    _temporal,
    _linkage,
    _skew,
    _text,
    _multimodal,
    _corpus,
)

_ALL_SPECS: list[QuerySpec] = [
    s for m in _MODULES for s in getattr(m, "SPECS", [])
]
_EXTRA_SPECS: list[QuerySpec] = [
    s for m in _MODULES for s in getattr(m, "EXTRA_SPECS", [])
]

QUERIES: dict[str, QuerySpec] = {s.name: s for s in _ALL_SPECS}
EXTRA_QUERIES: dict[str, QuerySpec] = {s.name: s for s in _EXTRA_SPECS}

assert len(QUERIES) == len(_ALL_SPECS), "duplicate query names in registry"
assert len(EXTRA_QUERIES) == len(_EXTRA_SPECS), "duplicate extra query names"
assert not (QUERIES.keys() & EXTRA_QUERIES.keys()), "name in both tiers"
assert len(QUERIES) <= DRIVER_WINDOW, (
    f"driver-facing registry has {len(QUERIES)} queries; the driver only "
    f"verifies the first {DRIVER_WINDOW} — demote overlap queries to "
    "EXTRA_SPECS instead"
)

# Everything, for local verification and benchmarking.
ALL_QUERIES: dict[str, QuerySpec] = {**QUERIES, **EXTRA_QUERIES}
