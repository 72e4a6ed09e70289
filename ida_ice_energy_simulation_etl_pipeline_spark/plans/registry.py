"""The merged driver-contract query registry."""

from __future__ import annotations

from ..operators import dedup as _dedup
from ..operators import graph as _graph
from ..operators import multimodal as _multimodal
from ..operators import similarity as _similarity
from ..operators import temporal as _temporal
from ..operators import text as _text
from . import analytics as _analytics
from . import relational as _relational
from .core import QuerySpec

_ALL_SPECS: list[QuerySpec] = (
    _relational.SPECS
    + _analytics.SPECS
    + _dedup.SPECS
    + _graph.SPECS
    + _similarity.SPECS
    + _temporal.SPECS
    + _text.SPECS
    + _multimodal.SPECS
)

QUERIES: dict[str, QuerySpec] = {s.name: s for s in _ALL_SPECS}

assert len(QUERIES) == len(_ALL_SPECS), "duplicate query names in registry"
