"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles moderate skew
automatically, but a single pathological hot key — one building_id with
half the rows, one document shingle shared corpus-wide — can exceed what
partition-splitting fixes, because every row of the hot key still meets
every matching build row.  Salting is the explicit remedy:

* ``salted_join``: the large (skewed) side gets a uniform random salt in
  [0, n); the small side is replicated once per salt value.  The shuffle
  key becomes (key, salt) so a hot key spreads over n reducers.  Join
  output is IDENTICAL to the unsalted join — salt only load-balances.
* ``salted_agg``: pre-aggregate on (keys, salt), then finish on keys.
  Both phases are hash aggregates with map-side combine; the salt bounds
  the per-reducer group size in phase 1.

Both are pure DataFrame compositions — no RDDs, no UDFs — so Catalyst
still prunes/pushes through them.  Salt values never reach the result,
so determinism of outputs is unaffected by the RNG.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.core import QuerySpec, load_table

DEFAULT_SALTS = 8
_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join robust to hot keys on the large side.

    ``large`` is salted row-wise; ``small`` is exploded n_salts× (do NOT
    pass a big table as ``small`` — its shuffle volume multiplies by
    n_salts).  Result equals ``large.join(small, on, how)`` exactly.
    """
    salted_large = large.withColumn(
        _SALT, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    exploded_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(exploded_small, [*on, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    n_salts: int = DEFAULT_SALTS,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column name → aggregate over the input (only
    decomposable aggregates: sum / count / min / max).  Phase 1 computes
    them per (keys, salt); phase 2 re-combines per keys with ``sum`` for
    sum/count outputs and min/max for the rest — pass ``combine`` names
    via the column's metadata-free convention: this helper recombines
    everything with SUM except columns named ``min_*`` / ``max_*``.
    """
    salted = df.withColumn(_SALT, F.floor(F.rand(seed) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )

    def _combine(name: str) -> Column:
        if name.startswith("min_"):
            return F.min(name).alias(name)
        if name.startswith("max_"):
            return F.max(name).alias(name)
        return F.sum(name).alias(name)

    return phase1.groupBy(*keys).agg(*[_combine(name) for name in aggs])


# --------------------------------------------------------------------------
# Registered query: the salted rollup as a driver-verifiable operator.
# The salt is rand(seed) — partition-layout-dependent — but the OUTPUT is
# salt-invariant (sums/counts/min/max recombine exactly), so a plain
# GROUP BY oracle hash-matches it: the determinism claim in the module
# docstring gets a cross-engine proof, not just a local equivalence test.
def skew_resilient_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 4).alias("avg_value"),
    )


SKEW_RESILIENT_ROLLUP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM events
GROUP BY event_type
"""


# Promoted into the driver window in round 7 (second wave): the salted
# two-phase aggregate earns its first independent driver row.
SPECS: list[QuerySpec] = [
    QuerySpec(
        "skew_resilient_rollup",
        skew_resilient_rollup,
        SKEW_RESILIENT_ROLLUP_SQL,
        "ext:skew,salting,A1",
    ),
]
