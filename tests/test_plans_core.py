"""plans/core.py unit coverage that does not fit the parity suites.

The one resident today is the ``free_local_checkpoint`` regression
test the r14 verdict asked for (item 4): the function reaches through
private JVM internals (``_jdf.queryExecution().analyzed().rdd()``)
with a swallow-all except, so a PySpark upgrade that moves any link in
that chain would silently turn the block release into a no-op and the
"Not enough memory to build and broadcast" flake it fixes would
quietly return.  This test makes that drift LOUD: it asserts the
reach-through actually removes a localCheckpoint's cached blocks from
the block manager on the pinned Spark version.
"""

from __future__ import annotations

import time

from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import (
    free_local_checkpoint,
)


def _cached_rdd_ids(spark) -> set[int]:
    """Ids of RDDs currently holding cached partitions, straight from
    the JVM block-manager view (getRDDStorageInfo lists only persisted
    RDDs; an unpersisted one drops out or reports zero partitions)."""
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if info.numCachedPartitions() > 0
    }


def test_free_local_checkpoint_releases_blocks(spark):
    base = _cached_rdd_ids(spark)
    df = spark.range(10_000).localCheckpoint(eager=True)
    created = _cached_rdd_ids(spark) - base
    # eager localCheckpoint MUST cache blocks; if this fails the API
    # changed underneath us and the whole release discipline needs a
    # fresh look, not just this helper
    assert created, "localCheckpoint(eager=True) cached no RDD blocks"

    # the reach-through path itself must resolve on this Spark version
    # (the function swallows failures by design, so probe it directly)
    jrdd = df._jdf.queryExecution().analyzed().rdd()
    assert jrdd is not None

    free_local_checkpoint(df)
    # unpersist(blocking=False): poll briefly for the async removal
    deadline = time.monotonic() + 20.0
    while time.monotonic() < deadline:
        if not (created & _cached_rdd_ids(spark)):
            break
        time.sleep(0.2)
    leftover = created & _cached_rdd_ids(spark)
    assert not leftover, (
        f"free_local_checkpoint left blocks cached for RDDs {leftover} — "
        "the private-API reach-through no longer unpersists; update "
        "plans/core.py::free_local_checkpoint for this Spark version"
    )


def test_free_local_checkpoint_is_noop_on_plain_frames(spark):
    """A non-checkpointed frame (or any projection on top of one) lands
    in the except path by design: no exception escapes, nothing else's
    blocks are touched."""
    base = _cached_rdd_ids(spark)
    keep = spark.range(1_000).localCheckpoint(eager=True)
    kept_ids = _cached_rdd_ids(spark) - base
    assert kept_ids
    free_local_checkpoint(spark.range(50).selectExpr("id * 2 AS x"))
    assert kept_ids <= _cached_rdd_ids(spark)
    free_local_checkpoint(keep)  # cleanup
