"""SparkSession factory.

The reference executes eagerly on a single pandas process (see
/root/reference/run_pipeline.py:25-157); here the session is configured once
for lazy, optimized, spill-safe distributed execution:

* ``spark.sql.session.timeZone=UTC`` — the reference's timestamps are
  tz-aware UTC (reference src/generate_synthetic_idaice.py:27-28); pinning
  the session TZ makes every extraction function (year/month/hour/...)
  deterministic across cluster nodes.
* AQE on — runtime re-planning (partition coalescing, skew-join splitting,
  dynamic broadcast) is the scale-out answer to the reference's hand
  scheduling.
* Arrow on — any edge ``toPandas()`` / pandas-UDF traffic is columnar.
* ``shuffle.partitions`` defaults small for local test volumes; on a real
  cluster pass e.g. 2000 (or rely on AQE coalescing from a high initial
  value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_conf(
    master: str | None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> dict[str, str]:
    """The session conf as a pure function of (master, knobs) — split out
    so the local-vs-cluster conditional is unit-testable without
    standing up a second JVM."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Broadcast threshold: dims in both the reference schema and the
        # TPC-H-ish fixtures are tiny; at 100 TB the facts never broadcast
        # but 64 MB of dim comfortably does.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Respect parquet row-group pruning and vectorized reads.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Timestamps: keep parquet int96-free round-trips exact.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # ANSI mode ON — Spark 4's default and what any unpinned session
        # (e.g. the verification driver's) runs with.  Pinning it off in
        # round 1 let a LongType overflow in a convergence digest wrap
        # silently here while throwing ARITHMETIC_OVERFLOW in the driver
        # (CORRECTNESS_r06 dedup_clusters_star); local must match the
        # strictest session our queries will meet.
        "spark.sql.ansi.enabled": "true",
        # No UI in this headless context: skips event-log bookkeeping and
        # the jetty server — measurable per-job overhead on short queries.
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        # Kryo for closure/broadcast serialization (SQL row data is
        # UnsafeRow either way); measurably faster per-stage setup.
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
    if master and master.startswith("local"):
        # Single-JVM tuning: a local shuffle is a write through the OS page
        # cache, not a network transfer, so lz4-compressing every tiny
        # map-output block is pure CPU overhead (measured ~30% of wall on
        # the shuffle-heavy sf0.1 queries).  A real cluster keeps
        # compression ON (network-bound) — these are set ONLY when the
        # master is known-local, and extra_conf can still override.
        conf["spark.shuffle.compress"] = "false"
        conf["spark.shuffle.spill.compress"] = "false"
        # One executor: there is no locality hierarchy to wait for.
        conf["spark.locality.wait"] = "0ms"
    if extra_conf:
        conf.update(extra_conf)
    return conf


def get_spark(
    app_name: str = "ida-ice-energy-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so the same entry point works in tests, bench, and cluster deploys
    (where ``master`` is injected by spark-submit and must stay None).
    """
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in build_conf(master, shuffle_partitions, extra_conf).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
