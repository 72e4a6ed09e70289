#!/usr/bin/env python
"""Same-process interleaved A/B for the r16 k-truss incremental support
maintenance (SPARK_GRAFT_TRUSS_INCREMENTAL=0 vs 1), results asserted
bitwise-equal before any timing is trusted; job counts recorded as the
host-noise-immune signal.  Mirrors the bench session settings.

Usage: python scripts/truss_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

from ida_ice_energy_simulation_etl_pipeline_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_cpus = int(cpus)
    input_mb = sum(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet")) for t in TABLES
    ) / (1024 * 1024)
    spark = get_spark(
        app_name="truss-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, min(n_cpus, int(input_mb))),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES

    tracker = spark.sparkContext.statusTracker()

    def latest_job() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    fn = ALL_QUERIES["ktruss_decomposition"].fn
    results, samples = {}, {"0": [], "1": []}
    jobs = {"0": [], "1": []}
    # warmup both modes
    for mode in ("1", "0"):
        os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = mode
        results[mode] = fn(spark, sf_dir).toPandas()
    pdiff = results["0"].sort_values(list(results["0"].columns)).reset_index(
        drop=True
    ).compare(
        results["1"].sort_values(list(results["1"].columns)).reset_index(drop=True)
    )
    assert pdiff.empty, f"results differ:\n{pdiff}"
    for rep in range(reps):
        for mode in ("0", "1"):
            os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = mode
            spark.sparkContext.setJobDescription(
                f"ktruss incremental={mode} rep={rep}"
            )
            j0 = latest_job()
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples[mode].append(round(time.perf_counter() - t0, 3))
            jobs[mode].append(latest_job() - j0)
    os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = "1"
    import statistics

    out = {
        "sf_dir": sf_dir,
        "walls_off": samples["0"],
        "walls_on": samples["1"],
        "median_off": statistics.median(samples["0"]),
        "median_on": statistics.median(samples["1"]),
        "jobs_off": jobs["0"],
        "jobs_on": jobs["1"],
        "results_identical": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
