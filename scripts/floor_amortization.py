"""Empirical floor-amortization experiment (round-11 verdict item 2).

BASELINE.md proves analytically that Spark's constant per-stage floor
(py4j round-trips, DAGScheduler job cadence, AQE stage materialization)
dominates the sf0.1 bench walls; the open question was empirical: does
the floor actually stay constant while the data path scales?  This
script measures it directly — the five floor-heaviest bench queries run
at 1× (sf0.1) and at a locally synthesized 10× of the same data, and we
record wall, plan-build time and the host-noise-immune JOB COUNT at
both scales.  If the floor story is right, job counts are IDENTICAL at
both scales and wall grows far less than 10×.

The 10× corpus is union-multiplied from sf0.1 with salted keys
(doc_id/vec_id/orderkey shifted per replica so join fan-outs stay
realistic); dims copy verbatim.  /root/testdata is never written.

Usage:
    python scripts/floor_amortization.py            # build + measure
    SPARK_GRAFT_SF_DIR=... to change the 1x input (default sf0.1)

Prints one JSON document with per-query {wall_1x, wall_10x, ratio,
jobs_1x, jobs_10x, build_1x, build_10x} plus the run environment.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

# runnable as `python scripts/floor_amortization.py` from the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "lm_perplexity",
    "table_profile",
    "region_revenue",
    "similarity_ivf",
    "gap_fill",
]
# r14: the query set is env-overridable so the per-round extensions
# (r13 graph kernels, r14 LPA communities) are reproducible from the
# committed script instead of an ad-hoc edit:
#   SPARK_GRAFT_AMORT_QUERIES=dup_communities,degree_distribution ...
if os.environ.get("SPARK_GRAFT_AMORT_QUERIES"):
    # strip + drop empties (r14 ADVICE): 'a, b' or a trailing comma must
    # not yield nonexistent query names
    QUERIES = [
        q.strip()
        for q in os.environ["SPARK_GRAFT_AMORT_QUERIES"].split(",")
        if q.strip()
    ]
# tables each query reads (scaled facts get key-salted replicas; the
# rest copy verbatim so every query runs unmodified at both scales)
SCALED = {
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "embeddings": "vec_id",
    "events": None,  # pure row multiplication (grid keys stay fixed)
}
VERBATIM = ["region", "nation", "customer", "supplier", "part"]
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))
KEY_SHIFT = 100_000_000  # far above any sf0.1 key range
REPEATS = 3


def _source_stamp(src: str) -> str:
    """Identity of the 1x corpus + build parameters.  A replica dir built
    from a different source dir, regenerated fixtures, or another replica
    count must NOT be silently reused (r11 ADVICE: the exists() skip made
    a rerun with a changed SPARK_GRAFT_SF_DIR measure a stale corpus)."""
    parts = [os.path.realpath(src), f"replicas={REPLICAS}"]
    for t in sorted(list(SCALED) + VERBATIM):
        p = Path(src) / f"{t}.parquet"
        st = p.stat()
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "\n".join(parts)


def build_10x(spark, src: str, dst: Path) -> None:
    from pyspark.sql import functions as F

    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import (
        load_table,
    )

    stamp = _source_stamp(src)
    stamp_file = dst / "SOURCE_STAMP"
    if dst.exists():
        if stamp_file.exists() and stamp_file.read_text() == stamp:
            return  # replica corpus verifiably built from this exact source
        shutil.rmtree(dst)  # stale or unstamped — rebuild from scratch
    dst.mkdir(parents=True, exist_ok=True)
    for t in VERBATIM:
        out = dst / f"{t}.parquet"
        if not out.exists():
            shutil.copy(Path(src) / f"{t}.parquet", out)
    for t, key in SCALED.items():
        out = dst / f"{t}.parquet"
        if out.exists():
            continue
        # load_table, not raw read: events is TIMESTAMP(NANOS) and the
        # nanosafe path converts to micros (the replica lands as micros,
        # which load_table passes through unchanged at measure time)
        base = load_table(spark, src, t)
        reps = []
        for i in range(REPLICAS):
            r = base
            if key is not None:
                r = r.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT))
                # orders/lineitem must salt the SAME key in lockstep so
                # the region_revenue join fan-out stays 1:n, not 1:10n
                if t == "lineitem":
                    pass  # l_orderkey handled above; other keys untouched
            reps.append(r)
        unioned = reps[0]
        for r in reps[1:]:
            unioned = unioned.unionAll(r)
        unioned.write.mode("overwrite").parquet(str(out))
    stamp_file.write_text(stamp)


def measure(spark, sf_dir: str) -> dict:
    from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES

    tracker = spark.sparkContext.statusTracker()

    def latest_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    out = {}
    for name in QUERIES:
        fn = ALL_QUERIES[name].fn
        fn(spark, sf_dir).toPandas()  # warm the shape at this scale
        j0 = latest_job_id()
        fn(spark, sf_dir).toPandas()
        jobs = latest_job_id() - j0
        walls, builds = [], []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            walls.append(t2 - t0)
        walls.sort()
        builds.sort()
        out[name] = {
            "wall": round(walls[len(walls) // 2], 3),
            "build": round(builds[len(builds) // 2], 3),
            "jobs": jobs,
        }
    return out


def main() -> None:
    from ida_ice_energy_simulation_etl_pipeline_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    dst = Path(
        os.environ.get(
            "SPARK_GRAFT_X10_DIR", f"/tmp/floor_amort_x{REPLICAS}"
        )
    )
    # SPARK_GRAFT_FLOOR_QUERIES: comma-separated subset for steep-slope
    # follow-up points (e.g. the 30x run on lm_perplexity,region_revenue)
    subset = os.environ.get("SPARK_GRAFT_FLOOR_QUERIES")
    if subset:
        QUERIES[:] = [q.strip() for q in subset.split(",") if q.strip()]
    # local mode hosts every "executor" inside the one driver JVM, so the
    # 10x corpus needs real heap (default 1g OOMs building lm_perplexity's
    # AQE-upgraded broadcast at 10x); on a cluster this is executor memory
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark, src, dst)
    m1 = measure(spark, src)
    m10 = measure(spark, str(dst))
    report = {
        "sf_1x": src,
        "sf_10x": str(dst),
        "replicas": REPLICAS,
        "loadavg_start": os.getloadavg()[0],
        "queries": {
            q: {
                "wall_1x": m1[q]["wall"],
                "wall_10x": m10[q]["wall"],
                "wall_ratio": round(m10[q]["wall"] / m1[q]["wall"], 2),
                "build_1x": m1[q]["build"],
                "build_10x": m10[q]["build"],
                "jobs_1x": m1[q]["jobs"],
                "jobs_10x": m10[q]["jobs"],
            }
            for q in QUERIES
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
