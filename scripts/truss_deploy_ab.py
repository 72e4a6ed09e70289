#!/usr/bin/env python
"""Deploy-coordinate A/B for the r16 incremental k-truss support
maintenance: a synthetic graph large enough that one full triangle
re-enumeration dwarfs the dropped-edge decrement pass.

Graph: N disjoint K5 cliques (every clique edge sits in 3 triangles)
each with a pendant triangle glued at one vertex (its 3 edges sit in
exactly 1 triangle).  The k=4 peel (support ≥ 2) drops the 3N pendant
edges in round 1; the fixpoint-confirming round 2 then needs supports of
the surviving 10N clique edges — a full re-enumeration walks all 10N
triangles, while the incremental path touches only the N lost pendant
triangles (decrement bounded by the dropped edges' neighborhoods).
Results asserted bitwise-equal (count + double xor digest) before any
timing is read.

Usage: python scripts/truss_deploy_ab.py [n_cliques] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.session import get_spark


def build_graph(spark, n_cliques: int, clique: int = 5):
    # vertex ids: clique c occupies [mc, mc+clique-1]; pendant verts +clique, +clique+1
    m = clique + 2
    base = spark.range(n_cliques).select((F.col("id") * m).alias("b"))
    kq = [(i, j) for i in range(clique) for j in range(i + 1, clique)]
    pend = [(0, clique), (0, clique + 1), (clique, clique + 1)]
    edges = None
    for (i, j) in kq + pend:
        e = base.select(
            (F.col("b") + F.lit(i)).alias("doc_a"),
            (F.col("b") + F.lit(j)).alias("doc_b"),
        )
        edges = e if edges is None else edges.unionAll(e)
    return edges.localCheckpoint(eager=True)


def digest(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("doc_a", "doc_b")).alias("h"),
        F.bit_xor(F.xxhash64("doc_b", "doc_a")).alias("h2"),
    ).collect()[0]
    return (row["n"], row["h"], row["h2"])


def main() -> None:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    clique = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="truss-deploy-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.graph import (
        ktruss_edges,
    )

    pairs = build_graph(spark, n_cliques, clique)
    tracker = spark.sparkContext.statusTracker()

    def latest_job() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    digests = {}
    for mode in ("1", "0"):
        os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = mode
        digests[mode] = digest(ktruss_edges(pairs, 4))
    assert digests["0"] == digests["1"], f"results differ: {digests}"
    walls, jobs = {"0": [], "1": []}, {"0": [], "1": []}
    for rep in range(reps):
        for mode in ("0", "1"):
            os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = mode
            spark.sparkContext.setJobDescription(
                f"ktruss4 incremental={mode} rep={rep}"
            )
            j0 = latest_job()
            t0 = time.perf_counter()
            digest(ktruss_edges(pairs, 4))
            walls[mode].append(round(time.perf_counter() - t0, 3))
            jobs[mode].append(latest_job() - j0)
    os.environ["SPARK_GRAFT_TRUSS_INCREMENTAL"] = "1"
    print(
        json.dumps(
            {
                "n_cliques": n_cliques,
                "clique_size": clique,
                "n_edges": pairs.count(),
                "digest": list(digests["1"]),
                "walls_off": walls["0"],
                "walls_on": walls["1"],
                "median_off": statistics.median(walls["0"]),
                "median_on": statistics.median(walls["1"]),
                "jobs_off": jobs["0"],
                "jobs_on": jobs["1"],
                "results_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
