#!/usr/bin/env python
"""Re-measure the two top perf-weak rejections at a ≥10× coordinate
(r16, r15 verdict item 7).

The r8-era dispositions were measured at sf0.1's cadence floor:

* table_profile — the single-aggregate multi-distinct form (Catalyst
  Expand + unpivot) was rejected at +55% wall despite floor jobs 9 → 3,
  because Expand inflates every row ×4 before the partials;
* tfidf_top_terms — the df-window fold (df computed by a token-window
  over tf instead of an aggregate + broadcast join) measured −6% at
  sf0.1 but re-shuffles the corpus-grain tf relation twice at scale.

This script rebuilds both rejected variants self-contained, scales the
input ×10 in memory (lineitem rows replicated with perturbed values so
the near-unique column stays near-unique; documents replicated with
offset doc_ids), asserts each variant equals the shipped form bitwise,
and times them interleaved in one JVM.

Usage: python scripts/weak10x_ab.py [sf_dir] [factor] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.session import get_spark


def scaled_lineitem(spark, sf_dir: str, factor: int):
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        PROFILE_COLUMNS,
    )

    li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLUMNS)
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    rep = li.select("*", k)
    # perturb the near-unique column per replica so ndv keeps scaling
    # with the input (otherwise the distinct shuffle would see factor×
    # duplicates of the same value set and undersell the variant cost)
    return rep.select(
        F.col(PROFILE_COLUMNS[0]),
        (F.col(PROFILE_COLUMNS[1]) + F.col("k") * F.lit(100000.0)).alias(
            PROFILE_COLUMNS[1]
        ),
        F.col(PROFILE_COLUMNS[2]),
        F.col(PROFILE_COLUMNS[3]),
    ).localCheckpoint(eager=True)


def profile_branches(li):
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        PROFILE_COLUMNS,
    )

    out = None
    for c in PROFILE_COLUMNS:
        branch = li.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col(c).isNull(), 1)), F.lit(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.min(c), 4).alias("min_value"),
            F.round(F.max(c), 4).alias("max_value"),
        )
        out = branch if out is None else out.unionAll(branch)
    return out


def profile_expand(li):
    """The r8-rejected single-aggregate multi-distinct + unpivot form."""
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.relational import (
        PROFILE_COLUMNS,
    )

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs += [
            F.coalesce(F.sum(F.when(F.col(c).isNull(), 1)), F.lit(0))
            .cast("long")
            .alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.round(F.min(c), 4).alias(f"mn_{c}"),
            F.round(F.max(c), 4).alias(f"mx_{c}"),
        ]
    wide = li.agg(*aggs)
    rows = None
    for c in PROFILE_COLUMNS:
        r = wide.select(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows


def scaled_documents(spark, sf_dir: str, factor: int):
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    k = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("k")
    return (
        docs.select("*", k)
        .select(
            (F.col("doc_id") + F.col("k") * F.lit(10 * n)).alias("doc_id"),
            "text",
        )
        .localCheckpoint(eager=True)
    )


def tfidf_broadcast(spark, docs):
    from pyspark.sql import Window

    from ida_ice_energy_simulation_etl_pipeline_spark.functions import word_tokens
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        TFIDF_TOP_K,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import (
        hash_parallelism,
    )

    d = hash_parallelism(spark, docs, "doc_id")
    toks = d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "term_rank",
            F.round("score", 4).alias("tfidf"),
        )
    )


def tfidf_window_fold(spark, docs):
    """The rejected df-window fold: df via a token-partition window."""
    from pyspark.sql import Window

    from ida_ice_energy_simulation_etl_pipeline_spark.functions import word_tokens
    from ida_ice_energy_simulation_etl_pipeline_spark.operators.text import (
        TFIDF_TOP_K,
    )
    from ida_ice_energy_simulation_etl_pipeline_spark.plans.core import (
        hash_parallelism,
    )

    d = hash_parallelism(spark, docs, "doc_id")
    toks = d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wdf = Window.partitionBy("token")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(wdf))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "term_rank",
            F.round("score", 4).alias("tfidf"),
        )
    )


def ab(spark, name, variants, reps):
    tracker = spark.sparkContext.statusTracker()

    def latest_job() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    # warmup + equality
    frames = {}
    for vname, fn in variants.items():
        frames[vname] = fn().toPandas()
    base = None
    for vname, pdf in frames.items():
        s = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        if base is None:
            base = s
        else:
            diff = base.compare(s)
            assert diff.empty, f"{name}/{vname} differs:\n{diff}"
    out = {}
    for rep in range(reps):
        for vname, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name}:{vname} rep={rep}")
            j0 = latest_job()
            t0 = time.perf_counter()
            fn().toPandas()
            rec = out.setdefault(vname, {"walls": [], "jobs": []})
            rec["walls"].append(round(time.perf_counter() - t0, 3))
            rec["jobs"].append(latest_job() - j0)
    import statistics

    for vname, rec in out.items():
        rec["median"] = statistics.median(rec["walls"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="weak10x-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    li10 = scaled_lineitem(spark, sf_dir, factor)
    docs10 = scaled_documents(spark, sf_dir, factor)
    record = {
        "sf_dir": sf_dir,
        "factor": factor,
        "lineitem_rows": li10.count(),
        "documents_rows": docs10.count(),
        "table_profile": ab(
            spark,
            "table_profile",
            {
                "branches": lambda: profile_branches(li10),
                "expand": lambda: profile_expand(li10),
            },
            reps,
        ),
        "tfidf_top_terms": ab(
            spark,
            "tfidf",
            {
                "broadcast": lambda: tfidf_broadcast(spark, docs10),
                "window_fold": lambda: tfidf_window_fold(spark, docs10),
            },
            reps,
        ),
    }
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
