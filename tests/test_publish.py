from __future__ import annotations

from pyspark.sql import functions as F

from ida_ice_energy_simulation_etl_pipeline_spark.etl.publish import (
    content_hash,
    publish_if_changed,
)


def test_content_hash_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "v"])
    b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], ["id", "v"])
    assert content_hash(a) == content_hash(b)
    assert content_hash(a.repartition(7)) == content_hash(a)
    c = a.withColumn("v", F.upper("v"))
    assert content_hash(c) != content_hash(a)


def test_publish_skip_and_republish(spark, tmp_path):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "val"])
    out, state = tmp_path / "table", tmp_path / "state.json"
    assert publish_if_changed(df, out, state) is True
    assert publish_if_changed(df, out, state) is False  # unchanged → skipped
    changed = df.withColumn("val", F.col("val") * 2)
    assert publish_if_changed(changed, out, state) is True
    back = spark.read.parquet(str(out))
    assert sorted(r["val"] for r in back.collect()) == [20.0, 40.0]
