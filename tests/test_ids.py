"""Deterministic distributed id assignment (plans/ids.py)."""

from pyspark.sql import functions as F

from osm_jigsaw_spark.plans.ids import assign_ids


def test_assign_ids_dense_and_ordered(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"),
        F.col("id").alias("orig"),
    )
    out = assign_ids(df, [F.col("k")], id_col="rid", partitions=7)
    rows = out.orderBy("rid").collect()
    assert [r["rid"] for r in rows] == list(range(1000))
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)


def test_assign_ids_deterministic(spark):
    df = spark.range(0, 500).select((F.col("id") * 13 % 97).alias("k"),
                                    F.col("id").alias("t"))
    a = assign_ids(df, ["k", "t"], id_col="rid", partitions=5)
    b = assign_ids(df, ["k", "t"], id_col="rid", partitions=5)
    assert a.orderBy("rid").collect() == b.orderBy("rid").collect()
