"""Salted skew-join produces exactly the plain-join result (SURVEY.md §4
skew mitigation) and spreads a hot key across shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_with_mapreduce_cuda_spark.operators.relational import salted_join


def test_salted_join_equals_plain_join(spark):
    # pathological skew: 90% of the big side shares one key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 2).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k").select("k", "payload", "dim")
    key = lambda df: sorted(map(tuple, df.toPandas().itertuples(index=False)))
    assert key(plain) == key(salted)


def test_salt_spreads_hot_key(spark):
    big = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    salted = big.withColumn("_salt", (F.rand(seed=42) * 16).cast("int"))
    n_shards = salted.select("_salt").distinct().count()
    assert n_shards >= 12  # the single hot key now occupies most shards
