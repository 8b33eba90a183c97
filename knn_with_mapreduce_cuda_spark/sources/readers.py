"""Source/sink connectors (SURVEY.md §1.1: the reference ingests positional
CSV/text — ``label,f1,…,fd`` lines on HDFS — and writes tab-separated
predictions; this module is the Spark-native equivalent plus the columnar
formats the engine actually prefers).

Readers return lazy DataFrames with explicit schemas (never inferSchema in
production paths — schema inference is a full extra pass at 100 TB).
Writers demonstrate the layouts that matter at scale: partitioned parquet
(partition-pruned reads) and sorted-bucketed tables (shuffle-free joins on
the bucket key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_runtime_confs


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.parquet(path)


def read_knn_text(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """The reference's native train-file format: one sample per line,
    ``label,f1,f2,…,fd`` (SURVEY.md §1.1 [P:Anchalia14]). Parsed into the
    engine's canonical (vec_id, emb array<double>, label) shape; line
    number becomes the id."""
    ensure_runtime_confs(spark)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), ",")
    return (
        lines.withColumn("vec_id", F.monotonically_increasing_id())
        .select(
            "vec_id",
            F.slice(parts, 2, dim).cast("array<double>").alias("emb"),
            F.element_at(parts, 1).cast("int").alias("label"),
        )
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partition layout — partition pruning turns a 100 TB scan
    into a per-partition scan for selective predicates."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame, name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Sorted-bucketed managed table: joins/aggregations on bucket_col
    skip the exchange entirely (co-located join — SURVEY.md §4)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )


def write_predictions_text(pred: DataFrame, path: str) -> None:
    """Reference output parity: ``testId \\t predictedLabel`` text lines
    (MapReduce TextOutputFormat, SURVEY.md §3.1 A.8)."""
    pred.select(
        F.concat_ws("\t", F.col("qid").cast("string"), F.col("pred_label").cast("string"))
    ).write.mode("overwrite").text(path)
