"""Approximate kNN — LSH prefilter → exact rerank composite planner
(SURVEY.md §4: "manual logical rewrite in our API: knn(q, k, approx=True)
plans LSH→exact-rerank").

At 100 TB even the GEMM brute-force path scans every train partition per
query block. The approx plan cuts the candidate set first:

1. ``BucketedRandomProjectionLSH`` (seeded) buckets train+query vectors;
   ``approxSimilarityJoin`` emits only same-bucket candidate pairs within
   ``radius`` — a bucket-join shuffle of O(matching pairs), not O(n·m).
2. Exact rerank: the surviving candidates get the exact Catalyst
   expression distance and a window top-k — identical semantics to the
   exact operator, on a fraction of the pairs.

Recall is tunable via (bucketLength, numHashTables, radius); the test
suite asserts recall@k against the exact GEMM path on the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import col

from .gemm_knn import knn_topk_gemm


def knn_search(
    queries_df: DataFrame,
    train_df: DataFrame,
    k: int = 10,
    approx: bool = False,
    radius: float = 1.35,
    bucket_length: float = 0.75,
    num_hash_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Top-k euclidean neighbors; exact (GEMM) or LSH-prefiltered.

    queries_df: (qid, qemb array<double>); train_df: (tid, temb).
    Returns (qid, tid, rnk, dist) — the exact path's contract; the approx
    path may miss true neighbors outside its LSH radius/buckets.
    """
    if not approx:
        return knn_topk_gemm(queries_df, train_df, k)

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    q = queries_df.withColumn("v", array_to_vector("qemb"))
    t = train_df.withColumn("v", array_to_vector("temb"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(t)
    cand = (
        model.approxSimilarityJoin(q, t, radius, distCol="dist")
        .filter(col("datasetA.qid") != col("datasetB.tid"))
        .select(
            col("datasetA.qid").alias("qid"),
            col("datasetB.tid").alias("tid"),
            col("dist"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc_nulls_last("dist"), "tid")
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select("qid", "tid", "rnk", "dist")
    )
