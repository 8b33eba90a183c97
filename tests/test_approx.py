"""Approx-kNN composite planner: recall vs the exact path, and the cosine
GEMM twin vs the expression-based simsearch (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import knn, llm
from knn_with_mapreduce_cuda_spark.plans.approx_knn import knn_search
from knn_with_mapreduce_cuda_spark.plans.gemm_knn import cosine_topk_gemm
from tests.conftest import SF_ORACLE, SF_SMOKE

K = 10


def _qt(spark, sf):
    e = tables.embeddings(spark, sf)
    q = knn.split_test(e).select("qid", "qemb")
    t = knn.train_all(e).select("tid", "temb")
    return q, t


def test_exact_path_is_gemm(spark):
    q, t = _qt(spark, SF_SMOKE)
    exact = knn_search(q, t, K, approx=False).select("qid", "tid").toPandas()
    expr = (
        knn.topk(
            knn.with_distance(
                knn.all_pairs(
                    q.withColumn("qlabel", F.lit(0)),
                    t.withColumn("tlabel", F.lit(0)),
                )
            ),
            K,
        )
        .select("qid", "tid")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(exact) == key(expr)


def test_approx_recall_at_k(spark):
    q, t = _qt(spark, SF_ORACLE)
    exact = knn_search(q, t, K, approx=False).select("qid", "tid").toPandas()
    approx = knn_search(q, t, K, approx=True).select("qid", "tid").toPandas()
    truth = set(map(tuple, exact.itertuples(index=False)))
    got = set(map(tuple, approx.itertuples(index=False)))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"recall@{K} = {recall:.3f}"


def test_cosine_gemm_matches_expression_simsearch(spark):
    e = tables.embeddings(spark, SF_ORACLE)
    q = e.filter(col("vec_id") % 50 == 0).select(
        col("vec_id").alias("qid"), col("emb").alias("qemb")
    )
    t = e.select(col("vec_id").alias("tid"), col("emb").alias("temb"))
    gemm = cosine_topk_gemm(q, t, 5).select("qid", "tid", "rnk").toPandas()
    expr = llm._q_simsearch_topk(spark, SF_ORACLE).select("qid", "tid", "rnk").toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(gemm) == key(expr)


def test_ivf_exhaustive_probe_equals_exact(spark):
    from knn_with_mapreduce_cuda_spark import tables as T
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm
    from knn_with_mapreduce_cuda_spark.plans.ivf import build_ivf_index, ivf_search

    e = T.embeddings(spark, SF_SMOKE)
    cents, index = build_ivf_index(e)
    q = e.filter("vec_id % 10 = 0").selectExpr("vec_id as qid", "emb as qemb")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    exact = {(r.qid, r.tid) for r in knn_topk_gemm(q, t, 5).collect()}
    # probing every cell is exhaustive search → identical result set
    full = {(r.qid, r.tid) for r in ivf_search(q, cents, index, 5, n_probe=5).collect()}
    assert full == exact


def test_ivf_partial_probe_recall(spark):
    from knn_with_mapreduce_cuda_spark import tables as T
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm
    from knn_with_mapreduce_cuda_spark.plans.ivf import build_ivf_index, ivf_search

    e = T.embeddings(spark, SF_SMOKE)
    cents, index = build_ivf_index(e)
    q = e.filter("vec_id % 10 = 0").selectExpr("vec_id as qid", "emb as qemb")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    exact = {(r.qid, r.tid) for r in knn_topk_gemm(q, t, 5).collect()}
    got = {(r.qid, r.tid) for r in ivf_search(q, cents, index, 5, n_probe=2).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall
