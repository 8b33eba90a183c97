"""kNN correctness against the NumPy serial oracle — the reference's
"serial baseline diff" test strategy reborn (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import knn
from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm
from tests.conftest import SF_SMOKE

K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = tables.embeddings(spark, SF_SMOKE).toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["emb"].to_numpy())
    labels = pdf["label"].to_numpy()
    return ids, mat, labels


def numpy_topk(ids, mat, k=K):
    """Serial brute-force: for each query (id%5==0) the k nearest others."""
    out = {}
    qmask = ids % 5 == 0
    for qi in np.where(qmask)[0]:
        d = np.sqrt(((mat - mat[qi]) ** 2).sum(axis=1))
        order = sorted((float(d[j]), int(ids[j])) for j in range(len(ids)) if j != qi)
        out[int(ids[qi])] = [tid for _, tid in order[:k]]
    return out


def test_topk_matches_numpy(spark, corpus):
    ids, mat, labels = corpus
    expected = numpy_topk(ids, mat)
    e = tables.embeddings(spark, SF_SMOKE)
    got = (
        knn.topk(knn.with_distance(knn.all_pairs(knn.split_test(e), knn.train_all(e))), K)
        .select("qid", "tid", "rnk")
        .toPandas()
    )
    for qid, grp in got.groupby("qid"):
        tids = grp.sort_values("rnk")["tid"].tolist()
        assert tids == expected[qid], f"qid {qid}"


def test_gemm_equals_expression_path(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    q = knn.split_test(e).select("qid", "qemb")
    t = knn.train_all(e).select("tid", "temb")
    gemm = knn_topk_gemm(q, t, K).select("qid", "tid", "rnk").toPandas()
    expr = (
        knn.topk(knn.with_distance(knn.all_pairs(knn.split_test(e), knn.train_all(e))), K)
        .select("qid", "tid", "rnk")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(gemm) == key(expr)


def test_classify_majority_vote(spark, corpus):
    ids, mat, labels = corpus
    label_of = dict(zip(ids.tolist(), labels.tolist()))
    expected_topk = numpy_topk(ids, mat)
    pred = knn.classify(spark, SF_SMOKE, K).toPandas().set_index("qid")
    for qid, tids in expected_topk.items():
        votes = {}
        for tid in tids:
            votes[label_of[tid]] = votes.get(label_of[tid], 0) + 1
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert pred.loc[qid, "pred_label"] == best
        assert pred.loc[qid, "true_label"] == label_of[qid]


def test_self_join_half_fold_edges_identical(spark):
    """r12: knn_self_join folds only qid < tid pairs and mirrors them
    inline before the top-k window (d symmetric bit-identically). The
    memoized edge list must equal the straightforward full-ordered-pair
    construction, row for row."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    e = tables.embeddings(spark, SF_SMOKE)
    q = e.select(
        col("vec_id").alias("qid"),
        col("emb").alias("qemb"),
        col("label").alias("qlabel"),
    )
    ref = (
        knn.topk(knn.with_distance(knn.all_pairs(q, knn.train_all(e))), knn.K_JOIN)
        .select(
            "qid", "tid", col("rnk").cast("long").alias("rnk"),
            F.round("dist", 4).alias("dist"),
        )
        .toPandas()
    )
    got = knn.knn_self_join(spark, SF_SMOKE, knn.K_JOIN).toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))  # noqa: E731
    assert key(got) == key(ref)
