"""Weighted vote, k-sweep, and the LSH bucket-size guard."""

from __future__ import annotations

from knn_with_mapreduce_cuda_spark.operators.knn import (
    _pairs,
    k_sweep_accuracy,
    topk,
    weighted_vote,
)
from knn_with_mapreduce_cuda_spark.operators.llm import near_dup_pairs
from tests.conftest import SF_SMOKE


def test_weighted_vote_prediction_shape(spark):
    pred = weighted_vote(topk(_pairs(spark, SF_SMOKE), 10)).collect()
    qids = [r.qid for r in pred]
    assert len(qids) == len(set(qids)) > 0
    assert all(r.wsum > 0 for r in pred)
    assert all(r.correct in (0, 1) for r in pred)


def test_k_sweep_one_row_per_k(spark):
    rows = {r.k: r for r in k_sweep_accuracy(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [1, 3, 5, 10]
    n = {r.n_test for r in rows.values()}
    assert len(n) == 1  # same test set at every k
    assert all(0.0 <= r.accuracy <= 1.0 for r in rows.values())


def test_bucket_guard_is_monotone_and_caps_pairs(spark):
    full = near_dup_pairs(spark, SF_SMOKE).collect()
    capped = near_dup_pairs(spark, SF_SMOKE, max_bucket_size=1).collect()
    # cap=1 means no bucket can produce a pair at all
    assert capped == []
    loose = set(
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs(spark, SF_SMOKE, max_bucket_size=10_000).collect()
    )
    assert loose == {(r.doc_a, r.doc_b) for r in full}


def test_seuclidean_matches_numpy(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from knn_with_mapreduce_cuda_spark.operators.knn import _q_dist_seuclidean

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    E = np.array([np.asarray(e, dtype=np.float64) for e in t.embedding])
    ids = t.vec_id.to_numpy()
    train = E[ids % 5 != 0]
    var = np.round(train.var(axis=0), 6)
    got = {}
    for r in _q_dist_seuclidean(spark, "/root/testdata/sf0.001").collect():
        got.setdefault(r.qid, []).append((r.rnk, r.tid, r.dist))
    for qi in np.nonzero(ids % 5 == 0)[0]:
        q = E[qi]
        d = np.sqrt((((E - q) ** 2) / var).sum(axis=1))
        d[qi] = np.inf
        order = sorted((round(dv, 4), tid) for dv, tid in zip(d, ids) if dv < np.inf)
        expect = [(rk + 1, tid, dv) for rk, (dv, tid) in enumerate(order[:5])]
        assert got[ids[qi]] == expect
