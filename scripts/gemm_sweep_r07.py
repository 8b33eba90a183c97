#!/usr/bin/env python
"""GEMM knob sweep for the knn_classify_full bench row (VERDICT r06 #6).

Two questions, answered with measurements:

1. sf0.1 (2000x2000): where does the 0.93 s go, and what does the
   broadcast-dim join rewrite buy? (Answer found while profiling: the
   kernel is milliseconds — the cost was Catalyst broadcasting the
   TOPK side of the label joins, re-running the GEMM subtree as a
   broadcast build and paying two extra exchanges in the vote tail.
   The rewrite pins the label dims as the broadcast sides.)
2. 10x (20k x 20k via the scale-proof amplifier): do the kernel knobs
   (Q_TILE query-tile rows, Arrow maxRecordsPerBatch on the streamed
   train side) move the topk stage at a size where the GEMM dominates?

Writes scripts/gemm_sweep_r07.json; the adopted config is recorded in
SCALE.md 9a.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import knn
from knn_with_mapreduce_cuda_spark.plans import gemm_knn
from knn_with_mapreduce_cuda_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gemm_sweep_r07.json")


def best_of(fn, n=3):
    rs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        rs.append(round(time.perf_counter() - t0, 3))
    return min(rs), rs


def classify_full(spark, hint: bool):
    e = tables.embeddings(spark, SF_DIR)
    t = knn.train_all(e)
    q = e.select(
        col("vec_id").alias("qid"),
        col("emb").alias("qemb"),
        col("label").alias("qlabel"),
    )
    top = gemm_knn.knn_topk_gemm(q.select("qid", "qemb"), t.select("tid", "temb"), 10)
    tdim, qdim = t.select("tid", "tlabel"), q.select("qid", "qlabel")
    if hint:
        tdim, qdim = F.broadcast(tdim), F.broadcast(qdim)
    return knn.majority_vote(top.join(tdim, "tid").join(qdim, "qid"))


def main() -> None:
    spark = get_spark("gemm-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, SF_DIR, "lineitem").count()  # warm
    out: dict = {"load1_start": round(os.getloadavg()[0], 1)}

    # 1. sf0.1 join-shape comparison (the adopted rewrite)
    shape = {}
    for label, hint in (("catalyst_build_side", False), ("broadcast_dims", True)):
        best, rs = best_of(lambda: classify_full(spark, hint).count(), n=4)
        plan = (
            classify_full(spark, hint)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        shape[label] = {
            "best_s": best,
            "runs": rs,
            "exchanges": plan.count("Exchange hashpartitioning"),
            "broadcasts": plan.count("BroadcastExchange"),
        }
    out["sf0.1_classify_full_join_shape"] = shape

    # 2. kernel knobs at 10x (GEMM-dominated size)
    from scale_proof import SCRATCH_ANN, amplify_embeddings

    n_total = amplify_embeddings(spark, 10)
    e = tables.embeddings(spark, SCRATCH_ANN)
    q = e.select(col("vec_id").alias("qid"), col("emb").alias("qemb"))
    t = e.select(col("vec_id").alias("tid"), col("emb").alias("temb"))
    sweep = []
    q_tile0 = gemm_knn.Q_TILE
    try:
        for q_tile in (512, 2048, 8192):
            for batch in (2000, 10000, 20000):
                gemm_knn.Q_TILE = q_tile
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
                )
                best, rs = best_of(
                    lambda: gemm_knn.knn_topk_gemm(q, t, 10).count(), n=3
                )
                sweep.append(
                    {
                        "q_tile": q_tile,
                        "arrow_batch": batch,
                        "best_s": best,
                        "runs": rs,
                        "load1": round(os.getloadavg()[0], 1),
                    }
                )
    finally:
        gemm_knn.Q_TILE = q_tile0
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    out["10x_topk_knob_sweep"] = {
        "n_vectors": n_total,
        "grid": sweep,
        "adopted": {"q_tile": q_tile0, "arrow_batch": 10000},
    }

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
