#!/usr/bin/env python
"""Measure the exact pair tier's cliff against the GEMM stage.

SCALE.md §5 rungs: the Catalyst expression fold (rung 1, the
correctness twin) vs the GEMM mapInArrow stage (rung 2, the flagship).
This stress amplifies the sf0.1 embeddings PAIR_FACTOR× (reusing the
ANN scratch amplifier — deterministic integer perturbation, no RNG)
and times the full kNN self-join (k=5) through both rungs on the same
data, with the result sets asserted equal on (qid, tid).

Records walls + load averages to scripts/scale_proof_r04_pairs.json.

Usage: PAIR_FACTOR=5 python scripts/pair_tier_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("EMB_FACTOR", os.environ.get("PAIR_FACTOR", "5"))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import knn
from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm
from knn_with_mapreduce_cuda_spark.session import get_spark

from scale_proof import SCRATCH_ANN, amplify_embeddings  # noqa: E402


def main() -> None:
    spark = get_spark("pair-tier-stress")
    spark.sparkContext.setLogLevel("ERROR")
    n = amplify_embeddings(spark)
    out = {"n_vectors": n, "n_pairs": n * (n - 1), "factor": os.environ["EMB_FACTOR"]}

    e = tables.embeddings(spark, SCRATCH_ANN)
    q = e.select(col("vec_id").alias("qid"), col("emb").alias("qemb"),
                 col("label").alias("qlabel"))
    t = e.select(col("vec_id").alias("tid"), col("emb").alias("temb"),
                 col("label").alias("tlabel"))

    t0 = time.perf_counter()
    gemm = {(r.qid, r.tid) for r in knn_topk_gemm(
        q.select("qid", "qemb"), t.select("tid", "temb"), 5).collect()}
    out["gemm"] = {"wall_s": round(time.perf_counter() - t0, 2),
                   "rows": len(gemm), "load1": round(os.getloadavg()[0], 1)}

    t0 = time.perf_counter()
    expr = {(r.qid, r.tid) for r in knn.topk(
        knn.with_distance(knn.all_pairs(q, t)), 5).select("qid", "tid").collect()}
    out["expr_fold"] = {"wall_s": round(time.perf_counter() - t0, 2),
                        "rows": len(expr), "load1": round(os.getloadavg()[0], 1)}

    out["sets_equal"] = gemm == expr
    out["ratio_expr_over_gemm"] = round(
        out["expr_fold"]["wall_s"] / out["gemm"]["wall_s"], 1)
    path = os.path.join(os.path.dirname(__file__), "scale_proof_r04_pairs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
