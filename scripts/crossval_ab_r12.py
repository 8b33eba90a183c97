#!/usr/bin/env python
"""knn_crossval symmetric-halving candidate: A/B + equality assert.

Hypothesis (guide §1 first-principles + §2.3): _q_crossval evaluates the
euclidean fold over EVERY ordered pair with fold != tfold — n²·4/5 array
folds — but d(q,t) = d(t,q) bit-identically in IEEE doubles
((x-y)² vs (y-x)², same zip_with index order, same left fold), so half
the folds compute values the other half already produced. Candidate:
fold only qid < tid pairs, then mirror each row inline with
explode(array(struct_fwd, struct_rev)) — one pass over the half pair
space, same row multiset into the ranking window, no checkpoint, no
duplicated subtree.

Runs both variants interleaved A,B,A,B in ONE session (same conf), after
asserting collected results identical.

Usage: python scripts/crossval_ab_r12.py
Artifact: scripts/crossval_ab_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.functions.vector import METRICS
from knn_with_mapreduce_cuda_spark.operators.knn import K_DEFAULT, _q_crossval
from knn_with_mapreduce_cuda_spark.session import get_spark

ROUNDS = 5


def crossval_half(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    q = e.select(
        col("vec_id").alias("qid"),
        (col("vec_id") % 5).alias("fold"),
        col("emb").alias("qemb"),
        col("label").alias("qlabel"),
    )
    t = e.select(
        col("vec_id").alias("tid"),
        (col("vec_id") % 5).alias("tfold"),
        col("emb").alias("temb"),
        col("label").alias("tlabel"),
    )
    fanout = spark.sparkContext.defaultParallelism
    pairs = t.repartition(fanout, col("tid")).join(
        F.broadcast(q), (col("fold") != col("tfold")) & (col("qid") < col("tid"))
    )
    half = pairs.withColumn("dist", METRICS["euclidean"]("qemb", "temb"))
    d = half.select(
        F.explode(
            F.array(
                F.struct(
                    col("fold"),
                    col("qid"),
                    col("qlabel"),
                    col("tid"),
                    col("tlabel"),
                ),
                F.struct(
                    col("tfold").alias("fold"),
                    col("tid").alias("qid"),
                    col("tlabel").alias("qlabel"),
                    col("qid").alias("tid"),
                    col("qlabel").alias("tlabel"),
                ),
            )
        ).alias("p"),
        "dist",
    ).select("p.*", "dist")
    w = Window.partitionBy("fold", "qid").orderBy(F.asc_nulls_last("dist"), "tid")
    top = d.withColumn("rnk", F.row_number().over(w)).filter(col("rnk") <= K_DEFAULT)
    votes = top.groupBy("fold", "qid", "qlabel", "tlabel").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("fold", "qid").orderBy(F.desc("votes"), "tlabel")
    pred = votes.withColumn("vr", F.row_number().over(wv)).filter(col("vr") == 1)
    return pred.groupBy("fold").agg(
        F.round(F.avg((col("tlabel") == col("qlabel")).cast("double")), 4).alias(
            "accuracy"
        ),
        F.count("*").alias("n_test"),
    )


def t_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("crossval_ab_r12")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, sf_dir, "embeddings").count()  # session warm-up

    old_rows = sorted(map(tuple, _q_crossval(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, crossval_half(spark, sf_dir).collect()))
    identical = old_rows == new_rows
    print("identical:", identical)
    if not identical:
        print("OLD:", old_rows)
        print("NEW:", new_rows)
        return 1

    runs = {"old": [], "new": []}
    for i in range(ROUNDS):
        runs["old"].append(t_noop(_q_crossval(spark, sf_dir)))
        runs["new"].append(t_noop(crossval_half(spark, sf_dir)))
        print(f"round {i + 1}: old {runs['old'][-1]} new {runs['new'][-1]}", flush=True)
    art = {
        "sf_dir": sf_dir,
        "identical": identical,
        "old_runs": runs["old"],
        "new_runs": runs["new"],
        "old_med": statistics.median(runs["old"]),
        "new_med": statistics.median(runs["new"]),
    }
    with open(os.path.join(os.path.dirname(__file__), "crossval_ab_r12.json"), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in ("old_med", "new_med")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
