#!/usr/bin/env python
"""ml_dbscan symmetric-halving candidate: A/B + equality assert.

Same algebra as the knn_crossval batch-5 change (guide §2.3):
d(a,b) = d(b,a) bit-identically in IEEE doubles, so the ε pair join's
euclidean fold over every ORDERED pair computes each value twice.
Candidate: fold qid < tid pairs only, filter < ε, localCheckpoint the
HALF edge list (half the checkpoint bytes too), and derive the full
directed ε-edge list as half ∪ mirror(half) — every consumer (counts
groupBy, core_edges qid<tid dedup, border min-cluster) is set-based,
so the row multiset is identical.

Usage: python scripts/dbscan_half_ab_r12.py
Artifact: scripts/dbscan_half_ab_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.functions.vector import METRICS
from knn_with_mapreduce_cuda_spark.operators.iterative import (
    DBSCAN_EPS,
    DBSCAN_MINPTS,
    _q_dbscan,
    connected_components,
)
from knn_with_mapreduce_cuda_spark.session import get_spark

ROUNDS = 5


def dbscan_half(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    a = e.select(col("vec_id").alias("qid"), col("emb").alias("qemb"))
    b = e.select(col("vec_id").alias("tid"), col("emb").alias("temb"))
    fanout = e.sparkSession.sparkContext.defaultParallelism
    half = (
        a.repartition(fanout, col("qid"))
        .join(F.broadcast(b), col("qid") < col("tid"))
        .withColumn("dist", METRICS["euclidean"]("qemb", "temb"))
        .filter(col("dist") < DBSCAN_EPS)
        .select("qid", "tid")
        .localCheckpoint(eager=True)
    )
    close = half.unionByName(
        half.select(col("tid").alias("qid"), col("qid").alias("tid"))
    )
    counts = close.groupBy("qid").agg(F.count("*").alias("n_in_eps"))
    core = counts.filter(col("n_in_eps") >= DBSCAN_MINPTS).select(
        col("qid").alias("id")
    )
    core_edges = (
        close.join(core.select(col("id").alias("qid")), "qid")
        .join(core.select(col("id").alias("tid")), "tid")
        .filter(col("qid") < col("tid"))
        .select(col("qid").alias("a"), col("tid").alias("b"))
    )
    comp = connected_components(core, core_edges)
    border = (
        close.join(comp.select(col("id").alias("tid"), "cluster"), "tid")
        .join(core.select(col("id").alias("qid")), "qid", "left_anti")
        .groupBy("qid")
        .agg(F.min("cluster").alias("b_cluster"))
    )
    return (
        e.select("vec_id")
        .join(counts.select(col("qid").alias("vec_id"), "n_in_eps"), "vec_id", "left")
        .join(
            comp.select(col("id").alias("vec_id"), col("cluster").alias("c_cluster")),
            "vec_id",
            "left",
        )
        .join(border.select(col("qid").alias("vec_id"), "b_cluster"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_in_eps", F.lit(0)).cast("long").alias("n_in_eps"),
            col("c_cluster").isNotNull().cast("int").alias("is_core"),
            F.coalesce("c_cluster", "b_cluster", F.lit(-1)).cast("long").alias("cluster"),
        )
    )


def t_noop(build, spark, sf_dir) -> float:
    """Time CONSTRUCTION + materialization: _q_dbscan localCheckpoints
    its edge list eagerly at DataFrame-construction time, so timing a
    pre-built df would exclude the quadratic join (the first A/B cut
    read 0.41 s/0.43 s — both variants' builds escaped the window)."""
    t0 = time.perf_counter()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dbscan_half_ab")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, sf_dir, "embeddings").count()

    old_rows = sorted(map(tuple, _q_dbscan(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, dbscan_half(spark, sf_dir).collect()))
    identical = old_rows == new_rows
    print("identical:", identical, "rows:", len(old_rows))
    if not identical:
        bad = [(o, n) for o, n in zip(old_rows, new_rows) if o != n][:5]
        print("first diffs:", bad)
        return 1

    runs = {"old": [], "new": []}
    for i in range(ROUNDS):
        runs["old"].append(t_noop(_q_dbscan, spark, sf_dir))
        runs["new"].append(t_noop(dbscan_half, spark, sf_dir))
        print(f"round {i + 1}: old {runs['old'][-1]} new {runs['new'][-1]}", flush=True)
    art = {
        "sf_dir": sf_dir,
        "identical": identical,
        "old_runs": runs["old"],
        "new_runs": runs["new"],
        "old_med": statistics.median(runs["old"]),
        "new_med": statistics.median(runs["new"]),
    }
    with open(
        os.path.join(os.path.dirname(__file__), "dbscan_half_ab_r12.json"), "w"
    ) as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in ("old_med", "new_med")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
