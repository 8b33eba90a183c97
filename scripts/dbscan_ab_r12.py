#!/usr/bin/env python
"""Round-12: interleaved A/B for the connected-components contraction
(VERDICT r11 #3 — ml_dbscan at 8.07 s was the most expensive registry
key; its cost center is min-label propagation over the dense 705 k-edge
core ε-graph, where every round re-scans the full symmetric edge list).

A = r11 propagation (min-label rounds over the full edge list)
B = r12 star-contraction (one l0 = min(id ∪ N(id)) pass — the Kiveris
    large-star seed step — then propagation on the CONTRACTED quotient
    graph, then compose). Output provably identical: the quotient of a
    connected graph is connected and the component min m has l0(m) = m,
    so min-reachable-label composes through l0 unchanged.

Runs A,B,A,B,... in ONE session (VERDICT r11 #4: un-interleaved sweeps
carried 2-4x session noise) over the REAL graded queries by toggling
iterative.connected_components, asserts sorted results identical between
modes, and records every sample.

Usage: python scripts/dbscan_ab_r12.py [rounds]  (default 4)
Artifact: scripts/dbscan_ab_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import iterative
from knn_with_mapreduce_cuda_spark.session import get_spark


def cc_r11(nodes: DataFrame, edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """The r11 implementation, copied verbatim for the A side."""
    edges = edges.localCheckpoint(eager=True)
    sym = edges.select(col("a").alias("x"), col("b").alias("y")).unionByName(
        edges.select(col("b").alias("x"), col("a").alias("y"))
    )
    touched = sym.select(col("x").alias("id")).distinct().localCheckpoint(eager=True)
    labels = touched.select(col("id"), col("id").alias("cluster"))
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.y == labels.id)
            .groupBy("x")
            .agg(F.min("cluster").alias("nbr"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.x, "left")
            .select(
                "id",
                F.least(
                    col("cluster"), F.coalesce(col("nbr"), col("cluster"))
                ).alias("cluster"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(col("n.cluster") != col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    rest = nodes.join(touched, "id", "left_anti").select(
        col("id"), col("id").alias("cluster")
    )
    return labels.unionByName(rest)


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    while os.getloadavg()[0] > 2.0:  # idle gate (bench.py discipline)
        time.sleep(5)
    spark = get_spark("dbscan_ab_r12")
    spark.sparkContext.setLogLevel("ERROR")
    cc_r12 = iterative.connected_components  # the shipped (new) impl

    from knn_with_mapreduce_cuda_spark import registry

    qs = registry.queries()
    keys = ["ml_dbscan", "graph_components_dedup", "llm_dedup_apply"]

    out: dict = {"sf_dir": sf_dir, "keys": {}}
    for key in keys:
        fn = qs[key]

        def run(impl) -> tuple[float, float]:
            import bench

            iterative.connected_components = impl
            # the components memo would amortize the build across
            # samples — drop it so every sample pays the real build
            iterative._COMPONENTS_MEMO = tables.SessionMemo()
            c0 = bench._tree_cpu_seconds()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # wall inflates under ambient/GC contention; the tree-CPU
            # companion (VERDICT r09 #2a) is the contention-insensitive
            # statistic — the A/B diff is honest in CPU even when wall
            # is noisy (the ε-join's per-run garbage makes it so here)
            return (
                round(time.perf_counter() - t0, 3),
                round(max(bench._tree_cpu_seconds() - c0, 0.0), 3),
            )

        def rows(impl):
            iterative.connected_components = impl
            iterative._COMPONENTS_MEMO = tables.SessionMemo()
            return sorted(map(tuple, fn(spark, sf_dir).collect()))

        try:
            assert rows(cc_r11) == rows(cc_r12), f"{key}: results differ"
            run(cc_r11)  # warm both paths once before timing
            run(cc_r12)
            a, b, ac, bc = [], [], [], []
            for _ in range(rounds):
                w, c = run(cc_r11)
                a.append(w)
                ac.append(c)
                w, c = run(cc_r12)
                b.append(w)
                bc.append(c)
            out["keys"][key] = {
                "r11_runs": a,
                "r12_runs": b,
                "r11_cpu": ac,
                "r12_cpu": bc,
                "r11_med": round(statistics.median(a), 3),
                "r12_med": round(statistics.median(b), 3),
                "r11_cpu_med": round(statistics.median(ac), 3),
                "r12_cpu_med": round(statistics.median(bc), 3),
                "identical": True,
            }
            k = out["keys"][key]
            print(f"{key}: r11 med {k['r11_med']} (cpu {k['r11_cpu_med']}) "
                  f"r12 med {k['r12_med']} (cpu {k['r12_cpu_med']}) "
                  f"(r11 {a} / r12 {b})", flush=True)
        finally:
            iterative.connected_components = cc_r12
            iterative._COMPONENTS_MEMO = tables.SessionMemo()

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dbscan_ab_r12.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
