#!/usr/bin/env python
"""VERDICT r09 #2b — attack the rel_join_broadcast_q3 sf0.1 constant.

At 600 k lineitem rows the shuffle-semi plan pays ~6 stages x 32 shuffle
tasks for a problem DuckDB answers in ~40 ms. This experiment measures,
in ONE gated session, the flat-Q3 row under candidate task-count knobs:

  A. baseline          — session as bench.py builds it (32 shuffle parts,
                         AQE parallelismFirst=true)
  B. parallelismFirst  — spark.sql.adaptive.coalescePartitions.
                         parallelismFirst=false (AQE coalesces to the
                         advisory size instead of defaultParallelism;
                         the Spark docs' recommended production setting)
  C. advisory8m+B      — B plus advisoryPartitionSizeInBytes=8m
  D. shuffle8          — spark.sql.shuffle.partitions=8 (static cap)
  E. shuffle4          — spark.sql.shuffle.partitions=4

Each variant: 1 warm-up + 5 warm runs, median + best reported, conf
restored after. Prints one JSON doc; artifact goes to
scripts/q3_floor_r10.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = {
    "A_baseline": {},
    "B_parallelismFirst_false": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "C_B_plus_advisory8m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
    "D_shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "E_shuffle4": {"spark.sql.shuffle.partitions": "4"},
}


def main() -> None:
    spark = get_spark("q3_floor_r10")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer"):
        tables.table(spark, SF_DIR, t).count()

    # job floor, same statistic bench.py publishes
    floor_df = spark.range(1).cache()
    floor_df.count()
    floor = min(
        (lambda t0: (floor_df.count(), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    floor_df.unpersist()

    defaults = {k: spark.conf.get(k, None) for v in VARIANTS.values() for k in v}
    out: dict = {"sf_dir": SF_DIR, "job_floor_s": round(floor, 4), "variants": {}}
    expect = None
    for name, confs in VARIANTS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        rs = []
        rows = None
        for _ in range(6):
            t0 = time.perf_counter()
            rows = bench.q3_shape(spark, SF_DIR).collect()
            rs.append(round(time.perf_counter() - t0, 3))
        if expect is None:
            expect = rows
        assert rows == expect, f"{name} changed the answer"
        for k in confs:
            if defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])
        warm = rs[1:]
        out["variants"][name] = {
            "runs": rs,
            "median_warm": round(statistics.median(warm), 3),
            "best": min(rs),
            "load1": round(os.getloadavg()[0], 2),
        }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "q3_floor_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
