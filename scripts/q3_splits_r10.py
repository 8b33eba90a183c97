#!/usr/bin/env python
"""Round-10 follow-up to scripts/q3_floor_r10.py: the flat-Q3 row's
residual over its adjacent shape-floor twin is ~0.23 s at sf0.1 while
DuckDB does the same data in ~43 ms. Hypothesis: lineitem.parquet at
sf0.1 is 10.8 MB — ONE 128 MB input split — so the scan AND the
map-side shuffle write of 600 k rows run on one core while 31 idle
(DuckDB scans with 4 threads). `spark.sql.files.maxPartitionBytes` is
the same knob cluster_confs() pins to 128m at 100 TB, sized here to
the toy files instead. Variants (all under the shuffle-partitions=8
row cap, 1 warm-up + 5 warm runs each, conf restored after):

  A. cap8 only (the shipped ROW_CONFS)
  B. cap8 + maxPartitionBytes=2m   (~5 splits — row-group bounded)
  C. cap8 + maxPartitionBytes=1m
  D. cap16 + maxPartitionBytes=1m
  E. cap8 + maxPartitionBytes=512k
Also re-times rel_agg_hash under B for the symmetric check.
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
from knn_with_mapreduce_cuda_spark.operators import relational
from knn_with_mapreduce_cuda_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = {
    "A_cap8": {"spark.sql.shuffle.partitions": "8"},
    "B_cap8_split2m": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": "2m",
    },
    "C_cap8_split1m": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": "1m",
    },
    "D_cap16_split1m": {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.files.maxPartitionBytes": "1m",
    },
    "E_cap8_split512k": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": "512k",
    },
}


def timed(spark, fn, confs) -> dict:
    defaults = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        rs = []
        for _ in range(6):
            t0 = time.perf_counter()
            fn().count()
            rs.append(round(time.perf_counter() - t0, 3))
    finally:
        for k, old in defaults.items():
            spark.conf.unset(k) if old is None else spark.conf.set(k, old)
    return {
        "runs": rs,
        "median_warm": round(statistics.median(rs[1:]), 3),
        "best": min(rs),
        "load1": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    spark = get_spark("q3_splits_r10")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer"):
        tables.table(spark, SF_DIR, t).count()
    out: dict = {"sf_dir": SF_DIR, "q3": {}, "agg": {}}
    base = None
    for name, confs in VARIANTS.items():
        rows_holder = {}

        def fn():
            df = bench.q3_shape(spark, SF_DIR)
            rows_holder["rows"] = df.collect()
            return df

        out["q3"][name] = timed(spark, fn, confs)
        if base is None:
            base = rows_holder["rows"]
        assert rows_holder["rows"] == base, f"{name} changed the answer"
    for name in ("A_cap8", "B_cap8_split2m"):
        out["agg"][name] = timed(
            spark, lambda: relational._q_agg_hash(spark, SF_DIR), VARIANTS[name]
        )
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "q3_splits_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
