#!/usr/bin/env python
"""Round-11 flat-Q3 aggregate-first A/B at 100× (companion to
scripts/q3_aggfirst_r11.py, which measured the toy sf0.1 scale): the
aggregate-first variant computes revenue for EVERY orderkey (~5× the
BUILDING-qualifying set), so a toy-scale win must be re-proven at
amplified scale before it can ship as the bench plan — 100 TB
efficiency outranks the sf0.1 number. Reuses the scale-proof 100×
scratch (60 M lineitem rows, 32 range-partitioned parts); DuckDB twin
on 4 threads, same protocol as scripts/scale_proof.time_weak_queries."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import bench
from knn_with_mapreduce_cuda_spark.session import get_spark
from scripts.q3_aggfirst_r11 import DUCK_Q3, q3_shape_r09_reduce_first

SCRATCH = os.path.join(
    os.path.expanduser("~/.cache/spark_graft_scratch"), "scale10x"
)


def runs(n, fn):
    rs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        rs.append(round(time.perf_counter() - t0, 3))
    return rs


def main() -> None:
    deadline = time.time() + 600
    while os.getloadavg()[0] > 2.0 and time.time() < deadline:
        time.sleep(10)
    spark = get_spark("q3_aggfirst_100x")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"scratch": SCRATCH, "idle_gate_load1": round(os.getloadavg()[0], 2)}
    a = runs(5, lambda: q3_shape_r09_reduce_first(spark, SCRATCH).count())
    b = runs(5, lambda: bench.q3_shape(spark, SCRATCH).count())
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SCRATCH}/{t}.parquet/*.parquet')"
        )
    d = runs(5, lambda: con.execute(DUCK_Q3).fetchall())
    dm = statistics.median(d[1:])
    for name, rs in (("shipped_reduce_first", a), ("aggfirst", b)):
        out[name] = {
            "runs": rs,
            "median_warm": round(statistics.median(rs[1:]), 3),
            "best": min(rs),
            "ratio_vs_duck": round(statistics.median(rs[1:]) / dm, 2),
        }
    out["duckdb_probe"] = {"runs": d, "median_warm": round(dm, 3)}
    sa = q3_shape_r09_reduce_first(spark, SCRATCH).collect()
    sb = bench.q3_shape(spark, SCRATCH).collect()
    assert [tuple(r) for r in sa] == [tuple(r) for r in sb], "variants disagree"
    print(json.dumps(out, indent=1))
    with open(
        os.path.join(os.path.dirname(__file__), "q3_aggfirst_100x_r11.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
