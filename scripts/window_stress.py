#!/usr/bin/env python
"""Global-window vs two-phase prefix scan at amplified scale (round-4
global-window sweep). Measures the exact shapes the sweep converted:

1. running sum + row_number over a total order (the CDF/rank shape),
2. exact ntile (the decile/quintile shape),

on N deterministic rows, via (a) the single-partition global window the
r1 operators used and (b) plans/prefix.py. Asserts bit-identical
aggregate results, prints one JSON document with run spreads and load
averages (the measurement-provenance convention of scale_proof.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import col, lit

from knn_with_mapreduce_cuda_spark.plans import prefix
from knn_with_mapreduce_cuda_spark.session import get_spark

N = int(os.environ.get("WINDOW_STRESS_N", "5000000"))
RUNS = int(os.environ.get("WINDOW_STRESS_RUNS", "3"))


def data(spark):
    # deterministic, shuffled-looking order key with ties + a tie-break
    return spark.range(N, numPartitions=32).select(
        ((col("id") * 2654435761) % 1000003).alias("k"),
        col("id").alias("tie"),
        ((col("id") * 7) % 1000 - 500).alias("v"),
    )


def timed(fn):
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"best_s": min(runs), "runs": runs, "load1": round(os.getloadavg()[0], 1)}


def checksum(df):
    # order-insensitive digest of (rn, cs) so both shapes can be compared
    r = df.agg(
        F.count(lit(1)).alias("n"),
        F.sum(F.pmod(col("rn") * col("cs"), lit(1048576))).alias("x"),
        F.sum("cs").alias("s"),
    ).collect()[0]
    return (r["n"], r["x"], r["s"])


def main() -> None:
    spark = get_spark("window-stress")
    spark.sparkContext.setLogLevel("ERROR")
    d = data(spark)
    order_spec = ["k", "tie"]
    order = prefix._order(order_spec)

    def global_shape():
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return d.select(
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rn"),
            F.sum("v").over(w).alias("cs"),
        )

    def prefix_shape():
        return prefix.attach_running(
            d, order_spec, sums={"v": "cs"}, rn="rn"
        ).select("rn", "cs")

    assert checksum(global_shape()) == checksum(prefix_shape())

    out = {
        "n_rows": N,
        # aggregate over the produced columns — a bare count() lets
        # Catalyst prune the (row-preserving) Window away entirely and
        # times a no-op scan.
        "cum_rank": {
            "global_window": timed(
                lambda: global_shape().agg(F.sum("cs"), F.max("rn")).collect()
            ),
            "prefix_scan": timed(
                lambda: prefix_shape().agg(F.sum("cs"), F.max("rn")).collect()
            ),
        },
        "ntile10": {
            "global_window": timed(
                lambda: d.select(
                    F.ntile(10).over(Window.orderBy(*order)).alias("b")
                )
                .groupBy("b")
                .count()
                .collect()
            ),
            "prefix_scan": timed(
                lambda: prefix.ntile_exact(d, order_spec, 10, "b")
                .groupBy("b")
                .count()
                .collect()
            ),
        },
    }
    for sec in ("cum_rank", "ntile10"):
        g, p = out[sec]["global_window"]["best_s"], out[sec]["prefix_scan"]["best_s"]
        out[sec]["speedup"] = round(g / p, 2) if p else None
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
