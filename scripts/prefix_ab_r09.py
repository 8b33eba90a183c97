#!/usr/bin/env python
"""attach_running phase-2 strategy A/B at window-stress scale (VERDICT
r08 #4: the accepted `collect` form evaluates its sliced input twice —
totals job + final output job — a cost invisible at sf0.1 and real at
100 TB; measure localCheckpoint / persist against it, keep the winner).

Four strategies over the SAME 20 M-row running-sum+rank query:

- collect         — r01–r08 form: two jobs, sliced input evaluated twice
- distributive    — r09 form: totals stay a DataFrame, exclusive prefix
                    as a window over the ≤`parts`-row totals relation,
                    ONE job ⇒ ReuseExchange evaluates the input once
- localCheckpoint — collect form, sliced input lineage-truncated after
                    first evaluation (NOT fault-tolerant at scale)
- persist         — collect form, sliced input cached (no sound
                    unpersist point inside a lazy builder; the script
                    clears the cache between runs, the operator cannot)

Two inputs: `cheap` (range arithmetic — recompute is almost free, the
fixture-scale shape) and `heavy` (adds 4 chained sha2 hashes per row —
models a real upstream of scans + transforms whose second evaluation is
the cost the A/B exists to expose).

Run on a quiet host: python scripts/prefix_ab_r09.py
Output: one JSON doc; prose lands in SCALE.md §9k.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from knn_with_mapreduce_cuda_spark.plans import prefix
from knn_with_mapreduce_cuda_spark.session import get_spark

N = int(os.environ.get("PREFIX_AB_N", "20000000"))
RUNS = int(os.environ.get("PREFIX_AB_RUNS", "3"))
STRATEGIES = ["collect", "distributive", "localCheckpoint", "persist"]


def cheap(spark):
    return spark.range(N, numPartitions=32).select(
        ((col("id") * 2654435761) % 1000003).alias("k"),
        col("id").alias("tie"),
        ((col("id") * 7) % 1000 - 500).alias("v"),
    )


def heavy(spark):
    # 4 chained sha2 per row: stands in for a real upstream (parquet
    # scan + joins + expressions) whose SECOND evaluation is what the
    # collect strategy pays. Deterministic, so checksums still pin.
    h = F.sha2(col("id").cast("string"), 256)
    for _ in range(3):
        h = F.sha2(h, 256)
    return spark.range(N, numPartitions=32).select(
        ((col("id") * 2654435761) % 1000003).alias("k"),
        col("id").alias("tie"),
        (F.unhex(F.substring(h, 1, 4)).cast("binary").isNotNull().cast("long")
         * ((col("id") * 7) % 1000 - 500)).alias("v"),
    )


def run_one(spark, d, strategy):
    def q():
        return (
            prefix.attach_running(
                d, ["k", "tie"], sums={"v": "cs"}, rn="rn", strategy=strategy
            )
            .agg(
                F.count(lit(1)).alias("n"),
                F.sum(F.pmod(col("rn") * col("cs"), lit(1048576))).alias("x"),
                F.max("rn").alias("mr"),
            )
            .collect()[0]
        )

    runs, check = [], None
    for _ in range(RUNS):
        spark.catalog.clearCache()  # persist strategy: no cross-run reuse
        t0 = time.perf_counter()
        r = q()
        runs.append(round(time.perf_counter() - t0, 3))
        check = (r["n"], r["x"], r["mr"])
    return {
        "best_s": min(runs),
        "runs": runs,
        "load1": round(os.getloadavg()[0], 1),
        "checksum": check,
    }


def main() -> None:
    spark = get_spark("prefix-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_rows": N, "runs_per_point": RUNS}
    for name, maker in (("cheap_input", cheap), ("heavy_input", heavy)):
        d = maker(spark)
        # pre-warm the quantile-bounds memo so every strategy times the
        # same work (the first caller would otherwise pay the
        # approxQuantile job the memo saves for the rest)
        prefix.attach_running(d, ["k", "tie"], rn="_w", strategy="collect").limit(
            1
        ).collect()
        sec = {}
        for s in STRATEGIES:
            sec[s] = run_one(spark, d, s)
        checks = {tuple(v["checksum"]) for v in sec.values()}
        assert len(checks) == 1, f"value divergence across strategies: {sec}"
        base = sec["collect"]["best_s"]
        for s in STRATEGIES:
            sec[s]["vs_collect"] = (
                round(base / sec[s]["best_s"], 2) if sec[s]["best_s"] else None
            )
        out[name] = sec
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
