#!/usr/bin/env python
"""Round-12: reproduce + diagnose the driver-env matching-block spike
(VERDICT r11 #2: knn_classify_full regated warm median 9.968 s with
matching process-tree CPU 10.2 at 32 cores; ALL four matching rows ran
4-6x their in-suite medians in the driver's re-gated block, wall AND
tree-CPU inflated together — so the spike burns real single-threaded-
equivalent CPU per sample).

Design: build the bench session, accumulate the same JVM debt the real
suite accumulates (full BENCH_QUERIES pass + bucketed-table and PQ index
builds), then time the four matching rows with INTERLEAVED per-sample
modes in one session:

    nogc    — plain timed run (in-suite protocol)
    gceach  — System.gc() immediately before the timed run (the r11
              regated-block protocol, bench.run_block gc_each=True)

Per sample we record wall, process-tree CPU, and the DELTA of JVM GC
collection time + count (GarbageCollectorMXBeans) INSIDE the timed
region — separating "the sample itself GC'd" from every other
explanation. Optional knobs (env):

    GCSPIKE_BALLAST_MB    cache ~N MB of live rows first (fat-heap sim)
    SPARK_DRIVER_MEMORY   heap size under test (default 8g, the r11 value)
    GCSPIKE_SAMPLES       samples per mode per row (default 6)

Usage: python scripts/gcspike_r12.py  -> one JSON doc on stdout
       (artifacts: scripts/gcspike_r12_<tag>.json via GCSPIKE_TAG)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from knn_with_mapreduce_cuda_spark.session import get_spark  # noqa: E402


def gc_stats(spark) -> tuple[int, int]:
    """(total GC count, total GC millis) across all collectors."""
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    n = t = 0
    for i in range(beans.size()):
        b = beans.get(i)
        n += max(b.getCollectionCount(), 0)
        t += max(b.getCollectionTime(), 0)
    return n, t


def heap_used_mb(spark) -> float:
    mem = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getMemoryMXBean()
        .getHeapMemoryUsage()
    )
    return round(mem.getUsed() / (1 << 20), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples = int(os.environ.get("GCSPIKE_SAMPLES", "6"))
    ballast_mb = int(os.environ.get("GCSPIKE_BALLAST_MB", "0"))
    tag = os.environ.get("GCSPIKE_TAG", "default")
    spark = get_spark("gcspike_r12")
    spark.sparkContext.setLogLevel("ERROR")

    from knn_with_mapreduce_cuda_spark import tables
    from knn_with_mapreduce_cuda_spark.operators import llm

    for t in ("lineitem", "orders", "customer", "nation", "region",
              "supplier", "events", "documents"):
        tables.table(spark, sf_dir, t).count()
    tables.embeddings(spark, sf_dir).count()
    bench.setup_bucketed(spark, sf_dir)
    llm._pq_store(spark, sf_dir)

    ballast = None
    if ballast_mb:
        # live heap ballast: cached long rows, ~36 bytes/row on-heap
        rows = ballast_mb * (1 << 20) // 36
        ballast = spark.range(rows).selectExpr(
            "id", "id * 2 as a", "id * 3 as b"
        ).cache()
        ballast.count()

    # accumulate the suite's JVM debt exactly like bench.main: 3 runs
    # per row, row confs applied, no gates (debt is the point)
    for name, fn in bench.BENCH_QUERIES.items():
        saved = {}
        for k, v in bench.ROW_CONFS.get(name, {}).items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            for _ in range(3):
                fn(spark, sf_dir).count()
        finally:
            for k, old in saved.items():
                spark.conf.unset(k) if old is None else spark.conf.set(k, old)

    heap_after_suite = heap_used_mb(spark)

    out: dict = {
        "tag": tag,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g(default)"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "ballast_mb": ballast_mb,
        "heap_used_after_suite_mb": heap_after_suite,
        "samples": {},
    }

    # gcsettle = System.gc() then a short drain sleep BEFORE the timed
    # region: if it reads like nogc, the post-GC work (reference/cleaner
    # flood, codegen effects) is short-lived and the r11 gc_each protocol
    # was injecting exactly that work INTO the timed samples.
    # sleeponly = the same 1.5 s pause with NO GC: separates "GC
    # aftermath" from "any idle gap before the sample slows it" (the
    # slow-after-idle class the r11 forensics kept circling).
    modes = os.environ.get("GCSPIKE_MODES", "nogc,gceach,gcsettle").split(",")
    for sk in bench.DUCK_MATCHING_SPARK.values():
        fn = bench.BENCH_QUERIES[sk]
        saved = {}
        for k, v in bench.ROW_CONFS.get(sk, {}).items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        recs = []
        try:
            fn(spark, sf_dir).count()  # row warm-up (codegen)
            for i in range(len(modes) * samples):
                mode = modes[i % len(modes)]  # interleaved A,B,C,A,B,C
                if mode in ("gceach", "gcsettle"):
                    t_gc0 = time.perf_counter()
                    spark.sparkContext._jvm.System.gc()
                    if mode == "gcsettle":
                        time.sleep(1.5)
                    gc_call_s = round(time.perf_counter() - t_gc0, 3)
                elif mode == "sleeponly":
                    time.sleep(1.5)
                    gc_call_s = None
                else:
                    gc_call_s = None
                n0, g0 = gc_stats(spark)
                c0 = bench._tree_cpu_seconds()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                wall = round(time.perf_counter() - t0, 3)
                cpu = round(max(bench._tree_cpu_seconds() - c0, 0.0), 3)
                n1, g1 = gc_stats(spark)
                recs.append(
                    {
                        "mode": mode,
                        "wall": wall,
                        "cpu": cpu,
                        "gc_n": n1 - n0,
                        "gc_ms": g1 - g0,
                        "gc_call_s": gc_call_s,
                        "heap_mb": heap_used_mb(spark),
                    }
                )
        finally:
            for k, old in saved.items():
                spark.conf.unset(k) if old is None else spark.conf.set(k, old)
        out["samples"][sk] = recs
        import statistics

        for m in modes:
            ws = [r["wall"] for r in recs if r["mode"] == m]
            cs = [r["cpu"] for r in recs if r["mode"] == m]
            print(
                f"{sk} {m}: wall med {statistics.median(ws):.3f} "
                f"(runs {ws}) cpu med {statistics.median(cs):.3f}",
                flush=True,
            )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"gcspike_r12_{tag}.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": path, "heap_after_suite_mb": heap_after_suite}))


if __name__ == "__main__":
    main()
