#!/usr/bin/env python
"""Round-12 spike forensics, part 2: WHAT burns the CPU in a matching-
block spike sample?

The r12-final bench run 1 spiked again at 24g heap (knn_classify_full
regated runs 20.2/15.9/11.9/... s, CPU ~= wall — a SINGLE thread's
worth of burn — and even the near-zero-data shape-floor twins read
3.4-4.3 s), so the heap-bistability fix (batch 2) reduced frequency but
did not kill the class. This probe splits each sample's process-tree
CPU into its components and tracks the JVM's own counters, to
discriminate the remaining hypotheses:

  jvm_cpu     — the Spark driver JVM process alone (utime+stime delta)
  py_cpu      — every python descendant (pyspark daemon/workers)
  drv_cpu     — this driver python process
  jit_ms      — delta of CompilationMXBean.getTotalCompilationTime():
                a JIT (re)compilation storm shows here
  gc_ms/gc_n  — GC collection time/count delta (GarbageCollectorMXBeans)
  loaded      — delta of loaded class count (ClassLoadingMXBean):
                codegen-cache misses regenerate+load classes
  py_spawned  — python PIDs in the tree at sample end that were not
                there at sample start: worker churn (a fresh worker
                re-imports numpy/pandas, ~0.3-0.5 s CPU each)

Protocol: same debt accumulation as gcspike_r12.py (full suite x3 +
bucketed + PQ builds in one session), then the four matching rows with
the regated protocol (System.gc() before each sample), 8 samples each.

Usage: python scripts/gcspike2_r12.py -> one JSON doc + per-sample lines
Artifact: scripts/gcspike2_r12_<GCSPIKE_TAG|split>.json
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from knn_with_mapreduce_cuda_spark.session import get_spark  # noqa: E402


def _procs() -> dict[int, tuple[int, float, str]]:
    clk = os.sysconf("SC_CLK_TCK")
    out: dict[int, tuple[int, float, str]] = {}
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            raw = open(path).read()
        except OSError:
            continue
        head, _, tail = raw.rpartition(")")
        fields = tail.split()
        pid = int(head.split("(", 1)[0])
        comm = head.split("(", 1)[1]
        ppid = int(fields[1])
        cpu = (int(fields[11]) + int(fields[12])) / clk
        out[pid] = (ppid, cpu, comm)
    return out


def tree_split() -> dict:
    """CPU split of this process tree: driver python / JVM / python
    descendants, plus the set of python pids (for churn detection)."""
    me = os.getpid()
    procs = _procs()
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    drv = jvm = py = other = 0.0
    py_pids: set[int] = set()
    stack = [me]
    while stack:
        pid = stack.pop()
        if pid not in procs:
            continue
        _, cpu, comm = procs[pid]
        if pid == me:
            drv += cpu
        elif comm == "java":
            jvm += cpu
        elif comm.startswith("python"):
            py += cpu
            py_pids.add(pid)
        else:
            other += cpu
        stack.extend(kids.get(pid, []))
    return {"drv": drv, "jvm": jvm, "py": py, "other": other, "py_pids": py_pids}


def jvm_beans(spark) -> dict:
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    gcs = mf.getGarbageCollectorMXBeans()
    n = t = 0
    for i in range(gcs.size()):
        b = gcs.get(i)
        n += max(b.getCollectionCount(), 0)
        t += max(b.getCollectionTime(), 0)
    comp = mf.getCompilationMXBean()
    cl = mf.getClassLoadingMXBean()
    # JIT code cache occupancy: when the reserved code cache (default
    # 240 MB with tiered compilation) fills, HotSpot disables/throttles
    # compilation and flushes nmethods — hot paths fall back to the
    # interpreter, degrading EVERYTHING (including trivial plans)
    # until sweeping frees space. The bistable multi-second matching
    # samples with CPU ~= wall fit that signature.
    cc_used = cc_max = 0
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        name = p.getName()
        if "CodeHeap" in name or "Code Cache" in name:
            u = p.getUsage()
            cc_used += u.getUsed()
            cc_max += u.getMax()
    return {
        "gc_n": n,
        "gc_ms": t,
        "jit_ms": comp.getTotalCompilationTime(),
        "loaded": cl.getTotalLoadedClassCount(),
        "unloaded": cl.getUnloadedClassCount(),
        "codecache_used_mb": round(cc_used / (1 << 20), 1),
        "codecache_max_mb": round(cc_max / (1 << 20), 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    samples = int(os.environ.get("GCSPIKE_SAMPLES", "8"))
    tag = os.environ.get("GCSPIKE_TAG", "split")
    spark = get_spark("gcspike2_r12")
    spark.sparkContext.setLogLevel("ERROR")

    from knn_with_mapreduce_cuda_spark import tables
    from knn_with_mapreduce_cuda_spark.operators import llm

    for t in ("lineitem", "orders", "customer", "nation", "region",
              "supplier", "events", "documents"):
        tables.table(spark, sf_dir, t).count()
    tables.embeddings(spark, sf_dir).count()
    bench.setup_bucketed(spark, sf_dir)
    llm._pq_store(spark, sf_dir)
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

    out: dict = {
        "tag": tag,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "(session default)"),
        "samples": {},
    }
    for sk in bench.DUCK_MATCHING_SPARK.values():
        fn = bench.BENCH_QUERIES[sk]
        saved = {}
        for k, v in bench.ROW_CONFS.get(sk, {}).items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        recs = []
        try:
            fn(spark, sf_dir).count()  # row warm-up
            for _ in range(samples):
                spark.sparkContext._jvm.System.gc()  # regated protocol
                b0 = jvm_beans(spark)
                s0 = tree_split()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                wall = round(time.perf_counter() - t0, 3)
                s1 = tree_split()
                b1 = jvm_beans(spark)
                recs.append(
                    {
                        "wall": wall,
                        "jvm_cpu": round(max(s1["jvm"] - s0["jvm"], 0), 2),
                        "py_cpu": round(max(s1["py"] - s0["py"], 0), 2),
                        "drv_cpu": round(max(s1["drv"] - s0["drv"], 0), 2),
                        "jit_ms": b1["jit_ms"] - b0["jit_ms"],
                        "gc_ms": b1["gc_ms"] - b0["gc_ms"],
                        "gc_n": b1["gc_n"] - b0["gc_n"],
                        "loaded": b1["loaded"] - b0["loaded"],
                        "unloaded": b1["unloaded"] - b0["unloaded"],
                        "py_spawned": len(s1["py_pids"] - s0["py_pids"]),
                        "py_alive": len(s1["py_pids"]),
                        "cc_used_mb": b1["codecache_used_mb"],
                        "cc_max_mb": b1["codecache_max_mb"],
                    }
                )
                print(f"{sk}: {json.dumps(recs[-1])}", flush=True)
        finally:
            for k, old in saved.items():
                spark.conf.unset(k) if old is None else spark.conf.set(k, old)
        out["samples"][sk] = recs
        walls = [r["wall"] for r in recs]
        print(f"{sk} wall med {statistics.median(walls):.3f} runs {walls}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"gcspike2_r12_{tag}.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()


