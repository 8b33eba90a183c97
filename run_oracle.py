#!/usr/bin/env python
"""Local pre-flight for the driver's t2 gate: run every queries()[name]
against its oracle_sql()[name] and print PASS/FAIL per query.

Usage: python run_oracle.py [key ...]     (no keys = all, at sf0.01)
       python run_oracle.py --both [key ...]   # sf0.01 AND sf0.1 —
           the documented pre-commit regression gate (VERDICT r02 #8:
           cross-SF sweeps catch ordering/-0.0-class bugs that a single
           SF can hold green by luck)
       SF_DIR=/root/testdata/sf0.01 python run_oracle.py
       VANILLA=1 python run_oracle.py   # bare SparkSession, as the
                                        # grading driver builds it
"""

from __future__ import annotations

import os
import sys
import time

import __spark_entry__ as entrymod  # noqa: F401  (driver-contract import path)
from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import compare, duck_connection
from knn_with_mapreduce_cuda_spark.session import get_spark


def sweep(spark, sf_dir: str, keys: list[str]) -> int:
    import gc

    qs = registry.queries()
    oracles = registry.oracle_sql(sf_dir)  # renders {SF_DIR} per scale
    if keys:
        qs = {k: qs[k] for k in keys}
    con = duck_connection(sf_dir)
    failures = 0
    for i, (name, fn) in enumerate(qs.items()):
        if i and i % 25 == 0:
            # heap hygiene for long sweeps in a DRIVER-SHAPED session
            # (VANILLA = bare local[8], 1g default heap): a full-registry
            # sf0.1 sweep accumulated enough JVM-side state (cached
            # relations, MLlib broadcast remnants pinned by py4j refs)
            # to OOM the heap mid-sweep under concurrent pytest load —
            # clearing the cache and collecting dropped py4j handles
            # every 25 keys keeps the high-water bounded.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            gc.collect()
        t0 = time.time()
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {n} rows  ({time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"FAIL      {name}: rows-only error {str(e)[:300]}")
            continue
        try:
            res = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL      {name}: harness error {str(e)[:300]}")
            continue
        tag = "PASS" if res.ok else "FAIL"
        failures += 0 if res.ok else 1
        extra = "" if res.ok else f"  {res.detail}"
        print(f"{tag}      {name}: {res.spark_rows} rows  ({time.time()-t0:.1f}s){extra}")
    print(f"\n[{sf_dir}] {len(qs) - failures}/{len(qs)} ok")
    return failures


def main() -> int:
    args = sys.argv[1:]
    both = "--both" in args
    keys = [a for a in args if not a.startswith("--")]
    if os.environ.get("VANILLA"):
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("run-oracle")
    sf_dirs = (
        ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        if both
        else [os.environ.get("SF_DIR", "/root/testdata/sf0.01")]
    )
    failures = 0
    for sf_dir in sf_dirs:
        failures += sweep(spark, sf_dir, keys)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
