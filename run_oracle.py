#!/usr/bin/env python
"""Local pre-flight for the driver's t2 gate: run every queries()[name]
against its oracle_sql()[name] at sf0.01 and print PASS/FAIL per query.

Usage: python run_oracle.py [key ...]   (no keys = all)
       SF_DIR=/root/testdata/sf0.01 python run_oracle.py
       VANILLA=1 python run_oracle.py   # bare SparkSession, as the
                                        # grading driver builds it
"""

from __future__ import annotations

import os
import sys
import time

import __spark_entry__ as entrymod
from knn_with_mapreduce_cuda_spark.oracle import compare, duck_connection
from knn_with_mapreduce_cuda_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    keys = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if keys:
        qs = {k: qs[k] for k in keys}
    if os.environ.get("VANILLA"):
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("run-oracle")
    con = duck_connection(sf_dir)
    failures = 0
    for name, fn in qs.items():
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
    print(f"\n{len(qs) - failures}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
