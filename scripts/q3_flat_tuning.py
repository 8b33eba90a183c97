#!/usr/bin/env python
"""Flat-layout Q3 @100× tuning probe (VERDICT r05 #4: flat q3 measured
2.18× DuckDB at 100×; either close it below 2.0× with AQE/shuffle
sizing or formally designate the bucketed variant as the at-scale plan).

Hypothesis under test: the post-semi-join aggregation exchanges ~3 M
(o_orderkey) groups ≈ 50 MB, which AQE's default 64 MB advisory
partition size coalesces into ONE post-shuffle partition — a
single-threaded final aggregation over 3 M groups. A smaller advisory
size (or more shuffle partitions) should spread the final agg.

Reuses the factor-100 amplified scratch written by scale_proof.py.
Run on a quiet host: python scripts/q3_flat_tuning.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import q3_shape
from knn_with_mapreduce_cuda_spark.session import get_spark
from scripts.scale_proof import SCRATCH, duck_sql  # noqa: F401 — shared scratch

CONFIGS = [
    ("current", {}),
    ("advisory16m", {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"}),
    ("advisory8m", {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"}),
    ("advisory4m", {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m"}),
    ("sp128", {"spark.sql.shuffle.partitions": "128"}),
    (
        "advisory8m_sp128",
        {
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.shuffle.partitions": "128",
        },
    ),
]


def timed_runs(n, fn):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    spark = get_spark("q3-flat-tuning")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.shuffle.partitions",
        )
    }
    result: dict = {"scratch": SCRATCH, "load1_start": round(os.getloadavg()[0], 1)}
    q3_shape(spark, SCRATCH).count()  # warm scans/JIT once, untimed
    for name, confs in CONFIGS:
        for k, v in confs.items():
            spark.conf.set(k, v)
        runs = timed_runs(5, lambda: q3_shape(spark, SCRATCH).count())
        result[name] = {
            "spark_runs": runs,
            "spark_s": min(runs),
            "load1": round(os.getloadavg()[0], 1),
        }
        for k, v in defaults.items():  # restore between configs
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SCRATCH}/{t}.parquet/*.parquet')"
        )
    sql = duck_sql("rel_join_broadcast_q3", True)
    druns = timed_runs(5, lambda: con.execute(sql).fetchall())
    result["duckdb"] = {"runs": druns, "duckdb_s": min(druns)}
    for name, _ in CONFIGS:
        result[name]["ratio"] = round(
            result[name]["spark_s"] / result["duckdb"]["duckdb_s"], 2
        )
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
