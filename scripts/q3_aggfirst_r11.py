#!/usr/bin/env python
"""Round-11 flat-Q3 A/B (VERDICT r10 #2): the shipped reduce-first +
shuffle-semi plan vs the judge's proposed single-exchange aggregate-
first variant — aggregate lineitem by orderkey FIRST (map-side partial
agg shrinks the shuffle payload from 600 k raw rows to ~150 k partial
groups), then semi-filter the AGGREGATED side against the reduced
BUILDING orderkeys, so the semi join reuses the aggregation's
hash(o_orderkey) partitioning instead of exchanging raw lineitem rows.

Trade being measured: aggregate-first shuffles partial aggregates (and
the post-agg semi join touches 150 k rows, not 600 k) but computes
revenue for EVERY orderkey — ~5× the qualifying set (BUILDING ≈ 1/5),
work the shipped filter-first plan never does. At 100 TB filter-first
wins asymptotically when the filter is selective; at toy scale the raw
row shuffle dominates, which is exactly the residual the shape-floor
decomposition attributes to this row.

Protocol (bench discipline): idle gate before measuring, 1 warm-up +
5 warm runs per variant under the shipped ROW_CONFS, answers asserted
identical, DuckDB probe timed in-session for the ratio, loser recorded
in this artifact either way.

OUTCOME (q3_aggfirst_r11.json + q3_aggfirst_100x_r11.json):
aggregate-first won BOTH scales — sf0.1 median 0.494 vs 0.616, 100×
2.42 s vs 3.65 s (1.68× vs 2.53× against DuckDB) — and SHIPPED as
bench.q3_shape; the reduce-first form below is the recorded loser
(the fallback when the dimension filter is selective enough that
qualifying orders are rare). After adoption this script's "shipped"
arm re-times the new plan; q3_shape_r09_reduce_first preserves the
loser for future A/Bs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import bench
from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark.sql.functions import col

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONFS = dict(bench.ROW_CONFS["rel_join_broadcast_q3"])

DUCK_Q3 = (
    "SELECT l_orderkey AS o_orderkey, "
    "sum(l_extendedprice * (1 - l_discount)) AS revenue "
    "FROM lineitem WHERE l_orderkey IN ("
    "SELECT o_orderkey FROM orders WHERE o_custkey IN ("
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) "
    "GROUP BY l_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"
)


def q3_shape_r09_reduce_first(spark, sf_dir):
    """The r09 reduce-first + shuffle-semi plan (the recorded loser of
    this A/B, preserved verbatim): semi-filter RAW lineitem against the
    reduced BUILDING orderkeys, then aggregate reusing the join's
    exchange."""
    cust = tables.table(spark, sf_dir, "customer")
    orders = tables.table(spark, sf_dir, "orders")
    li = tables.table(spark, sf_dir, "lineitem")
    bo = orders.join(
        F.broadcast(
            cust.filter(col("c_mktsegment") == "BUILDING").select("c_custkey")
        ),
        col("o_custkey") == col("c_custkey"),
        "left_semi",
    ).select("o_orderkey")
    return (
        li.join(
            bo.hint("SHUFFLE_HASH"),
            col("l_orderkey") == col("o_orderkey"),
            "left_semi",
        )
        .groupBy(col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(col("l_extendedprice") * (1 - col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q3_aggfirst(spark, sf_dir):
    """Aggregate-first variant: one hash(l_orderkey) exchange carrying
    map-side partial aggregates; the semi join consumes the agg's
    partitioning (no raw-row exchange). SHIPPED as bench.q3_shape
    after winning both scales."""
    cust = tables.table(spark, sf_dir, "customer")
    orders = tables.table(spark, sf_dir, "orders")
    li = tables.table(spark, sf_dir, "lineitem")
    bo = orders.join(
        F.broadcast(
            cust.filter(col("c_mktsegment") == "BUILDING").select("c_custkey")
        ),
        col("o_custkey") == col("c_custkey"),
        "left_semi",
    ).select("o_orderkey")
    rev = li.groupBy(col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(col("l_extendedprice") * (1 - col("l_discount"))).alias("revenue")
    )
    return (
        rev.join(bo.hint("SHUFFLE_HASH"), "o_orderkey", "left_semi")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def timed(spark, fn) -> dict:
    defaults = {k: spark.conf.get(k, None) for k in CONFS}
    for k, v in CONFS.items():
        spark.conf.set(k, v)
    try:
        rs = []
        rows = None
        for _ in range(6):
            t0 = time.perf_counter()
            rows = fn().collect()
            rs.append(round(time.perf_counter() - t0, 3))
    finally:
        for k, old in defaults.items():
            spark.conf.unset(k) if old is None else spark.conf.set(k, old)
    return {
        "runs": rs,
        "median_warm": round(statistics.median(rs[1:]), 3),
        "best": min(rs),
        "load1": round(os.getloadavg()[0], 2),
        "_rows": rows,
    }


def main() -> None:
    deadline = time.time() + 600
    while os.getloadavg()[0] > 2.0 and time.time() < deadline:
        time.sleep(10)
    gate = round(os.getloadavg()[0], 2)
    spark = get_spark("q3_aggfirst_r11")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer"):
        tables.table(spark, SF_DIR, t).count()
    out: dict = {"sf_dir": SF_DIR, "idle_gate_load1": gate, "confs": CONFS}
    a = timed(spark, lambda: q3_shape_r09_reduce_first(spark, SF_DIR))
    b = timed(spark, lambda: bench.q3_shape(spark, SF_DIR))
    assert [tuple(r) for r in a.pop("_rows")] == [
        tuple(r) for r in b.pop("_rows")
    ], "variants disagree"
    out["shipped_reduce_first"] = a
    out["aggfirst"] = b
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    ds = []
    for _ in range(6):
        t0 = time.perf_counter()
        con.execute(DUCK_Q3).fetchall()
        ds.append(round(time.perf_counter() - t0, 3))
    out["duckdb_probe"] = {"runs": ds, "median_warm": round(statistics.median(ds[1:]), 3)}
    for k in ("shipped_reduce_first", "aggfirst"):
        out[k]["ratio_vs_duck"] = round(
            out[k]["median_warm"] / out["duckdb_probe"]["median_warm"], 2
        )
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "q3_aggfirst_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
