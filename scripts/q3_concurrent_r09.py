#!/usr/bin/env python
"""Flat-layout Q3 @100×: the round-9 serialization attempt (VERDICT r08
#5 — "the 0.9 s cost is two sequential HashedRelation builds; trigger
the two broadcast builds concurrently").

The two builds are DEPENDENT (bo's semi join consumes the customer-keys
broadcast), so literal concurrency inside the reduce-first broadcast
plan is impossible — but the serialization can be attacked two ways,
both measured here against the r08 baseline and the same-session DuckDB
twin:

- `concurrent_warm` — the verdict's literal shape: two Python threads
  materialize the reduction subtree (bo.count()) and the lineitem probe
  columns concurrently, then the full query runs. Spark does NOT reuse
  broadcast exchanges across actions, so this can only help through
  page-cache warming — included to record the attempt honestly.
- `shuffle_semi` — restructure: keep broadcast(cust keys) (300k rows,
  cheap build), but make lineitem⋈bo a SHUFFLE_HASH semi join instead
  of a broadcast. This (a) removes the expensive 3M-key driver-side
  HashedRelation build+ship entirely, (b) lets the lineitem map stage
  run CONCURRENTLY with the orders-reduction stage (independent stages
  of one job — the concurrency the verdict asked for, expressed in
  plan shape rather than threads), and (c) hands the agg
  hash(l_orderkey) partitioning from the join exchange, so the
  groupBy adds NO further exchange.
- `shuffle_semi_bloom` — same, with runtime bloom-filter injection
  explicitly enabled (prunes the lineitem exchange map-side).

Run on a quiet host (the 100× amplify takes ~100 s of setup):
    SCALE_FACTOR=100 python scripts/q3_concurrent_r09.py
Output: one JSON doc; prose lands in SCALE.md §9h.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.session import get_spark
from scripts.scale_proof import FACTOR, SCRATCH, amplify, duck_sql, timed_runs

RUNS = int(os.environ.get("Q3_RUNS", "5"))


def q3_shape(spark, sf_dir):
    """The r01–r08 flat baseline (reduce-first, BOTH joins broadcast) —
    pinned here verbatim because bench.q3_shape ADOPTED the winning
    shuffle-semi form after this script's measurement; the artifact's
    flat_baseline row must keep measuring the shape it measured."""
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
        li.join(F.broadcast(bo), col("l_orderkey") == col("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(col("l_extendedprice") * (1 - col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q3_shuffle_semi(spark, sf_dir):
    """Q3 with the lineitem⋈bo step as a SHUFFLE_HASH semi join."""
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


def concurrent_warm(spark, sf_dir):
    """The literal two-thread materialization attempt, timed END TO END
    (warm threads + the real query — broadcast relations are not
    reusable across actions, so the query re-builds them)."""
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
    t1 = threading.Thread(target=lambda: bo.count())
    t2 = threading.Thread(
        target=lambda: li.select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ).count()
    )
    t1.start(), t2.start()
    t1.join(), t2.join()
    return q3_shape(spark, sf_dir)


def main() -> None:
    spark = get_spark("q3-concurrent")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"factor": FACTOR, "runs_per_variant": RUNS}
    if not os.path.isdir(os.path.join(SCRATCH, "lineitem.parquet")):
        t0 = time.perf_counter()
        amplify(spark)
        out["amplify_s"] = round(time.perf_counter() - t0, 3)

    # reference values once: every variant must return the same top-10
    want = [tuple(r) for r in q3_shape(spark, SCRATCH).collect()]

    variants = {
        "flat_baseline": lambda: q3_shape(spark, SCRATCH),
        "shuffle_semi": lambda: q3_shuffle_semi(spark, SCRATCH),
        "concurrent_warm": lambda: concurrent_warm(spark, SCRATCH),
    }
    for name, make in variants.items():
        got = [tuple(r) for r in make().collect()]
        assert [g[0] for g in got] == [w[0] for w in want], f"{name} diverges"
        runs = timed_runs(RUNS, lambda: make().collect())
        out[name] = {
            "best_s": min(runs),
            "runs": runs,
            "load1": round(os.getloadavg()[0], 1),
        }

    # bloom-filter variant needs the conf flipped before planning
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    got = [tuple(r) for r in q3_shuffle_semi(spark, SCRATCH).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    runs = timed_runs(RUNS, lambda: q3_shuffle_semi(spark, SCRATCH).collect())
    out["shuffle_semi_bloom"] = {
        "best_s": min(runs),
        "runs": runs,
        "load1": round(os.getloadavg()[0], 1),
    }
    spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")

    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SCRATCH}/{t}.parquet/*.parquet')"
        )
    sql = duck_sql("rel_join_broadcast_q3", True)
    druns = timed_runs(RUNS, lambda: con.execute(sql).fetchall())
    out["duckdb"] = {"best_s": min(druns), "runs": druns}
    d = out["duckdb"]["best_s"]
    for v in ("flat_baseline", "shuffle_semi", "shuffle_semi_bloom", "concurrent_warm"):
        out[v]["vs_duckdb"] = round(out[v]["best_s"] / d, 2) if d else None
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
