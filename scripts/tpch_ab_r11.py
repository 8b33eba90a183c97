#!/usr/bin/env python
"""A/B: TPC-H q7/q8 join-tree pruning (r11 optimization).

q7: the nation-pair disjunction filter runs AFTER the 4-table join; the
implied per-side constraint (supp/cust nation ∈ {NATION_1, NATION_2})
is not derived by Catalyst, so customer/supplier flow un-pruned through
the join tree. Pre-filtering BOTH nation dims to the two nations prunes
customers/suppliers ~12× before the fact joins; the final pair filter
is unchanged, so results are identical (the pre-filter is implied by
it).

q8: lineitem joins orders BEFORE the far more selective broadcast part
join (p_type = STANDARD, ~1/25); swapping the two inner joins prunes
the fact side first. Inner-join reorder — results identical.

Artifact: scripts/tpch_ab_r11.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import tpch
from knn_with_mapreduce_cuda_spark.operators.tpch import cents
from knn_with_mapreduce_cuda_spark.session import get_spark

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def q7_pruned(spark, sf_dir):
    nation = tables.table(spark, sf_dir, "nation")
    nations2 = ["NATION_1", "NATION_2"]
    n1 = nation.select(
        col("n_nationkey").alias("s_nk"), col("n_name").alias("supp_nation")
    ).filter(col("supp_nation").isin(nations2))
    n2 = nation.select(
        col("n_nationkey").alias("c_nk"), col("n_name").alias("cust_nation")
    ).filter(col("cust_nation").isin(nations2))
    li = tables.table(spark, sf_dir, "lineitem").filter(
        col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    return (
        li.join(tables.table(spark, sf_dir, "orders"), col("l_orderkey") == col("o_orderkey"))
        .join(tables.table(spark, sf_dir, "customer"), col("o_custkey") == col("c_custkey"))
        .join(tables.table(spark, sf_dir, "supplier"), col("l_suppkey") == col("s_suppkey"))
        .join(F.broadcast(n1), col("s_nationkey") == col("s_nk"))
        .join(F.broadcast(n2), col("c_nationkey") == col("c_nk"))
        .filter(
            ((col("supp_nation") == "NATION_1") & (col("cust_nation") == "NATION_2"))
            | ((col("supp_nation") == "NATION_2") & (col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
                "revenue_cents"
            )
        )
    )


def q8_part_first(spark, sf_dir):
    nation = tables.table(spark, sf_dir, "nation")
    cn = nation.select(
        col("n_nationkey").alias("c_nk"), col("n_regionkey").alias("c_rk")
    )
    sn = nation.select(
        col("n_nationkey").alias("s_nk"), col("n_name").alias("supp_nation")
    )
    region = tables.table(spark, sf_dir, "region").filter(col("r_name") == "ASIA")
    orders = tables.table(spark, sf_dir, "orders").filter(
        col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    part = tables.table(spark, sf_dir, "part").filter(col("p_type") == "STANDARD")
    li = tables.table(spark, sf_dir, "lineitem")
    vol = cents(col("l_extendedprice") * (1 - col("l_discount")))
    return (
        li.join(F.broadcast(part), col("l_partkey") == col("p_partkey"))
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(tables.table(spark, sf_dir, "customer"), col("o_custkey") == col("c_custkey"))
        .join(F.broadcast(cn), col("c_nationkey") == col("c_nk"))
        .join(F.broadcast(region), col("c_rk") == col("r_regionkey"))
        .join(tables.table(spark, sf_dir, "supplier"), col("l_suppkey") == col("s_suppkey"))
        .join(F.broadcast(sn), col("s_nationkey") == col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0))).alias(
                "nation_cents"
            ),
            F.sum(vol).alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.round(F.lit(100.0) * col("nation_cents") / col("total_cents"), 4).alias(
                "mkt_share_pct"
            ),
        )
    )


def main() -> None:
    spark = get_spark("tpch_ab_r11")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region", "part"):
        tables.table(spark, SF, t).count()

    def timed(fn, label, n=4):
        rs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: {rs} median-warm={statistics.median(rs[1:])}")
        return rs

    for name, cur, var in (
        ("q7", tpch._q7, q7_pruned),
        ("q8", tpch._q8, q8_part_first),
    ):
        a = sorted(map(tuple, cur(spark, SF).collect()))
        b = sorted(map(tuple, var(spark, SF).collect()))
        assert a == b, f"{name} variant changes the result!"
        print(f"{name}: answers identical ({len(a)} rows)")

    out = {
        "q7_current": timed(tpch._q7, "q7 current"),
        "q7_pruned_dims": timed(q7_pruned, "q7 pruned"),
        "q8_current": timed(tpch._q8, "q8 current"),
        "q8_part_first": timed(q8_part_first, "q8 part-first"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpch_ab_r11.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
