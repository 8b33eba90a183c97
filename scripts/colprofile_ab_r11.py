#!/usr/bin/env python
"""A/B: rel_column_profile reformulation (r11 optimization).

Diagnosis (plans/r11 + sweep_timing_r11.json: warm 14.4 s at sf0.1, the
slowest key in the registry): one agg mixing 6 countDistinct with
string min/max forces the Expand rewrite (x7 row multiplication) AND
SortAggregate (string min/max buffers are immutable, so hash agg is
off) — a sort over 4.2 M expanded wide rows for a 600 k-row profile.

Variant B splits the aggregate: (1) the non-distinct pass (count, null
sums, min/max) — no Expand; (2) the distinct counts alone — Expand x6
but pure hash aggregation (no string aggregate buffers). The two 1-row
results cross-join (both bounded), stack unchanged. Values identical by
construction (same aggregates over the same rows).

Usage: python scripts/colprofile_ab_r11.py
Artifact: scripts/colprofile_ab_r11.json
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
from knn_with_mapreduce_cuda_spark.operators.analytics import _q_column_profile
from knn_with_mapreduce_cuda_spark.session import get_spark

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
]


def variant_b(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")

    def _canon(c):
        if c in ("l_quantity", "l_extendedprice"):
            return F.expr(f"TRY_CAST(round({c} * 100, 0) AS BIGINT)")
        return col(c)

    base = li.agg(
        F.count("*").alias("n_rows"),
        *[F.sum(col(c).isNull().cast("long")).alias(f"z_{c}") for c in COLS],
        *[F.min(_canon(c)).cast("string").alias(f"mn_{c}") for c in COLS],
        *[F.max(_canon(c)).cast("string").alias(f"mx_{c}") for c in COLS],
    )
    dist = li.agg(*[F.countDistinct(c).alias(f"d_{c}") for c in COLS])
    agg = base.crossJoin(F.broadcast(dist))
    stacked = ", ".join(f"'{c}', d_{c}, z_{c}, mn_{c}, mx_{c}" for c in COLS)
    return agg.selectExpr(
        "n_rows",
        f"stack({len(COLS)}, {stacked}) AS (col_name, n_distinct, n_null, "
        "min_str, max_str)",
    )


def main() -> None:
    spark = get_spark("colprofile_ab_r11")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, SF, "lineitem").count()  # warm scan

    def timed(fn, label, n=4):
        rs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: {rs} median-warm={statistics.median(rs[1:])}")
        return rs

    # answers identical first (sorted rows compare)
    a_rows = sorted(map(tuple, _q_column_profile(spark, SF).collect()))
    b_rows = sorted(map(tuple, variant_b(spark, SF).collect()))
    assert a_rows == b_rows, "variant B changes the result!"
    print(f"answers identical: {len(a_rows)} rows")

    out = {
        "current_expand_sortagg": timed(_q_column_profile, "A current"),
        "split_agg": timed(variant_b, "B split"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "colprofile_ab_r11.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
