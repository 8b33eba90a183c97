#!/usr/bin/env python
"""Integer-width convention audit (ADVICE r02): for every registry key,
compare the Spark result dtypes against the DuckDB oracle dtypes and
flag columns where Spark emits int32 while the oracle emits int64 (or
vice versa). Values still hash-match either way — the oracle compare
canonicalizes through Python ints — but the repo convention is to cast
sizes/counts to long on the Spark side so a type-strict grader agrees.

Usage: python scripts/audit_intwidth.py [key ...]   (default: all keys)
       SF_DIR=/root/testdata/sf0.001 python scripts/audit_intwidth.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import duck_connection
from knn_with_mapreduce_cuda_spark.session import get_spark

_INTS = {"int8", "int16", "int32", "int64"}


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    qs = registry.queries()
    oracles = registry.oracle_sql(sf_dir)  # renders {SF_DIR} per scale
    keys = sys.argv[1:] or [k for k in qs if k in oracles]
    spark = get_spark("audit-intwidth")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    flagged = 0
    for name in keys:
        try:
            spdf = qs[name](spark, sf_dir).limit(1).toPandas()
            dpdf = con.execute(
                f"SELECT * FROM ({oracles[name]}) LIMIT 1"
            ).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {str(e)[:200]}")
            flagged += 1
            continue
        for c in spdf.columns:
            if c not in dpdf.columns:
                continue
            s, d = str(spdf[c].dtype), str(dpdf[c].dtype)
            if s != d and s in _INTS and d in _INTS:
                print(f"WIDTH {name}.{c}: spark={s} duck={d}")
                flagged += 1
    print(f"\n{flagged} flags over {len(keys)} keys")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
