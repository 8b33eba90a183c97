#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query (and any extra
registry key given on argv) into plans/r12/<name>_<tag>.txt.

Usage:
    python scripts/gen_plans_r12.py before [key ...]
    python scripts/gen_plans_r12.py after  [key ...]

Bench queries are planned under their ROW_CONFS (the confs their timed
runs use), so the captured plan is the one the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from knn_with_mapreduce_cuda_spark import registry, tables  # noqa: E402
from knn_with_mapreduce_cuda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    extra = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans_r12")
    spark.sparkContext.setLogLevel("ERROR")

    def plan(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # bench rows need their setup artifacts to *plan* (bucketed tables,
    # PQ store); build them once, untimed, like bench.main does.
    bench.setup_bucketed(spark, SF_DIR)
    from knn_with_mapreduce_cuda_spark.operators import llm

    llm._pq_store(spark, SF_DIR)

    targets: dict[str, object] = dict(bench.BENCH_QUERIES)
    qs = registry.queries()
    for k in extra:
        if k in qs and k not in targets:
            targets[k] = qs[k]

    for name, fn in targets.items():
        saved = {}
        for ck, cv in bench.ROW_CONFS.get(name, {}).items():
            saved[ck] = spark.conf.get(ck, None)
            spark.conf.set(ck, cv)
        try:
            txt = plan(fn(spark, SF_DIR))
        except Exception as e:  # keep capturing the rest
            txt = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        finally:
            for ck, old in saved.items():
                if old is None:
                    spark.conf.unset(ck)
                else:
                    spark.conf.set(ck, old)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
