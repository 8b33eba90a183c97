#!/usr/bin/env python
"""Round-11 optimization: full-registry wall-time sweep at sf0.1.

Guide §1 (measure first): time EVERY registry query through the noop
sink (computes every column of every row, no sink cost, no oracle
comparator cost) so the per-operator optimization checklist starts from
measured numbers on THIS tree, not round-4/6 history. Two passes per
key (cold within session, then warm) — the warm number is the one plan
cost shows up in; the delta is scan-cache/codegen warm-up.

Usage:
    python scripts/sweep_timing_r11.py [key ...]    # default: all keys
    SF_DIR=/root/testdata/sf0.1 python scripts/sweep_timing_r11.py

Artifact: scripts/sweep_timing_r11.json  {key: {cold, warm, err}}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sweep_timing_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    keys = [k for k in sys.argv[1:] if k in qs] or list(qs)
    out: dict[str, dict] = {}
    t_start = time.time()
    for i, k in enumerate(keys):
        if i and i % 25 == 0:
            # heap hygiene, same rationale as run_oracle.sweep
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            gc.collect()
        spark.sparkContext.setJobDescription(f"sweep_r11:{k}")
        rec: dict = {"cold": None, "warm": None, "err": None}
        for field in ("cold", "warm"):
            t0 = time.perf_counter()
            try:
                qs[k](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                rec[field] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # record, keep sweeping
                rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
                break
        out[k] = rec
        print(
            f"[{i + 1}/{len(keys)}] {k}: cold={rec['cold']} warm={rec['warm']}"
            + (f" ERR {rec['err']}" if rec["err"] else ""),
            flush=True,
        )
    out["_meta"] = {
        "sf_dir": sf_dir,
        "total_wall_s": round(time.time() - t_start, 1),
        "n_keys": len(keys),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sweep_timing_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
