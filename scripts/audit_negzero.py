#!/usr/bin/env python
"""Audit: which registry queries EMIT an IEEE -0.0 anywhere?

A column that can produce -0.0 is one ulp of fold-order noise away from a
cross-engine hash mismatch (the driver's compare is repr-strict and
distinguishes -0.0 from 0.0): whether Spark and DuckDB agree on the sign
of a rounded near-zero value depends on accumulation order, so every
emitting site needs the SURVEY §7.2 ``+ 0.0`` normalization ON BOTH
ENGINES. The sf0.001/sf0.1 sweeps caught five such sites empirically;
this audit finds the rest proactively by scanning Spark output alone
(much cheaper than a full two-engine sweep, and detection does not need
the oracle: any -0.0 at all is a hazard).

Usage: python scripts/audit_negzero.py [sf_dir ...]
Prints one line per (query, column) that produced -0.0.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from knn_with_mapreduce_cuda_spark.session import get_spark


def has_negzero(v) -> bool:
    if isinstance(v, float):
        return v == 0.0 and math.copysign(1.0, v) < 0
    if isinstance(v, (list, tuple)):
        return any(has_negzero(x) for x in v)
    return False


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("negzero-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    flagged: dict[tuple[str, str], list[str]] = {}
    for sf_dir in sf_dirs:
        for name, fn in qs.items():
            t0 = time.time()
            try:
                rows = fn(spark, sf_dir).collect()
            except Exception as exc:  # sf-pinned keys etc.
                print(f"SKIP {name} @ {sf_dir}: {type(exc).__name__}")
                continue
            cols = rows[0].__fields__ if rows else []
            for r in rows:
                for c in cols:
                    if has_negzero(r[c]):
                        flagged.setdefault((name, c), []).append(sf_dir)
                        break
            print(f"done {name} @ {os.path.basename(sf_dir)} ({time.time()-t0:.1f}s)")
    print("\n== FLAGGED (query, column) emitting -0.0 ==")
    for (name, c), dirs in sorted(flagged.items()):
        print(f"NEGZERO {name}.{c} @ {','.join(sorted(set(os.path.basename(d) for d in dirs)))}")
    if not flagged:
        print("(none)")
    return 0


if __name__ == "__main__":
    main()
