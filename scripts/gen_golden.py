#!/usr/bin/env python
"""Regenerate tests/golden_smoke_digests.json — canonical value digests
of every SURVEY §2 contract key at the smoke SF (sf0.001).

The DuckDB oracle gate proves Spark == oracle each run; these digests
pin the values against HISTORY: a change where the Spark query and its
oracle SQL drift together (agreeing corruption — the failure class the
stored-index staleness guards exist for) passes the oracle gate but
fails here, forcing the change to be explicit (rerun with --fix, and
re-front the key per the _RE_EARNED rotation discipline).

Usage: python scripts/gen_golden.py [--fix] [--all]
  (no flag: print drift vs the committed file, exit 1 on any;
   --fix: rewrite the file with current digests;
   --all: cover the FULL 368-key registry instead of the 67 contract
   keys, against tests/golden_smoke_digests_all.json — the full net
   matters most for keys whose oracle reads engine-produced artifacts
   (the stored ANN indexes), where code and oracle corrupt TOGETHER by
   construction; run as round-close evidence, not in pytest)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import canonical_rows
from knn_with_mapreduce_cuda_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
_TESTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
)


def digest(pdf) -> str:
    return hashlib.sha256(repr(canonical_rows(pdf)).encode()).hexdigest()[:16]


def main() -> int:
    spark = get_spark("golden")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    full = "--all" in sys.argv
    keys = list(qs) if full else registry.SURVEY_QKEYS
    out_name = "golden_smoke_digests_all.json" if full else "golden_smoke_digests.json"
    OUT = os.path.join(_TESTS, out_name)
    got, empty = {}, []
    for k in keys:
        pdf = qs[k](spark, SF_SMOKE).toPandas()
        got[k] = digest(pdf)
        if len(pdf) == 0:
            empty.append(k)
    if empty:
        # review r08: an empty-result pin asserts ONLY emptiness — a
        # break that returns zero rows for the wrong reason still
        # matches. Surface it so the evidence never overclaims.
        print(f"NOTE: {len(empty)} empty-at-smoke pins (digest asserts "
              f"emptiness, not values): {sorted(empty)}")
    if "--fix" in sys.argv:
        with open(OUT, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        print(f"wrote {len(got)} digests to {OUT}")
        return 0
    if not os.path.exists(OUT):
        # ADVICE r08: a missing digest file (fresh branch adding keys
        # before generation; the --all file is round-close-only) is
        # ALL-drift by the check contract, not a FileNotFoundError
        # traceback.
        print(f"MISSING {OUT}: no pinned digests — run with --fix first")
        print(f"0/{len(got)} match")
        return 1
    want = json.load(open(OUT))
    drift = {k: (want.get(k), v) for k, v in got.items() if want.get(k) != v}
    for k, (w, g) in drift.items():
        print(f"DRIFT {k}: pinned {w} != current {g}")
    # a pin whose key left the registry is drift too (review r08:
    # renames would otherwise leave stale entries forever)
    stale = sorted(set(want) - set(got))
    for k in stale:
        print(f"STALE {k}: pinned {want[k]} but no longer in the registry")
    print(f"{len(got) - len(drift)}/{len(got)} match, {len(stale)} stale")
    return 1 if drift or stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
