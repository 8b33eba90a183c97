#!/usr/bin/env python
"""Interleaved isolated A/B for the r12 batch-4 edits
(ml_ivf_recall_at10, ml_dim_ablation).

VERDICT r11 #4 discipline: before (git HEAD, via a worktree) and after
(working tree) alternate A,B,A,B in time so a host window cannot fake a
win. Each sample is a FRESH subprocess session (cheap warm-up key
first, then 1 cold + 3 warm noop-sink runs of the key; statistic of
record = warm median). Result equality is proven separately (oracle
both SFs + pinned golden digests unchanged); this script is timing
only.

Usage: python scripts/abl_ivf_ab_r12.py [--rounds 3]
Artifact: scripts/abl_ivf_ab_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

AFTER_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEFORE_ROOT = "/tmp/repo_head_r12"
SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
KEYS = ["ml_ivf_recall_at10", "ml_dim_ablation"]
WARMUP_KEY = "rel_agg_hash"
NWARM = 3

_PROG = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
os.chdir({root!r})
from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.session import get_spark
spark = get_spark("ab_r12")
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
sf = {sf!r}
qs[{warm!r}](spark, sf).write.format("noop").mode("overwrite").save()
out = {{}}
for k in {keys!r}:
    t0 = time.perf_counter()
    qs[k](spark, sf).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    warm = []
    for _ in range({nwarm}):
        t0 = time.perf_counter()
        qs[k](spark, sf).write.format("noop").mode("overwrite").save()
        warm.append(round(time.perf_counter() - t0, 3))
    out[k] = {{"cold": round(cold, 3), "warm_runs": warm}}
print("ABJSON:" + json.dumps(out))
"""


def run_variant(root: str) -> dict:
    prog = _PROG.format(root=root, sf=SF_DIR, warm=WARMUP_KEY, keys=KEYS, nwarm=NWARM)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, text=True, env=env,
        cwd=root, timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"variant at {root} failed:\n{r.stderr[-2000:]}")


def main() -> int:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    samples = {"before": [], "after": []}
    for i in range(rounds):
        print(f"round {i + 1}/{rounds}: before...", flush=True)
        samples["before"].append(run_variant(BEFORE_ROOT))
        print(f"round {i + 1}/{rounds}: after...", flush=True)
        samples["after"].append(run_variant(AFTER_ROOT))
    summary = {}
    for k in KEYS:
        row = {}
        for side in ("before", "after"):
            meds = [statistics.median(s[k]["warm_runs"]) for s in samples[side]]
            colds = [s[k]["cold"] for s in samples[side]]
            row[side] = {
                "warm_medians": meds,
                "warm": round(statistics.median(meds), 3),
                "cold_median": round(statistics.median(colds), 3),
            }
        row["speedup_warm"] = round(row["before"]["warm"] / row["after"]["warm"], 2)
        summary[k] = row
    art = {
        "_meta": {
            "sf_dir": SF_DIR,
            "rounds": rounds,
            "nwarm": NWARM,
            "protocol": "alternating fresh-session subprocess per variant, "
            "warm-up key first, warm median of medians",
            "before": "git HEAD via /tmp/repo_head_r12 worktree",
        },
        "summary": summary,
        "samples": samples,
    }
    out = os.path.join(AFTER_ROOT, "scripts", "abl_ivf_ab_r12.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
