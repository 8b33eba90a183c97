#!/usr/bin/env python
"""Round-12 optimization: full-registry wall-time sweep at sf0.1,
with the instrument-trust upgrade VERDICT r11 #4 asked for.

Guide §1 (measure first): time EVERY registry query through the noop
sink (computes every column of every row, no sink cost, no oracle
comparator cost). The r11 sweep had 2-4x per-key session noise (six
untouched keys read high in the after-sweep and had to be re-timed by
hand in a side note). This round's instrument records the noise
handling IN the artifact:

- 1 cold + NWARM warm samples per key; the statistic of record is the
  WARM MEDIAN (a single warm sample was the r11 noise source);
- when a reference sweep is given (--ref), any key whose warm median
  moved more than +-50% vs the reference AND is not job-floor-dominated
  (>= 0.5 s on either side) is RE-TIMED in a fresh isolated session
  (cheap warm-up key first, then 1 cold + NWARM warm), and the re-time
  lands in the same JSON under "retime" — the sweep of record carries
  its own noise rejection instead of a side note.

Usage:
    python scripts/sweep_timing_r12.py [key ...]
    python scripts/sweep_timing_r12.py --ref scripts/sweep_timing_r12.json \
        --out scripts/sweep_timing_r12_after.json
    SF_DIR=/root/testdata/sf0.1 python scripts/sweep_timing_r12.py

Artifact: {key: {cold, warm_runs, warm, err[, retime]}} + _meta.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NWARM = 3
#: |delta| bar for the isolated re-time pass (VERDICT r11 #4)
RETIME_REL = 0.5
#: keys below this on BOTH sides are job-floor-dominated at sf0.1 — a
#: 50% move there is scheduling jitter, not a plan change
RETIME_ABS_S = 0.5


def time_key(spark, qs, k: str, sf_dir: str) -> dict:
    rec: dict = {"cold": None, "warm_runs": [], "warm": None, "err": None}
    spark.sparkContext.setJobDescription(f"sweep_r12:{k}")
    t0 = time.perf_counter()
    try:
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
        return rec
    rec["cold"] = round(time.perf_counter() - t0, 3)
    for _ in range(NWARM):
        t0 = time.perf_counter()
        try:
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
            return rec
        rec["warm_runs"].append(round(time.perf_counter() - t0, 3))
    rec["warm"] = round(statistics.median(rec["warm_runs"]), 3)
    return rec


def retime_isolated(key: str, sf_dir: str) -> dict | None:
    """Re-time one key in a FRESH process/session: a cheap warm-up key
    first (session/codegen warm-up lands there, not on the key), then
    the key itself through time_key. Runs as a subprocess so the JVM is
    genuinely new — the in-sweep session's accumulated heap/cache state
    was exactly the r11 noise mechanism."""
    prog = (
        "import json,sys,os;"
        "sys.path.insert(0, %r);"
        "from knn_with_mapreduce_cuda_spark import registry;"
        "from knn_with_mapreduce_cuda_spark.session import get_spark;"
        "from scripts.sweep_timing_r12 import time_key;"
        "spark = get_spark('sweep_r12_retime');"
        "spark.sparkContext.setLogLevel('ERROR');"
        "qs = registry.queries();"
        "time_key(spark, qs, 'rel_sort_limit', %r);"
        "print('RETIME_JSON ' + json.dumps(time_key(spark, qs, %r, %r)))"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        sf_dir,
        key,
        sf_dir,
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RETIME_JSON "):
                return json.loads(line[len("RETIME_JSON "):])
    except Exception:
        pass
    return None


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    ref_path = out_path = None
    keys_arg: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--ref":
            ref_path = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            keys_arg.append(args[i])
            i += 1

    from knn_with_mapreduce_cuda_spark import registry
    from knn_with_mapreduce_cuda_spark.session import get_spark

    spark = get_spark("sweep_timing_r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    keys = [k for k in keys_arg if k in qs] or list(qs)
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
        rec = time_key(spark, qs, k, sf_dir)
        out[k] = rec
        print(
            f"[{i + 1}/{len(keys)}] {k}: cold={rec['cold']} warm={rec['warm']}"
            + (f" ERR {rec['err']}" if rec["err"] else ""),
            flush=True,
        )

    # isolated re-time pass for outliers vs the reference sweep
    retimed: list[str] = []
    if ref_path and os.path.exists(ref_path):
        ref = json.load(open(ref_path))
        spark.stop()  # the fresh-session re-times must not inherit this JVM
        for k, rec in out.items():
            if k.startswith("_") or rec.get("err") or rec.get("warm") is None:
                continue
            rw = (ref.get(k) or {}).get("warm")
            if not rw:
                continue
            if max(rec["warm"], rw) < RETIME_ABS_S:
                continue
            if abs(rec["warm"] - rw) / rw <= RETIME_REL:
                continue
            print(f"retime (isolated): {k} warm={rec['warm']} ref={rw}", flush=True)
            rt = retime_isolated(k, sf_dir)
            if rt is not None:
                rec["retime"] = rt
                rec["retime_ref_warm"] = rw
                retimed.append(k)
                print(
                    f"  -> isolated warm={rt['warm']} (runs {rt['warm_runs']})",
                    flush=True,
                )

    out["_meta"] = {
        "sf_dir": sf_dir,
        "total_wall_s": round(time.time() - t_start, 1),
        "n_keys": len(keys),
        "nwarm": NWARM,
        "ref": ref_path,
        "retimed": retimed,
        "retime_bar": {"rel": RETIME_REL, "abs_s": RETIME_ABS_S},
    }
    path = out_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sweep_timing_r12.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
