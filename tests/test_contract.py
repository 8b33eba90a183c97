"""Driver-contract checks: entry() smoke, registry key consistency
(SURVEY.md §5 t1 + the queries()/oracle_sql() shape the grader relies on)."""

from __future__ import annotations

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE


def test_registry_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)
    # every registry entry is hash-graded since round 2 (the former
    # rows-only LSH pair is now recall-gated, VERDICT.md r01 #2)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_doc_counts_match_registry():
    """Docs must carry generated counts (scripts/gen_counts.py --fix),
    not hand-synced ones — README said 358 while the registry had 359
    in round 2 (VERDICT r02 #6)."""
    import os
    import re

    n = len(entrymod.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in ("README.md", "COVERAGE.md"):
        text = open(os.path.join(root, path)).read()
        for m in re.findall(r"(\d{3,}) queries", text):
            assert int(m) == n, f"{path} says '{m} queries', registry has {n}"


def test_rotation_window_policy():
    """The driver grades the first 50 registry keys. The rotation
    policy (VERDICT r04 #3, tightened per ADVICE r05 #4): the window
    holds EXACTLY 50 keys, every one registered, and none carrying a
    driver row from a previous round — a repeated key wastes a grading
    slot — EXCEPT keys listed in registry._RE_EARNED (deliberate
    re-grades after an output-changing edit). The current round's own
    artifact is identified by round NUMBER (the max-r file, and only
    when its key set is exactly this window — i.e. it IS this
    rotation's grading), not by an overlap fraction that would mask
    genuine 25+-key repeats."""
    import glob
    import json
    import os
    import re

    from knn_with_mapreduce_cuda_spark import registry

    front = registry._ROTATE_FRONT
    qs = registry.queries()
    assert len(front) == 50
    assert set(front) <= set(qs)
    assert list(qs)[:50] == front  # the window IS the registry prefix
    assert set(registry._RE_EARNED) <= set(front)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            artifacts[int(m.group(1))] = set(json.load(open(path)))
        except Exception:
            continue
    if artifacts:
        latest = max(artifacts)
        if artifacts[latest] == set(front):
            # the max-round artifact IS this window's own grading run —
            # the one legitimate full overlap; everything older counts.
            del artifacts[latest]
    graded: set[str] = set().union(*artifacts.values()) if artifacts else set()
    overlap = [k for k in front if k in graded and k not in registry._RE_EARNED]
    assert overlap == [], f"window repeats driver-graded keys: {overlap}"
    # The pinned r08 plan (VERDICT r06 #4): _ROTATE_NEXT + this window
    # must cover EVERY never-driver-graded registry key exactly once —
    # no key lost between windows, no slot wasted on a graded key.
    nxt = registry._ROTATE_NEXT
    assert set(nxt) <= set(qs)
    assert not set(nxt) & set(front)
    assert not set(nxt) & graded, "r08 plan repeats driver-graded keys"
    never = set(qs) - graded - set(front)
    assert set(nxt) == never, (
        f"r08 plan out of sync with never-graded set: "
        f"missing={sorted(never - set(nxt))} stale={sorted(set(nxt) - never)}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"qid", "pred_label", "true_label", "correct", "votes"} == set(df.columns)


def test_queries_run_at_smoke_sf(spark):
    # spot-check one query per tier runs at sf0.001 (full oracle matching
    # is run_oracle.py / the driver's t2 at sf0.01)
    qs = entrymod.queries()
    for key in ["knn_topk", "rel_agg_hash", "llm_text_stats", "str_window_session",
                "udf_map_arrow"]:
        assert qs[key](spark, SF_SMOKE).count() > 0


def test_re_earned_outputs_pinned():
    """The 9 freshness re-grades in the r08 window (_RE_EARNED) are
    declared output-UNCHANGED since their r01 driver rows — pin that
    mechanically against the golden digest file: the digests recorded
    when the claim was made are literals here, the LIVE values are
    asserted per-key by tests/test_golden.py against the same file, so
    an output change either fails test_golden (file not regenerated) or
    fails here (file regenerated via gen_golden.py --fix without
    re-fronting the key) — no duplicate Spark runs (review r08)."""
    import json
    import os

    from knn_with_mapreduce_cuda_spark import registry

    pinned = {
        "knn_scan": "ab3b136b82eee4a3",
        "knn_normalize_minmax": "faf0eda9faa8763c",
        "knn_normalize_zscore": "1ae4ee6f70aecafc",
        "knn_split": "02561560cdea93e6",
        "knn_allpairs": "49e2b12ca3494814",
        "knn_dist_euclidean": "879b7bb61d30e47c",
        "knn_dist_sqeuclidean": "fc9d17606df93ba2",
        "knn_dist_manhattan": "00723e4f183efe53",
        "knn_dist_cosine": "9376256cf7fd6b98",
    }
    assert set(pinned) == set(registry._RE_EARNED)
    root = os.path.dirname(os.path.abspath(__file__))
    golden = json.load(open(os.path.join(root, "golden_smoke_digests.json")))
    for key, want in pinned.items():
        assert golden[key] == want, (
            f"{key}: golden digest changed ({golden[key]} != {want}) — the "
            f"_RE_EARNED 'outputs unchanged' claim no longer holds; re-front "
            f"the key and update this pin"
        )
