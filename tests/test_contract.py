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
    """The driver grades the first 50 registry keys. POST-CLOSURE
    policy (VERDICT r08 #2 — the driver-graded union hit 368/368 in
    r08, so "never-graded first" is vacuous): the window holds EXACTLY
    50 keys, every one registered, and it must be the STALEST-FIRST
    window — _RE_EARNED (output-changed) keys lead, then all keys
    ordered by rounds-since-last-driver-row (never-graded new keys rank
    stalest of all), ties broken by the stable pre-rotation module
    order. registry.compute_stale_window() is the canonical
    computation; the pinned _ROTATE_FRONT must match it exactly, so a
    new CORRECTNESS artifact (or a new key) forces the next round's
    window to be re-declared consciously rather than drifting."""
    from knn_with_mapreduce_cuda_spark import registry

    front = registry._ROTATE_FRONT
    qs = registry.queries()
    assert len(front) == 50
    assert set(front) <= set(qs)
    assert list(qs)[:50] == front  # the window IS the registry prefix
    assert set(registry._RE_EARNED) <= set(front)
    want = registry.compute_stale_window(50)
    assert front == want, (
        f"window is not the stalest-first set: "
        f"unexpected={[k for k in front if k not in want]} "
        f"missing={[k for k in want if k not in front]}"
    )


def test_stale_window_freshness_bound():
    """No registry key's driver row may age past the full-rotation
    bound: 368 keys / 50 slots ≈ 8 rounds of staleness if the rotation
    never repeats — assert nothing is older than that, so a key dropped
    from the rotation (e.g. by a bad tie-break edit) surfaces as a test
    failure instead of silently never re-earning a driver row.

    Staleness MUST come from registry.staleness_map() — it applies the
    newest-artifact exclusion, so the driver writing the artifact this
    window asked for cannot re-arm this assertion mid-round (the r09
    self-arming failure, VERDICT r09 #1: this test reimplemented the
    map without the exclusion and went red the moment
    CORRECTNESS_r09.json landed on the frozen tree)."""
    from knn_with_mapreduce_cuda_spark import registry

    last = registry.staleness_map()
    if not last:
        return
    latest = max(last.values())
    qs = registry.queries()
    graded = [k for k in qs if k in last]
    # every graded key within ceil(368/50)=8 rounds, AND the current
    # window covers the oldest stratum (keys the bound is tightest for)
    overdue = [k for k in graded if latest - last[k] > 8]
    assert overdue == [], f"keys older than one full rotation: {overdue}"
    oldest = min(last[k] for k in graded)
    stratum = [k for k in graded if last[k] == oldest]
    missed = [k for k in stratum if k not in registry._ROTATE_FRONT]
    # the window must drain the oldest stratum first (up to its size)
    assert len(stratum) > 50 or missed == [], (
        f"oldest stratum (r{oldest:02d}) not fully re-graded: {missed}"
    )


def test_staleness_map_excludes_mid_round_artifact(tmp_path):
    """Regression for the r09 self-arming failure: an artifact whose
    key set is exactly _ROTATE_FRONT (i.e. the driver grading THIS
    window) must not change the staleness view; any other newest
    artifact must. Synthetic artifacts in tmp_path via the root
    override."""
    import json

    from knn_with_mapreduce_cuda_spark import registry

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {}, "b": {}}))
    base = registry.staleness_map(root=str(tmp_path))
    assert base == {"a": 1, "b": 1}
    # the driver writes this window's own grading run → excluded
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({k: {} for k in registry._ROTATE_FRONT}))
    assert registry.staleness_map(root=str(tmp_path)) == base
    # a DIFFERENT newest key set (a real later round) counts
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"a": {}}))
    got = registry.staleness_map(root=str(tmp_path))
    assert got["a"] == 3 and got["b"] == 1
    # every key the excluded-then-superseded r02 graded now counts too
    assert all(got[k] == 2 for k in registry._ROTATE_FRONT)


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
    """_RE_EARNED declares keys whose OUTPUT changed since their last
    driver row (they jump the staleness queue). This round it is empty:
    the r09 window is pure freshness re-grades, and the 'outputs
    unchanged' claim for every window key is carried mechanically by
    the golden digest net (tests/test_golden.py asserts every contract
    key's live digest against the committed file, and the r08 full-net
    sweep pinned all 368). If a future edit changes a graded key's
    output, gen_golden --fix will rewrite its digest, test_golden's
    git-visible diff records it, and that key belongs here."""
    from knn_with_mapreduce_cuda_spark import registry

    assert registry._RE_EARNED == []
