"""Round-4 global-window sweep: converted operators must plan ZERO
partition-less Window over unbounded inputs (a partition-less Window
executes on one partition — the one shape that cannot survive a
corpus-sized input). In `explain` output a global window prints as
``Window [fns], [order]`` (two bracket groups) while a keyed window
prints ``Window [fns], [part], [order]`` (three); counting the
two-group form counts the single-partition windows in a plan.

Operators whose remaining global windows run over relations bounded by
construction (top-k rows after a limit, hour/day calendar buckets,
k-level score distributions) assert their expected bounded count, so a
regression that re-introduces a corpus-sized one fails the pin."""

from __future__ import annotations

import re

from knn_with_mapreduce_cuda_spark import registry
from tests.conftest import SF_SMOKE
from tests.test_plans import _plan

# WindowGroupLimit is excluded: it prints [partition], [order] as two
# groups but is partition-local by definition.
_GLOBAL_WINDOW = re.compile(r"(?<!Group)(?<!GroupLimit )Window \[[^\]]*\], \[[^\]]*\](?!, \[)")


def n_global_windows(df) -> int:
    # The r09 distributive prefix recombine (SCALE.md §9l) computes the
    # exclusive-prefix OFFSETS as a window ordered by the slice id over
    # the per-slice TOTALS relation — one row per slice, bounded by the
    # shuffle-partition ceiling, never by the data (the same bounded
    # relation the collect strategy used to pull to the driver). It is
    # the one partition-less window that is safe at any corpus size, and
    # it is identifiable by its `_prefix_pid` order key (a name private
    # to plans/prefix.py), so the audit exempts exactly that form and
    # keeps the zero-pin strong for everything else.
    return len(
        [
            m
            for m in _GLOBAL_WINDOW.findall(_plan(df, "simple"))
            if "_prefix_pid" not in m
        ]
    )


#: fully converted — no single-partition window anywhere in the plan.
_ZERO = [
    "ml_roc_curve",
    "ml_pr_curve",
    "ml_youden_threshold",
    "ml_average_precision",
    "ml_best_f1_threshold",
    "ml_tpr_at_fixed_fpr",
    "ml_operating_point_card",
    "ml_ks_test",
    "ml_decision_stump",
    "ml_spearman_rho",
    "ml_gini_user_activity",
    "graph_degree_gini",
    "str_power_users_pareto",
    "llm_vocab_coverage",
    "ts_drawdown",
    "ts_max_drawdown",
    "ts_merge_intervals",
    "ts_interp_linear",
    "str_rfm_segments",
    "ml_conformal_knn",
    "graph_edge_length_stats",
]

#: converted to bounded inputs — the rank window survives but runs over
#: ≤ k rows delivered by TakeOrderedAndProject / a calendar-bucket agg.
_BOUNDED = {
    "llm_search_bm25": 1,  # rank over top-10
    "llm_zipf_slope": 1,  # rank over top-100
    "ml_gains_table": 1,  # cum over 10 deciles
    "llm_heavy_hitters_cms": 1,  # rank over top-20
    "rel_sample_weighted": 1,  # rank over top-WSAMPLE_N
}


def test_converted_keys_have_zero_global_windows(spark):
    qs = registry.queries()
    offenders = {}
    for key in _ZERO:
        n = n_global_windows(qs[key](spark, SF_SMOKE))
        if n:
            offenders[key] = n
    assert not offenders, offenders


def test_bounded_keys_hold_their_window_budget(spark):
    qs = registry.queries()
    for key, budget in _BOUNDED.items():
        n = n_global_windows(qs[key](spark, SF_SMOKE))
        assert n <= budget, (key, n, budget)


def test_topk_goes_through_take_ordered(spark):
    # the rank≤k conversions must actually plan the bounded-heap top-k
    qs = registry.queries()
    for key in ("llm_search_bm25", "rel_sample_weighted", "llm_zipf_slope"):
        assert "TakeOrderedAndProject" in _plan(qs[key](spark, SF_SMOKE)), key
