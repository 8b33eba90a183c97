"""Central query registry — merges each operator module's QUERIES/ORACLE.

Every SURVEY.md §2 row ships as one entry in ``queries()`` plus (when
SQL-expressible) one in ``oracle_sql()``. Modules are imported lazily so a
bug in one tier can't take down the whole contract.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: operator modules contributing QUERIES / ORACLE dicts, in tier order.
_MODULES = [
    "knn_with_mapreduce_cuda_spark.operators.knn",
    "knn_with_mapreduce_cuda_spark.operators.relational",
    "knn_with_mapreduce_cuda_spark.operators.llm",
    "knn_with_mapreduce_cuda_spark.operators.streaming_batch",
    "knn_with_mapreduce_cuda_spark.operators.udf",
    "knn_with_mapreduce_cuda_spark.operators.sources_io",
    "knn_with_mapreduce_cuda_spark.operators.iterative",
    "knn_with_mapreduce_cuda_spark.operators.tpch",
    "knn_with_mapreduce_cuda_spark.operators.analytics",
]


#: SURVEY.md §2's graded contract, in table order (T1→T5). All 67 keys
#: lead the queries()/oracle_sql() dicts so a driver that checks a prefix
#: (time-budgeted gate) always covers the declared inventory first.
SURVEY_QKEYS = [
    # T1 — kNN core
    "knn_scan", "knn_normalize_minmax", "knn_normalize_zscore", "knn_split",
    "knn_allpairs", "knn_dist_euclidean", "knn_dist_sqeuclidean",
    "knn_dist_manhattan", "knn_dist_cosine", "knn_topk", "knn_classify",
    "knn_regress", "knn_join", "knn_accuracy", "knn_confusion",
    # T2 — relational surface
    "rel_scan_project_filter", "rel_join_broadcast", "rel_join_shuffle",
    "rel_join_outer", "rel_join_semi_anti", "rel_join_theta_range",
    "rel_join_asof", "rel_agg_hash", "rel_agg_distinct", "rel_agg_approx",
    "rel_agg_grouping_sets", "rel_window_rank", "rel_window_analytic",
    "rel_window_frame", "rel_sort_limit", "rel_topk_per_group",
    "rel_setop_union", "rel_setop_intersect_except", "rel_subquery",
    "rel_fn_string", "rel_fn_date", "rel_fn_math", "rel_fn_conditional",
    "rel_fn_array", "rel_fn_map_struct", "rel_fn_json", "rel_dedup_exact",
    "rel_sample", "rel_explain_pivot",
    # T3 — LLM pipeline
    "llm_dedup_hash", "llm_dedup_near_minhash", "llm_simsearch_topk",
    "llm_text_tokenize", "llm_text_ngram", "llm_text_tfidf",
    "llm_text_stats", "llm_multimodal_join", "llm_lang_partition",
    # T4 — streaming (batch-equivalent forms)
    "str_window_tumbling", "str_window_sliding", "str_window_session",
    "str_dedup_watermark", "str_late_data", "str_join_stream_static",
    "str_join_stream_stream", "str_stateful_map", "str_sink",
    # T5 — UDF surface
    "udf_scalar_py", "udf_pandas_vectorized", "udf_grouped_agg",
    "udf_map_arrow", "udf_udtf",
]


#: Round-5 rotation window (VERDICT r04 "Next round" #3): union of
#: driver-green keys after r04 is 177/366, zero red rows, zero overlap
#: wasted. This round fronts (a) the NEW stored-index PQ key plus the
#: never-graded keys whose implementation the round-5 prefix-scan /
#: sketch changes touched (they must earn their first driver row on
#: the new code), then (b) the heaviest remaining never-graded keys:
#: the kNN pair tier, the rest of the graph tier, multi-stage ML, and
#: the ts/str heavies. Displaced keys keep their r01–r04 rows.
_ROTATE_FRONT = [
    # new this round — the stored-index ANN paths (flat + cell-partitioned)
    "llm_simsearch_pq_stored", "llm_simsearch_ivfpq_stored",
    # prefix-scan consumers, never driver-graded, re-sliced this round
    "ml_gains_table", "ts_drawdown", "ts_max_drawdown",
    "ts_merge_intervals", "str_rfm_segments", "graph_edge_length_stats",
    "ml_gini_user_activity", "graph_degree_gini", "str_power_users_pareto",
    "llm_vocab_coverage", "llm_zipf_slope", "ts_interp_linear",
    # kNN pair tier (BNLJ fan-out territory)
    "knn_radius", "knn_radius_pivot", "knn_mutual", "knn_k_sweep",
    "knn_predict_proba", "knn_kth_dist", "knn_centroid",
    "knn_classify_weighted",
    # remaining graph tier
    "graph_reciprocity", "graph_transitivity", "graph_component_sizes",
    "graph_linkpred_jaccard", "graph_assortativity",
    "graph_degree_entropy", "graph_summary_stats",
    # multi-stage ML heavies
    "ml_kmeans_inertia", "ml_kaplan_meier", "ml_learning_curve",
    "ml_ndcg_at10", "ml_cluster_purity_nmi", "ml_embed_drift_ks",
    "ml_ivf_recall_at10", "ml_spearman_rho", "ml_kendall_tau",
    "ml_markov_transitions",
    # time-series heavies
    "ts_backtest_snaive", "ts_cross_correlation", "ts_acf_significance",
    "ts_pacf_2", "ts_spectral_entropy", "ts_sax_symbols", "ts_rle_sax",
    # behavioral/stream heavies (str_churn_labels displaced to r06 by
    # the second new stored-index key — window stays exactly 50)
    "str_cohort_ltv", "str_pattern_match_seq", "str_time_to_convert",
    "str_user_temporal_entropy",
]


def _collect(attr: str) -> dict:
    merged: dict = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ModuleNotFoundError:
            continue
        for key, value in getattr(mod, attr, {}).items():
            if key in merged:
                raise ValueError(f"duplicate query key {key!r} from {mod_name}")
            merged[key] = value
    # Keys still needing a driver-green row first, then the rest of the
    # SURVEY contract, then engine extras — all in stable order.
    front = [k for k in _ROTATE_FRONT if k in merged]
    front += [k for k in SURVEY_QKEYS if k in merged and k not in front]
    ordered = {k: merged[k] for k in front}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered


#: the driver grades at this fixture scale; oracle strings carrying the
#: {SF_DIR} placeholder (currently src_parquet_metadata, whose SQL needs
#: a literal filesystem path) are rendered against it by default so the
#: driver runs valid verbatim SQL. run_oracle.py re-renders per SF.
GRADED_SF_DIR = "/root/testdata/sf0.01"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect("QUERIES")


def oracle_sql(sf_dir: str = GRADED_SF_DIR) -> dict[str, str]:
    out = _collect("ORACLE")
    known = set(queries())
    stray = set(out) - known
    if stray:
        raise ValueError(f"oracle entries without queries: {sorted(stray)}")
    stem = sf_dir.rstrip("/")
    return {k: v.replace("{SF_DIR}", stem) for k, v in out.items()}
