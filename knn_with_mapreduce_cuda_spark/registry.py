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


#: Round-10 rotation window — the POST-CLOSURE freshness policy
#: (VERDICT r08 "Next round" #2). The driver-graded contract closed at
#: 368/368 in r08 (zero red rows across nine rounds), so the 50-slot
#: window re-grades the STALEST keys: staleness = rounds since a key's
#: newest driver CORRECTNESS row, ties broken by the stable
#: pre-rotation merged-module order (NOT the rotated registry order,
#: which this list itself determines — that would be circular).
#: _RE_EARNED keys (output-changed since their last driver row) jump
#: the staleness queue; never-graded keys (new additions) rank as
#: staleness=∞ and front automatically. This list must equal
#: compute_stale_window(50) — enforced by tests/test_contract.py. This
#: round: the full 18-key r02 stratum (the 14 str_*/udf_* SURVEY
#: contract keys + 4 llm extras — VERDICT r09 #1/#5: drain it) plus
#: the 32 stalest of the 50 last graded r03.
_ROTATE_FRONT = [
    "llm_chunk_windows", "llm_dedup_incremental", "llm_tokenizer_fertility",
    "llm_shard_assignment", "str_window_tumbling", "str_window_sliding",
    "str_window_session", "str_dedup_watermark", "str_late_data",
    "str_join_stream_static", "str_join_stream_stream", "str_stateful_map",
    "str_sink", "udf_scalar_py", "udf_pandas_vectorized", "udf_grouped_agg",
    "udf_map_arrow", "udf_udtf", "rel_cte_recursive", "rel_merge_upsert",
    "llm_dedup_simhash", "llm_dedup_jaccard", "llm_dedup_embed",
    "llm_simsearch_gemm", "llm_simsearch_ivf", "llm_lang_id",
    "llm_quality_score", "llm_token_count", "llm_fingerprint",
    "llm_contamination", "llm_pii_redact", "llm_search_bm25",
    "llm_pack_sequences", "ml_naive_bayes", "llm_pipeline_e2e",
    "llm_pipeline_ingest", "src_parquet_metadata", "src_csv_roundtrip",
    "src_jsonl_roundtrip", "src_knn_text_roundtrip", "src_orc_roundtrip",
    "src_partition_prune_read", "src_python_datasource", "ml_kmeans_lloyd",
    "graph_components_dedup", "llm_dedup_apply", "graph_pagerank",
    "ml_pca_power", "ml_dbscan", "llm_cluster_topics",
]

#: Keys whose OUTPUT changed since their last driver row (an
#: intentional semantics edit): they jump the staleness queue and lead
#: the next window regardless of age (ADVICE r05 #4 discipline, carried
#: into the post-closure policy). Empty this round — no graded key's
#: output changed (golden digests pin this; tests/test_golden.py).
_RE_EARNED: list[str] = []


def staleness_map(root: str | None = None) -> dict[str, int]:
    """key → newest driver-CORRECTNESS round, with the NEWEST-ARTIFACT
    EXCLUSION applied: the newest CORRECTNESS_r*.json is ignored when
    its key set is exactly _ROTATE_FRONT (that file IS the current
    window's own grading run — counting it would re-rotate the window,
    or re-arm freshness assertions, every time the driver writes the
    artifact the window itself asked for; VERDICT r09 #1). This is THE
    canonical staleness view — compute_stale_window and the contract
    tests both read it, so they can never disagree. ``root`` overrides
    the artifact directory (tests inject synthetic artifacts)."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[int, set] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            rounds[int(m.group(1))] = set(json.load(open(path)))
        except Exception:
            continue
    if rounds and rounds[max(rounds)] == set(_ROTATE_FRONT):
        del rounds[max(rounds)]
    last: dict[str, int] = {}
    for r, keys in rounds.items():
        for k in keys:
            last[k] = max(last.get(k, 0), r)
    return last


def compute_stale_window(n: int = 50) -> list[str]:
    """The canonical n-key freshness window: _RE_EARNED first, then all
    registry keys stalest-first (never-graded keys rank stalest of all),
    ties broken by the stable pre-rotation merged-module order.
    Staleness comes from staleness_map() (newest-artifact exclusion
    applied there)."""
    last = staleness_map()
    base = list(_collect_raw("QUERIES"))
    order = {k: i for i, k in enumerate(base)}
    re_earned = [k for k in _RE_EARNED if k in order]
    rest = sorted(
        (k for k in base if k not in re_earned),
        key=lambda k: (last.get(k, 0), order[k]),
    )
    return (re_earned + rest)[:n]


def _collect_raw(attr: str) -> dict:
    """Merged module dicts in stable pre-rotation module order — the
    tie-break order for staleness (rotation-independent by design)."""
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
    return merged


def _collect(attr: str) -> dict:
    merged = _collect_raw(attr)
    # This round's freshness window first, then the rest of the SURVEY
    # contract, then engine extras — all in stable order.
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
    # both placeholders land inside single-quoted DuckDB string
    # literals — escape embedded quotes (ADVICE r07 #4: an
    # env-controlled SPARK_GRAFT_SCRATCH containing ' would otherwise
    # break or ALTER the rendered oracle SQL).
    stem = sf_dir.rstrip("/").replace("'", "''")
    out = {k: v.replace("{SF_DIR}", stem) for k, v in out.items()}
    if any("{PQ_ROOT}" in v for v in out.values()):
        # stored-index oracles read artifacts under the user scratch
        # root. Rendered with the PURE path resolver (no mkdir, no
        # raise — ADVICE r06 #4): an unusable root fails only those
        # keys at execution, never this whole dict.
        from .operators.llm import _scratch_root_path

        root = _scratch_root_path().replace("'", "''")
        out = {k: v.replace("{PQ_ROOT}", root) for k, v in out.items()}
    return out
