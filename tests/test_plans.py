"""Plan-shape golden tests (SURVEY.md §5.5) — assert Catalyst actually
delivers the physical strategies the scale design relies on: broadcast
of the probe side, map-side partial aggregation (the Combiner), window
group-limit pruning before the shuffle, parquet predicate pushdown, and
whole-stage codegen in the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import knn, relational
from tests.conftest import SF_SMOKE


def _plan(df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        getattr(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode, "fromString"
        )(mode)
    )


def test_knn_pairs_broadcast_probe_side(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    pairs = knn.all_pairs(knn.split_test(e), knn.train_all(e))
    plan = _plan(pairs)
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_knn_pairs_streamed_side_fans_out(spark):
    # BNLJ task count = streamed-side partitions: the train side must
    # pass through a hash repartition so a one-file fixture does not run
    # the whole quadratic distance fold in a single task (53 s -> 4.3 s
    # at sf0.1 on local[32])
    e = tables.embeddings(spark, SF_SMOKE)
    pairs = knn.all_pairs(knn.split_test(e), knn.train_all(e))
    plan = _plan(pairs)
    assert "hashpartitioning(tid" in plan, plan


def test_agg_has_partial_stage(spark):
    df = relational._q_agg_hash(spark, SF_SMOKE)
    plan = _plan(df)
    # partial + final hash aggregate around the exchange = the Combiner
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_topk_window_group_limit_pushed(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    t = knn.topk(knn.with_distance(knn.all_pairs(knn.split_test(e), knn.train_all(e))), 10)
    plan = _plan(t)
    assert "WindowGroupLimit" in plan, plan


def test_parquet_filter_pushdown_and_pruning(spark):
    li = tables.table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") < 10).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(li)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)" in plan, plan
    # column pruning: read schema carries only the two projected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_distance_path_stays_jvm_side(spark):
    # zip_with/aggregate higher-order expressions evaluate JVM-side (no
    # Python worker round-trip); whole-stage codegen applies to the
    # scan/filter/agg pipeline around them.
    e = tables.embeddings(spark, SF_SMOKE)
    pairs = knn.with_distance(knn.all_pairs(knn.split_test(e), knn.train_all(e)))
    plan = _plan(pairs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_whole_stage_codegen_in_agg_path(spark):
    df = relational._q_agg_hash(spark, SF_SMOKE)
    plan = _plan(df, "codegen")
    assert "WholeStageCodegen" in plan, plan[:2000]


def test_broadcast_hash_join_for_dim_table(spark):
    df = relational._q_join_broadcast(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_gemm_chunked_equals_unchunked(spark, tmp_path):
    """Chunked result must equal unchunked, with the VERDICT r02 #3
    residency contract observed in code: exactly one query broadcast
    alive at any time (each destroyed after its block's flush), the
    train side persisted for every block, and the block count derived
    from parquet metadata — no eager count() job at construction."""
    import knn_with_mapreduce_cuda_spark.plans.gemm_knn as G
    from knn_with_mapreduce_cuda_spark import tables as T

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    whole = G.knn_topk_gemm(q, t, 5).collect()

    events: list = []
    real = G.knn_topk_gemm

    def tracked(*args, **kwargs):
        out = kwargs.get("broadcast_out")
        assert out is not None, "chunked must pass broadcast_out"
        train = args[1]
        assert train.storageLevel.useMemory, "train side must be persisted"
        before = len(out)
        res = real(*args, **kwargs)
        for h in out[before:]:
            events.append(("create", id(h)))
            orig = h.destroy

            def destroy(_orig=orig, _hid=id(h)):
                events.append(("destroy", _hid))
                return _orig()

            h.destroy = destroy
        return res

    G.knn_topk_gemm = tracked
    try:
        chunked_df = G.knn_topk_gemm_chunked(
            q, t, 5, query_block_rows=40, sink_path=str(tmp_path / "sink")
        )
    finally:
        G.knn_topk_gemm = real
    chunked = chunked_df.collect()
    key = lambda rows: sorted((r.qid, r.tid, r.rnk) for r in rows)
    assert key(whole) == key(chunked)
    # one resident broadcast at a time: create/destroy strictly alternate
    assert len(events) >= 4, events
    alive = 0
    for kind, _ in events:
        alive += 1 if kind == "create" else -1
        assert 0 <= alive <= 1, events
    assert alive == 0, events


def test_gemm_chunked_filtered_sparse_queries(spark, tmp_path):
    """Review regression: parquet-footer counts over-state a FILTERED
    query relation, so chunking can produce empty blocks (must not hit
    np.stack) and arithmetic qid patterns must not pile into one block
    (xxhash64 spread). Result must equal the unchunked kernel."""
    import knn_with_mapreduce_cuda_spark.plans.gemm_knn as G
    from knn_with_mapreduce_cuda_spark import tables as T

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb").filter("qid % 50 = 0")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    whole = G.knn_topk_gemm(q, t, 5).collect()
    ch = G.knn_topk_gemm_chunked(
        q, t, 5, query_block_rows=40, sink_path=str(tmp_path / "sink")
    ).collect()
    key = lambda rows: sorted((r.qid, r.tid, r.rnk) for r in rows)
    assert key(whole) == key(ch)
    assert len(ch) > 0


def test_gemm_chunked_rows_upper_bound(spark):
    """Block sizing reads parquet footers driver-side: exact for a
    projected scan, None (→ counted fallback) for row-multiplying plans."""
    from knn_with_mapreduce_cuda_spark import tables as T
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import _rows_upper_bound

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb")
    assert _rows_upper_bound(q) == e.count()
    joined = q.join(q.selectExpr("qid as qid2"), F.expr("qid = qid2"))
    assert _rows_upper_bound(joined) is None
    assert _rows_upper_bound(spark.range(10)) is None


import pytest


@pytest.mark.parametrize("precision", ["float32", "float64"])
def test_gemm_tie_guard_exact_under_mass_ties(spark, precision):
    """ADVICE r02 (medium): with more than OVERFETCH candidates exactly
    tied at the k-th distance, argpartition alone keeps an arbitrary
    subset of the ties, dropping the smallest-tid ones the contract
    requires — in BOTH precisions (f32: within-noise ties; f64: exact
    ties). The boundary guards must fall back to tid-stable selection."""
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import OVERFETCH, knn_topk_gemm

    dim, k = 8, 10
    base = [float(i) for i in range(dim)]
    rows = [(t, [x + 1.0 for x in base]) for t in range(3)]
    rows += [(100 + t, [x + 2.0 for x in base]) for t in range(OVERFETCH * 4)]
    t_df = spark.createDataFrame(rows, "tid long, temb array<double>").coalesce(1)
    q_df = spark.createDataFrame([(0, base)], "qid long, qemb array<double>")
    got = knn_topk_gemm(q_df, t_df, k, exclude_self=False, precision=precision).collect()
    got_tids = [r.tid for r in sorted(got, key=lambda r: r.rnk)]
    # exact contract: the 3 near points, then the smallest-tid ties
    assert got_tids == [0, 1, 2] + [100 + i for i in range(k - 3)], got_tids


@pytest.mark.parametrize("precision", ["float32", "float64"])
def test_gemm_cosine_tie_guard(spark, precision):
    """Similarity-descending twin: mass cosine ties at the k-th rank
    must resolve to the smallest tids in both precisions."""
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import OVERFETCH, cosine_topk_gemm

    dim, k = 8, 5
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)  # orthogonal to a
    mid = [0.8, 0.6] + [0.0] * (dim - 2)
    rows = [(0, mid)] + [(100 + t, b) for t in range(OVERFETCH * 4)]
    t_df = spark.createDataFrame(rows, "tid long, temb array<double>").coalesce(1)
    q_df = spark.createDataFrame([(0, a)], "qid long, qemb array<double>")
    got = cosine_topk_gemm(q_df, t_df, k, exclude_self=False, precision=precision).collect()
    got_tids = [r.tid for r in sorted(got, key=lambda r: r.rnk)]
    assert got_tids == [0] + [100 + i for i in range(k - 1)], got_tids


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("precision", ["float32", "float64"])
def test_gemm_topk_matches_numpy_reference_on_tie_dense_data(spark, seed, precision):
    """Adversarial property check: on coordinates quantized to a 3-value
    grid (exact ties everywhere), both precision paths must reproduce a
    pure-NumPy ground truth with the (dist, tid) tie-break — across
    partitions, tiles, and the boundary guards."""
    import numpy as np

    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm

    rng = np.random.RandomState(seed)
    n_t, n_q, dim, k = 300, 20, 4, 7
    tmat = rng.randint(0, 3, size=(n_t, dim)).astype(np.float64) / 2.0
    qmat = rng.randint(0, 3, size=(n_q, dim)).astype(np.float64) / 2.0
    t_rows = [(int(i), [float(x) for x in tmat[i]]) for i in range(n_t)]
    q_rows = [(int(i), [float(x) for x in qmat[i]]) for i in range(n_q)]
    t_df = spark.createDataFrame(t_rows, "tid long, temb array<double>").coalesce(2)
    q_df = spark.createDataFrame(q_rows, "qid long, qemb array<double>")
    got = knn_topk_gemm(
        q_df, t_df, k, exclude_self=False, precision=precision
    ).collect()
    got_k = sorted((r.qid, r.rnk, r.tid) for r in got)

    # ground truth: exact f64 distances, (dist², tid) lexsorted per query
    d2 = ((qmat[:, None, :] - tmat[None, :, :]) ** 2).sum(axis=2)
    tids = np.arange(n_t)
    want = []
    for q in range(n_q):
        order = np.lexsort((tids, d2[q]))[:k]
        want += [(q, r + 1, int(t)) for r, t in enumerate(order)]
    assert got_k == sorted(want)


def test_gemm_no_eager_jobs_on_construction(spark):
    """Building the unchunked GEMM plan must not launch Spark jobs (the
    r01 `_ensure_parallel` probe ran .rdd + count() per call)."""
    from knn_with_mapreduce_cuda_spark import tables as T
    from knn_with_mapreduce_cuda_spark.plans.gemm_knn import knn_topk_gemm

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb").limit(5)
    t = e.selectExpr("vec_id as tid", "emb as temb")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    # toPandas() on the tiny query side is the one permitted job
    knn_topk_gemm(q, t, 3)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 1, f"{after - before} jobs during plan construction"


def test_gemm_cupy_parity(spark):
    """When a CUDA device is visible the CuPy backend must produce the
    same top-k as NumPy (selection runs on host either way)."""
    import pytest

    from knn_with_mapreduce_cuda_spark.plans import gemm_knn

    if gemm_knn.gemm_backend() != "cupy":
        pytest.skip("no CUDA device in this container — NumPy backend active")
    from knn_with_mapreduce_cuda_spark import tables as T

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    gpu = (
        gemm_knn.knn_topk_gemm(q, t, 5, backend="cupy")
        .select("qid", "tid", "rnk")
        .collect()
    )
    cpu = (
        gemm_knn.knn_topk_gemm(q, t, 5, backend="numpy")
        .select("qid", "tid", "rnk")
        .collect()
    )
    assert sorted(map(tuple, gpu)) == sorted(map(tuple, cpu))


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    import os

    from knn_with_mapreduce_cuda_spark import tables as T
    from knn_with_mapreduce_cuda_spark.sources.readers import write_partitioned_parquet

    ev = T.table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = os.path.join(str(tmp_path), "ev_by_type")
    write_partitioned_parquet(ev, path, "event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(back)
    # the predicate lands in PartitionFilters → only the click/ directory
    # is scanned; nothing reaches PushedFilters (no data-file IO for it)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0], plan


def test_centroid_classify_broadcasts_model(spark):
    # the c-row centroid table must be broadcast: classify is map-side
    plan = _plan(knn._q_centroid(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_range_frame_single_shuffle(spark):
    # trailing-1h RANGE window: exactly one exchange (on user_id)
    plan = _plan(relational._q_window_range_interval(spark, SF_SMOKE))
    assert plan.count(") Exchange") == 1, plan


def test_naive_bayes_model_is_broadcast(spark):
    from knn_with_mapreduce_cuda_spark.operators import llm

    plan = _plan(llm._q_naive_bayes(spark, SF_SMOKE))
    # scoring join against the counts model is a broadcast hash join,
    # not a shuffled one
    assert "BroadcastHashJoin" in plan, plan


def test_histogram_bounds_broadcast_no_sort(spark):
    plan = _plan(relational._q_histogram_fixed(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Sort" not in plan.split("== Physical Plan ==")[-1], plan


def test_cache_reuses_inmemory_scan(spark):
    # persist() swaps downstream scans to InMemoryTableScan — recompute
    # of the (expensive) upstream never happens twice
    e = tables.embeddings(spark, SF_SMOKE).persist()
    try:
        e.count()  # materialize
        downstream = e.groupBy("label").count()
        plan = _plan(downstream)
        assert "InMemoryTableScan" in plan, plan
    finally:
        e.unpersist()


def test_aqe_rewrites_executed_plan(spark):
    # after execution, the adaptive plan shows AQE took over the
    # exchanges (coalescing tiny shuffle partitions at runtime)
    df = (
        tables.table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .count()
    )
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan isFinalPlan=true" in executed, executed[:2000]
    assert "AQEShuffleRead" in executed, executed[:2000]


def test_bloom_tables_are_broadcast(spark):
    from knn_with_mapreduce_cuda_spark.operators import analytics

    df = analytics._q_bloom_prefilter(spark, SF_SMOKE)
    plan = _plan(df)
    # both per-seed bitmask tables join as BroadcastHashJoin — the fact
    # side never shuffles for the prefilter
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_gaps_islands_single_user_shuffle(spark):
    from knn_with_mapreduce_cuda_spark.operators import analytics

    df = analytics._q_gaps_islands(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    # two exchanges by design: map-side dedup on (user_id, day) shrinks
    # the shuffle to distinct pairs, then the tiny deduped set re-keys to
    # user_id for the window; the island aggregate reuses that second
    # partitioning (no third exchange)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    first = plan.split("Exchange hashpartitioning")[2]
    assert "HashAggregate" in first  # partial dedup below the first exchange


def test_rolling_active_no_nested_loop_on_data(spark):
    from knn_with_mapreduce_cuda_spark.operators import analytics

    df = analytics._q_rolling_active(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    # the trailing-window distinct uses bounded explode fan-out, NOT a
    # range self-join; the only nested-loop join is against the 1-row
    # max-day bound (IdentityBroadcastMode)
    assert "Generate explode" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_tpch_q4_semi_join_is_hash_not_nested_loop(spark):
    from knn_with_mapreduce_cuda_spark.operators import tpch

    df = tpch._q4(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    # the EXISTS predicate has a non-equi residual, but it rides on the
    # l_orderkey equi key — must plan as a hash/sort-merge semi join,
    # never a nested loop over the fact table
    assert "NestedLoop" not in plan, plan
    assert "LeftSemi" in plan, plan


def test_skyline_anti_join_and_attribution_conservation_plan(spark):
    from knn_with_mapreduce_cuda_spark.operators import analytics

    df = analytics._q_skyline(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    # dominance test is non-equi -> BNLJ is expected BUT the build side
    # must be the broadcast (small dim), not a shuffle of both sides
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_hamming_search_plan_shape(spark):
    """The sketch scan is the big side: query sketches broadcast, the
    candidate cut is partition-local (WindowGroupLimit), and no shuffle
    carries the corpus-sized scan."""
    from knn_with_mapreduce_cuda_spark.operators.llm import _q_simsearch_hamming

    plan = _plan(_q_simsearch_hamming(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pq_adc_plan_no_cartesian(spark):
    """ADC is a flat-LUT expression over the code table with the
    queries+LUTs broadcast — never a cross product of queries x corpus
    floats, and the shortlist cut is partition-local (WindowGroupLimit)
    so the shuffle carries ~|Q| x CAND rows, not the corpus."""
    from knn_with_mapreduce_cuda_spark.operators.llm import (
        _q_simsearch_ivfpq,
        _q_simsearch_pq,
    )

    for fn in (_q_simsearch_pq, _q_simsearch_ivfpq):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastExchange" in plan, plan
        assert "WindowGroupLimit" in plan, plan


def test_ivfpq_stored_scan_partition_pruned(spark):
    """The stored IVF-PQ code scan carries the probe cells as a
    LITERAL partition filter, so Catalyst prunes unprobed cid=
    directories at planning time — the stored-layout realization of
    'a probe reads n_probe/k_cells of the files'."""
    from knn_with_mapreduce_cuda_spark.operators.llm import (
        _q_simsearch_ivfpq_stored,
    )

    plan = _plan(_q_simsearch_ivfpq_stored(spark, SF_SMOKE))
    assert "PartitionFilters: [cid" in plan, plan
    assert "hashpartitioning(tid" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_cms_join_regime_switches_on_width(spark):
    """VERDICT r04: the CMS cells grid must not be FORCE-broadcast.
    Below CMS_BROADCAST_CELLS the estimate join carries the broadcast
    hint (planned as a broadcast hash join even with auto-broadcast
    off); at the CMS_W_CAP grid there is no hint, so the plan is
    Catalyst's size-based choice — with auto-broadcast disabled (the
    stand-in for 'grid exceeds the threshold') it must fall back to a
    shuffle join, never an Ω(grid) driver broadcast."""
    from knn_with_mapreduce_cuda_spark.operators import llm

    toks = llm._tokens(spark, SF_SMOKE).select(F.explode("ts").alias("tok"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = _plan(llm._cms_top(toks, llm._cms_width(500)))
        assert "BroadcastHashJoin" in small, small
        capped = _plan(llm._cms_top(toks, llm.CMS_W_CAP))
        assert ("SortMergeJoin" in capped) or ("ShuffledHashJoin" in capped), capped
        assert capped.count("BroadcastHashJoin") == 0, capped
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bloom_broadcast_is_bounded(spark):
    """Same rule as the CMS grid: the bloom's occupied-cell relation is
    Ω(corpus) and may only be broadcast below BLOOM_BROADCAST_CELLS —
    the fixture sits in the broadcast regime (hint present even with
    auto-broadcast off); past the bound the hint is absent, so the
    probe degrades to Catalyst's size-based choice."""
    from knn_with_mapreduce_cuda_spark.operators import llm

    assert llm._bloom_use_broadcast(5_000)
    assert not llm._bloom_use_broadcast(1_000_000)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(llm._q_dedup_bloom(spark, SF_SMOKE))
        assert "BroadcastHashJoin LeftSemi" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pq_stored_scan_fans_out(spark):
    """The stored-code ADC scan obeys the pair-join fan-out rule
    (ADVICE r04): the streamed code table is hash-repartitioned before
    the broadcast-LUT join, so a one-file index never runs the
    n x |Q| scan in a single task."""
    from knn_with_mapreduce_cuda_spark.operators.llm import _q_simsearch_pq_stored

    plan = _plan(_q_simsearch_pq_stored(spark, SF_SMOKE))
    assert "hashpartitioning(tid" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_weighted_sample_take_ordered(spark):
    """Global rank-limit rewrites to TakeOrderedAndProject — bounded
    per-partition heaps + one merge, never a full sort."""
    from knn_with_mapreduce_cuda_spark.operators.relational import _q_sample_weighted

    plan = _plan(_q_sample_weighted(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan


def test_fn_null_global_counts_are_scalar_not_window(spark):
    """rel_fn_null attaches corpus-wide counts via a 1-row aggregate
    broadcast-cross-joined back — never `count(...) over ()`, whose
    unpartitioned window is an Exchange SinglePartition folding the
    whole relation through one task."""
    from knn_with_mapreduce_cuda_spark.operators.relational import _q_fn_null

    plan = _plan(_q_fn_null(spark, SF_SMOKE))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_window_percentiles_plan_is_sliced_not_per_priority(spark):
    """rel_window_percentiles must not fold a fifth of orders per task:
    percent_rank/cume_dist run as closed forms over the grouped prefix
    scan (slice-id repartition in the plan), the rank-3 probe compiles
    to WindowGroupLimit, and no percent_rank/cume_dist/nth_value window
    function survives in the physical plan."""
    from knn_with_mapreduce_cuda_spark.operators.relational import (
        _q_window_percentiles,
    )
    from knn_with_mapreduce_cuda_spark.plans import prefix

    plan = _plan(_q_window_percentiles(spark, SF_SMOKE), mode="extended")
    assert prefix._PID in plan, plan
    assert "WindowGroupLimit" in plan, plan
    for fn in ("percent_rank()", "cume_dist()", "nth_value("):
        assert fn not in plan, fn


def test_normalize_stats_are_grouped_not_window(spark):
    """knn_normalize_minmax/zscore: per-dimension stats come from a
    map-side groupBy broadcast-joined back — an unordered
    Window.partitionBy(pos) would fold every vector of a dimension
    through one task (parallelism capped at dim)."""
    from knn_with_mapreduce_cuda_spark.operators.knn import (
        _q_normalize_minmax,
        _q_normalize_zscore,
    )

    for fn in (_q_normalize_minmax, _q_normalize_zscore):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "Window" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan


def test_feature_gain_scan_is_sliced_not_per_dim(spark):
    """ml_feature_gain's per-dim cumulative scan must ride the grouped
    prefix scan (slice-id repartition), not a per-dim window fold."""
    from knn_with_mapreduce_cuda_spark.operators.analytics import _q_feature_gain
    from knn_with_mapreduce_cuda_spark.plans import prefix

    plan = _plan(_q_feature_gain(spark, SF_SMOKE), mode="extended")
    assert prefix._PID in plan, plan


def test_text_family_single_partition_budget(spark):
    """Pin SCALE.md §9i's plan audit: the text ops carry NO
    SinglePartition exchange except the 1-row corpus-stat scalars in
    tfidf (corpus count) and bm25 (n_docs/avgdl) — a token- or
    doc-sized relation through one partition would show up here."""
    from knn_with_mapreduce_cuda_spark.operators import llm

    budget = {
        "_q_text_tokenize": 0,
        "_q_text_ngram": 0,
        "_q_lang_id": 0,
        "_q_quality_score": 0,
        "_q_gopher_repetition": 0,
        "_q_pack_sequences": 0,
        "_q_text_tfidf": 1,
        "_q_search_bm25": 1,
    }
    for name, allowed in budget.items():
        plan = _plan(getattr(llm, name)(spark, SF_SMOKE))
        got = plan.count("Exchange SinglePartition")
        assert got <= allowed, (name, got, allowed)


def test_multimodal_family_arrow_batched_no_row_udf(spark):
    """Pin SCALE.md §9k: every binary-payload op streams Arrow batches
    (MapInPandas / ArrowEvalPython), never per-row Python
    (BatchEvalPython), and holds no SinglePartition exchange."""
    from knn_with_mapreduce_cuda_spark.operators import llm

    payload_ops = [
        "_q_multimodal_features",
        "_q_multimodal_framesample",
        "_q_multimodal_resize",
    ]
    for name in payload_ops:
        plan = _plan(getattr(llm, name)(spark, SF_SMOKE))
        assert ("MapInPandas" in plan) or ("ArrowEvalPython" in plan), name
        assert "BatchEvalPython" not in plan, name
        assert "Exchange SinglePartition" not in plan, name
    jplan = _plan(llm._q_multimodal_join(spark, SF_SMOKE))
    assert "BatchEvalPython" not in jplan
    assert "Exchange SinglePartition" not in jplan


def test_graph_family_single_partition_budget(spark):
    """Pin SCALE.md §9g: graph-op SinglePartition exchanges are 1-row
    scalar aggregates only — the triangle total (1) and pagerank's
    per-iteration node-count scalars — never an edge-sized relation;
    linkpred's top-n is TakeOrderedAndProject."""
    from knn_with_mapreduce_cuda_spark.operators import analytics, iterative
    from knn_with_mapreduce_cuda_spark.operators import knn as knnmod

    lp = _plan(analytics._q_linkpred(spark, SF_SMOKE))
    assert lp.count("Exchange SinglePartition") == 0, lp
    assert "TakeOrderedAndProject" in lp, lp
    tr = _plan(knnmod._q_triangles(spark, SF_SMOKE))
    assert tr.count("Exchange SinglePartition") <= 1, tr
    pr = _plan(iterative._q_pagerank(spark, SF_SMOKE))
    assert pr.count("Exchange SinglePartition") <= 3, pr


def test_near_dup_family_joins_are_banded_equi_joins(spark):
    """The near-dup candidate generators must pair documents through
    banded/bucketed EQUI-joins — a CartesianProduct or a
    BroadcastNestedLoopJoin in any of these plans would mean the LSH
    banding degraded to an all-pairs scan (SCALE.md dedup verdict:
    'never all-pairs')."""
    from knn_with_mapreduce_cuda_spark.operators import llm

    for name in (
        "_q_dedup_near_minhash",
        "_q_dedup_jaccard",
        "_q_dedup_simhash",
    ):
        plan = _plan(getattr(llm, name)(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # dedup_embed is the declared exact brute-force BASELINE (its scale
    # twin is llm_semdedup / the LSH family): a BNLJ pair join is its
    # contract, but it must carry the streamed-side fan-out repartition
    # so a one-file fixture never folds the quadratic scan in one task.
    ep = _plan(llm._q_dedup_embed(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in ep, ep
    assert "hashpartitioning(vec_a" in ep, ep


def test_gemm_classify_tail_single_exchange(spark):
    """The bench/CLI GEMM classify tail must keep the label dims as the
    broadcast sides: un-hinted, Catalyst broadcasts the TOPK relation
    (post-window stats look tiny), re-running the GEMM subtree as a
    broadcast build and paying two extra exchanges in the vote
    (measured 1.20 -> 0.80 s at sf0.1; SCALE.md 9a, round 7). Pin: one
    hash exchange total (inside topk — agg and vote window reuse its
    hash(qid) clustering) and the MapInArrow stage NOT under a
    BroadcastExchange."""
    import bench

    df = bench.knn_classify_full_gemm(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the GEMM stage streams: no broadcast node above it
    above = plan.split("MapInArrow")[0]
    assert "BroadcastExchange" not in above, plan


def test_prefix_string_leading_order_degrades_not_misorders(spark):
    """Review r08: a numeric-parsable STRING leading order column must
    not be quantile-sliced (cast('double') is not monotone in string
    sort order — '10' < '9' as strings but 10.0 > 9.0 as doubles);
    _slice_id degrades it to one slice and the running sums stay
    correct against the plain global window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knn_with_mapreduce_cuda_spark.plans import prefix

    data = [(str(i), i) for i in range(1, 30)]  # '1'..'29' — sorts as text
    d = spark.createDataFrame(data, "o string, v long").repartition(5)
    got = prefix.attach_running(d, ["o"], sums={"v": "cs"}, parts=4)
    w = Window.orderBy("o").rowsBetween(Window.unboundedPreceding, 0)
    want = d.withColumn("cs", F.sum("v").over(w))
    assert sorted(map(tuple, got.select("o", "v", "cs").collect())) == sorted(
        map(tuple, want.select("o", "v", "cs").collect())
    )


def test_gemm_chunked_honors_explicit_sink_at_one_block(spark, tmp_path):
    """Review r08: n_blocks==1 with an explicit sink_path must still
    write the sink (a bypass would leave a previous run's rows there
    stale while returning fresh ones in memory)."""
    import knn_with_mapreduce_cuda_spark.plans.gemm_knn as G
    from knn_with_mapreduce_cuda_spark import tables as T

    e = T.embeddings(spark, SF_SMOKE)
    q = e.selectExpr("vec_id as qid", "emb as qemb").filter("qid < 20")
    t = e.selectExpr("vec_id as tid", "emb as temb")
    sink = str(tmp_path / "sink")
    out = G.knn_topk_gemm_chunked(
        q, t, 3, query_block_rows=10_000, n_queries=20, sink_path=sink
    )
    rows = out.collect()
    assert len(rows) > 0
    assert sorted(map(tuple, spark.read.parquet(sink).collect())) == sorted(
        map(tuple, rows)
    )


def test_cosine_zero_vector_not_dropped(spark):
    """Review r08: an all-zero embedding must appear in the cosine
    top-k output (cosine 0 against everything, tid tie-break), not be
    silently dropped as a NaN row."""
    from pyspark.sql import Row

    import knn_with_mapreduce_cuda_spark.plans.gemm_knn as G

    rows = [Row(qid=0, qemb=[0.0, 0.0]), Row(qid=1, qemb=[1.0, 0.0])]
    trows = [Row(tid=10, temb=[1.0, 0.0]), Row(tid=11, temb=[0.0, 1.0]),
             Row(tid=12, temb=[0.0, 0.0])]
    q = spark.createDataFrame(rows)
    t = spark.createDataFrame(trows)
    got = G.cosine_topk_gemm(q, t, 2, exclude_self=False).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rnk, r.tid, r.cos))
    assert 0 in by_q, "zero-vector query dropped"
    assert sorted(by_q[0]) == [(1, 10, 0.0), (2, 11, 0.0)]  # tid tie-break
    assert sorted(t for _, t, _ in by_q[1])  # normal query still present


def test_rows_upper_bound_refuses_python_map_nodes(spark):
    """Review r08: mapInArrow/mapInPandas can emit MORE rows than their
    input, so footer-derived counts must refuse such plans (fall back
    to a real count) rather than under-state the block residency."""
    import pandas as pd

    import knn_with_mapreduce_cuda_spark.plans.gemm_knn as G
    from knn_with_mapreduce_cuda_spark import tables as T

    e = T.embeddings(spark, SF_SMOKE)
    assert G._rows_upper_bound(e.select("vec_id")) is not None  # plain scan ok

    def dup(it):
        for pdf in it:
            yield pd.concat([pdf, pdf])

    fanned = e.select("vec_id").mapInPandas(dup, "vec_id long")
    assert G._rows_upper_bound(fanned) is None


def test_q3_flat_shape_shuffle_semi_one_exchange_per_fact_side(spark):
    """The r11 flat-Q3 plan (VERDICT r10 #2, A/B in
    scripts/q3_aggfirst_r11.py + 100× companion): lineitem aggregates
    FIRST with the partial sum BELOW its exchange (map-side combine
    shrinks raw rows to partial groups before the shuffle), customer
    KEYS broadcast (bounded dim side), and the SHUFFLE_HASH semi join
    CONSUMES the aggregation's hash(l_orderkey) partitioning — never a
    broadcast of the reduced orderkeys, which grow with the facts:
    exactly one hash exchange per fact side, none between the aggregate
    and the join."""
    import re

    import bench

    df = bench.q3_shape(spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # the cust-keys reduction
    # map-side combine: the partial aggregate sits BELOW the exchange
    assert "partial_sum" in plan, plan
    assert plan.index("partial_sum") > plan.index("Exchange hashpartitioning"), plan
    # reduced-orderkey set must NOT be broadcast: exactly ONE broadcast
    # exchange (cust keys) in the whole plan
    assert len(re.findall(r"BroadcastExchange", plan)) == 1, plan
    # one hash exchange per fact side (lineitem, orders), and the semi
    # join consumes the agg's — no third hashpartitioning exchange
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan


def test_dim_ablation_single_pair_pass(spark):
    """r12: the per-variant union re-evaluated the quadratic BNLJ pair
    subtree once per distance variant (no ReusedExchange under a BNLJ).
    The melted form must run the pair space ONCE: exactly one
    BroadcastNestedLoopJoin in the plan, and the variant fan-out is a
    Generate (explode) above it."""
    import re

    from knn_with_mapreduce_cuda_spark.operators import analytics

    plan = _plan(analytics._q_dim_ablation(spark, SF_SMOKE), "simple")
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) == 1, plan
    assert "Generate explode" in plan, plan


def test_ivf_recall_probe_join_broadcasts_bounded_sides(spark):
    """r12: the candidate join keyed only on the cluster id `c`
    (KMEANS_K distinct values) planned as a SortMergeJoin whose
    exchanges hash into <= k usable partitions — near-serial distance
    fold. The probes side is bounded (2 rows/query), the exact top-10
    is n_test*10 skinny rows: both must broadcast, leaving no
    sort-merge join keyed on `c` in the plan."""
    import re

    from knn_with_mapreduce_cuda_spark.operators import analytics

    plan = _plan(analytics._q_ivf_recall(spark, SF_SMOKE), "simple")
    assert not re.search(r"SortMergeJoin \[c[#L0-9]*\]", plan), plan


def test_crossval_folds_half_pair_space_then_mirrors(spark):
    """r12: the euclidean fold runs ONLY on qid < tid pairs (half the
    ordered pair space; d(q,t)=d(t,q) bit-identically), mirrored inline
    by an explode above the BNLJ — so the plan must show the qid < tid
    predicate in the join condition and a Generate (explode) above it,
    with the distance fold evaluated once, below the Generate."""
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_crossval

    plan = _plan(_q_crossval(spark, SF_SMOKE), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "(qid" in plan and "< tid" in plan.replace("#", " ").replace("L", ""), plan
    gen = plan.index("Generate")
    bnlj = plan.index("BroadcastNestedLoopJoin")
    assert gen < bnlj, plan  # explode ABOVE the join in tree print order
    # exactly one zip_with distance fold in the whole plan
    assert plan.count("zip_with") == 1, plan
