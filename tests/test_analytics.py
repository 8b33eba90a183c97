"""Unit tests for operators/analytics.py against pure-Python/NumPy
oracles on tiny in-memory inputs (the reference repo class's "serial
baseline" test strategy, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from knn_with_mapreduce_cuda_spark.operators import analytics

from conftest import SF_SMOKE


def _round4(x: float) -> float:
    """Spark F.round(x, 4): BigDecimal(x).setScale(4, HALF_UP)."""
    import decimal

    return float(
        decimal.Decimal(float(x)).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_gaps_islands_tiny(spark):
    days = spark.createDataFrame(
        [(1, 5), (1, 6), (1, 7), (1, 9), (2, 1), (2, 3), (2, 4), (1, 6)],
        "user_id long, day long",
    )
    rows = {
        (r.user_id, r.start_day): (r.end_day, r.n_days)
        for r in analytics.gaps_islands(days).collect()
    }
    assert rows == {(1, 5): (7, 3), (1, 9): (9, 1), (2, 1): (1, 1), (2, 3): (4, 2)}


def test_retention_cohort_tiny(spark):
    days = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 2), (3, 1)], "user_id long, day long"
    )
    rows = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in analytics.retention_cohort(days).collect()
    }
    assert rows == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_rolling_active_window(spark):
    # user 1 active day 0 only; window=3 keeps it "active" days 0-2
    days = spark.createDataFrame([(1, 0), (2, 2)], "user_id long, day long")
    rows = {
        r.d: r.actives_7d
        for r in analytics.rolling_active_users(days, window_days=3).collect()
    }
    assert rows == {0: 1, 1: 1, 2: 2}


def _np_acf(c: np.ndarray, k: int) -> float:
    m = c.mean()
    num = ((c[k:] - m) * (c[:-k] - m)).sum()
    den = ((c - m) ** 2).sum()
    return num / den


def test_autocorr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    c = rng.integers(0, 40, size=60)
    series = spark.createDataFrame(
        [(int(h), int(v)) for h, v in enumerate(c)], "h long, c long"
    )
    got = {r.k: r.acf for r in analytics.autocorr(series, max_lag=5).collect()}
    for k in range(1, 6):
        assert got[k] == pytest.approx(_np_acf(c, k), abs=2e-4)


def test_ewma_matches_recursive(spark):
    rng = np.random.default_rng(11)
    c = rng.integers(0, 30, size=50)
    series = spark.createDataFrame(
        [(int(h), int(v)) for h, v in enumerate(c)], "h long, c long"
    )
    got = {r.h: r.ewma for r in analytics.ewma(series, terms=20).collect()}
    for t in range(len(c)):
        expect = sum(
            c[t - j] * 2.0 ** -(j + 1) for j in range(min(t + 1, 20))
        )
        assert got[t] == pytest.approx(expect, abs=2e-4)


def test_ks_two_sample_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, size=200)
    b = rng.integers(10, 60, size=150)
    vals = spark.createDataFrame(
        [(int(v), 1) for v in a] + [(int(v), 2) for v in b], "vc long, grp int"
    )
    row = analytics.ks_two_sample(vals).collect()[0]
    # numpy ECDF-based two-sample KS over the pooled support
    support = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), support, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), support, side="right") / len(b)
    d = np.abs(f1 - f2).max()
    assert (row.n1, row.n2) == (200, 150)
    assert row.d_stat == pytest.approx(d, abs=2e-4)


def test_bloom_prefilter_lossless_and_pruning(spark):
    fact = spark.range(0, 2000).select(col("id").alias("fk"))
    dim = spark.range(0, 2000, 40).select(col("id").alias("k"))  # 50 keys
    pruned = analytics.bloom_prefilter(fact, col("fk"), dim)
    kept = {r.fk for r in pruned.collect()}
    true_keys = set(range(0, 2000, 40))
    # no false negatives
    assert true_keys <= kept
    # real pruning happened (2-seed bloom over 50/65536 bits ⟹ tiny FPR)
    assert len(kept) < 200


def test_linkpred_jaccard_bruteforce(spark):
    # path graph 0-1-2-3 plus edge 1-3: candidates share neighbors
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 3)], "a long, b long"
    )
    got = {
        (r.x, r.y): (r.common_neighbors, r.jaccard)
        for r in analytics.linkpred_jaccard(edges, top_n=10).collect()
    }
    adj = {0: {1}, 1: {0, 2, 3}, 2: {1, 3}, 3: {1, 2}}
    expect = {}
    for x in adj:
        for y in adj:
            if x < y and y not in adj[x]:
                cn = len(adj[x] & adj[y])
                if cn:
                    expect[(x, y)] = (cn, round(cn / len(adj[x] | adj[y]), 4))
    assert got == expect


def test_decision_stump_bruteforce(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=80).round(3)
    y = (x + rng.normal(scale=0.5, size=80) > 0).astype(int)
    pts = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y long"
    )
    row = analytics.decision_stump(pts).collect()[0]
    best = 0
    for t in np.unique(x):
        left = x <= t
        acc1 = (y[left] == 1).sum() + (y[~left] == 0).sum()
        acc2 = (y[left] == 0).sum() + (y[~left] == 1).sum()
        best = max(best, acc1, acc2)
    assert row.correct == best
    assert row.accuracy == pytest.approx(best / 80, abs=1e-4)


def test_mi_entropy_consistency(spark):
    # MI(lang, source) must be ≤ min(H(lang), H(source)) and ≥ 0
    row = analytics._q_mi_lang_source(spark, SF_SMOKE).collect()[0]
    assert 0 <= row.mi_nats <= min(row.h_lang_nats, row.h_source_nats) + 1e-9


def test_vocab_coverage_monotone(spark):
    rows = {
        r.threshold_pct: (r.vocab_size, r.covered_tokens)
        for r in analytics._q_vocab_coverage(spark, SF_SMOKE).collect()
    }
    assert rows[50][0] <= rows[90][0] <= rows[99][0]
    assert rows[50][1] <= rows[90][1] <= rows[99][1]


def test_mix_temperature_flattens(spark):
    rows = analytics._q_mix_temperature(spark, SF_SMOKE).collect()
    assert abs(sum(r.share_temp for r in rows) - 1.0) < 5e-4
    # temperature sampling upweights the tail: max share shrinks
    assert max(r.share_temp for r in rows) < max(r.share_raw for r in rows)


def test_rolling_z_matches_numpy(spark):
    rng = np.random.default_rng(9)
    c = rng.integers(0, 50, size=60)
    series = spark.createDataFrame(
        [(int(h), int(v)) for h, v in enumerate(c)], "h long, c long"
    )
    got = {r.h: r.z for r in analytics.rolling_z(series, width=10).collect()}
    for t in range(10, 60):
        win = c[t - 10 : t]
        mu, sd = win.mean(), win.std(ddof=1)
        if sd > 0:
            assert got[t] == pytest.approx((c[t] - mu) / sd, abs=2e-4)


def test_cusum_matches_recursive(spark):
    rng = np.random.default_rng(13)
    c = np.concatenate([rng.integers(0, 10, 30), rng.integers(20, 30, 30)])
    series = spark.createDataFrame(
        [(int(h), int(v)) for h, v in enumerate(c)], "h long, c long"
    )
    got = {r.h: r.cusum for r in analytics.cusum(series).collect()}
    m, s = c.mean(), 0.0
    for t, v in enumerate(c):
        s = max(0.0, s + (v - m))
        assert got[t] == pytest.approx(s, abs=2e-4)
    # drift after the level shift must push CUSUM up
    assert got[59] > got[29]


def _midrank(v):
    order = np.argsort(v, kind="stable")
    r = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        r[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return r


def test_spearman_matches_numpy(spark):
    rng = np.random.default_rng(17)
    x = rng.integers(0, 20, 100).astype(float)  # force ties
    y = (x + rng.integers(0, 10, 100)).astype(float)
    pts = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    row = analytics.spearman_rho(pts).collect()[0]
    rx, ry = _midrank(x), _midrank(y)
    expect = np.corrcoef(rx, ry)[0, 1]
    assert row.rho == pytest.approx(expect, abs=2e-4)


def test_kendall_matches_bruteforce(spark):
    rng = np.random.default_rng(19)
    x = rng.integers(0, 12, 60).astype(float)
    y = (x + rng.integers(0, 6, 60)).astype(float)
    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
        "id long, x double, y double",
    )
    row = analytics.kendall_tau(pts).collect()[0]
    nc = nd = 0
    for i in range(60):
        for j in range(i + 1, 60):
            s = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            nc += s > 0
            nd += s < 0
    n0 = 60 * 59 / 2
    n1 = sum(t * (t - 1) / 2 for t in np.unique(x, return_counts=True)[1])
    n2 = sum(t * (t - 1) / 2 for t in np.unique(y, return_counts=True)[1])
    assert (row.nc, row.nd) == (nc, nd)
    assert row.tau_b == pytest.approx((nc - nd) / np.sqrt((n0 - n1) * (n0 - n2)), abs=2e-4)


def test_khop_path_graph(spark):
    # path 0-1-2-3-4: 2-hop sets are the nodes at distance exactly 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    got = {r.node: (r.n_1hop, r.n_2hop) for r in analytics.khop_reach(edges).collect()}
    assert got == {0: (1, 1), 1: (2, 1), 2: (2, 2), 3: (2, 1), 4: (1, 1)}


def test_assortativity_star_is_negative(spark):
    # star graph: hub degree 4 links only to leaves (degree 1) → r = -1
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], "a long, b long")
    row = analytics.degree_assortativity(edges).collect()[0]
    assert row.assortativity == pytest.approx(-1.0, abs=1e-9)


def test_seasonal_profile_partition_of_total(spark):
    from conftest import SF_SMOKE

    rows = analytics._q_seasonal_profile(spark, SF_SMOKE).collect()
    assert len(rows) == 24
    assert sum(r.total_events for r in rows) == 1000  # sf0.001 events


def test_changepoint_finds_level_shift(spark):
    c = [5] * 40 + [50] * 40
    series = spark.createDataFrame(
        [(h, v) for h, v in enumerate(c)], "h long, c long"
    )
    row = analytics.changepoint(series, min_seg=10).collect()[0]
    assert row.split_h == 39  # boundary: left = hours 0..39
    assert row.mean_left == pytest.approx(5.0)
    assert row.mean_right == pytest.approx(50.0)


def test_ab_proportions_z_formula(spark):
    from conftest import SF_ORACLE

    row = analytics._q_ab_proportions(spark, SF_ORACLE).collect()[0]
    p = (row.x1 + row.x2) / (row.n1 + row.n2)
    z = (row.x1 / row.n1 - row.x2 / row.n2) / np.sqrt(
        p * (1 - p) * (1 / row.n1 + 1 / row.n2)
    )
    assert row.z == pytest.approx(z, abs=2e-4)


def test_ngram_novelty_bounds(spark):
    from conftest import SF_ORACLE

    rows = analytics._q_ngram_novelty(spark, SF_ORACLE).collect()
    assert rows  # held-out docs exist
    for r in rows:
        assert 0 <= r.n_unseen <= r.n_bigrams
        assert 0.0 <= r.novelty <= 1.0


def test_feature_gain_majority_floor(spark):
    from conftest import SF_ORACLE

    rows = analytics._q_feature_gain(spark, SF_ORACLE).collect()
    assert len(rows) == 8
    # any stump at least matches the majority-class baseline
    for r in rows:
        assert r.accuracy >= 0.5


def test_roc_curve_matches_numpy(spark):
    rng = np.random.default_rng(23)
    s = rng.normal(size=120).round(2)
    y = (s + rng.normal(scale=1.0, size=120) > 0).astype(int)
    pts = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(s, y)], "score double, y long"
    )
    rows = {r.threshold: (r.tp, r.fp) for r in analytics.roc_curve(pts).collect()}
    for t in np.unique(s):
        tp = int(((s >= t) & (y == 1)).sum())
        fp = int(((s >= t) & (y == 0)).sum())
        assert rows[round(float(t), 4)] == (tp, fp)


def test_periodogram_finds_planted_cycle(spark):
    # planted 12-sample cycle over 144 samples → spectral peak at k=12
    c = [10 + (7 if t % 12 == 0 else 0) for t in range(144)]
    series = spark.createDataFrame(
        [(t, v) for t, v in enumerate(c)], "h long, c long"
    )
    rows = {r.k: r.power for r in analytics.periodogram(series, max_k=20).collect()}
    assert max(rows, key=rows.get) == 12


def test_calibration_totals_match_test_split(spark):
    from conftest import SF_ORACLE

    rows = analytics._q_calibration_knn(spark, SF_ORACLE).collect()
    assert sum(r.n for r in rows) == 100  # 500 vecs, vec_id % 5 == 0 test split
    for r in rows:
        assert 0 <= r.n_correct <= r.n


def test_brier_and_logloss_bounds(spark):
    from conftest import SF_ORACLE

    b = analytics._q_brier_score(spark, SF_ORACLE).collect()[0]
    assert b.n_test == 100
    assert 0.0 <= b.brier <= 2.0
    ll = analytics._q_log_loss(spark, SF_ORACLE).collect()[0]
    # smoothed log loss is bounded below by the all-correct value
    assert ll.log_loss >= round(-np.log(11 / 20), 4) - 1e-9


def test_dedup_threshold_sweep_monotone(spark):
    from conftest import SF_ORACLE

    rows = {
        r.threshold_pct: r.n_pairs
        for r in analytics._q_dedup_threshold_sweep(spark, SF_ORACLE).collect()
    }
    assert rows[50] >= rows[70] >= rows[90] >= 0


def test_arrival_iat_consistency(spark):
    from conftest import SF_ORACLE

    for r in analytics._q_arrival_iat(spark, SF_ORACLE).collect():
        assert r.mean_us == pytest.approx(r.total_us / r.n_gaps, abs=1e-3)
        assert r.median_us <= r.max_us


def test_downsample_minmax_envelope(spark):
    from conftest import SF_ORACLE

    for r in analytics._q_downsample_minmax(spark, SF_ORACLE).collect():
        assert r.c_min <= r.c_first <= r.c_max
        assert r.c_min <= r.c_last <= r.c_max


def test_theil_sen_on_linear_series(spark):
    # exact line c = 3h + noise-free → every pairwise slope is 3
    series = spark.createDataFrame(
        [(h, 3 * h + 7) for h in range(40)], "h long, c long"
    )
    row = analytics.theil_sen(series).collect()[0]
    assert row.n_pairs == 40 * 39 // 2
    assert row.trend_per_hour == pytest.approx(3.0)


def test_mad_flags_planted_outliers(spark):
    c = [10, 11, 9, 10, 12, 10, 11, 9, 10, 500, 10, 11, -400, 10]
    series = spark.createDataFrame(
        [(h, v) for h, v in enumerate(c)], "h long, c long"
    )
    row = analytics.mad_outliers(series).collect()[0]
    assert row.n_outliers == 2
    assert row.median == pytest.approx(10.0)


def test_minhash_estimate_tracks_exact(spark):
    from conftest import SF_ORACLE

    rows = analytics._q_minhash_est_vs_exact(spark, SF_ORACLE).collect()
    assert rows
    est = np.array([r.jaccard_est for r in rows])
    exact = np.array([r.jaccard_exact for r in rows])
    # the sketch must correlate with truth over the candidate set
    if est.std() > 0 and exact.std() > 0:
        assert np.corrcoef(est, exact)[0, 1] > 0.4


def test_incremental_agg_equals_single_pass(spark):
    from conftest import SF_ORACLE
    from knn_with_mapreduce_cuda_spark import tables
    from knn_with_mapreduce_cuda_spark.operators.relational import cents

    got = {
        r.l_returnflag: (r.price_cents, r.n_items)
        for r in analytics._q_incremental_agg(spark, SF_ORACLE).collect()
    }
    li = tables.table(spark, SF_ORACLE, "lineitem")
    single = {
        r.l_returnflag: (r.s, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(cents(F.col("l_extendedprice"))).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == single  # merged partial states == one-pass aggregate


def test_snapshot_diff_partitions_users(spark):
    from conftest import SF_ORACLE

    rows = {r.status: r.n_users for r in analytics._q_snapshot_diff(spark, SF_ORACLE).collect()}
    assert sum(rows.values()) == 150  # every sf0.01 user classified once


def test_dataset_card_consistency(spark):
    from conftest import SF_ORACLE

    r = analytics._q_dataset_card(spark, SF_ORACLE).collect()[0]
    assert r.n_docs == 500 and r.n_langs == 5 and r.n_sources == 20
    assert 0 <= r.n_dup_docs <= r.n_docs
    assert r.mean_tokens_per_doc == pytest.approx(r.total_tokens / r.n_docs, abs=1e-3)


def test_label_prop_bounded_rounds(spark):
    # path 0-1-2-3-4: after r rounds node v has min label max(0, v - r)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], "a long, b long")
    got = {
        r.node: r.community
        for r in analytics.label_propagation(nodes, edges, rounds=2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}
    # enough rounds ⟹ full convergence to the component minimum
    conv = {
        r.node: r.community
        for r in analytics.label_propagation(nodes, edges, rounds=4).collect()
    }
    assert set(conv.values()) == {0}


def test_label_prop_isolated_nodes_keep_label(spark):
    nodes = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    edges = spark.createDataFrame([(0, 1)], "a long, b long")
    got = {
        r.node: r.community
        for r in analytics.label_propagation(nodes, edges, rounds=2).collect()
    }
    assert got == {0: 0, 1: 0, 9: 9}


def test_psi_and_chi2_sanity(spark):
    from conftest import SF_ORACLE

    p = analytics._q_psi_drift(spark, SF_ORACLE).collect()[0]
    # uniform event times ⟹ the two halves have near-identical value mix
    assert 0 <= p.psi < 0.1
    c = analytics._q_chi2_independence(spark, SF_ORACLE).collect()[0]
    assert c.dof == 4  # 5 event types × 2 buckets
    assert c.chi2 >= 0


def test_chi2_matches_numpy(spark):
    from conftest import SF_ORACLE
    from knn_with_mapreduce_cuda_spark import tables

    pdf = (
        tables.table(spark, SF_ORACLE, "events")
        .select("event_type", (F.col("user_id") % 2).alias("b"))
        .toPandas()
    )
    obs = pdf.groupby(["event_type", "b"]).size().unstack(fill_value=0).to_numpy()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    got = analytics._q_chi2_independence(spark, SF_ORACLE).collect()[0]
    assert got.chi2 == pytest.approx(chi2, abs=2e-4)


def test_ohlc_envelope_and_volume(spark):
    from conftest import SF_ORACLE
    from knn_with_mapreduce_cuda_spark import tables
    from knn_with_mapreduce_cuda_spark.operators.relational import cents

    rows = analytics._q_ohlc(spark, SF_ORACLE).collect()
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
    total = tables.table(spark, SF_ORACLE, "events").agg(
        F.sum(cents(F.col("value")))
    ).collect()[0][0]
    assert sum(r.vol_cents for r in rows) == total


def test_dist_concentration_high_dim_signature(spark):
    from conftest import SF_ORACLE

    r = analytics._q_dist_concentration(spark, SF_ORACLE).collect()[0]
    # dim-64 random-ish unit vectors: distances concentrate near sqrt(2)
    assert 1.2 < r.mean_dist < 1.6
    assert 0 < r.cv < 0.3
    assert r.rel_contrast > 0


def test_interp_linear_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    p = t[t.event_type == "purchase"].copy()
    p["tus"] = p.ts.values.astype("datetime64[us]").astype("int64")
    p["vc"] = (p.value * 100).round().astype("int64")
    p = p.sort_values(["tus", "event_id"])
    ts, vs = p.tus.to_numpy(), p.vc.to_numpy()
    H = 3_600_000_000
    expected = {}
    for h in range(int(-(-ts.min() // H)), int(ts.max() // H) + 1):
        tg = h * H
        # prev = last event with t <= tg (ties resolved by event_id via the
        # sort); next = first event with t > tg (events at exactly tg sort
        # before the grid row in the operator's window order).
        j = int(np.searchsorted(ts, tg, side="right"))
        i = j - 1
        if i < 0 or j >= len(ts):
            continue
        pt, pv, nt, nv = ts[i], vs[i], ts[j], vs[j]
        expected[h] = (pv * (nt - tg) + nv * (tg - pt)) / (nt - pt) / 100
    got = {r.h: r.value_interp for r in analytics._q_interp_linear(spark, SF_SMOKE).collect()}
    assert set(got) == set(expected)
    for h in expected:
        # 1.2e-4 absorbs Spark's HALF_UP round(,4) vs the unrounded oracle
        assert abs(got[h] - expected[h]) < 1.2e-4, h


def test_gini_matches_formula(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    x = np.sort(t.groupby("user_id").size().to_numpy())
    n, s = len(x), x.sum()
    sx = (np.arange(1, n + 1) * x).sum()
    exp = round((2.0 * sx - (n + 1.0) * s) / (n * s), 4)
    row = analytics._q_gini_activity(spark, SF_SMOKE).collect()[0]
    assert row.n_users == n and row.total_events == s
    assert row.gini == pytest.approx(exp)
    assert 0 <= row.gini < 1


def test_assoc_rules_consistency(spark):
    rows = analytics._q_assoc_rules(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.conf_a_to_b == pytest.approx(round(r.n_ab / r.n_a, 4))


def test_fano_spine_consistency(spark):
    rows = analytics._q_fano_burstiness(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    hours = {r.n_hours for r in rows}
    assert len(hours) == 1  # shared global spine
    assert sum(r.total for r in rows) == 1000  # sf0.001 events
    assert all(r.fano > 0 for r in rows)


def test_bfs_matches_python(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    edges = [(r.a, r.b) for r in _q_mutual(spark, SF_SMOKE).collect()]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {0: 0}
    frontier = {0}
    for d in range(1, 4):
        frontier = {y for x in frontier for y in adj.get(x, ())} - set(dist)
        for y in frontier:
            dist[y] = d
    got = {r.id: r.dist for r in analytics._q_bfs_dist(spark, SF_SMOKE).collect()}
    assert got == dist


def test_keywords_rank_shape(spark):
    rows = analytics._q_keywords_per_doc(spark, SF_SMOKE).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.rnk, r.siq))
    for doc, lst in per_doc.items():
        lst.sort()
        assert [rk for rk, _ in lst] == list(range(1, len(lst) + 1))
        scores = [s for _, s in lst]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_cosine_bounds_and_dup_pairs(spark):
    rows = analytics._q_tfidf_cosine_pairs(spark, SF_SMOKE).collect()
    assert rows, "planted dup docs must produce pairs"
    for r in rows:
        assert r.a < r.b
        assert 0 < r.cosine <= 1.0001
        assert r.dot > 0  # all pairs share the 'dup' term


def test_pr_curve_properties(spark):
    rows = sorted(
        analytics._q_pr_curve(spark, SF_SMOKE).collect(),
        key=lambda r: -r.threshold,
    )
    recalls = [r.recall for r in rows]
    assert recalls == sorted(recalls)  # monotone as threshold loosens
    assert rows[-1].recall == pytest.approx(1.0)
    for r in rows:
        # Spark round() is HALF_UP, python's is banker's — compare unrounded
        assert abs(r.precision - r.tp / (r.tp + r.fp)) < 6e-5


def test_clustering_coeff_bounds_and_triangle_mass(spark):
    rows = analytics._q_clustering_coeff(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.deg >= 2
        assert 0 <= r.cc <= 1
        assert r.tri <= r.deg * (r.deg - 1) // 2
    # every triangle contributes to exactly 3 nodes
    assert sum(r.tri for r in rows) % 3 == 0


def test_token_entropy_matches_numpy(spark):
    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    got = {r.doc_id: (r.n_tokens, r.entropy_nats)
           for r in analytics._q_token_entropy(spark, SF_SMOKE).collect()}
    for doc_id, text in list(zip(t.doc_id, t.text))[:50]:
        c = Counter(text.split(" "))
        L = sum(c.values())
        h = np.log(L) - sum(ci * np.log(ci) for ci in c.values()) / L
        assert got[doc_id][0] == L
        assert abs(got[doc_id][1] - h) < 1.2e-4


def test_cohens_kappa_matches_python(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_centroid, classify

    p1 = {r.qid: r.pred_label for r in classify(spark, SF_SMOKE).collect()}
    p2 = {r.qid: r.pred_label for r in _q_centroid(spark, SF_SMOKE).collect()}
    qids = sorted(set(p1) & set(p2))
    n = len(qids)
    agree = sum(p1[q] == p2[q] for q in qids)
    from collections import Counter

    c1, c2 = Counter(p1[q] for q in qids), Counter(p2[q] for q in qids)
    s = sum(c1[l] * c2[l] for l in c1)
    exp = (agree * n - s) / (n * n - s)
    row = analytics._q_cohens_kappa(spark, SF_SMOKE).collect()[0]
    assert row.n == n and row.agree == agree
    assert abs(row.kappa - exp) < 1.2e-4


def test_gains_table_shape(spark):
    rows = sorted(analytics._q_gains_table(spark, SF_SMOKE).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == 500
    captures = [r.capture for r in rows]
    assert captures == sorted(captures)
    assert captures[-1] == pytest.approx(1.0)


def test_time_to_convert_matches_python(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    t["tus"] = t.ts.values.astype("datetime64[us]").astype("int64")
    exp = {}
    for uid, g in t.groupby("user_id"):
        su = g[g.event_type == "signup"].tus
        if su.empty:
            continue
        s = su.min()
        pu = g[(g.event_type == "purchase") & (g.tus >= s)].tus
        if pu.empty:
            continue
        exp[uid] = (pu.min() - s) // 1_000_000
    got = {r.user_id: r.delta_s
           for r in analytics._q_time_to_convert(spark, SF_SMOKE).collect()}
    assert got == exp


def test_lang_vocab_overlap_bounds(spark):
    rows = analytics._q_lang_vocab_overlap(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_common <= min(r.n_a, r.n_b)
        assert 0 < r.jaccard <= 1


def test_logreg_irls1_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    xq = np.round(np.array([e[0] for e in t.embedding], dtype=np.float64) * 1e6)
    y = (t.label.to_numpy() >= 5).astype(np.int64)
    X = np.column_stack([np.ones_like(xq), xq])
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    row = analytics._q_logreg_irls1(spark, SF_SMOKE).collect()[0]
    assert row.n == len(y)
    assert abs(row.beta0 - beta[0]) < 1e-5
    assert abs(row.beta1 - beta[1] * 1e6) < 1e-5


def test_try_arith_null_semantics(spark):
    rows = analytics._q_try_arith(spark, SF_SMOKE).collect()
    assert all(r.bad_cast is None for r in rows)  # 'click' etc. never int
    zero_k = [r for r in rows if r.k_or_default == 0]
    assert zero_k, "fixture should contain k=0 props"
    assert all(r.cents_per_k is None for r in zero_k)  # divide-by-zero -> NULL


def test_drawdown_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    p = t[t.event_type == "purchase"].copy()
    p["tus"] = p.ts.values.astype("datetime64[us]").astype("int64")
    p["delta"] = ((p.value * 100).round().astype("int64")
                  * np.where(p.event_id % 2 == 0, 1, -1))
    p = p.sort_values(["tus", "event_id"])
    cum = p.delta.cumsum().to_numpy()
    peak = np.maximum.accumulate(cum)
    exp = {eid: (c, pk, pk - c) for eid, c, pk in zip(p.event_id, cum, peak)}
    got = {r.event_id: (r.cum_c, r.peak_c, r.drawdown_c)
           for r in analytics._q_drawdown(spark, SF_SMOKE).collect()}
    assert got == exp


def test_kcore_peel_matches_python(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    edges = [(r.a, r.b) for r in _q_mutual(spark, SF_SMOKE).collect()]

    def peel(es, k=3):
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        rm = {n for n, d in deg.items() if d < k}
        return [(a, b) for a, b in es if a not in rm and b not in rm]

    e2 = peel(peel(edges))
    deg2 = {}
    for a, b in e2:
        deg2[a] = deg2.get(a, 0) + 1
        deg2[b] = deg2.get(b, 0) + 1
    got = {r.node: r.deg_after_peel2
           for r in analytics._q_kcore_peel(spark, SF_SMOKE).collect()}
    assert got == deg2


def test_sax_symbols_partition(spark):
    rows = analytics._q_sax_symbols(spark, SF_SMOKE).collect()
    assert len(rows) == 720
    counts = [r.c for r in rows]
    mu = np.mean(counts)
    sd = np.std(counts, ddof=1)
    for r in rows:
        z = (r.c - mu) / sd
        exp = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        assert r.sym == exp, (r.h, z)


def test_shingle_containment_dominates_jaccard(spark):
    rows = analytics._q_shingle_containment(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        jac = r.i / (r.n_a + r.n_b - r.i)
        assert r.contain_a >= round(jac, 4) - 1e-9
        assert r.contain_b >= round(jac, 4) - 1e-9
        assert r.i <= min(r.n_a, r.n_b)


def test_decompose_components_reconstruct(spark):
    rows = analytics._q_decompose(spark, SF_SMOKE).collect()
    assert len(rows) == 720
    counts = {r.h: r.c for r in rows}
    grand = np.mean(list(counts.values()))
    for r in rows[:100]:
        # components reconstruct the observation (additive model identity)
        assert r.c == pytest.approx(
            r.seasonal + r.trend + r.residual - grand, abs=3e-4
        )


def test_mcc_matches_sklearn_formula(spark):
    row = analytics._q_mcc(spark, SF_SMOKE).collect()[0]
    tp, tn, fp, fn = row.tp, row.tn, row.fp, row.fn
    assert tp + tn + fp + fn == 100  # sf0.001 test split
    exp = (tp * tn - fp * fn) / np.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(row.mcc - exp) < 1e-4
    assert -1 <= row.mcc <= 1


def test_platt_step_matches_numpy(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import (
        K_DEFAULT,
        _pairs,
        majority_vote,
        topk,
    )

    pred = majority_vote(topk(_pairs(spark, SF_SMOKE), K_DEFAULT)).collect()
    x = np.array([r.votes for r in pred], dtype=np.float64)
    y = np.array([r.correct for r in pred], dtype=np.float64)
    X = np.column_stack([np.ones_like(x), x])
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    row = analytics._q_platt_1step(spark, SF_SMOKE).collect()[0]
    assert abs(row.beta0 - beta[0]) < 1e-5
    assert abs(row.beta1_per_vote - beta[1]) < 1e-5


def test_ljung_box_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo, hi = h.min(), h.max()
    c = np.bincount(h - lo, minlength=hi - lo + 1).astype(np.float64)
    n = len(c)
    q = 0.0
    for k in range(1, 11):
        q += _np_acf(c.astype(np.int64), k) ** 2 / (n - k)
    q *= n * (n + 2)
    row = analytics._q_ljung_box(spark, SF_SMOKE).collect()[0]
    assert row.n_hours == n
    assert abs(row.q_stat - q) < 2e-3


def test_peak_detect_is_local_max(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    mu, sd = c.mean(), c.std(ddof=1)
    exp = {
        int(i + lo)
        for i in range(1, len(c) - 1)
        if c[i] > c[i - 1] and c[i] > c[i + 1] and (c[i] - mu) / sd > 1.0
    }
    got = {r.h for r in analytics._q_peak_detect(spark, SF_SMOKE).collect()}
    assert got == exp


def test_variant_extraction_typed(spark):
    rows = analytics._q_variant_fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1000
    for r in rows[:50]:
        assert r.k_sq == r.k_int * r.k_int
        assert r.k_str == str(r.k_int)


def test_degree_gini_bounds(spark):
    row = analytics._q_degree_gini(spark, SF_SMOKE).collect()[0]
    assert row.n_nodes == 500
    assert row.total_edges == 500 * 5  # every node emits k=5 edges
    assert 0 <= row.gini < 1


def test_cross_correlation_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo, n = h.min(), h.max() - h.min() + 1
    x = np.bincount(h[t.event_type == "view"] - lo, minlength=n).astype(float)
    y = np.bincount(h[t.event_type == "purchase"] - lo, minlength=n).astype(float)
    mx, my = x.mean(), y.mean()
    den = np.sqrt(((x - mx) ** 2).sum()) * np.sqrt(((y - my) ** 2).sum())
    got = {r.k: r.ccf for r in analytics._q_cross_correlation(spark, SF_SMOKE).collect()}
    for k in range(13):
        num = ((y[k:] - my) * (x[: n - k] - mx)).sum()
        assert abs(got[k] - num / den) < 2e-4, k


def test_variance_time_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    got = {r.w: (r.n_blocks, r.block_var)
           for r in analytics._q_variance_time(spark, SF_SMOKE).collect()}
    # blocks are keyed by absolute hour index h div w, so alignment
    # follows the absolute grid, not the series start
    for w in [1, 2, 4, 8, 16, 32]:
        blk = (np.arange(lo, h.max() + 1)) // w
        sums, counts = {}, {}
        for bi, ci in zip(blk, c):
            sums[bi] = sums.get(bi, 0) + ci
            counts[bi] = counts.get(bi, 0) + 1
        vals = np.array([sums[b] for b in sums if counts[b] == w], dtype=float)
        assert got[w][0] == len(vals)
        assert abs(got[w][1] - vals.var(ddof=1)) < 2e-3, w


def test_histogram_log_total(spark):
    rows = analytics._q_histogram_log(spark, SF_SMOKE).collect()
    assert sum(r.n for r in rows) == 1500  # sf0.001 orders
    assert all(2 <= r.decade <= 8 for r in rows)


def test_perplexity_matches_numpy(spark):
    import hashlib

    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    is_train = {
        d: hashlib.md5(str(d).encode()).hexdigest()[:2] < "cc" for d in t.doc_id
    }
    counts, nt = Counter(), 0
    for d, text in zip(t.doc_id, t.text):
        if is_train[d]:
            toks = text.split(" ")
            counts.update(toks)
            nt += len(toks)
    vs = len(counts)
    got = {r.doc_id: (r.n_tokens, r.perplexity)
           for r in analytics._q_perplexity(spark, SF_SMOKE).collect()}
    checked = 0
    for d, text in zip(t.doc_id, t.text):
        if is_train[d]:
            continue
        toks = text.split(" ")
        lp = sum(np.log((counts[w] + 1) / (nt + vs + 1)) for w in toks)
        pp = np.exp(-lp / len(toks))
        assert got[d][0] == len(toks)
        assert abs(got[d][1] - pp) / pp < 1e-4
        checked += 1
    assert checked == len(got) > 0


def test_ndcg_matches_numpy(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _pairs, topk

    rows = topk(_pairs(spark, SF_SMOKE), 10).collect()
    per = {}
    for r in rows:
        per.setdefault(r.qid, []).append((r.rnk, int(r.tlabel == r.qlabel)))
    ndcgs = []
    for qid, lst in per.items():
        lst.sort()
        dcg = sum(rel / np.log2(rk + 1) for rk, rel in lst)
        nrel = sum(rel for _, rel in lst)
        if nrel == 0:
            ndcgs.append(0.0)
            continue
        idcg = sum(1 / np.log2(i + 1) for i in range(1, nrel + 1))
        ndcgs.append(dcg / idcg)
    row = analytics._q_ndcg(spark, SF_SMOKE).collect()[0]
    assert row.n_queries == len(per)
    assert abs(row.mean_ndcg_at10 - np.mean(ndcgs)) < 1e-4


def test_modularity_matches_python(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    edges = [(r.a, r.b) for r in _q_mutual(spark, SF_SMOKE).collect()]
    comm = {
        r.node: r.community
        for r in analytics.label_propagation(
            analytics.tables.embeddings(spark, SF_SMOKE).select(
                col("vec_id").alias("id")
            ),
            spark.createDataFrame(edges, "a long, b long"),
        ).collect()
    }
    m = len(edges)
    deg, ec, dc = {}, {}, {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if comm[a] == comm[b]:
            ec[comm[a]] = ec.get(comm[a], 0) + 1
    for n, c in comm.items():
        dc[c] = dc.get(c, 0) + deg.get(n, 0)
    q = sum(ec.get(c, 0) / m - (dc[c] / (2 * m)) ** 2 for c in dc)
    row = analytics._q_modularity(spark, SF_SMOKE).collect()[0]
    assert row.n_communities == len(dc)
    assert abs(row.modularity - q) < 1e-4
    assert -0.5 <= row.modularity <= 1


def test_hurst_rs_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1).astype(np.int64)
    got = {r.w: (r.n_blocks, r.mean_rs)
           for r in analytics._q_hurst_rs(spark, SF_SMOKE).collect()}
    for w in [8, 16, 32, 64]:
        vals = []
        # blocks keyed by absolute h div w (not series-relative)
        habs = np.arange(lo, h.max() + 1)
        for blk in np.unique(habs // w):
            mask = habs // w == blk
            if mask.sum() != w:
                continue
            x = c[mask]
            if x.std() == 0:
                continue
            dev = np.cumsum(x - x.mean())
            rs = (dev.max() - dev.min()) / x.std()
            vals.append(rs)
        assert got[w][0] == len(vals)
        assert abs(got[w][1] - np.mean(vals)) < 2e-3, w


def test_attribution_conserves_cents(spark):
    import pyarrow.parquet as pq

    from knn_with_mapreduce_cuda_spark.operators import streaming_batch

    rows = streaming_batch._q_attribution_linear(spark, SF_SMOKE).collect()
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    p = t[t.event_type == "purchase"]
    total_cents = int((p.value * 100).round().astype("int64").sum())
    # allocation conserves every purchase's cents exactly
    assert sum(r.attr_cents for r in rows) == total_cents
    per_p = {}
    for r in rows:
        per_p.setdefault(r.p_id, []).append(r)
    for pid, lst in per_p.items():
        n = lst[0].n_touch
        if n == 0:
            assert len(lst) == 1 and lst[0].touch_id == -1
        else:
            assert len(lst) == n
            shares = sorted(r.attr_cents for r in lst)
            assert shares[-1] - shares[0] <= n  # remainder goes to one touch


def test_parquet_metadata_matches_duckdb(spark):
    import duckdb

    from knn_with_mapreduce_cuda_spark.operators import sources_io

    got = sorted(
        (r.row_group_id, r.num_rows, r.n_cols, r.compressed_bytes)
        for r in sources_io._q_parquet_metadata(spark, SF_SMOKE).collect()
    )
    exp = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                "SELECT row_group_id, row_group_num_rows, count(*), "
                "CAST(sum(total_compressed_size) AS BIGINT) "
                f"FROM parquet_metadata('{SF_SMOKE}/lineitem.parquet') "
                "GROUP BY 1, 2"
            )
            .fetchall(),
        )
    )
    assert got == exp


def test_topic_coherence_bounds(spark):
    from knn_with_mapreduce_cuda_spark.operators import iterative

    rows = iterative._q_topic_coherence(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # k=5 clusters
    for r in rows:
        assert r.n_pairs == 10  # C(5,2) pairs of top tokens
        assert -1 <= r.coherence_npmi <= 1


def test_cluster_purity_nmi_matches_sklearn_formulas(spark):
    from collections import Counter

    from knn_with_mapreduce_cuda_spark.operators.iterative import _q_kmeans

    asg = {r.vec_id: r.cluster for r in _q_kmeans(spark, SF_SMOKE).collect()}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    lab = dict(zip(t.vec_id, t.label))
    n = len(asg)
    ct = Counter((asg[v], lab[v]) for v in asg)
    purity = sum(
        max(c for (cl, _), c in ct.items() if cl == cluster)
        for cluster in {cl for cl, _ in ct}
    ) / n
    a = Counter(asg.values())
    b = Counter(lab[v] for v in asg)
    mi = sum(
        c / n * np.log(c * n / (a[cl] * b[l])) for (cl, l), c in ct.items()
    )
    ha = -sum(v / n * np.log(v / n) for v in a.values())
    hb = -sum(v / n * np.log(v / n) for v in b.values())
    row = analytics._q_cluster_purity_nmi(spark, SF_SMOKE).collect()[0]
    assert row.n == n
    assert abs(row.purity - purity) < 1e-4
    assert abs(row.nmi - 2 * mi / (ha + hb)) < 1e-4
    assert 0 <= row.nmi <= 1


def test_yoy_growth_consistency(spark):
    rows = sorted(analytics._q_yoy_growth(spark, SF_SMOKE).collect(),
                  key=lambda r: r.yr)
    assert rows[0].prev_cents is None and rows[0].growth_pct is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_cents == prev.rev_cents
        exp = (cur.rev_cents - cur.prev_cents) * 100 / cur.prev_cents
        assert cur.growth_pct == pytest.approx(exp, abs=1e-4)


def test_tukey_fences_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pandas()
    tc = (t.o_totalprice * 100).round().astype("int64").to_numpy()
    q1 = np.quantile(tc, 0.25, method="linear")
    q3 = np.quantile(tc, 0.75, method="linear")
    row = analytics._q_tukey_fences(spark, SF_SMOKE).collect()[0]
    assert row.n == len(tc)
    assert row.q1 == pytest.approx(q1, abs=1e-2)
    assert row.q3 == pytest.approx(q3, abs=1e-2)
    assert row.n_low == int((tc < q1 - 1.5 * (q3 - q1)).sum())
    assert row.n_high == int((tc > q3 + 1.5 * (q3 - q1)).sum())


def test_kmeans_inertia_matches_numpy(spark):
    import pyarrow.parquet as pq

    from knn_with_mapreduce_cuda_spark.operators.iterative import _q_kmeans

    asg = {r.vec_id: r.cluster for r in _q_kmeans(spark, SF_SMOKE).collect()}
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    E = {v: np.asarray(e, dtype=np.float64) for v, e in zip(t.vec_id, t.embedding)}
    got = {r.cluster: (r.n_members, r.inertia)
           for r in analytics._q_kmeans_inertia(spark, SF_SMOKE).collect()}
    for c in got:
        members = [v for v in asg if asg[v] == c]
        cent = np.round(np.mean([E[v] for v in members], axis=0), 4)
        inertia = sum(((E[v] - cent) ** 2).sum() for v in members)
        assert got[c][0] == len(members)
        assert abs(got[c][1] - inertia) < 1e-2, c


def test_lang_confusion_consistent_with_lang_id(spark):
    from knn_with_mapreduce_cuda_spark.operators.llm import QUERIES as LLM_Q

    rows = analytics._q_lang_confusion(spark, SF_SMOKE).collect()
    total = sum(r.n for r in rows)
    diag = sum(r.n for r in rows if r.true_lang == r.pred_lang)
    assert total == 500
    correct = (
        LLM_Q["llm_lang_id"](spark, SF_SMOKE)
        .agg(F.sum("is_correct"))
        .collect()[0][0]
    )
    assert diag == correct  # the matrix diagonal IS the lang_id accuracy


def test_learning_curve_monotone_data(spark):
    rows = {r.frac: r for r in analytics._q_learning_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == {25, 50, 75, 100}
    for f in rows:
        assert rows[f].n_queries == 100  # every fraction answers all queries
    # more data should not catastrophically hurt: 100% within 15pp of best
    best = max(r.accuracy for r in rows.values())
    assert rows[100].accuracy >= best - 0.15


def test_fk_integrity_all_clean(spark):
    rows = {r.fk: (r.n_child, r.n_orphans)
            for r in analytics._q_fk_integrity(spark, SF_SMOKE).collect()}
    assert len(rows) == 7
    assert all(o == 0 for _, o in rows.values())  # fixtures are consistent
    assert rows["lineitem.l_orderkey->orders"][0] == 6000


def test_user_temporal_entropy_bounds(spark):
    rows = analytics._q_user_temporal_entropy(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.entropy_nats <= np.log(24) + 1e-9


def test_ivf_recall_reasonable_and_bounded(spark):
    row = analytics._q_ivf_recall(spark, SF_SMOKE).collect()[0]
    assert row.n_queries == 100
    assert row.truths == 1000  # 100 queries x exact top-10
    assert 0 < row.recall_at10 <= 1
    # probing 2 of 5 cells must beat the 2/5 random-cell floor
    assert row.recall_at10 > 0.4


def test_lag_features_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    got = {r.h - lo: r for r in analytics._q_lag_features(spark, SF_SMOKE).collect()}
    for i in range(25, len(c), 37):
        r = got[i]
        assert r.lag_1 == c[i - 1] and r.lag_24 == c[i - 24]
        assert r.diff_1 == c[i] - c[i - 1]
        win = c[max(0, i - 24) : i]
        assert r.mean_24 == pytest.approx(win.mean(), abs=1e-4)
        assert r.max_24 == win.max()


def test_embed_outliers_z_distribution(spark):
    rows = analytics._q_embed_outliers(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    zs = np.array([r.z for r in rows])
    assert abs(zs.mean()) < 0.01  # z-scores center on 0
    assert all(r.dist_centroid >= 0 for r in rows)


def test_reciprocity_consistent_with_mutual_graph(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    n_mutual_undirected = _q_mutual(spark, SF_SMOKE).count()
    row = analytics._q_reciprocity(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == 500 * 5
    # each undirected mutual pair = 2 reciprocated directed edges
    assert row.n_mutual == 2 * n_mutual_undirected


def test_hash_uniformity_chi2_matches_numpy(spark):
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    from collections import Counter

    cnt = Counter(hashlib.md5(str(d).encode()).hexdigest()[:2] for d in t.doc_id)
    n = len(t)
    exp = n / 256
    chi2 = sum((c - exp) ** 2 for c in cnt.values()) / exp + (256 - len(cnt)) * exp
    row = analytics._q_hash_uniformity(spark, SF_SMOKE).collect()[0]
    assert row.n_rows == n and row.n_buckets_hit == len(cnt)
    assert row.chi2_255df == pytest.approx(chi2, abs=1e-2)


def test_bigram_crossentropy_bounds(spark):
    from knn_with_mapreduce_cuda_spark.operators import analytics as A

    row = A._q_bigram_crossentropy(spark, SF_SMOKE).collect()[0]
    uni = A._q_perplexity(spark, SF_SMOKE).collect()
    # bigram CE should beat (or at least approach) the unigram LM's CE
    uni_ce = np.mean([np.log(r.perplexity) for r in uni])
    assert 0 < row.cross_entropy_nats < uni_ce + 0.5


def test_skyline_matches_bruteforce(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/part.parquet").to_pandas()
    pts = [
        (k, int(round(p * 100)), s)
        for k, p, s in zip(t.p_partkey, t.p_retailprice, t.p_size)
    ]
    exp = {
        (k, pc, sz)
        for k, pc, sz in pts
        if not any(
            (qc <= pc and qs >= sz and (qc < pc or qs > sz))
            for _, qc, qs in pts
        )
    }
    got = {(r.p_partkey, r.price_c, r.p_size)
           for r in analytics._q_skyline(spark, SF_SMOKE).collect()}
    assert got == exp
    assert got  # frontier is never empty


def test_conformal_coverage_near_nominal(spark):
    row = analytics._q_conformal_knn(spark, SF_SMOKE).collect()[0]
    assert row.n_test > 0 and row.qhat >= 0
    # split-conformal guarantees >= 90% marginal coverage in expectation;
    # finite-sample slack on ~50 test points
    assert row.coverage >= 0.75


def test_boilerplate_prefix_groups(spark):
    rows = analytics._q_boilerplate_prefix(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.n_docs > 1
        assert len(r.prefix.split(" ")) == 3


def test_edit_distance_pairs_sane(spark):
    rows = analytics._q_edit_distance_pairs(spark, SF_SMOKE).collect()
    assert rows  # planted near-dups produce candidates
    for r in rows:
        assert 0 <= r.sim_ratio <= 1
        assert r.edit_dist >= 0
    # at least one candidate pair should be strongly similar at char level
    assert max(r.sim_ratio for r in rows) > 0.5


def test_merge_intervals_matches_python(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    p = t[t.event_type == "purchase"].copy()
    p["s"] = p.ts.values.astype("datetime64[us]").astype("int64")
    ivs = sorted(zip(p.s, p.s + 300_000_000, p.event_id))
    merged = []
    for s, e, _ in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += 1
        else:
            merged.append([s, e, 1])
    got = sorted(
        (r.start_us, r.end_us, r.n_intervals)
        for r in analytics._q_merge_intervals(spark, SF_SMOKE).collect()
    )
    assert got == [tuple(m) for m in merged]


def test_backtest_snaive_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1).astype(np.int64)
    mx = len(c) - 1
    idx = [i for i in range(24, len(c)) if i > mx - 168]
    err = np.array([c[i] - c[i - 24] for i in idx], dtype=np.float64)
    row = analytics._q_backtest_snaive(spark, SF_SMOKE).collect()[0]
    assert row.n_hours == len(idx)
    assert row.mae == pytest.approx(np.abs(err).mean(), abs=1e-3)
    assert row.rmse == pytest.approx(np.sqrt((err**2).mean()), abs=1e-3)
    assert row.bias == pytest.approx(err.mean(), abs=1e-3)


def test_pattern_match_matches_python(spark):
    import re

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    t["tus"] = t.ts.values.astype("datetime64[us]").astype("int64")
    t = t.sort_values(["tus", "event_id"])
    clean = anyc = err = 0
    for _, g in t.groupby("user_id"):
        j = "".join(s[0] for s in g.event_type)
        clean += bool(re.search(r"s[^e]*p", j))
        anyc += bool(re.search(r"s.*p", j))
        err += "e" in j
    row = analytics._q_pattern_match_seq(spark, SF_SMOKE).collect()[0]
    assert (row.clean_converters, row.any_converters, row.saw_error) == (
        clean,
        anyc,
        err,
    )


def test_rle_sax_reconstructs_sequence(spark):
    sax = {r.h: r.sym for r in analytics._q_sax_symbols(spark, SF_SMOKE).collect()}
    runs = sorted(
        analytics._q_rle_sax(spark, SF_SMOKE).collect(), key=lambda r: r.start_h
    )
    assert sum(r.run_len for r in runs) == len(sax)
    # runs tile the hour axis contiguously and agree with the symbols
    pos = min(sax)
    for r in runs:
        assert r.start_h == pos
        for h in range(r.start_h, r.start_h + r.run_len):
            assert sax[h] == r.sym
        pos += r.run_len
    # adjacent runs must alternate symbols (maximal runs)
    for a, b in zip(runs, runs[1:]):
        assert a.sym != b.sym


def test_class_weights_weighted_mean_is_one(spark):
    rows = analytics._q_class_weights(spark, SF_SMOKE).collect()
    n = sum(r.n_c for r in rows)
    # sum_c n_c * w_c == n  (balanced-weight identity)
    assert sum(r.n_c * r.weight for r in rows) == pytest.approx(n, rel=1e-3)


def test_season_strength_bounds_and_formula(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1).astype(np.float64)
    habs = np.arange(lo, h.max() + 1)
    seas = np.zeros_like(c)
    for hd in range(24):
        m = habs % 24 == hd
        seas[m] = c[m].mean()
    resid = c - seas
    fs = max(0.0, 1 - resid.var(ddof=1) / c.var(ddof=1))
    row = analytics._q_season_strength(spark, SF_SMOKE).collect()[0]
    assert row.n_hours == len(c)
    assert row.season_strength == pytest.approx(fs, abs=1e-3)
    assert 0 <= row.season_strength <= 1


def test_embed_drift_ks_no_drift_on_unbiased_split(spark):
    row = analytics._q_embed_drift_ks(spark, SF_SMOKE).collect()[0]
    assert row.n1 == 400 and row.n2 == 100
    assert 0 <= row.d_stat <= 1
    # vec_id % 5 split is unbiased by construction -> no drift expected
    assert row.drift_flag == 0
    assert row.d_stat < row.crit_5pct


def test_acf_significance_agrees_with_band(spark):
    rows = analytics._q_acf_significance(spark, SF_SMOKE).collect()
    assert len(rows) == 24
    n = 720
    band = 1.96 / np.sqrt(n)
    for r in rows:
        # quantized integer decision matches the float band test except
        # exactly at the boundary (none occur in the fixture)
        assert r.significant == int(abs(r.acf) > band), r.k


def test_kaplan_meier_matches_python(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    t["tus"] = t.ts.values.astype("datetime64[us]").astype("int64")
    mx = t.tus.max()
    lives = []
    for _, g in t.groupby("user_id"):
        lt = (g.tus.max() - g.tus.min()) // 86_400_000_000
        lives.append((lt, int(g.tus.max() < mx - 3 * 86_400_000_000)))
    lives.sort()
    n_at_risk = len(lives)
    s = 1.0
    exp = {}
    from itertools import groupby

    for lt, grp in groupby(lives, key=lambda x: x[0]):
        grp = list(grp)
        d = sum(e for _, e in grp)
        if d:
            s *= 1 - d / n_at_risk
        exp[lt] = (d, n_at_risk, round(s, 4))
        n_at_risk -= len(grp)
    got = {r.t: (r.d, r.n_at_risk, r.survival)
           for r in analytics._q_kaplan_meier(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][1] == exp[k][1]
        assert got[k][2] == pytest.approx(exp[k][2], abs=2e-4)


def test_transitivity_consistent_with_parts(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    edges = [(r.a, r.b) for r in _q_mutual(spark, SF_SMOKE).collect()]
    deg = {}
    adj = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < b < c
    )
    row = analytics._q_transitivity(spark, SF_SMOKE).collect()[0]
    assert row.wedges == wedges and row.triangles == tri
    assert 0 <= row.transitivity <= 1


def test_mcnemar_consistent_with_kappa_inputs(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_centroid, classify

    k = {r.qid: r.correct for r in classify(spark, SF_SMOKE).collect()}
    c = {r.qid: r.correct for r in _q_centroid(spark, SF_SMOKE).collect()}
    b = sum(1 for q in k if k[q] == 1 and c[q] == 0)
    cc = sum(1 for q in k if k[q] == 0 and c[q] == 1)
    row = analytics._q_mcnemar(spark, SF_SMOKE).collect()[0]
    assert (row.b, row.c) == (b, cc)
    if b + cc:
        assert row.chi2_1df == pytest.approx(
            (abs(b - cc) - 1) ** 2 / (b + cc), abs=1e-4
        )


def test_cohort_ltv_monotone_and_conserves(spark):
    import pyarrow.parquet as pq

    rows = analytics._q_cohort_ltv(spark, SF_SMOKE).collect()
    per = {}
    for r in rows:
        per.setdefault(r.cohort_day, []).append((r.day_offset, r.cum_c))
    for c, lst in per.items():
        lst.sort()
        cums = [v for _, v in lst]
        assert cums == sorted(cums)  # cumulative revenue is monotone
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    total = int(
        (t[t.event_type == "purchase"].value * 100).round().astype("int64").sum()
    )
    assert sum(max(v for _, v in lst) for lst in per.values()) == total


def test_lsh_bucket_stats_mass(spark):
    from knn_with_mapreduce_cuda_spark.operators.llm import N_BANDS

    rows = analytics._q_lsh_bucket_stats(spark, SF_SMOKE).collect()
    # every (doc, band) signature lands in exactly one bucket
    assert sum(r.sz * r.n_buckets for r in rows) == 500 * N_BANDS
    for r in rows:
        assert r.candidate_pairs == r.n_buckets * r.sz * (r.sz - 1) // 2


def test_weekday_weekend_profile_mass(spark):
    rows = analytics._q_weekday_weekend_profile(spark, SF_SMOKE).collect()
    assert sum(r.c for r in rows) == 1000
    hods = {(r.hod, r.is_weekend) for r in rows}
    assert len(hods) == len(rows)  # one row per (hod, regime) cell


def test_ece_matches_calibration_table(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import (
        K_DEFAULT,
        _pairs,
        majority_vote,
        topk,
    )

    pred = majority_vote(topk(_pairs(spark, SF_SMOKE), K_DEFAULT)).collect()
    from collections import defaultdict

    bins = defaultdict(lambda: [0, 0])
    for r in pred:
        bins[r.votes][0] += 1
        bins[r.votes][1] += r.correct
    n = len(pred)
    ece = sum(
        nb / n * abs(v / K_DEFAULT - cb / nb) for v, (nb, cb) in bins.items()
    )
    row = analytics._q_ece(spark, SF_SMOKE).collect()[0]
    assert row.n == n
    assert row.ece == pytest.approx(ece, abs=1e-4)


def test_hapax_mass_conserved(spark):
    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    cf = Counter(w for text in t.text for w in text.split(" "))
    n_hapax_total = sum(1 for c in cf.values() if c == 1)
    rows = analytics._q_hapax_stats(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    assert sum(r.n_hapax for r in rows) == n_hapax_total


def test_natural_join_matches_manual(spark):
    rows = {(r.n_name, r.r_name)
            for r in analytics._q_join_natural(spark, SF_SMOKE).collect()}
    assert len(rows) == 25  # every nation resolves its region


def test_type_correlation_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    t = t.assign(h=tus // 3_600_000_000)
    lo, hi = t.h.min(), t.h.max()
    series = {}
    for et, g in t.groupby("event_type"):
        series[et] = np.bincount(g.h - lo, minlength=hi - lo + 1)
    got = {(r.ta, r.tb): r.pearson_r
           for r in analytics._q_type_correlation(spark, SF_SMOKE).collect()}
    assert len(got) == 10
    for (a, b), r in got.items():
        exp = np.corrcoef(series[a], series[b])[0, 1]
        assert abs(r - exp) < 2e-4, (a, b)


def test_dim_ablation_shapes(spark):
    rows = {r.variant: r for r in analytics._q_dim_ablation(spark, SF_SMOKE).collect()}
    assert set(rows) == {"dims_32", "dims_64"}
    for r in rows.values():
        assert r.n_queries == 100
        assert 0 <= r.accuracy <= 1


def test_new_vs_returning_identity(spark):
    import pyarrow.parquet as pq

    rows = analytics._q_new_vs_returning(spark, SF_SMOKE).collect()
    # every user is new exactly once
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    assert sum(r.new_users for r in rows) == t.user_id.nunique()
    # daily actives = new + returning
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    t = t.assign(day=tus // 86_400_000_000)
    dau = t.groupby("day").user_id.nunique()
    got = {r.day: r.new_users + r.returning_users for r in rows}
    assert got == dau.to_dict()


def test_column_profile_matches_pandas(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/lineitem.parquet").to_pandas()
    rows = {r.col_name: r for r in analytics._q_column_profile(spark, SF_SMOKE).collect()}
    assert rows["l_orderkey"].n_distinct == t.l_orderkey.nunique()
    assert rows["l_returnflag"].n_distinct == 3
    assert all(r.n_null == 0 for r in rows.values())
    assert int(rows["l_quantity"].max_str) == int(round(t.l_quantity.max() * 100))


def test_completeness_bounds(spark):
    rows = analytics._q_completeness(spark, SF_SMOKE).collect()
    assert len(rows) == 30
    for r in rows:
        assert 1 <= r.hours_present <= 24
        assert r.completeness <= 1.0001


def test_label_noise_flags_match_bruteforce(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    E = np.array([np.asarray(e, dtype=np.float64) for e in t.embedding])
    ids = t.vec_id.to_numpy()
    labels = t.label.to_numpy()
    flagged = set()
    for i in range(len(ids)):
        d = np.sqrt(((E - E[i]) ** 2).sum(axis=1))
        d[i] = np.inf
        order = sorted((round(dv, 4), tid) for dv, tid in zip(d, ids) if dv < np.inf)
        nbrs = [tid for _, tid in order[:5]]
        same = sum(labels[list(ids).index(tid)] == labels[i] for tid in nbrs)
        if 5 * same <= 5:
            flagged.add(ids[i])
    got = {r.qid for r in analytics._q_label_noise_flags(spark, SF_SMOKE).collect()}
    assert got == flagged


def test_lowe_ratio_bounds(spark):
    rows = analytics._q_lowe_ratio(spark, SF_SMOKE).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0 < r.d1 <= r.d5
        assert 0 < r.lowe_ratio <= 1.0001


def test_balanced_accuracy_matches_python(spark):
    from collections import defaultdict

    from knn_with_mapreduce_cuda_spark.operators.knn import classify

    per = defaultdict(lambda: [0, 0])
    for r in classify(spark, SF_SMOKE).collect():
        per[r.true_label][0] += 1
        per[r.true_label][1] += r.correct
    exp = np.mean([ok / n for n, ok in per.values()])
    row = analytics._q_balanced_accuracy(spark, SF_SMOKE).collect()[0]
    assert row.n_classes == len(per)
    assert row.balanced_accuracy == pytest.approx(exp, abs=1e-4)


def test_runs_test_matches_python(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    med = np.sort(c, kind="stable")[int(np.ceil(len(c) / 2)) - 1]
    seq = [int(x > med) for x in c if x != med]
    r = 1 + sum(a != b for a, b in zip(seq, seq[1:]))
    n1, n2 = sum(seq), len(seq) - sum(seq)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    row = analytics._q_runs_test(spark, SF_SMOKE).collect()[0]
    assert (row.r, row.n1, row.n2) == (r, n1, n2)
    assert row.z == pytest.approx((r - mu) / np.sqrt(var), abs=1e-3)


def test_hits_top_hub_is_max(spark):
    rows = analytics._q_hits(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    assert max(r.hub_u for r in rows) == analytics.HITS_SCALE
    assert max(r.auth_u for r in rows) == analytics.HITS_SCALE
    assert all(0 <= r.hub_u <= analytics.HITS_SCALE for r in rows)


def test_stickiness_bounds(spark):
    rows = analytics._q_stickiness(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.dau <= r.mau
        assert 0 < r.stickiness <= 1


def test_youden_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    # mirror the operator's pre-quantized thresholds (_emb_scored_pts)
    s = np.array([_round4(e[0]) for e in t.embedding], dtype=np.float64)
    y = (t.label.to_numpy() >= 5).astype(int)
    p, neg = y.sum(), (1 - y).sum()
    best = (-1, None)
    for thr in np.unique(s)[::-1]:
        sel = s >= thr
        j = y[sel].sum() * neg - (sel.sum() - y[sel].sum()) * p
        if j > best[0]:
            best = (j, thr)
    row = analytics._q_youden_threshold(spark, SF_SMOKE).collect()[0]
    assert row.threshold == pytest.approx(round(float(best[1]), 4), abs=1e-4)


def test_average_precision_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    # the operator sweeps thresholds pre-quantized to 4 decimals (see
    # analytics._emb_scored_pts) — mirror that exactly: F.round is
    # BigDecimal(x).setScale(4, HALF_UP), which Decimal reproduces
    s = np.array([_round4(e[0]) for e in t.embedding], dtype=np.float64)
    y = (t.label.to_numpy() >= 5).astype(int)
    order = np.argsort(-s, kind="stable")
    ap, tp, fp, prev_tp = 0.0, 0, 0, 0
    for thr in np.unique(s)[::-1]:
        sel = s >= thr
        tp = int(y[sel].sum())
        fp = int(sel.sum() - tp)
        ap += (tp - prev_tp) * tp / (tp + fp)
        prev_tp = tp
    ap /= y.sum()
    row = analytics._q_average_precision(spark, SF_SMOKE).collect()[0]
    assert row.n_pos == y.sum()
    assert row.average_precision == pytest.approx(ap, abs=1e-4)


def test_pacf_consistent_with_acf(spark):
    row = analytics._q_pacf_2(spark, SF_SMOKE).collect()[0]
    assert row.pacf_1 == row.r1
    exp = (row.r2 - row.r1**2) / (1 - row.r1**2)
    assert row.pacf_2 == pytest.approx(exp, abs=1e-4)


def test_graph_summary_consistent(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    edges = [(r.a, r.b) for r in _q_mutual(spark, SF_SMOKE).collect()]
    row = analytics._q_graph_summary(spark, SF_SMOKE).collect()[0]
    assert row.n == 500 and row.m == len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row.max_degree == max(deg.values())
    assert row.n_isolated == 500 - len(deg)
    assert row.avg_degree == pytest.approx(2 * len(edges) / 500, abs=1e-3)


def test_spectral_entropy_bounds(spark):
    row = analytics._q_spectral_entropy(spark, SF_SMOKE).collect()[0]
    assert row.n_freqs == 36
    assert 0 < row.spectral_entropy_nats <= np.log(36) + 1e-9
    # fixture has a planted daily cycle -> entropy below the white-noise max
    assert row.spectral_entropy_nats < np.log(36) - 0.01


def test_heaps_law_monotone_and_beta(spark):
    rows = sorted(analytics._q_heaps_law(spark, SF_SMOKE).collect(),
                  key=lambda r: r.cp)
    assert [r.cp for r in rows] == [50 * i for i in range(1, 11)]
    vs = [r.v for r in rows]
    ns = [r.n for r in rows]
    assert vs == sorted(vs) and ns == sorted(ns)  # both grow
    xq = np.round(np.log(ns) * 1e6)
    yq = np.round(np.log(vs) * 1e6)
    m = len(xq)
    beta = (m * (xq * yq).sum() - xq.sum() * yq.sum()) / (
        m * (xq * xq).sum() - xq.sum() ** 2
    )
    assert rows[0].beta == pytest.approx(beta, abs=1e-3)
    # the fixture vocabulary is small and saturates almost immediately,
    # so the exponent sits at ~0; real corpora land in (0, 1)
    assert 0 <= rows[0].beta <= 1


def test_f1_scores_match_python(spark):
    from collections import Counter

    from knn_with_mapreduce_cuda_spark.operators.knn import classify

    p = [(r.true_label, r.pred_label) for r in classify(spark, SF_SMOKE).collect()]
    act = Counter(t for t, _ in p)
    prd = Counter(q for _, q in p)
    tp = Counter(t for t, q in p if t == q)
    labels = set(act) | set(prd)
    f1s = [
        2 * tp[l] / (act[l] + prd[l]) if act[l] + prd[l] else 0.0 for l in labels
    ]
    row = analytics._q_f1_scores(spark, SF_SMOKE).collect()[0]
    assert row.n_classes == len(labels)
    assert row.micro_f1 == pytest.approx(sum(tp.values()) / len(p), abs=1e-4)
    assert row.macro_f1 == pytest.approx(np.mean(f1s), abs=1e-4)


def test_max_drawdown_rollup(spark):
    series = analytics._q_drawdown(spark, SF_SMOKE).collect()
    row = analytics._q_max_drawdown(spark, SF_SMOKE).collect()[0]
    assert row.n_points == len(series)
    assert row.max_drawdown_c == max(r.drawdown_c for r in series)
    assert row.max_peak_c == max(r.peak_c for r in series)


def test_mann_kendall_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1).astype(np.int64)
    n = len(c)
    s = sum(
        np.sign(c[j] - c[i]) for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(tc * (tc - 1) * (2 * tc + 5) for tc in Counter(c).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18
    z = (s - np.sign(s)) / np.sqrt(var)
    row = analytics._q_mann_kendall(spark, SF_SMOKE).collect()[0]
    assert row.s == s and row.n_pairs == n * (n - 1) // 2
    assert row.z == pytest.approx(z, abs=1e-3)


def test_vocab_kl_nonnegative_and_matches_numpy(spark):
    import hashlib

    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    ct, ch = Counter(), Counter()
    for d, text in zip(t.doc_id, t.text):
        tgt = ct if hashlib.md5(str(d).encode()).hexdigest()[:2] < "cc" else ch
        tgt.update(text.split(" "))
    vocab = set(ct) | set(ch)
    nt, nh, v = sum(ct.values()), sum(ch.values()), len(vocab)
    kl = sum(
        ((ch[w] + 1) / (nh + v))
        * np.log(((ch[w] + 1) / (nh + v)) / ((ct[w] + 1) / (nt + v)))
        for w in vocab
    )
    row = analytics._q_vocab_kl(spark, SF_SMOKE).collect()[0]
    assert row.vocab_size == v
    assert row.kl_heldout_from_train == pytest.approx(kl, abs=1e-3)
    assert row.kl_heldout_from_train >= 0


def test_churn_labels_consistent(spark):
    rows = analytics._q_churn_labels(spark, SF_SMOKE).collect()
    assert len(rows) == 15  # sf0.001 user population
    for r in rows:
        assert r.active_days <= r.tenure_days + 1
        assert (r.recency_days > 7) == bool(r.churned)


def test_persistence_error_grows_with_horizon(spark):
    rows = {r.hz: r for r in analytics._q_persistence_error_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 6, 12, 24}
    # forecasting 24h ahead hits the same phase of the daily cycle:
    # the seasonal horizon should beat the anti-phase 12h horizon
    assert rows[24].mae < rows[12].mae
    for r in rows.values():
        assert r.rmse >= r.mae


def test_unique_key_audit_findings(spark):
    rows = {r.key: r for r in analytics._q_unique_key_audit(spark, SF_SMOKE).collect()}
    assert len(rows) == 5
    # the four id columns are clean...
    for k in ["events.event_id", "documents.doc_id", "embeddings.vec_id",
              "orders.o_orderkey"]:
        assert rows[k].dup_keys == 0 and rows[k].surplus_rows == 0
    assert rows["events.event_id"].distinct_keys == 1000
    # ...and the audit correctly SURFACES that the fixture's composite
    # lineitem key is not unique (linenumbers are not sequential per
    # order in the synthetic data) — distinct + surplus = total rows
    li = rows["lineitem.(l_orderkey,l_linenumber)"]
    assert li.dup_keys > 0
    assert li.distinct_keys + li.surplus_rows == 6000


def test_best_f1_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    s = np.array([e[0] for e in t.embedding], dtype=np.float64)
    y = (t.label.to_numpy() >= 5).astype(int)
    p = y.sum()
    best = (-1.0, None)
    for thr in np.unique(s)[::-1]:
        sel = s >= thr
        tp = int(y[sel].sum())
        fp = int(sel.sum() - tp)
        f1 = round(2 * tp / (2 * tp + fp + (p - tp)) * 1e6)
        if f1 > best[0]:
            best = (f1, thr)
    row = analytics._q_best_f1_threshold(spark, SF_SMOKE).collect()[0]
    assert row.threshold == pytest.approx(round(float(best[1]), 4), abs=1e-4)
    assert row.best_f1 == pytest.approx(best[0] / 1e6, abs=1e-4)


def test_gumbel_fit_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    habs = np.arange(lo, h.max() + 1)
    mx = []
    for d in np.unique(habs // 24):
        mask = habs // 24 == d
        if mask.sum() == 24:
            mx.append(c[mask].max())
    mx = np.array(mx, dtype=np.float64)
    beta = mx.std(ddof=1) * np.sqrt(6) / np.pi
    mu = mx.mean() - 0.5772156649 * beta
    rl = mu - beta * np.log(-np.log(1 - 1 / 30))
    row = analytics._q_gumbel_fit(spark, SF_SMOKE).collect()[0]
    assert row.n_blocks == len(mx)
    assert row.gumbel_beta == pytest.approx(beta, abs=1e-3)
    assert row.gumbel_mu == pytest.approx(mu, abs=1e-3)
    assert row.return_level_30d == pytest.approx(rl, abs=1e-3)
    assert row.return_level_30d > row.mean_max  # tail above the mean max


def test_term_burstiness_matches_numpy(spark):
    import pyarrow.parquet as pq
    from collections import Counter, defaultdict

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    per_doc = defaultdict(Counter)
    df = Counter()
    for d, text in zip(t.doc_id, t.text):
        cc = Counter(text.split(" "))
        per_doc[d] = cc
        df.update(cc.keys())
    top = sorted(df, key=lambda w: (-df[w], w))[:20]
    nd = len(t)
    got = {r.term: r.burstiness
           for r in analytics._q_term_burstiness(spark, SF_SMOKE).collect()}
    assert set(got) == set(top)
    for w in top[:5]:
        xs = np.array([per_doc[d][w] for d in t.doc_id], dtype=np.float64)
        b = xs.var() / xs.mean()
        assert got[w] == pytest.approx(b, abs=1e-3), w


def test_rfm_segments_quintiles(spark):
    rows = analytics._q_rfm_segments(spark, SF_SMOKE).collect()
    assert rows
    from collections import Counter

    for dim in ("r", "f", "m"):
        cnt = Counter(getattr(r, dim) for r in rows)
        assert set(cnt) <= {1, 2, 3, 4, 5}
        # ntile balance: sizes differ by at most one
        assert max(cnt.values()) - min(cnt.values()) <= 1
    for r in rows:
        assert r.segment == f"{r.r}{r.f}{r.m}"


def test_precision_at_k_consistent_with_ndcg_inputs(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import _pairs, topk

    rows = topk(_pairs(spark, SF_SMOKE), 10).collect()
    per = {}
    for r in rows:
        per.setdefault(r.qid, []).append((r.rnk, int(r.tlabel == r.qlabel)))
    got = {r.k: r.precision_q4
           for r in analytics._q_precision_at_k(spark, SF_SMOKE).collect()}
    for k in range(1, 11):
        ps = []
        for lst in per.values():
            lst.sort()
            ps.append(round(sum(rel for rk, rel in lst[:k]) / k * 1e6) / 1e6)
        # precision_q4 is the 4dp integer quantization (×10⁴, half-up)
        assert got[k] == pytest.approx(np.mean(ps) * 1e4, abs=0.51), k


def test_dedup_cluster_langs_same_lang(spark):
    rows = analytics._q_dedup_cluster_langs(spark, SF_SMOKE).collect()
    assert rows  # planted near-dups form multi-member clusters
    for r in rows:
        assert r.n_members > 1
        assert 1 <= r.n_langs <= r.n_members
    # the MinHash band join is NOT language-gated, so the review queue
    # genuinely surfaces cross-language near-dup clusters in the fixture
    assert any(r.n_langs > 1 for r in rows)


def test_operating_point_card_consistent_with_youden(spark):
    y = analytics._q_youden_threshold(spark, SF_SMOKE).collect()[0]
    c = analytics._q_operating_point_card(spark, SF_SMOKE).collect()[0]
    assert c.threshold == y.threshold and c.tp == y.tp and c.fp == y.fp
    assert c.tp + c.fn + c.fp + c.tn == 500
    assert c.sensitivity - (1 - c.specificity) == pytest.approx(
        y.youden_j, abs=2e-4
    )


def test_median_filter_matches_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    got = {r.h - lo: r.median5 for r in analytics._q_median_filter(spark, SF_SMOKE).collect()}
    for i in range(len(c)):
        if i < 2 or i >= len(c) - 2:
            assert got[i] == c[i]
        else:
            assert got[i] == int(np.median(c[i - 2 : i + 3])), i


def test_vote_margin_mass_and_monotone_trend(spark):
    rows = sorted(analytics._q_vote_margin(spark, SF_SMOKE).collect(),
                  key=lambda r: r.margin)
    assert sum(r.n_queries for r in rows) == 100
    for r in rows:
        assert 0 <= r.margin <= 10
        assert r.n_correct <= r.n_queries


def test_recall_at_k_monotone_and_bounded(spark):
    rows = {r.k: r.recall_at_k
            for r in analytics._q_recall_at_k(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(1, 11))
    vals = [rows[k] for k in range(1, 11)]
    assert vals == sorted(vals)  # recall grows with k
    assert 0 < vals[-1] < 0.5  # 10 of ~50 same-label points max


def test_edge_length_stats_consistent(spark):
    row = analytics._q_edge_length_stats(spark, SF_SMOKE).collect()[0]
    assert row.min_d <= row.median_d <= row.max_d
    assert row.min_d <= row.mean_d <= row.max_d
    from knn_with_mapreduce_cuda_spark.operators.knn import _q_mutual

    assert row.n_edges == _q_mutual(spark, SF_SMOKE).count()


def test_bounce_rate_session_mass(spark):
    from knn_with_mapreduce_cuda_spark.operators import streaming_batch

    rows = analytics._q_bounce_rate(spark, SF_SMOKE).collect()
    n_sessions = streaming_batch._q_window_session(spark, SF_SMOKE).count()
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.bounce_rate <= 1
        assert r.n_bounces <= r.n_sessions


def test_degree_entropy_bounds(spark):
    row = analytics._q_degree_entropy(spark, SF_SMOKE).collect()[0]
    assert 0 <= row.degree_entropy_nats <= np.log(row.n_degree_values) + 1e-9


def test_tpr_at_fixed_fpr_constraint(spark):
    row = analytics._q_tpr_at_fixed_fpr(spark, SF_SMOKE).collect()[0]
    assert row.fpr <= 0.05 + 1e-9
    assert 0 <= row.tpr <= 1
    y = analytics._q_youden_threshold(spark, SF_SMOKE).collect()[0]
    # the FPR-capped point can never beat the unconstrained ROC frontier
    assert row.tp <= y.tp or row.fp <= y.fp


def test_exceedance_episodes_match_numpy(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    tus = t.ts.values.astype("datetime64[us]").astype("int64")
    h = tus // 3_600_000_000
    lo = h.min()
    c = np.bincount(h - lo, minlength=h.max() - lo + 1)
    thr = np.sort(c, kind="stable")[int(np.ceil(0.9 * len(c))) - 1]
    exp = []
    i = 0
    habs = np.arange(lo, h.max() + 1)
    while i < len(c):
        if c[i] > thr:
            j = i
            while j < len(c) and c[j] > thr:
                j += 1
            exp.append((int(habs[i]), j - i, int(c[i:j].max())))
            i = j
        else:
            i += 1
    got = sorted(
        (r.start_h, r.duration_h, r.peak_c)
        for r in analytics._q_exceedance_episodes(spark, SF_SMOKE).collect()
    )
    assert got == exp


def test_holt_linear_matches_python_fold(spark):
    rows = {r.event_type: r for r in analytics._q_holt_linear(spark, SF_SMOKE).collect()}
    from knn_with_mapreduce_cuda_spark import tables

    ev = tables.table(spark, SF_SMOKE, "events").selectExpr(
        "event_type", "ts_us div 3600000000 AS h"
    ).toPandas()
    for et, grp in ev.groupby("event_type"):
        xs = [float(c) for _, c in sorted(grp.groupby("h").size().items())]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (nl - l) + 0.75 * b
            l = nl
        r = rows[et]
        assert r.n_hours == len(xs)
        assert r.level_q4 == round(l * 10000)
        assert r.trend_q4 == round(b * 10000)
        assert r.forecast1_q4 == round((l + b) * 10000)
