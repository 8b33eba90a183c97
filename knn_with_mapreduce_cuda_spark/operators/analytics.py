"""T6 — event/corpus analytics: gaps-and-islands, retention cohorts,
rolling actives, autocorrelation, EWMA, KS test, bloom-prefiltered join,
kNN-graph link prediction, decision stump, Zipf slope, vocabulary
coverage, temperature-based mixture weights, mutual information.

Parity note (SURVEY.md §0/§2): the reference repo class has no analytics
layer — this tier is engine surface mandated by the north star
(BASELINE.json "design every operator for 100 TB scale"), graded like
every other §2 row via the DuckDB oracle.

Determinism conventions (SURVEY.md §7.2) used throughout: every floating
aggregate is either (a) derived from exact integer sums (counts, cents,
dyadic EWMA weights) with the final double arithmetic written as an
identical expression tree on both engines, or (b) quantized to integer
micro/nano units before summation so the result is independent of
partitioning and accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from ..oracle import materialize_ctes
from ..plans import prefix
from .relational import _CENTS, cents

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000

# Shared CTE: events with day/hour indexes (µs epoch // width). The duck
# side reads ts natively (ns) and truncates to µs via epoch_us, matching
# the Spark loader's `ts div 1000` (tables.py).
_EVD = (
    "evd AS (SELECT user_id, event_id, event_type, value, "
    "epoch_us(ts) // 86400000000 AS day, epoch_us(ts) // 3600000000 AS h "
    "FROM events)"
)


def _event_days(spark, sf_dir) -> DataFrame:
    ev = tables.table(spark, sf_dir, "events")
    return ev.select("user_id", F.expr("ts_us div 86400000000").alias("day"))


def _hourly_series(spark, sf_dir) -> DataFrame:
    """Zero-filled hourly event-count series (the resample spine).

    Scale: groupBy(h) is one shuffle on the hour key; the spine is
    generated from the 1-row min/max aggregate with ``sequence`` — no
    driver loop, and series length is hours-of-history, not rows.
    """
    ev = tables.table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.expr("ts_us div 3600000000").alias("h")).agg(
        F.count("*").alias("c")
    )
    spine = (
        hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(F.explode(F.sequence(col("mn"), col("mx"))).alias("h"))
    )
    return spine.join(hourly, "h", "left").select(
        "h", F.coalesce(col("c"), lit(0).cast("long")).alias("c")
    )


_HOURLY_SQL = (
    "hourly AS (SELECT h, count(*) AS c FROM evd GROUP BY h), "
    "bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly), "
    "spine AS (SELECT unnest(generate_series(mn, mx)) AS h FROM bounds), "
    "s AS (SELECT spine.h, COALESCE(hourly.c, 0) AS c "
    "FROM spine LEFT JOIN hourly ON spine.h = hourly.h)"
)


# ---------------------------------------------------------------- operators


def gaps_islands(days: DataFrame) -> DataFrame:
    """Consecutive-day activity islands per user (gaps-and-islands).

    island key = day − row_number() — constant within a run of
    consecutive days. Scale: one shuffle on user_id shared by the window
    and the final aggregate (same partitioning, no second exchange).
    """
    ud = days.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = ud.withColumn("grp", col("day") - F.row_number().over(w))
    return (
        grp.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
    )


def _q_gaps_islands(spark, sf_dir):
    return gaps_islands(_event_days(spark, sf_dir))


def retention_cohort(days: DataFrame) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted at each day offset they return. The groupBy(user) cohort
    assignment and the join both shuffle on user_id once; the final
    (cohort, offset) aggregate is tiny (days² cells max)."""
    ud = days.distinct()
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ud.join(cohort, "user_id")
        .select("cohort_day", (col("day") - col("cohort_day")).alias("day_offset"), "user_id")
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _q_retention_cohort(spark, sf_dir):
    return retention_cohort(_event_days(spark, sf_dir))


def rolling_active_users(days: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing-N-day distinct actives per day (the WAU curve).

    Distinct-over-a-sliding-window has no partial aggregate, so instead
    each (user, day) emits the ≤N future days it keeps the user active
    for — a bounded N× expansion — and the count becomes a plain
    per-day distinct. At 100 TB this is a fixed fan-out map + one
    aggregate, versus a range self-join that rescans the fact table."""
    ud = days.distinct()
    mx = ud.agg(F.max("day").alias("mx"))
    ex = ud.select(
        "user_id",
        F.explode(F.sequence(col("day"), col("day") + lit(window_days - 1))).alias("d"),
    )
    return (
        ex.join(F.broadcast(mx), col("d") <= col("mx"))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("actives_7d"))
    )


def _q_rolling_active(spark, sf_dir):
    return rolling_active_users(_event_days(spark, sf_dir))


def autocorr(series: DataFrame, max_lag: int = 24) -> DataFrame:
    """Lag-1..max_lag autocorrelation of an (h, c) integer series.

    r_k is expanded so every aggregate is an exact integer sum
    (Σc_t·c_{t−k}, Σc_t, Σc_{t−k}, counts); the mean enters only in the
    final double expression, written identically on both engines.
    Scale: the lag join is equi on the hour index after a bounded
    max_lag× fan-out of the (tiny) series, not a self-cross."""
    spark = series.sparkSession
    ks = spark.range(1, max_lag + 1).select(col("id").alias("k"))
    a = series.select(col("h").alias("ht"), col("c").alias("ct"))
    b = series.select(col("h").alias("hl"), col("c").alias("cl"))
    pairs = a.crossJoin(F.broadcast(ks)).join(b, col("ht") - col("k") == col("hl"))
    lagagg = pairs.groupBy("k").agg(
        F.count("*").alias("nk"),
        F.sum(col("ct") * col("cl")).alias("p"),
        F.sum("ct").alias("ak"),
        F.sum("cl").alias("bk"),
    )
    g = series.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(col("c") * col("c")).alias("ss"),
    )
    return (
        lagagg.crossJoin(F.broadcast(g))
        .withColumn("m", F.expr("s1 / n"))
        .select(
            col("k"),
            col("nk").alias("n_pairs"),
            F.expr("round((p - m * (ak + bk) + nk * m * m) / (ss - n * m * m), 4)").alias(
                "acf"
            ),
        )
    )


def _q_autocorr(spark, sf_dir):
    return autocorr(_hourly_series(spark, sf_dir))


def ewma(series: DataFrame, terms: int = 20) -> DataFrame:
    """EWMA (α=1/2) of an integer series, truncated to `terms` terms.

    Weight of lag j is 2^−(j+1); scaling by 2^20 makes every term an
    exact integer (count × power of two), so the windowed sum is exact
    under any accumulation order — the float appears only in the final
    division. Truncation error < 2^−20·max(c): invisible at round(4).
    Scale: bounded terms× fan-out + equi-join on the hour index."""
    spark = series.sparkSession
    ks = spark.range(0, terms).select(col("id").alias("j"))
    t = series.select(col("h").alias("ht"), col("c").alias("ct"))
    s = series.select(col("h").alias("hj"), col("c").alias("cj"))
    contrib = (
        t.crossJoin(F.broadcast(ks))
        .join(s, col("ht") - col("j") == col("hj"))
        .select(
            "ht",
            "ct",
            (col("cj") * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(19 - j AS INT))")).alias(
                "w"
            ),
        )
    )
    return (
        contrib.groupBy("ht", "ct")
        .agg(F.sum("w").alias("scaled"))
        .select(
            col("ht").alias("h"),
            col("ct").alias("c"),
            F.expr("round(scaled / CAST(1048576 AS DOUBLE), 4)").alias("ewma"),
        )
    )


def _q_ewma(spark, sf_dir):
    return ewma(_hourly_series(spark, sf_dir))


def ks_two_sample(values: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D over (vc, grp∈{1,2}) integer
    values. D·n1·n2 = max|cum1·n2 − cum2·n1| is exact integer; the
    statistic floats only in the last division. One shuffle to group by
    value, one ordered window over the (distinct-value-sized) result.

    NULL measurements are excluded from the distribution entirely (r10
    non-finite sweep): a NULL vc has no place on the CDF grid, and the
    engines ORDER it differently (Spark nulls-first vs DuckDB
    nulls-last), which silently shifts D."""
    values = values.filter(col("vc").isNotNull())
    per = values.groupBy("vc").agg(
        F.sum(F.when(col("grp") == 1, 1).otherwise(0)).alias("a"),
        F.sum(F.when(col("grp") == 2, 1).otherwise(0)).alias("b"),
    )
    # two-phase prefix scan over the distinct-value CDF grid — no
    # single-partition window at any value cardinality.
    cum = prefix.attach_running(
        per, ["vc"], sums={"a": "ca", "b": "cb"}
    ).select("ca", "cb")
    g = values.agg(
        F.sum(F.when(col("grp") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(col("grp") == 2, 1).otherwise(0)).alias("n2"),
    )
    return (
        cum.crossJoin(F.broadcast(g))
        .select("n1", "n2", F.abs(col("ca") * col("n2") - col("cb") * col("n1")).alias("ds"))
        .groupBy("n1", "n2")
        .agg(F.max("ds").alias("d_scaled"))
        .select(
            "n1",
            "n2",
            "d_scaled",
            F.expr("round(try_divide(CAST(d_scaled AS DOUBLE), (n1 * n2)), 4)").alias("d_stat"),
        )
    )


def _q_ks_test(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events").filter(
        col("event_type").isin("purchase", "view")
    )
    vals = ev.select(
        cents(col("value")).alias("vc"),
        F.when(col("event_type") == "purchase", 1).otherwise(2).alias("grp"),
    )
    return ks_two_sample(vals)


_REV = "(l.l_extendedprice * (1 - l.l_discount))"


def bloom_prefilter(
    fact: DataFrame,
    fact_key,
    dim_keys: DataFrame,
    seeds=(1, 2),
    m_words: int = 1024,
) -> DataFrame:
    """Declarative Bloom filter prefilter: for each seed, hash the dim
    keys into a (word, bitmask) table via ``xxhash64`` + ``bit_or`` —
    m_words rows regardless of dim size — broadcast it, and keep only
    fact rows whose bit is set. No UDF, no driver collect; no false
    negatives, so an exact join downstream restores exact semantics.

    Scale: this is the runtime filter a 100 TB fact⋈filtered-dim join
    wants — the fact side sheds non-matching rows BEFORE its shuffle,
    at the cost of broadcasting KBs of bitmask instead of the full key
    set a semi-join would ship. Two seeds ⟹ FPR ≈ (fill ratio)²."""
    out = fact
    for s in seeds:
        tbl = (
            dim_keys.select(
                F.pmod(F.xxhash64(col("k"), lit(s)), lit(m_words)).alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(pmod(xxhash64(k, {s + 100}), 64) AS INT))"
                ).alias("m"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(m)").alias("mask"))
        )
        out = (
            out.withColumn("__w", F.pmod(F.xxhash64(fact_key, lit(s)), lit(m_words)))
            .withColumn(
                "__b", F.pmod(F.xxhash64(fact_key, lit(s + 100)), lit(64)).cast("int")
            )
            .join(F.broadcast(tbl), col("__w") == col("word"))
            .filter(F.expr("(shiftright(mask, __b) & CAST(1 AS BIGINT)) = 1"))
            .drop("__w", "__b", "word", "mask")
        )
    return out


def _q_bloom_prefilter(spark, sf_dir):
    """Bloom-prefiltered fact⋈dim join. The exact join downstream makes
    the result identical to the plain join — which is the oracle, so the
    grade proves the prefilter is lossless."""
    orders = tables.table(spark, sf_dir, "orders").filter(
        col("o_orderpriority") == "1-URGENT"
    )
    li = tables.table(spark, sf_dir, "lineitem")
    pruned = bloom_prefilter(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        col("l_orderkey"),
        orders.select(col("o_orderkey").alias("k")),
    )
    return (
        pruned.join(orders, col("l_orderkey") == col("o_orderkey"))
        .groupBy(col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
                "rev_cents"
            ),
        )
    )


def linkpred_jaccard(edges: DataFrame, top_n: int = 20) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over an undirected edge
    list (a < b): score non-adjacent pairs that share neighbors.

    Candidates come from the shared-neighbor equi-join (fan-out bounded
    by degree², never all-pairs), existing edges drop via left_anti, and
    the Jaccard denominator uses exact integer degrees. Scale: both
    joins shuffle on node keys; the global top-n sort runs on the
    candidate set, which the anti-join already pruned."""
    sym = edges.union(edges.select(col("b").alias("a"), col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    e1 = sym.select(col("a").alias("x"), col("b").alias("c"))
    e2 = sym.select(col("a").alias("y"), col("b").alias("c"))
    cand = (
        e1.join(e2, "c")
        .filter(col("x") < col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cn"))
        .join(edges, (col("x") == col("a")) & (col("y") == col("b")), "left_anti")
    )
    scored = (
        cand.join(deg.select(col("a").alias("x"), col("deg").alias("dx")), "x")
        .join(deg.select(col("a").alias("y"), col("deg").alias("dy")), "y")
        .withColumn("jac", F.expr("cn / (dx + dy - cn)"))
    )
    return (
        scored.orderBy(F.desc("jac"), "x", "y")
        .limit(top_n)
        .select("x", "y", col("cn").alias("common_neighbors"), F.round("jac", 4).alias("jaccard"))
    )


def _q_linkpred(spark, sf_dir):
    from .knn import _q_mutual

    return linkpred_jaccard(_q_mutual(spark, sf_dir))


def decision_stump(pts: DataFrame) -> DataFrame:
    """Best single-threshold classifier on (x, y∈{0,1}): scan every
    observed split point with cumulative integer counts, evaluate both
    polarities, keep the most accurate (ties → smaller threshold,
    positive-left polarity). One sort-shuffle over distinct feature
    values; all candidate accuracies are exact integers."""
    per = pts.groupBy("x").agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    # two-phase prefix scan over the distinct split points — no
    # single-partition window at any feature cardinality.
    cum = prefix.attach_running(
        per, ["x"], sums={"n": "cn", "pos": "cp"}
    ).select("x", "cn", "cp")
    g = pts.agg(F.count("*").alias("nn"), F.sum("y").alias("p"))
    scored = cum.crossJoin(F.broadcast(g)).select(
        "x",
        "nn",
        F.expr("nn - p + 2 * cp - cn").alias("acc_pos_left"),
        F.expr("cn + p - 2 * cp").alias("acc_neg_left"),
    )
    best = scored.select(
        "x",
        "nn",
        F.greatest("acc_pos_left", "acc_neg_left").alias("correct"),
        F.when(col("acc_pos_left") >= col("acc_neg_left"), 1).otherwise(0).alias("pos_left"),
    )
    return (
        best.orderBy(F.desc("correct"), "x")
        .limit(1)
        .select(
            F.round("x", 4).alias("threshold"),
            "pos_left",
            "correct",
            F.expr("round(try_divide(CAST(correct AS DOUBLE), nn), 4)").alias("accuracy"),
            col("nn").alias("n"),
        )
    )


def _q_decision_stump(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    pts = e.select(
        col("emb").getItem(0).alias("x"), (col("label") >= 5).cast("long").alias("y")
    ).filter(col("x").isNotNull())  # poisoned vectors leave the stump (r10)
    return decision_stump(pts)


_TOKS = (
    "toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents), "
    "freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok)"
)


def _token_freq(spark, sf_dir) -> DataFrame:
    docs = tables.table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )


def _q_zipf_slope(spark, sf_dir):
    """Zipf slope of the corpus: OLS fit of ln(freq) on ln(rank) over the
    top-100 tokens. Logs are quantized to integer micro-units before the
    moment sums, so the regression inputs are exact integers; the slope
    divides two bigints in one final double op. Scale: token counting is
    the only large aggregate — the fit runs on 100 rows."""
    freq = _token_freq(spark, sf_dir)
    # top-100 via orderBy+limit so the rank window runs over 100 rows,
    # not the vocabulary-sized relation through a single partition.
    w = Window.orderBy(F.desc("f"), "tok")
    top = (
        freq.orderBy(F.desc("f"), "tok")
        .limit(100)
        .withColumn("r", F.row_number().over(w))
    )
    q = top.select(
        F.expr("TRY_CAST(round(ln(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT)").alias("xi"),
        F.expr("TRY_CAST(round(ln(CAST(f AS DOUBLE)) * 1000000, 0) AS BIGINT)").alias("yi"),
    )
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(col("xi") * col("yi")).alias("sxy"),
        F.sum(col("xi") * col("xi")).alias("sxx"),
    )
    return m.select(
        col("n").alias("n_top"),
        F.expr("round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)").alias("slope"),
        F.expr(
            "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / (n * 1000000.0), 4)"
        ).alias("intercept_ln"),
    )


def _q_vocab_coverage(spark, sf_dir):
    """Smallest frequency-ranked vocabulary covering 50/90/99% of corpus
    tokens — the BPE-vocab sizing curve. Cumulative share is exact
    (integer cumsum × integer total, cross-multiplied); one ordered
    window over the vocabulary, thresholds fan out 3×."""
    freq = _token_freq(spark, sf_dir)
    # vocabulary-wide rank + cumulative count via the two-phase prefix
    # scan (plans/prefix.py) — the r1 global window moved the whole
    # vocabulary through one partition.
    ranked = prefix.attach_running(
        freq, [("f", "desc"), "tok"], sums={"f": "cum"}, rn="r"
    ).select("r", "cum")
    tot = freq.agg(F.sum("f").alias("t"))
    thr = freq.sparkSession.range(0, 3).select(
        F.element_at(F.array(lit(50), lit(90), lit(99)), (col("id") + 1).cast("int")).alias(
            "threshold_pct"
        )
    )
    hit = (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(thr))
        .filter(col("cum") * 100 >= col("threshold_pct") * col("t"))
        .groupBy("threshold_pct")
        .agg(F.min("r").alias("vocab_size"))
    )
    return hit.join(ranked.withColumnRenamed("r", "vocab_size"), "vocab_size").select(
        "threshold_pct", "vocab_size", col("cum").alias("covered_tokens")
    )


def _q_mix_temperature(spark, sf_dir):
    """Temperature-rebalanced language mixture weights (T=2 ⟹ share^0.5,
    the multilingual-pretraining sampling scheme): upweights tail
    languages relative to raw frequency. Weights quantize to integer
    micro-units before normalization so the 5-way sum is exact."""
    docs = tables.table(spark, sf_dir, "documents")
    byl = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tot = docs.agg(F.count("*").alias("nn"))
    q = byl.crossJoin(F.broadcast(tot)).withColumn(
        "wi", F.expr("TRY_CAST(round(sqrt(n / nn) * 1000000, 0) AS BIGINT)")
    )
    sw = q.agg(F.sum("wi").alias("sw"))
    return (
        q.crossJoin(F.broadcast(sw))
        .select(
            "lang",
            col("n").alias("n_docs"),
            F.expr("round(n / nn, 4)").alias("share_raw"),
            F.expr("round(wi / sw, 4)").alias("share_temp"),
        )
    )


def _q_mi_lang_source(spark, sf_dir):
    """Mutual information (nats) between documents.lang and source, plus
    the marginal entropies — the redundancy check a corpus-mixing
    pipeline runs on its metadata. Each p·ln(p…) term is quantized to
    integer nano-nats before summation (≤100 cells ⟹ quantization error
    < 5e-8, invisible at round(4))."""
    docs = tables.table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("nls"))
    nl = docs.groupBy("lang").agg(F.count("*").alias("nl"))
    ns = docs.groupBy("source").agg(F.count("*").alias("ns"))
    tot = docs.agg(F.count("*").alias("nn"))
    terms = (
        cells.join(nl, "lang")
        .join(ns, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "TRY_CAST(round((nls / nn) * ln((CAST(nls AS DOUBLE) * nn) / "
                "(CAST(nl AS DOUBLE) * ns)) * 1000000000, 0) AS BIGINT)"
            ).alias("ti")
        )
    )
    mi = terms.agg(F.count("*").alias("n_cells"), F.sum("ti").alias("tsum")).select(
        "n_cells", F.expr("round(tsum / CAST(1000000000 AS DOUBLE), 4)").alias("mi_nats")
    )
    hl = (
        nl.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "TRY_CAST(round(-(nl / nn) * ln(nl / nn) * 1000000000, 0) AS BIGINT)"
            ).alias("ti")
        )
        .agg(F.sum("ti").alias("hsum"))
        .select(F.expr("round(hsum / CAST(1000000000 AS DOUBLE), 4)").alias("h_lang_nats"))
    )
    hs = (
        ns.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "TRY_CAST(round(-(ns / nn) * ln(ns / nn) * 1000000000, 0) AS BIGINT)"
            ).alias("ti")
        )
        .agg(F.sum("ti").alias("hsum"))
        .select(F.expr("round(hsum / CAST(1000000000 AS DOUBLE), 4)").alias("h_source_nats"))
    )
    return mi.crossJoin(hl).crossJoin(hs)


def _q_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal profile of the event stream: per-hour-slot
    totals and the ratio to the overall hourly mean — the seasonality
    vector a forecast would subtract. All shares cross-multiplied from
    integer sums; the division happens once per output row."""
    s = _hourly_series(spark, sf_dir)
    prof = s.groupBy(F.expr("h % 24").alias("hod")).agg(
        F.count("*").alias("n_hours"), F.sum("c").alias("total_events")
    )
    g = s.agg(F.count("*").alias("n_all"), F.sum("c").alias("s_all"))
    return prof.crossJoin(F.broadcast(g)).select(
        "hod",
        "n_hours",
        "total_events",
        F.expr("round(try_divide(CAST(total_events AS DOUBLE), n_hours), 4)").alias("mean_per_hour"),
        F.expr(
            "round(try_divide(CAST(total_events * n_all AS DOUBLE), n_hours * s_all), 4)"
        ).alias("rel_to_overall"),
    )


def rolling_z(series: DataFrame, width: int = 24) -> DataFrame:
    """Rolling z-score anomaly detection over an integer series: each
    point scored against the trailing `width` points (current excluded).
    Window sums are exact integers; the σ>0 guard is the integer
    cross-multiplication ss·nn > mn², so no float enters a predicate.
    Scale: one ordered window, frame state O(width)."""
    w = Window.orderBy("h").rowsBetween(-width, -1)
    scored = series.select(
        "h",
        "c",
        F.count("c").over(w).alias("nn"),
        F.sum("c").over(w).alias("mn"),
        F.sum(col("c") * col("c")).over(w).alias("ss"),
    )
    return scored.filter(
        (col("nn") >= width) & (col("ss") * col("nn") > col("mn") * col("mn"))
    ).select(
        "h",
        "c",
        F.expr(
            "round((c - CAST(mn AS DOUBLE) / nn) / "
            "sqrt((ss - CAST(mn AS DOUBLE) * mn / nn) / (nn - 1)), 4)"
        ).alias("z"),
    )


def _q_anomaly_rolling_z(spark, sf_dir):
    return rolling_z(_hourly_series(spark, sf_dir))


def cusum(series: DataFrame) -> DataFrame:
    """One-sided CUSUM drift statistic over an integer series, via the
    prefix identity S_t = R_t − min_{j≤t} R_j with R = cumsum(c·N − S):
    mean-centering by the global mean scales through ×N so the running
    sums stay exact integers; the final /N is the only float op.
    Scale: two ordered windows over the (hours-long) series — the
    recursive textbook form needs sequential state, this one doesn't."""
    g = series.agg(F.count("*").alias("n_all"), F.sum("c").alias("s_all"))
    d = series.crossJoin(F.broadcast(g)).select(
        "h", "c", "n_all", (col("c") * col("n_all") - col("s_all")).alias("d")
    )
    wcum = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = d.select("h", "c", "n_all", F.sum("d").over(wcum).alias("r"))
    return r.select(
        "h",
        "c",
        F.expr(
            "round((r - min(r) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)) / CAST(n_all AS DOUBLE), 4)"
        ).alias("cusum"),
    )


def _q_cusum(spark, sf_dir):
    return cusum(_hourly_series(spark, sf_dir))


def spearman_rho(pts: DataFrame) -> DataFrame:
    """Spearman rank correlation of (x, y) with exact tie handling:
    doubled midranks 2·rank+count−1 are integers, so every moment is an
    exact integer sum and ρ floats only in the final expression.
    Ranks come from per-distinct-value group counts run through the
    two-phase prefix scan (min-rank = exclusive cumcount + 1, so
    2·rank+count−1 = 2·cumExcl+count+1), joined back to the rows on the
    value — two shuffles on value, no single-partition window at any
    cardinality."""

    def _dranks(c: str):
        per = pts.groupBy(c).agg(F.count("*").alias("_cnt"))
        cum = prefix.attach_running(per, [c], sums={"_cnt": "_cin"})
        return cum.select(
            c,
            (2 * (col("_cin") - col("_cnt")) + col("_cnt") + 1).alias(f"r_{c}"),
        )

    r = (
        pts.join(_dranks("x"), "x")
        .join(_dranks("y"), "y")
        .select(col("r_x").alias("rx"), col("r_y").alias("ry"))
    )
    m = r.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(col("rx") * col("ry")).alias("sxy"),
        F.sum(col("rx") * col("rx")).alias("sxx"),
        F.sum(col("ry") * col("ry")).alias("syy"),
    )
    return m.select(
        "n",
        # try_divide: a zero-variance side zeroes the sqrt and ANSI mode
        # would crash where DuckDB's x/0 yields the NULL rho the oracle
        # emits (same hazard class as llm_heaps_law, found by the r10
        # unicode sweep; fixed proactively across the OLS idiom).
        F.expr(
            "round(try_divide(CAST(n * sxy - sx * sy AS DOUBLE), "
            "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy))), 4)"
        ).alias("rho"),
    )


def _q_spearman(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    return spearman_rho(
        e.select(col("emb").getItem(0).alias("x"), col("emb").getItem(1).alias("y"))
    )


def kendall_tau(pts: DataFrame) -> DataFrame:
    """Kendall τ-b of (id, x, y): concordant/discordant counted over the
    id<id pair join, tie corrections from per-value group counts — every
    term an exact integer, sqrt at the end. Scale note: the pair join is
    O(n²); at 100 TB this statistic runs on a bounded sample (the
    estimator converges at √n) — here it is exact."""
    a = pts.select(col("id").alias("i"), col("x").alias("xi"), col("y").alias("yi"))
    b = pts.select(col("id").alias("j"), col("x").alias("xj"), col("y").alias("yj"))
    pair = a.join(b, col("i") < col("j"))
    cd = pair.agg(
        F.sum(
            F.when(
                ((col("xi") < col("xj")) & (col("yi") < col("yj")))
                | ((col("xi") > col("xj")) & (col("yi") > col("yj"))),
                1,
            ).otherwise(0)
        ).alias("nc"),
        F.sum(
            F.when(
                ((col("xi") < col("xj")) & (col("yi") > col("yj")))
                | ((col("xi") > col("xj")) & (col("yi") < col("yj"))),
                1,
            ).otherwise(0)
        ).alias("nd"),
    )
    n0 = pts.agg(F.expr("count(*) * (count(*) - 1) / 2").cast("long").alias("n0"))
    tx = (
        pts.groupBy("x")
        .agg(F.count("*").alias("t"))
        .agg(F.expr("CAST(sum(t * (t - 1) / 2) AS BIGINT)").alias("n1"))
    )
    ty = (
        pts.groupBy("y")
        .agg(F.count("*").alias("t"))
        .agg(F.expr("CAST(sum(t * (t - 1) / 2) AS BIGINT)").alias("n2"))
    )
    return (
        cd.crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "nc",
            "nd",
            F.expr(
                "round(try_divide(CAST(nc - nd AS DOUBLE), "
                "sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2))), 4)"
            ).alias("tau_b"),
        )
    )


def _q_kendall(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    return kendall_tau(
        e.select(
            col("vec_id").alias("id"),
            col("emb").getItem(0).alias("x"),
            col("emb").getItem(1).alias("y"),
        )
    )


def khop_reach(edges: DataFrame) -> DataFrame:
    """1-hop and 2-hop neighborhood sizes per node over an undirected
    edge list (a < b) — the reachability profile density/expansion
    diagnostics read. The 2-hop set comes from one mid-node equi-join,
    distinct, minus self and direct neighbors. Scale: join fan-out is
    bounded by degree²; everything shuffles on node keys."""
    sym = edges.union(edges.select(col("b").alias("a"), col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("n_1hop"))
    hop2 = (
        sym.select(col("a").alias("u"), col("b").alias("mid"))
        .join(sym.select(col("a").alias("mid"), col("b").alias("w")), "mid")
        .select("u", "w")
        .filter(col("u") != col("w"))
        .distinct()
        .join(
            sym.select(col("a").alias("u"), col("b").alias("w")),
            ["u", "w"],
            "left_anti",
        )
        .groupBy("u")
        .agg(F.count("*").alias("n_2hop"))
    )
    return (
        deg.join(hop2, deg.a == hop2.u, "left")
        .select(
            col("a").alias("node"),
            "n_1hop",
            F.coalesce(col("n_2hop"), lit(0).cast("long")).alias("n_2hop"),
        )
    )


def _q_khop(spark, sf_dir):
    from .knn import _q_mutual

    return khop_reach(_q_mutual(spark, sf_dir))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity: Pearson correlation of endpoint degrees over
    the symmetrized edge list — positive means hubs link to hubs. Exact
    integer moments (degrees are counts), one final float expression."""
    sym = edges.union(edges.select(col("b").alias("a"), col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    pair = (
        sym.join(deg.select(col("a"), col("deg").alias("da")), "a")
        .join(deg.select(col("a").alias("b"), col("deg").alias("db")), "b")
    )
    m = pair.agg(
        F.count("*").alias("n"),
        F.sum("da").alias("sx"),
        F.sum("db").alias("sy"),
        F.sum(col("da") * col("db")).alias("sxy"),
        F.sum(col("da") * col("da")).alias("sxx"),
        F.sum(col("db") * col("db")).alias("syy"),
    )
    return m.select(
        "n",
        # try_divide: a degree-regular graph zeroes both variances and
        # ANSI mode would crash where DuckDB's x/0 yields the NULL the
        # oracle emits (same hazard class as llm_heaps_law, r10 sweep).
        F.expr(
            "round(try_divide(CAST(n * sxy - sx * sy AS DOUBLE), "
            "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy))), 4)"
        ).alias("assortativity"),
    )


def _q_assortativity(spark, sf_dir):
    from .knn import _q_mutual

    return degree_assortativity(_q_mutual(spark, sf_dir))


def _q_top_mover(spark, sf_dir):
    """Largest day-over-day swings per event type: daily counts, lag
    delta, global top-5 by |delta| (integer), tie-broken (type, day).
    One shuffle on event_type covers the rollup and the lag window."""
    ev = tables.table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("ts_us div 86400000000").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("prev", F.lag("cnt").over(w)).filter(col("prev").isNotNull())
    d = d.withColumn("delta", col("cnt") - col("prev"))
    return (
        d.orderBy(F.abs(col("delta")).desc(), "event_type", "day")
        .limit(5)
        .select("event_type", "day", "cnt", "prev", "delta")
    )


def _q_power_users(spark, sf_dir):
    """Pareto concentration: share of all events produced by the top
    decile of users. Decile boundary via the integer comparison
    rn·10 ≤ N+9 (= rn ≤ ⌈N/10⌉); the share is the only float."""
    ev = tables.table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    # global rank over the user dimension via the two-phase prefix scan
    # (plans/prefix.py) — no single-partition window at any user count.
    ranked = prefix.attach_running(per, [("c", "desc"), "user_id"], rn="rn")
    g = per.agg(
        F.count("*").alias("n_users"), F.sum("c").alias("total_events")
    )
    top = (
        ranked.crossJoin(F.broadcast(g))
        .filter(col("rn") * 10 <= col("n_users") + 9)
        .groupBy("n_users", "total_events")
        .agg(F.count("*").alias("top_users"), F.sum("c").alias("top_events"))
    )
    return top.select(
        "n_users",
        "top_users",
        "total_events",
        "top_events",
        F.expr("round(try_divide(CAST(top_events AS DOUBLE), total_events), 4)").alias("share"),
    )


def _q_ab_proportions(spark, sf_dir):
    """Two-proportion z-test for purchase share between the even/odd
    user-id buckets (the A/B assignment a hash split would produce).
    Counts are exact integers; p̂, pooled variance, and z are one final
    expression written identically on both engines."""
    ev = tables.table(spark, sf_dir, "events")
    per = ev.groupBy(F.expr("user_id % 2").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(col("event_type") == "purchase", 1).otherwise(0)).alias("x"),
    )
    a = per.filter(col("bucket") == 0).select(
        col("n").alias("n1"), col("x").alias("x1")
    )
    b = per.filter(col("bucket") == 1).select(
        col("n").alias("n2"), col("x").alias("x2")
    )
    return a.crossJoin(b).select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.expr("round(try_divide(CAST(x1 AS DOUBLE), n1), 4)").alias("p1"),
        F.expr("round(try_divide(CAST(x2 AS DOUBLE), n2), 4)").alias("p2"),
        F.expr(
            "round(try_divide(try_divide(CAST(x1 AS DOUBLE), n1) - "
            "try_divide(CAST(x2 AS DOUBLE), n2), "
            "sqrt(try_divide(CAST(x1 + x2 AS DOUBLE), n1 + n2) * "
            "(1 - try_divide(CAST(x1 + x2 AS DOUBLE), n1 + n2)) * "
            "(try_divide(CAST(1 AS DOUBLE), n1) + try_divide(CAST(1 AS DOUBLE), n2)))), 4)"
        ).alias("z"),
    )


def changepoint(series: DataFrame, min_seg: int = 24) -> DataFrame:
    """Single change-point by binary segmentation: the split maximizing
    |mean(left) − mean(right)|, segments ≥ min_seg. Left/right sums come
    from one cumulative window (exact integers); each candidate's score
    is one double expression; argmax tie-breaks on the split hour.
    Scale: one ordered window + a top-1 — no per-split rescan."""
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = series.agg(F.count("*").alias("n_all"), F.sum("c").alias("s_all"))
    cum = series.select(
        "h", F.row_number().over(Window.orderBy("h")).alias("rn"), F.sum("c").over(w).alias("cs")
    )
    cand = cum.crossJoin(F.broadcast(g)).filter(
        (col("rn") >= min_seg) & (col("rn") <= col("n_all") - min_seg)
    )
    scored = cand.select(
        "h",
        F.expr("round(try_divide(CAST(cs AS DOUBLE), rn), 4)").alias("mean_left"),
        F.expr("round(try_divide(CAST(s_all - cs AS DOUBLE), (n_all - rn)), 4)").alias("mean_right"),
        F.expr(
            "round(abs(CAST(cs AS DOUBLE) / rn - "
            "CAST(s_all - cs AS DOUBLE) / (n_all - rn)), 4)"
        ).alias("score"),
        F.expr(
            "abs(CAST(cs AS DOUBLE) / rn - CAST(s_all - cs AS DOUBLE) / (n_all - rn))"
        ).alias("raw"),
    )
    return (
        scored.orderBy(F.desc("raw"), "h")
        .limit(1)
        .select(col("h").alias("split_h"), "mean_left", "mean_right", "score")
    )


def _q_changepoint(spark, sf_dir):
    return changepoint(_hourly_series(spark, sf_dir))


def _q_ngram_novelty(spark, sf_dir):
    """Held-out bigram novelty: for each test doc (doc_id % 10 = 0), the
    share of its distinct bigrams never seen in the training split — the
    memorization/contamination complement an eval pipeline reports.
    Train bigrams dedup to a distinct set before the anti-join, so the
    join is bounded by vocabulary, not corpus size."""
    docs = tables.table(spark, sf_dir, "documents").select(
        "doc_id", F.split(col("text"), " ").alias("ts")
    ).filter(F.size("ts") >= 2)
    bi = F.transform(
        F.sequence(lit(1), F.size("ts") - 1),
        lambda j: F.concat_ws(" ", F.element_at(col("ts"), j), F.element_at(col("ts"), j + 1)),
    )
    grams = docs.select("doc_id", F.explode(bi).alias("bg")).distinct()
    test = grams.filter(col("doc_id") % 10 == 0)
    train_set = grams.filter(col("doc_id") % 10 != 0).select("bg").distinct()
    unseen = test.join(train_set, "bg", "left_anti").groupBy("doc_id").agg(
        F.count("*").alias("n_unseen")
    )
    per = test.groupBy("doc_id").agg(F.count("*").alias("n_bigrams"))
    return (
        per.join(unseen, "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            F.coalesce(col("n_unseen"), lit(0).cast("long")).alias("n_unseen"),
        )
        .withColumn(
            "novelty", F.expr("round(try_divide(CAST(n_unseen AS DOUBLE), n_bigrams), 4)")
        )
    )


def _q_feature_gain(spark, sf_dir):
    """Per-dimension decision-stump accuracy for the first 8 embedding
    dimensions — the univariate feature-ranking pass a feature-selection
    step runs. Same exact-integer cumulative-count stump as
    ml_decision_stump; the per-dim cumulative scan runs on the GROUPED
    two-phase prefix scan (group = dim, slices on the split value) —
    ``Window.partitionBy("dim")`` would fold each dimension's entire
    distinct-value set (~one per corpus row for raw floats) through a
    single task, capping parallelism at 8."""
    e = tables.embeddings(spark, sf_dir)
    pts = e.select(
        F.posexplode(F.slice(col("emb"), 1, 8)).alias("dim", "x"),
        (col("label") >= 5).cast("long").alias("y"),
    )
    per = pts.groupBy("dim", "x").agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    cum = prefix.attach_running_grouped(
        per, ["dim"], ["x"], sums={"n": "cn", "pos": "cp"}
    ).select("dim", "x", "cn", "cp")
    g = pts.groupBy("dim").agg(F.count("*").alias("nn"), F.sum("y").alias("p"))
    scored = cum.join(g, "dim").select(
        "dim",
        "nn",
        F.greatest(
            F.expr("nn - p + 2 * cp - cn"), F.expr("cn + p - 2 * cp")
        ).alias("correct"),
    )
    best = scored.groupBy("dim", "nn").agg(F.max("correct").alias("best_correct"))
    return best.select(
        col("dim").cast("long").alias("dim"),
        "best_correct",
        F.expr("round(try_divide(CAST(best_correct AS DOUBLE), nn), 4)").alias("accuracy"),
    )


def _emb_scored_pts(spark, sf_dir) -> DataFrame:
    """(score, y) points shared by the ROC/PR/threshold-pick family:
    emb[0] scoring the label ≥ 5 positive class. The score is quantized
    to the output precision (4 decimals, −0.0-normalized) BEFORE the
    sweep: raw f32 scores that collide only after rounding would
    otherwise emit duplicate-threshold curve rows whose cumulative
    counts differ — an order-ambiguous, non-monotone curve. Rounding
    first makes each emitted threshold one distinct sweep point."""
    e = tables.embeddings(spark, sf_dir)
    return e.select(
        F.expr("round(emb[0], 4) + CAST(0 AS DOUBLE)").alias("score"),
        (col("label") >= 5).cast("long").alias("y"),
    )


def _score_sweep_cum(pts: DataFrame) -> DataFrame:
    """(score, n, pos, tp, fp) per distinct score threshold, cumulative
    score-descending — shared by the ROC/PR/threshold-pick family.

    The cumulative counts run through the two-phase prefix scan
    (plans/prefix.py) instead of a single-partition global window, so
    the sweep survives a corpus-sized distinct-score set (raw float
    scores at 100 TB are ~one distinct value per row). Distinct scores
    form a total order, so the recombination is exact."""
    per = pts.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    cum = prefix.attach_running(
        per, [("score", "desc")], sums={"pos": "tp", "n": "_cn"}
    )
    return cum.select(
        "score", "n", "pos", "tp", (col("_cn") - col("tp")).alias("fp")
    )


def roc_curve(pts: DataFrame) -> DataFrame:
    """Full ROC curve for a continuous score vs binary label: one point
    per distinct score threshold (score ≥ t positive), TPR/FPR from
    cumulative integer counts over the score-descending sweep
    (_score_sweep_cum — two-phase prefix scan, no single-partition
    window). The curve length is distinct scores, not rows."""
    cum = _score_sweep_cum(pts)
    g = pts.agg(F.sum("y").alias("p"), F.expr("count(*) - sum(y)").alias("neg"))
    return cum.crossJoin(F.broadcast(g)).select(
        F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
        "tp",
        "fp",
        F.expr("round(try_divide(CAST(tp AS DOUBLE), p), 4)").alias("tpr"),
        F.expr("round(try_divide(CAST(fp AS DOUBLE), neg), 4)").alias("fpr"),
    )


def _q_roc_curve(spark, sf_dir):
    return roc_curve(_emb_scored_pts(spark, sf_dir))


def _q_calibration_knn(spark, sf_dir):
    """Calibration (reliability) table for the kNN classifier: group test
    predictions by their vote confidence (votes/k) and compare claimed
    confidence to empirical accuracy — the well-calibrated-probability
    check an ensembling stage runs. Composes the graded top-k + vote
    pipeline; confidence levels are exact vote integers."""
    from .knn import K_DEFAULT, knn_test_topk

    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    votes = t.groupBy("qid", "qlabel", "tlabel").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("qid").orderBy(F.desc("votes"), "tlabel")
    pred = votes.withColumn("rn", F.row_number().over(w)).filter(col("rn") == 1)
    return (
        pred.groupBy("votes")
        .agg(
            F.count("*").alias("n"),
            F.sum((col("tlabel") == col("qlabel")).cast("long")).alias("n_correct"),
        )
        .select(
            col("votes").alias("conf_votes"),
            "n",
            "n_correct",
            F.expr(f"round(CAST(conf_votes AS DOUBLE) / {K_DEFAULT}, 4)").alias(
                "confidence"
            ),
            F.expr("round(try_divide(CAST(n_correct AS DOUBLE), n), 4)").alias("empirical_acc"),
        )
    )


def _q_component_sizes(spark, sf_dir):
    """Near-dup cluster size histogram: how many clusters of each size
    the MinHash component pass produced — the dedup-yield report.
    Composes the graded connected-components output; one tiny aggregate
    over (cluster, size)."""
    from .iterative import _q_components

    comp = _q_components(spark, sf_dir)
    return (
        comp.groupBy("cluster_size")
        .agg(F.countDistinct("cluster").alias("n_clusters"))
        .select(col("cluster_size").alias("size"), "n_clusters")
    )


def periodogram(series: DataFrame, max_k: int = 36) -> DataFrame:
    """Discrete periodogram of an integer series at frequencies 1..max_k
    cycles: P_k = (Σc·cos)² + (Σc·sin)² scaled by 1/n — the spectral
    peak finder (daily cycle ⟹ peak at n/24 for hourly data). Each
    trig term is quantized to 1e-8 units before the sum, so the two
    inner sums are exact integers under any partitioning."""
    spark = series.sparkSession
    n_ = series.agg(F.count("*").alias("n"))
    t_ = series.select(
        "c", (F.row_number().over(Window.orderBy("h")) - 1).alias("t")
    )
    ks = spark.range(1, max_k + 1).select(col("id").alias("k"))
    terms = t_.crossJoin(F.broadcast(ks)).crossJoin(F.broadcast(n_))
    agg = terms.groupBy("k", "n").agg(
        F.sum(
            F.expr(
                "TRY_CAST(round(c * cos(2 * pi() * k * t / n) * 100000000, 0) AS BIGINT)"
            )
        ).alias("a"),
        F.sum(
            F.expr(
                "TRY_CAST(round(c * sin(2 * pi() * k * t / n) * 100000000, 0) AS BIGINT)"
            )
        ).alias("b"),
    )
    return agg.select(
        "k",
        F.expr(
            "round(((CAST(a AS DOUBLE) / 100000000) * (CAST(a AS DOUBLE) / 100000000) "
            "+ (CAST(b AS DOUBLE) / 100000000) * (CAST(b AS DOUBLE) / 100000000)) / n, 4)"
        ).alias("power"),
    )


def _q_periodogram(spark, sf_dir):
    return periodogram(_hourly_series(spark, sf_dir))


def _q_brier_score(spark, sf_dir):
    """Multi-class Brier score of the kNN vote distribution — the proper
    scoring rule for probability quality. Scaled by k² the per-query
    score Σ_c votes_c² − 2k·votes_true + k² is an exact integer, so the
    corpus aggregate is partitioning-exact and floats once at the end."""
    from .knn import K_DEFAULT, knn_test_topk

    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    votes = t.groupBy("qid", "qlabel", "tlabel").agg(F.count("*").alias("votes"))
    per = votes.groupBy("qid").agg(
        F.sum(col("votes") * col("votes")).alias("sv"),
        F.sum(F.when(col("tlabel") == col("qlabel"), col("votes")).otherwise(0)).alias(
            "vy"
        ),
    )
    scored = per.select(
        (
            col("sv") - 2 * K_DEFAULT * col("vy") + lit(K_DEFAULT * K_DEFAULT)
        ).alias("qs")
    )
    return scored.agg(F.count("*").alias("n_test"), F.sum("qs").alias("total")).select(
        "n_test",
        F.expr(f"round(try_divide(CAST(total AS DOUBLE), (n_test * {K_DEFAULT * K_DEFAULT})), 4)").alias(
            "brier"
        ),
    )


def _q_log_loss(spark, sf_dir):
    """Laplace-smoothed log loss of the kNN classifier:
    −mean ln((votes_true+1)/(k+10)). Each per-query term quantizes to
    integer nano-nats before the sum (inputs are exact rationals), so the
    mean is order-independent."""
    from .knn import K_DEFAULT, knn_test_topk

    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    vy = t.groupBy("qid").agg(
        F.sum((col("tlabel") == col("qlabel")).cast("long")).alias("vy")
    )
    terms = vy.select(
        F.expr(
            f"TRY_CAST(round(-ln((vy + 1) / CAST({K_DEFAULT} + 10 AS DOUBLE)) "
            "* 1000000000, 0) AS BIGINT)"
        ).alias("ti")
    )
    return terms.agg(F.count("*").alias("n_test"), F.sum("ti").alias("tsum")).select(
        "n_test",
        F.expr(
            "round(try_divide(tsum / CAST(1000000000 AS DOUBLE), n_test), 4)"
        ).alias("log_loss"),
    )


def _q_dedup_threshold_sweep(spark, sf_dir):
    """Near-dup pair yield at Jaccard thresholds 50/70/90% — the curve a
    dedup pipeline reads to pick its cutoff. Thresholds compare by
    integer cross-multiplication (i·100 ≥ thr·union), so no float enters
    a predicate; zero-yield thresholds still report 0."""
    from .llm import _shingles

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(col("doc_id").alias("doc_a"), col("lang").alias("lang_a"), "s")
    b = sh.select(col("doc_id").alias("doc_b"), col("lang").alias("lang_b"), "s")
    inter = (
        a.join(b, ["s"])
        .filter((col("doc_a") < col("doc_b")) & (col("lang_a") == col("lang_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
        .join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("na")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), "doc_b")
    )
    thr = spark.range(0, 3).select(
        F.element_at(F.array(lit(50), lit(70), lit(90)), (col("id") + 1).cast("int")).alias(
            "threshold_pct"
        )
    )
    hits = (
        inter.crossJoin(F.broadcast(thr))
        .filter(col("i") * 100 >= col("threshold_pct") * (col("na") + col("nb") - col("i")))
        .groupBy("threshold_pct")
        .agg(F.count("*").alias("c"))
    )
    return thr.join(hits, "threshold_pct", "left").select(
        "threshold_pct", F.coalesce(col("c"), lit(0).cast("long")).alias("n_pairs")
    )


def _q_arrival_iat(spark, sf_dir):
    """Inter-arrival-time distribution per event type: count, mean,
    exact interpolated median, and max of the µs gaps between
    consecutive events of the same type. Gaps are integer µs; mean/median
    float once. One shuffle on event_type carries the lag window and the
    aggregate. Scale note (cf. rel_agg_percentile): the exact median and
    the per-type lag are corpus-grain per event type — the graded
    contract is exactness; at 100 TB the declared path is
    approx_percentile (t-digest) for the median and a time-bucketed lag
    (per (type, hour-bucket) windows + boundary stitch, the
    str_late_data shape) for the gaps."""
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    gaps = (
        ev.select("event_type", "ts_us", "event_id")
        .withColumn("gap", col("ts_us") - F.lag("ts_us").over(w))
        .filter(col("gap").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap").alias("total_us"),
        F.expr(
            "round(try_divide(CAST(sum(gap) AS DOUBLE), count(*)), 4)"
        ).alias("mean_us"),
        F.expr("round(percentile(gap, 0.5), 4)").alias("median_us"),
        F.max("gap").alias("max_us"),
    )


def _q_downsample_minmax(spark, sf_dir):
    """Min/max downsampling of the hourly series into 12-hour buckets —
    the lossless-extremes decimation a plotting/monitoring layer uses
    (peaks survive, unlike plain averaging). min_by/max_by pick the
    earliest/latest points; all aggregates are single-pass."""
    s = _hourly_series(spark, sf_dir)
    return s.groupBy(F.expr("h div 12").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("c").alias("c_min"),
        F.max("c").alias("c_max"),
        F.expr("min_by(c, h)").alias("c_first"),
        F.expr("max_by(c, h)").alias("c_last"),
    )


def theil_sen(series: DataFrame) -> DataFrame:
    """Theil–Sen robust trend: the exact median of all pairwise slopes
    (c_j − c_i)/(j − i) — outlier-resistant unlike OLS. Slopes are exact
    rationals evaluated in one double division; the median interpolates
    identical doubles on both engines. Scale note: O(n²) pairs of the
    *series*, which is hours-of-history; for longer series the estimator
    runs on a bounded window of pairs."""
    a = series.select(col("h").alias("hi"), col("c").alias("ci"))
    b = series.select(col("h").alias("hj"), col("c").alias("cj"))
    slopes = a.join(b, col("hi") < col("hj")).select(
        F.expr("(cj - ci) / CAST(hj - hi AS DOUBLE)").alias("slope")
    )
    return slopes.agg(
        F.count("*").alias("n_pairs"),
        F.expr("round(percentile(slope, 0.5), 4)").alias("trend_per_hour"),
    )


def _q_theil_sen(spark, sf_dir):
    return theil_sen(_hourly_series(spark, sf_dir))


def mad_outliers(series: DataFrame) -> DataFrame:
    """Median-absolute-deviation outlier count — the robust twin of the
    rolling-z detector: med and MAD are exact interpolated quantiles of
    integers, the 3σ-equivalent cutoff 3·1.4826·MAD is one identical
    float expression on both engines."""
    med = series.agg(F.expr("percentile(c, 0.5)").alias("med"))
    dev = series.crossJoin(F.broadcast(med)).select(
        "c", "med", F.abs(col("c") - col("med")).alias("adev")
    )
    madv = dev.agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(madv))
        .agg(
            F.count("*").alias("n"),
            F.expr("round(any_value(med), 4)").alias("median"),
            F.expr("round(any_value(mad), 4)").alias("mad"),
            F.sum(
                F.expr("CASE WHEN adev > 3 * 1.4826 * mad THEN 1 ELSE 0 END")
            ).alias("n_outliers"),
        )
    )


def _q_mad_outliers(spark, sf_dir):
    return mad_outliers(_hourly_series(spark, sf_dir))


def _q_minhash_est_vs_exact(spark, sf_dir):
    """Sketch calibration: for every MinHash band-join candidate pair,
    the signature-agreement estimate (matches/8) next to the exact
    shingle Jaccard — the report that tells a dedup pipeline whether its
    sketch budget (8 hashes) is adequate. Match counts and intersections
    are exact integers; the two shares float once per pair."""
    from .llm import N_MINHASH, _shingles, minhash_signatures, near_dup_pairs

    pairs = near_dup_pairs(spark, sf_dir)
    sig = minhash_signatures(spark, sf_dir)
    siga = sig.select(
        col("doc_id").alias("doc_a"), *[col(f"h{k}").alias(f"a{k}") for k in range(N_MINHASH)]
    )
    sigb = sig.select(
        col("doc_id").alias("doc_b"), *[col(f"h{k}").alias(f"b{k}") for k in range(N_MINHASH)]
    )
    est = pairs.join(siga, "doc_a").join(sigb, "doc_b").select(
        "doc_a",
        "doc_b",
        sum(
            [(col(f"a{k}") == col(f"b{k}")).cast("long") for k in range(N_MINHASH)],
            lit(0).cast("long"),
        ).alias("est_matches"),
    )
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # r11 (guide §3.3 — same candidate-set pushdown as llm_topic_
    # coherence's co-occurrence): the exact-Jaccard inverted join used
    # to aggregate over EVERY doc pair sharing any shingle and only
    # then left-join down to the band-join candidates; semi-joining the
    # (bounded, broadcastable) candidate pair set BEFORE the groupBy
    # drops non-candidate pairs before the aggregate. Identical `i`
    # counts for every surviving pair — the left join kept only
    # candidate pairs anyway. Measured sf0.1: 4.3 → ~2.0 s warm.
    inter = (
        sh.select(col("doc_id").alias("doc_a"), "s")
        .join(sh.select(col("doc_id").alias("doc_b"), "s"), "s")
        .join(
            F.broadcast(pairs.select("doc_a", "doc_b")),
            ["doc_a", "doc_b"],
            "left_semi",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    out = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("na")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_matches",
            F.coalesce(col("i"), lit(0).cast("long")).alias("i"),
            F.expr(f"round(CAST(est_matches AS DOUBLE) / {N_MINHASH}, 4)").alias(
                "jaccard_est"
            ),
            F.expr(
                "round(CAST(COALESCE(i, 0) AS DOUBLE) / (na + nb - COALESCE(i, 0)), 4)"
            ).alias("jaccard_exact"),
        )
    )
    return out


def _q_incremental_agg(spark, sf_dir):
    """Incremental-view-maintenance proof: aggregate two disjoint
    partitions of the fact table separately (the nightly delta and the
    existing materialization), merge the partial states (sum of sums,
    sum of counts), and finish. Graded against the single-pass aggregate
    — mergeability is exactly what lets a 100 TB rollup refresh by
    touching only new partitions."""
    li = tables.table(spark, sf_dir, "lineitem")

    def partial(part):
        return (
            li.filter(F.expr(f"l_orderkey % 2 = {part}"))
            .groupBy("l_returnflag")
            .agg(
                F.sum(cents(col("l_extendedprice"))).alias("s"),
                F.count("*").alias("n"),
            )
        )

    merged = (
        partial(0)
        .unionByName(partial(1))
        .groupBy("l_returnflag")
        .agg(F.sum("s").alias("price_cents"), F.sum("n").alias("n_items"))
    )
    return merged.select(
        "l_returnflag",
        "price_cents",
        "n_items",
        F.expr("round(price_cents / CAST(n_items AS DOUBLE) / 100, 4)").alias(
            "avg_price"
        ),
    )


def _q_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot diff: compare the per-user event rollup as of
    day 1 vs day 15 and report users added / absent / unchanged / grown — the
    reconciliation report an incremental pipeline emits. One shuffle on
    user_id; both snapshots come from a single scan (conditional
    aggregation), not two."""
    ev = tables.table(spark, sf_dir, "events")
    day = F.expr("ts_us div 86400000000 - 19723")  # days since 2024-01-01
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(day < 1, 1).otherwise(0)).alias("n_then"),
        F.sum(F.when(day < 15, 1).otherwise(0)).alias("n_now"),
    )
    return per.select(
        F.when(col("n_now") == 0, "absent")
        .when(col("n_then") == 0, "added")
        .when(col("n_now") > col("n_then"), "grown")
        .otherwise("unchanged")
        .alias("status"),
        "user_id",
    ).groupBy("status").agg(F.count("*").alias("n_users"))


def _q_dataset_card(spark, sf_dir):
    """One-row dataset card for the documents corpus: sizes, language
    spread, token volume, and near-dup rate — the summary block a corpus
    release ships. Composes token counting and the MinHash candidate
    pairs; every number integer-derived."""
    from .llm import near_dup_pairs

    docs = tables.table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(col("text"), " "))).alias("total_tokens"),
    )
    dup_docs = (
        near_dup_pairs(spark, sf_dir)
        .select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .distinct()
        .agg(F.count("*").alias("n_dup_docs"))
    )
    return base.crossJoin(F.broadcast(dup_docs)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_chars",
        "total_tokens",
        "n_dup_docs",
        F.expr("round(try_divide(CAST(n_dup_docs AS DOUBLE), n_docs), 4)").alias("dup_rate"),
        F.expr("round(try_divide(CAST(total_tokens AS DOUBLE), n_docs), 4)").alias(
            "mean_tokens_per_doc"
        ),
    )


def label_propagation(nodes: DataFrame, edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Min-label propagation (bounded-round Pregel community detection)
    over an undirected edge list: each round every node takes the min of
    its own and its neighbors' labels. Labels are node ids — exact
    integers — so the non-converged state after `rounds` supersteps is
    itself deterministic and hash-gradable. Each round is one equi-join
    + one groupBy on node id (the Pregel message schedule); isolated
    nodes keep their own label via the left join."""
    sym = edges.union(edges.select(col("b").alias("a"), col("a").alias("b")))
    lbl = nodes.select(col("id"), col("id").alias("lbl"))
    for _ in range(rounds):
        nb = (
            sym.join(lbl.select(col("id").alias("b"), col("lbl").alias("nlbl")), "b")
            .groupBy("a")
            .agg(F.min("nlbl").alias("mn"))
        )
        lbl = (
            lbl.join(nb, lbl.id == nb.a, "left")
            .select(col("id"), F.least(col("lbl"), F.coalesce(col("mn"), col("lbl"))).alias("lbl"))
        )
    return lbl.select(col("id").alias("node"), col("lbl").alias("community"))


def _q_label_prop(spark, sf_dir):
    from .knn import _q_mutual

    e = tables.embeddings(spark, sf_dir)
    return label_propagation(
        e.select(col("vec_id").alias("id")), _q_mutual(spark, sf_dir)
    )


def _q_select_except(spark, sf_dir):
    """Modern star-projection surface: Spark 4 `SELECT * EXCEPT (...)`
    (⟷ DuckDB `* EXCLUDE`) — drop the wide text column at the parser
    level so column pruning still reaches the scan."""
    tables.table(spark, sf_dir, "documents").createOrReplaceTempView("documents_se")
    return spark.sql(
        "SELECT * EXCEPT (text) FROM documents_se WHERE doc_id < 50"
    )


def _q_group_by_all(spark, sf_dir):
    """GROUP BY ALL surface (Spark ≥3.4 ⟷ DuckDB): every non-aggregate
    select item becomes a grouping key — the dbt-style rollup shorthand."""
    tables.table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        f"CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS price_cents "
        "FROM lineitem_gba GROUP BY ALL"
    )


def _q_psi_drift(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the month for the event-value distribution — the drift monitor a
    feature pipeline runs per release. Values bin into 10 fixed cent
    deciles of the reference window; PSI terms quantize to nano units
    before summation (counts are exact integers throughout)."""
    ev = tables.table(spark, sf_dir, "events")
    day = F.expr("ts_us div 86400000000 - 19723")
    binned = ev.select(
        F.when(day < 15, 1).otherwise(2).alias("win"),
        F.least(F.floor(cents(col("value")) / 5000), lit(9)).cast("long").alias("b"),
    )
    per = binned.groupBy("b").agg(
        F.sum(F.when(col("win") == 1, 1).otherwise(0)).alias("na"),
        F.sum(F.when(col("win") == 2, 1).otherwise(0)).alias("nb"),
    )
    g = binned.agg(
        F.sum(F.when(col("win") == 1, 1).otherwise(0)).alias("ta"),
        F.sum(F.when(col("win") == 2, 1).otherwise(0)).alias("tb"),
    )
    terms = per.crossJoin(F.broadcast(g)).select(
        F.expr(
            "TRY_CAST(round(((na + 1) / CAST(ta + 10 AS DOUBLE) - "
            "(nb + 1) / CAST(tb + 10 AS DOUBLE)) * "
            "ln(((na + 1) / CAST(ta + 10 AS DOUBLE)) / "
            "((nb + 1) / CAST(tb + 10 AS DOUBLE))) * 1000000000, 0) AS BIGINT)"
        ).alias("ti")
    )
    return terms.agg(F.count("*").alias("n_bins"), F.sum("ti").alias("s")).select(
        "n_bins", F.expr("round(s / CAST(1000000000 AS DOUBLE), 4)").alias("psi")
    )


def _q_chi2_independence(spark, sf_dir):
    """χ² test of independence between event_type and the even/odd user
    bucket — the categorical-drift / assignment-balance check. Observed
    and marginal counts are exact integers; each (O−E)²/E term quantizes
    to nano units before the sum; dof is (r−1)(c−1)."""
    ev = tables.table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.expr("user_id % 2").alias("bucket")
    ).agg(F.count("*").alias("o"))
    rows_ = ev.groupBy("event_type").agg(F.count("*").alias("nr"))
    cols_ = ev.groupBy(F.expr("user_id % 2").alias("bucket")).agg(
        F.count("*").alias("nc")
    )
    tot = ev.agg(F.count("*").alias("nn"))
    terms = (
        cells.join(rows_, "event_type")
        .join(cols_, "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "TRY_CAST(round(pow(o - CAST(nr AS DOUBLE) * nc / nn, 2) / "
                "(CAST(nr AS DOUBLE) * nc / nn) * 1000000000, 0) AS BIGINT)"
            ).alias("ti")
        )
    )
    dims = rows_.agg(F.count("*").alias("r")).crossJoin(
        cols_.agg(F.count("*").alias("c"))
    )
    return (
        terms.agg(F.sum("ti").alias("s"))
        .crossJoin(F.broadcast(dims))
        .select(
            F.expr("round(s / CAST(1000000000 AS DOUBLE), 4)").alias("chi2"),
            F.expr("CAST((r - 1) * (c - 1) AS BIGINT)").alias("dof"),
        )
    )


def _q_ohlc(spark, sf_dir):
    """Hourly OHLC candles over event values — the financial-style
    resample. Open/close pick the first/last event by the total order
    (ts, event_id) via rank-1 windows; high/low/volume are plain
    aggregates in cents. One shuffle on the hour key carries both
    windows and the aggregate."""
    ev = tables.table(spark, sf_dir, "events").select(
        F.expr("ts_us div 3600000000").alias("h"),
        cents(col("value")).alias("vc"),
        "ts_us",
        "event_id",
    )
    wa = Window.partitionBy("h").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("h").orderBy(F.desc("ts_us"), F.desc("event_id"))
    r = ev.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rd", F.row_number().over(wd)
    )
    return r.groupBy("h").agg(
        F.max(F.when(col("ra") == 1, col("vc"))).alias("open_cents"),
        F.max("vc").alias("high_cents"),
        F.min("vc").alias("low_cents"),
        F.max(F.when(col("rd") == 1, col("vc"))).alias("close_cents"),
        F.count("*").alias("n"),
        F.sum("vc").alias("vol_cents"),
    )


def _q_dist_concentration(spark, sf_dir):
    """Distance-concentration diagnostic (the curse-of-dimensionality
    check): coefficient of variation and relative contrast of the
    query→train distance distribution — near-zero CV means neighbors
    stop being meaningful. Distances quantize to integer micro-units
    before the moment sums; one final float expression. Headroom note:
    Σd² grows with the n² pair count (~9e18 at 4M pairs) — beyond ~10⁷
    pairs drop the quantum to 1e4 or compute on the GEMM-sampled pair
    subset; ANSI mode fails loudly rather than wrapping."""
    from .knn import _pairs

    q = _pairs(spark, sf_dir).select(
        F.expr("TRY_CAST(round(dist * 1000000, 0) AS BIGINT)").alias("di")
    )
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("di").alias("s"),
        F.sum(col("di") * col("di")).alias("ss"),
        F.min("di").alias("mn"),
        F.max("di").alias("mx"),
    )
    return m.select(
        col("n").alias("n_pairs"),
        F.expr("round(s / CAST(n AS DOUBLE) / 1000000, 4)").alias("mean_dist"),
        F.expr(
            "round(sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) / "
            "(s / CAST(n AS DOUBLE)), 4)"
        ).alias("cv"),
        F.expr("round(try_divide(mx - mn, CAST(mn AS DOUBLE)), 4)").alias("rel_contrast"),
    )


def _q_interp_linear(spark, sf_dir):
    """Hourly linear-interpolation resample of the purchase value series —
    the numeric twin of ts_resample_locf (carry-forward fills steps;
    interpolation fills slopes). Union the event points with the hourly
    grid, sort once on (t, is_grid, event_id); the surrounding points
    come from two framed windows (last/first IGNORE NULLS), so the whole
    resample is one sort-shuffle, no range self-join. The interpolation
    numerator is exact integer cents·µs; one double division at the end.
    Grid points outside the observed span have no bracket and are
    dropped; a grid point landing exactly on an event reproduces that
    event's value (t−pt = 0 term)."""
    ev = tables.table(spark, sf_dir, "events").filter(
        col("event_type") == "purchase"
    )
    pts = ev.select(
        col("ts_us").alias("t"),
        cents(col("value")).alias("vc"),
        "event_id",
        lit(0).alias("is_grid"),
    )
    grid = (
        pts.agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
        .select(
            F.explode(
                F.sequence(
                    F.expr("(mn + 3599999999) div 3600000000"),
                    F.expr("mx div 3600000000"),
                )
            ).alias("h")
        )
        .select(
            (col("h") * HOUR_US).alias("t"),
            lit(None).cast("long").alias("vc"),
            lit(None).cast("long").alias("event_id"),
            lit(1).alias("is_grid"),
        )
    )
    # forward fill = running last-non-null via the two-phase prefix
    # scan; backward fill = the same scan over the reversed order — no
    # single-partition window over the event stream.
    base = (
        pts.unionByName(grid)
        .withColumn("te", F.when(col("is_grid") == 0, col("t")))
        .withColumn("eid", F.coalesce("event_id", lit(-1)))
    )
    fwd = ["t", "is_grid", "eid"]
    bwd = [("t", "desc"), ("is_grid", "desc"), ("eid", "desc")]
    u = prefix.attach_running(base, fwd, lasts={"vc": "pv", "te": "pt"})
    u = prefix.attach_running(u, bwd, lasts={"vc": "nv", "te": "nt"})
    return u.filter(
        (col("is_grid") == 1) & col("pv").isNotNull() & col("nv").isNotNull()
    ).select(
        F.expr("t div 3600000000").alias("h"),
        F.expr(
            "round((pv * (nt - t) + nv * (t - pt)) / CAST(nt - pt AS DOUBLE) / 100, 4)"
        ).alias("value_interp"),
    )


def _q_gini_activity(spark, sf_dir):
    """Gini coefficient of the per-user event-count distribution — the
    activity-concentration summary (0 = egalitarian, →1 = a few users
    generate everything). Ranks are assigned ascending by (count, user);
    Σi·xᵢ is invariant to tie order among equal counts, so the statistic
    is exact. One groupBy + one global sort of user-count rows (users ≪
    events; at 100 TB the sorted set is the user dimension, not the
    fact table)."""
    per = (
        tables.table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("x"))
    )
    # ranks via the two-phase prefix scan — the sorted set is the user
    # dimension, and it no longer funnels through one partition.
    r = prefix.attach_running(per, ["x", "user_id"], rn="i").select("x", "i")
    g = r.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(col("i") * col("x")).alias("sx"),
    )
    return g.select(
        col("n").alias("n_users"),
        col("s").alias("total_events"),
        F.expr(
            "round((2.0 * sx - (n + 1.0) * s) / (CAST(n AS DOUBLE) * s), 4)"
        ).alias("gini"),
    )


def _q_assoc_rules(spark, sf_dir):
    """Association rules over per-user event-type baskets: for every
    unordered type pair, support / confidence / lift from exact integer
    user counts. The pair space is |types|² (25), not users² — the
    self-join runs on the deduped (user, type) set, shuffling on
    user_id. The classic market-basket co-occurrence mining shape."""
    ev = tables.table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.countDistinct("user_id").alias("n"))
    na = ut.groupBy("event_type").agg(F.count("*").alias("cnt"))
    ab = (
        ut.select("user_id", col("event_type").alias("a"))
        .join(ut.select("user_id", col("event_type").alias("b")), "user_id")
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        ab.join(
            F.broadcast(na.select(col("event_type").alias("a"), col("cnt").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(na.select(col("event_type").alias("b"), col("cnt").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("round(n_ab / CAST(n_a AS DOUBLE), 4)").alias("conf_a_to_b"),
            F.expr(
                "round(CAST(n_ab AS DOUBLE) * n / (CAST(n_a AS DOUBLE) * n_b), 4)"
            ).alias("lift"),
        )
    )


def _q_fano_burstiness(spark, sf_dir):
    """Burstiness (Fano factor = population variance / mean) of each
    event type's zero-filled hourly arrival counts — 1 ≈ Poisson,
    > 1 bursty, < 1 regular. The spine is hours × types (generated, not
    scanned); all moments are exact integer sums, one double expression
    at the end."""
    ev = tables.table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").alias("c"))
    spine = (
        ev.agg(
            F.expr("min(ts_us) div 3600000000").alias("mn"),
            F.expr("max(ts_us) div 3600000000").alias("mx"),
        )
        .select(F.explode(F.sequence(col("mn"), col("mx"))).alias("h"))
        .crossJoin(ev.select("event_type").distinct())
    )
    z = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", F.coalesce("c", lit(0)).alias("c")
    )
    m = z.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(col("c") * col("c")).alias("ss"),
    )
    return m.select(
        "event_type",
        col("n").alias("n_hours"),
        col("s").alias("total"),
        F.expr(
            "round(CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * s), 4)"
        ).alias("fano"),
    )


def _q_bfs_dist(spark, sf_dir):
    """Bounded-depth BFS over the mutual-kNN graph from vec_id 0 —
    shortest hop distances within 3 rounds (the Pregel traversal
    primitive under connected components / label propagation, graded
    directly). Each round is one equi-join frontier⋈edges shuffling on
    node id; per-round distinct() keeps the frontier ≤ |V| so path
    explosion never reaches the shuffle. Depth is fixed, so the
    non-converged state is itself deterministic and hash-graded."""
    from .knn import _q_mutual

    m = _q_mutual(spark, sf_dir)
    sym = m.select(col("a").alias("src"), col("b").alias("dst")).unionByName(
        m.select(col("b").alias("src"), col("a").alias("dst"))
    )
    e = tables.embeddings(spark, sf_dir)
    visited = e.filter(col("vec_id") == 0).select(
        col("vec_id").alias("id"), lit(0).alias("dist")
    )
    frontier = visited
    for r in range(1, 4):
        frontier = (
            frontier.join(sym, col("id") == col("src"))
            .select(col("dst").alias("id"), lit(r).alias("dist"))
            .distinct()
        )
        visited = visited.unionByName(frontier)
    return visited.groupBy("id").agg(F.min("dist").alias("dist"))


def _q_keywords_per_doc(spark, sf_dir):
    """Keyword extraction: top-3 TF-IDF terms per document (the tag /
    index-term generator over a corpus). Reuses the graded TF-IDF
    formula; scores are quantized to integer micro-units before ranking
    so the per-doc order is engine-exact; ties break on the term. The
    rank window partitions by doc — WindowGroupLimit prunes to 3 rows
    per doc before the shuffle."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("ts").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = tables.table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    siq = F.expr(
        "TRY_CAST(round(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1) * 1000000, 0) AS BIGINT)"
    )
    scored = (
        tf.join(df_, "term").crossJoin(F.broadcast(n)).select("doc_id", "term", siq.alias("siq"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("siq"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "siq")
    )


def _q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse-vector document similarity: TF-IDF cosine between every
    pair of documents containing the planted 'dup' token — the
    lexical-overlap twin of the embedding cosine ops, computed as a
    sparse dot product via a term equi-join (never a dense d² matrix).
    Weights quantize to integer micro-units so dot and norms are exact
    integer sums; one double expression forms the cosine."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir)
    sel = toks.filter(F.array_contains("ts", "dup")).select("doc_id")
    t = toks.select("doc_id", F.explode("ts").alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = tables.table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    wq = (
        tf.join(F.broadcast(sel), "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.expr(
                "TRY_CAST(round(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1) * 1000000, 0)"
                " AS BIGINT)"
            ).alias("w"),
        )
    )
    norms = wq.groupBy("doc_id").agg(F.sum(col("w") * col("w")).alias("nrm2"))
    dots = (
        wq.select(col("doc_id").alias("a"), "term", col("w").alias("wa"))
        .join(wq.select(col("doc_id").alias("b"), "term", col("w").alias("wb")), "term")
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(F.sum(col("wa") * col("wb")).alias("dot"))
    )
    return (
        dots.join(norms.select(col("doc_id").alias("a"), col("nrm2").alias("na2")), "a")
        .join(norms.select(col("doc_id").alias("b"), col("nrm2").alias("nb2")), "b")
        .select(
            "a",
            "b",
            "dot",
            F.expr(
                "round(dot / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 4)"
            ).alias("cosine"),
        )
    )


def _q_pr_curve(spark, sf_dir):
    """Precision-recall curve for the same scored points as ml_roc_curve
    (emb[0] scoring label ≥ 5) — the imbalanced-class companion to ROC.
    One point per distinct score; precision/recall from cumulative
    integer counts over the score-descending window."""
    pts = _emb_scored_pts(spark, sf_dir)
    cum = _score_sweep_cum(pts)  # two-phase prefix scan, no global window
    g = pts.agg(F.sum("y").alias("p"))
    return cum.crossJoin(F.broadcast(g)).select(
        F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
        "tp",
        "fp",
        F.expr("round(try_divide(CAST(tp AS DOUBLE), (tp + fp)), 4)").alias("precision"),
        F.expr("round(try_divide(CAST(tp AS DOUBLE), p), 4)").alias("recall"),
    )


def _q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient per node of the mutual-kNN graph —
    triangles(v) / C(deg(v), 2), the neighborhood-density companion to
    graph_triangles. Ordered edges (a<b) find each triangle once via the
    two-join pattern (fan-out bounded by forward degree); degree comes
    from the symmetrized edge list. Exact integer counts; one double
    expression."""
    from .knn import _q_mutual

    m = _q_mutual(spark, sf_dir)
    sym = m.select(col("a").alias("node")).unionByName(
        m.select(col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    e1 = m.select(col("a").alias("x"), col("b").alias("y"))
    e2 = m.select(col("a").alias("y"), col("b").alias("z"))
    e3 = m.select(col("a").alias("x2"), col("b").alias("z2"))
    tris = (
        e1.join(e2, "y")
        .join(e3, (col("x") == col("x2")) & (col("z") == col("z2")))
        .select("x", "y", "z")
    )
    pt = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri"))
    )
    return (
        deg.join(pt, "node", "left")
        .filter(col("deg") >= 2)
        .select(
            "node",
            "deg",
            F.coalesce("tri", lit(0)).alias("tri"),
            F.expr(
                "round(CAST(2 * coalesce(tri, 0) AS DOUBLE) / (deg * (deg - 1)), 4)"
            ).alias("cc"),
        )
    )


def _q_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution (lexical
    diversity; H = ln L − Σc·ln c / L). The c·ln c terms quantize to
    integer nano-nats before the per-doc sum, so the aggregate is exact
    under any partitioning; ln L enters only the final expression."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("ts").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    per = tf.groupBy("doc_id").agg(
        F.sum("c").alias("L"),
        F.sum(F.expr("TRY_CAST(round(c * ln(c) * 1000000000, 0) AS BIGINT)")).alias("s"),
    )
    return per.select(
        "doc_id",
        col("L").alias("n_tokens"),
        F.expr(
            "round(ln(CAST(L AS DOUBLE)) - s / (CAST(L AS DOUBLE) * 1000000000), 4)"
        ).alias("entropy_nats"),
    )


def _q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the two graded classifiers — kNN majority
    vote vs nearest-centroid — on the shared test split: chance-corrected
    agreement from exact integer marginals (κ = (agree·n − Σn1ₖn2ₖ) /
    (n² − Σn1ₖn2ₖ)). The model-agreement diagnostic an ensembling stage
    runs before stacking."""
    from .knn import _q_centroid, classify

    p1 = classify(spark, sf_dir).select("qid", col("pred_label").alias("p1"))
    p2 = _q_centroid(spark, sf_dir).select("qid", col("pred_label").alias("p2"))
    j = p1.join(p2, "qid")
    m = j.agg(
        F.count("*").alias("n"),
        F.sum((col("p1") == col("p2")).cast("long")).alias("agree"),
    )
    c1 = j.groupBy(col("p1").alias("lbl")).agg(F.count("*").alias("n1"))
    c2 = j.groupBy(col("p2").alias("lbl")).agg(F.count("*").alias("n2"))
    pe = c1.join(c2, "lbl").agg(F.sum(col("n1") * col("n2")).alias("s"))
    return m.crossJoin(pe).select(
        "n",
        "agree",
        F.expr(
            "round(CAST(agree * n - s AS DOUBLE) / (CAST(n AS DOUBLE) * n - s), 4)"
        ).alias("kappa"),
    )


def _q_gains_table(spark, sf_dir):
    """Decile gains/lift table for the emb[0] scorer (the campaign-
    targeting view of ml_roc_curve): ntile(10) over the score with a
    unique tie-break, cumulative capture and lift from exact integer
    counts."""
    e = tables.embeddings(spark, sf_dir)
    pts = e.select(
        "vec_id",
        col("emb").getItem(0).alias("score"),
        (col("label") >= 5).cast("long").alias("y"),
    )
    # exact ntile(10) via the two-phase prefix scan (plans/prefix.py) —
    # the decile assignment no longer single-partitions the corpus.
    per = (
        prefix.ntile_exact(pts, [("score", "desc"), "vec_id"], 10, "decile")
        .groupBy("decile")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    tot = pts.agg(F.sum("y").alias("p"), F.count("*").alias("nn"))
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "pos",
        F.expr("round(try_divide(cum_pos, CAST(p AS DOUBLE)), 4)").alias("capture"),
        F.expr(
            "round(try_divide(try_divide(CAST(cum_pos AS DOUBLE), cum_n), "
            "try_divide(CAST(p AS DOUBLE), nn)), 4)"
        ).alias("lift"),
    )


def _q_time_to_convert(spark, sf_dir):
    """Per-user signup→purchase conversion latency: first signup, first
    purchase at-or-after it, exact integer seconds between. One shuffle
    on user_id covers both aggregates; users who never convert drop out
    (the funnel complement of rel_funnel_3step)."""
    ev = tables.table(spark, sf_dir, "events")
    s = (
        ev.filter(col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("s_us"))
    )
    p = ev.filter(col("event_type") == "purchase").select("user_id", "ts_us")
    return (
        s.join(p, "user_id")
        .filter(col("ts_us") >= col("s_us"))
        .groupBy("user_id", "s_us")
        .agg(F.min("ts_us").alias("p_us"))
        .select("user_id", F.expr("(p_us - s_us) div 1000000").alias("delta_s"))
    )


def _q_lang_vocab_overlap(spark, sf_dir):
    """Cross-language vocabulary overlap: distinct-term Jaccard for every
    unordered language pair — the corpus-mixing diagnostic (shared
    loanwords/markers vs language-exclusive vocabulary). The term
    equi-join runs on deduped (lang, term) sets: vocabulary-sized, never
    corpus-sized."""
    from .llm import _tokens

    v = (
        _tokens(spark, sf_dir)
        .select("lang", F.explode("ts").alias("term"))
        .distinct()
    )
    sizes = v.groupBy("lang").agg(F.count("*").alias("vsz"))
    inter = (
        v.select(col("lang").alias("a"), "term")
        .join(v.select(col("lang").alias("b"), "term"), "term")
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(F.broadcast(sizes.select(col("lang").alias("a"), col("vsz").alias("n_a"))), "a")
        .join(F.broadcast(sizes.select(col("lang").alias("b"), col("vsz").alias("n_b"))), "b")
        .select(
            "a",
            "b",
            "n_common",
            "n_a",
            "n_b",
            F.expr("round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 4)").alias(
                "jaccard"
            ),
        )
    )


def _q_order_by_all(spark, sf_dir):
    """ORDER BY ALL shorthand (Spark 4 ⟷ DuckDB): total order over every
    output column, here driving a deterministic LIMIT — the companion of
    rel_group_by_all."""
    tables.table(spark, sf_dir, "events").createOrReplaceTempView("events_oba")
    return spark.sql(
        "SELECT event_type, ts_us div 86400000000 AS day, count(*) AS n "
        "FROM events_oba GROUP BY ALL ORDER BY ALL LIMIT 20"
    )


def _q_try_arith(spark, sf_dir):
    """Null-on-error arithmetic surface: try_divide / try_cast semantics
    (Spark) expressed against DuckDB's TRY_CAST and NULLIF-guarded
    division — the defensive-ingest idiom for dirty numeric columns.
    Exercises divide-by-zero → NULL, bad string → NULL cast, and
    coalesce fallback on the events JSON prop."""
    ev = tables.table(spark, sf_dir, "events")
    k = F.expr("CAST(get_json_object(props, '$.k') AS INT)")
    return ev.select(
        "event_id",
        F.expr(
            "round(try_divide(TRY_CAST(round(value * 100, 0) AS BIGINT), "
            "CAST(get_json_object(props, '$.k') AS INT)), 4)"
        ).alias("cents_per_k"),
        F.expr("try_cast(event_type AS INT)").alias("bad_cast"),
        F.coalesce(k, lit(-1)).alias("k_or_default"),
    )


def _q_logreg_irls1(spark, sf_dir):
    """One IRLS/Newton step of logistic regression (intercept + emb[0])
    from β = 0 — at that point p = ½ exactly, so the step is
    β₁ = 2·(X'X)⁻¹X'(2y−1) on exact integer moments: x quantized to
    micro-units, the 2×2 solve done in closed form as one final double
    expression. The from-scratch GLM training step as relational
    algebra; the full optimizer is this step iterated."""
    e = tables.embeddings(spark, sf_dir)
    pts = e.select(
        F.expr("TRY_CAST(round(emb[0] * 1000000, 0) AS BIGINT)").alias("xq"),
        (col("label") >= 5).cast("long").alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("xq").alias("u"),
        F.sum(col("xq") * col("xq")).alias("v"),
        F.sum("y").alias("sy"),
        F.sum(col("xq") * col("y")).alias("sxy"),
    )
    # a = 2Σy − n, b = 2Σxy − Σx; β = 2/det · [v·a − u·b, n·b − u·a]
    return m.select(
        "n",
        F.expr(
            "round(try_divide(CAST(2 * (v * (2 * sy - n) - u * (2 * sxy - u)) "
            "AS DOUBLE), n * v - u * u), 6)"
        ).alias("beta0"),
        F.expr(
            "round(try_divide(CAST(2 * (n * (2 * sxy - u) - u * (2 * sy - n)) "
            "AS DOUBLE), n * v - u * u) * 1000000, 6)"
        ).alias("beta1"),
    )


def _q_drawdown(spark, sf_dir):
    """Running peak and drawdown of the cumulative purchase-revenue curve
    (the financial risk statistic applied to the event stream): cumsum in
    exact cents over the (ts, event_id) total order, peak = running max,
    drawdown = peak − current. Two frames over one global sort — at scale
    the same windows partition by portfolio/user key."""
    ev = tables.table(spark, sf_dir, "events").filter(
        col("event_type") == "purchase"
    )
    sign = F.when(col("event_id") % 2 == 0, 1).otherwise(-1)
    pts = ev.select(
        "event_id", "ts_us", (cents(col("value")) * sign).alias("delta_c")
    )
    # two chained prefix scans (plans/prefix.py): running balance, then
    # running peak OF the balance — no single-partition window over the
    # event stream (the r1 docstring deferred this to "partition by
    # portfolio key at scale"; now the global form scales too).
    order = ["ts_us", "event_id"]
    cum = prefix.attach_running(pts, order, sums={"delta_c": "cum_c"})
    r = prefix.attach_running(cum, order, maxs={"cum_c": "peak_c"})
    return r.select(
        "event_id",
        "cum_c",
        "peak_c",
        (col("peak_c") - col("cum_c")).alias("drawdown_c"),
    )


def _q_kcore_peel(spark, sf_dir):
    """Two unrolled k-core peeling rounds (k=3) over the mutual-kNN
    graph: drop nodes with degree < 3, recompute degrees on the induced
    subgraph, drop again — the bounded-round core decomposition (full
    k-core = iterate to fixpoint; the non-converged state is
    deterministic and graded). Each round is one groupBy + two
    anti-joins, all shuffling on node ids."""
    from .knn import _q_mutual

    # The edge list (≪ the kNN pair space that derives it) feeds five
    # downstream degree/induced-subgraph computations — materialize it
    # once instead of re-running the kNN self-join per consumer.
    m = _q_mutual(spark, sf_dir).localCheckpoint(eager=True)

    def degrees(edges):
        sym = edges.select(col("a").alias("node")).unionByName(
            edges.select(col("b").alias("node"))
        )
        return sym.groupBy("node").agg(F.count("*").alias("deg"))

    d0 = degrees(m)
    rm1 = d0.filter(col("deg") < 3).select("node")
    e1 = m.join(rm1.withColumnRenamed("node", "a"), "a", "left_anti").join(
        rm1.withColumnRenamed("node", "b"), "b", "left_anti"
    )
    d1 = degrees(e1)
    rm2 = d1.filter(col("deg") < 3).select("node")
    e2 = e1.join(rm2.withColumnRenamed("node", "a"), "a", "left_anti").join(
        rm2.withColumnRenamed("node", "b"), "b", "left_anti"
    )
    d2 = degrees(e2)
    return (
        d2.join(d0.select("node", col("deg").alias("deg0")), "node")
        .select("node", "deg0", col("deg").alias("deg_after_peel2"))
    )


def _q_sax_symbols(spark, sf_dir):
    """SAX symbolic discretization of the hourly event-count series:
    global z-score against the series mean/sd (exact integer moments, one
    double expression), then the 4-letter alphabet at the standard normal
    quartile breakpoints ±0.6745 — the time-series indexing/motif
    alphabet. Identical expression trees on both engines decide the
    letter on identical doubles."""
    series = _hourly_series(spark, sf_dir)
    g = series.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(col("c") * col("c")).alias("ss"),
    )
    # try_divide twice: a CONSTANT series has sd = 0 and a 1-point
    # series has n-1 = 0 — plain / crashes the job under Spark 4's
    # default ANSI mode, while DuckDB's x/0.0 yields NULL, every CASE
    # branch compares NULL, and the ELSE assigns 'd'. try_divide
    # reproduces exactly that (NULL z → 'd'), is bit-identical to / on
    # every non-degenerate series (golden digests unchanged), and keeps
    # the engines twin-consistent (r09 degenerate-fixture sweep). The
    # sqrt argument cannot go negative by float cancellation: c is
    # integer-backed, so ss−s²/n is exact at fixture scales.
    z = (
        "try_divide(c - CAST(s AS DOUBLE) / n, "
        "sqrt(try_divide(ss - CAST(s AS DOUBLE) * s / n, n - 1)))"
    )
    return series.crossJoin(F.broadcast(g)).select(
        "h",
        "c",
        F.expr(
            f"CASE WHEN {z} < -0.6745 THEN 'a' WHEN {z} < 0 THEN 'b' "
            f"WHEN {z} < 0.6745 THEN 'c' ELSE 'd' END"
        ).alias("sym"),
    )


def _q_shingle_containment(spark, sf_dir):
    """Asymmetric near-dup containment (|A∩B|/|A| vs /|B|) for same-lang
    shingle pairs with ≥5 shared shingles — catches subset/quotation
    relations that symmetric Jaccard under-scores. Pair candidates come
    from the shared-shingle equi-join (never all-pairs); counts are exact
    integers."""
    from .llm import _shingles

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(col("doc_id").alias("doc_a"), col("lang").alias("lang_a"), "s")
    b = sh.select(col("doc_id").alias("doc_b"), col("lang").alias("lang_b"), "s")
    inter = (
        a.join(b, ["s"])
        .filter((col("lang_a") == col("lang_b")) & (col("doc_a") < col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
        .filter(col("i") >= 5)
    )
    return (
        inter.join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("n_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "i",
            "n_a",
            "n_b",
            F.expr("round(i / CAST(n_a AS DOUBLE), 4)").alias("contain_a"),
            F.expr("round(i / CAST(n_b AS DOUBLE), 4)").alias("contain_b"),
        )
    )


def _q_decompose(spark, sf_dir):
    """Additive seasonal-trend decomposition of the hourly series (the
    STL-lite view): seasonal = hour-of-day mean, trend = centered 25-hour
    moving average, residual = observed − seasonal − trend + grand mean
    (so components sum back to the observation). Every component is a
    ratio of exact integer window/group sums; one rounded double each."""
    series = _hourly_series(spark, sf_dir)
    hod = series.withColumn("hod", F.expr("h % 24"))
    ws = Window.partitionBy("hod")
    wt = Window.orderBy("h").rowsBetween(-12, 12)
    g = series.agg(F.count("*").alias("gn"), F.sum("c").alias("gs"))
    r = (
        hod.withColumn("s_sum", F.sum("c").over(ws))
        .withColumn("s_n", F.count("*").over(ws))
        .withColumn("t_sum", F.sum("c").over(wt))
        .withColumn("t_n", F.count("*").over(wt))
        .crossJoin(F.broadcast(g))
    )
    return r.select(
        "h",
        "c",
        F.expr("round(try_divide(CAST(s_sum AS DOUBLE), s_n), 4)").alias("seasonal"),
        F.expr("round(try_divide(CAST(t_sum AS DOUBLE), t_n), 4)").alias("trend"),
        F.expr(
            "round(c - try_divide(CAST(s_sum AS DOUBLE), s_n) "
            "- try_divide(CAST(t_sum AS DOUBLE), t_n) "
            "+ try_divide(CAST(gs AS DOUBLE), gn), 4)"
        ).alias("residual"),
    )


def _q_mcc(spark, sf_dir):
    """Matthews correlation coefficient of the kNN classifier collapsed
    to the binary task (label ≥ 5): the chance-robust single-number
    summary from the exact integer 2×2 confusion — the metric that stays
    honest under class imbalance. One double sqrt at the end."""
    from .knn import classify

    p = classify(spark, sf_dir).select(
        (col("pred_label") >= 5).cast("long").alias("yp"),
        (col("true_label") >= 5).cast("long").alias("yt"),
    )
    m = p.agg(
        F.sum(F.expr("CASE WHEN yp = 1 AND yt = 1 THEN 1 ELSE 0 END")).alias("tp"),
        F.sum(F.expr("CASE WHEN yp = 0 AND yt = 0 THEN 1 ELSE 0 END")).alias("tn"),
        F.sum(F.expr("CASE WHEN yp = 1 AND yt = 0 THEN 1 ELSE 0 END")).alias("fp"),
        F.sum(F.expr("CASE WHEN yp = 0 AND yt = 1 THEN 1 ELSE 0 END")).alias("fn"),
    )
    return m.select(
        "tp",
        "tn",
        "fp",
        "fn",
        F.expr(
            "round(try_divide(CAST(tp * tn - fp * fn AS DOUBLE), "
            "sqrt(CAST((tp + fp) AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn))), 4)"
        ).alias("mcc"),
    )


def _q_platt_1step(spark, sf_dir):
    """One IRLS step of Platt scaling from β = 0: logistic calibration of
    the kNN vote count (1..k) against correctness — the
    confidence-calibration fit over ml_calibration_knn's raw table.
    Votes are small exact integers, so every moment is exact; the 2×2
    solve is one closed-form double expression (same algebra as
    ml_logreg_irls1, applied to a model's own outputs)."""
    from .knn import K_DEFAULT, knn_test_topk, majority_vote

    pred = majority_vote(knn_test_topk(spark, sf_dir, K_DEFAULT))
    pts = pred.select(col("votes").alias("xq"), col("correct").cast("long").alias("y"))
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("xq").alias("u"),
        F.sum(col("xq") * col("xq")).alias("v"),
        F.sum("y").alias("sy"),
        F.sum(col("xq") * col("y")).alias("sxy"),
    )
    return m.select(
        "n",
        F.expr(
            "round(try_divide(CAST(2 * (v * (2 * sy - n) - u * (2 * sxy - u)) "
            "AS DOUBLE), n * v - u * u), 6)"
        ).alias("beta0"),
        F.expr(
            "round(try_divide(CAST(2 * (n * (2 * sxy - u) - u * (2 * sy - n)) "
            "AS DOUBLE), n * v - u * u), 6)"
        ).alias("beta1_per_vote"),
    )


def _q_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau statistic Q = n(n+2)·Σ r²ₖ/(n−k) over lags
    1..10 of the hourly series — the is-this-white-noise test that
    validates a residual series. The r²ₖ/(n−k) terms quantize to integer
    pico-units before the cross-lag sum (10 doubles summed in
    nondeterministic order otherwise); ACF moments are the exact integer
    sums of ts_autocorr."""
    series = _hourly_series(spark, sf_dir)
    ks = spark.range(1, 11).select(col("id").alias("k"))
    a = series.select(col("h").alias("ht"), col("c").alias("ct"))
    b = series.select(col("h").alias("hl"), col("c").alias("cl"))
    pairs = a.crossJoin(F.broadcast(ks)).join(b, col("ht") - col("k") == col("hl"))
    lagagg = pairs.groupBy("k").agg(
        F.count("*").alias("nk"),
        F.sum(col("ct") * col("cl")).alias("p"),
        F.sum("ct").alias("ak"),
        F.sum("cl").alias("bk"),
    )
    g = series.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(col("c") * col("c")).alias("ss"),
    )
    terms = (
        lagagg.crossJoin(F.broadcast(g))
        .withColumn("m", F.expr("s1 / n"))
        .withColumn(
            "r", F.expr("(p - m * (ak + bk) + nk * m * m) / (ss - n * m * m)")
        )
        .select(
            "n",
            F.expr("TRY_CAST(round(r * r / (n - k) * 1000000000000, 0) AS BIGINT)").alias(
                "tq"
            ),
        )
    )
    return terms.groupBy("n").agg(F.sum("tq").alias("s")).select(
        col("n").alias("n_hours"),
        lit(10).alias("lags"),
        F.expr("round(n * (n + 2) * (s / CAST(1000000000000 AS DOUBLE)), 4)").alias("q_stat"),
    )


def _q_peak_detect(spark, sf_dir):
    """Local-peak detection on the hourly series: strictly above both
    neighbors AND more than one global standard deviation above the
    mean — the alerting primitive over any rollup. Neighbor tests are
    integer comparisons; the z threshold is one identical double
    expression on both engines."""
    series = _hourly_series(spark, sf_dir)
    w = Window.orderBy("h")
    g = series.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(col("c") * col("c")).alias("ss"),
    )
    nb = series.withColumn("cp", F.lag("c").over(w)).withColumn(
        "cn", F.lead("c").over(w)
    )
    # try_divide for the same degenerate-series reasons as
    # _q_sax_symbols above: a NULL z fails the > 1.0 filter on both
    # engines instead of crashing Spark under ANSI.
    z = (
        "try_divide(c - CAST(s AS DOUBLE) / n, "
        "sqrt(try_divide(ss - CAST(s AS DOUBLE) * s / n, n - 1)))"
    )
    return (
        nb.crossJoin(F.broadcast(g))
        .filter(
            col("cp").isNotNull()
            & col("cn").isNotNull()
            & (col("c") > col("cp"))
            & (col("c") > col("cn"))
            & F.expr(f"{z} > 1.0")
        )
        .select("h", "c", F.expr(f"round({z}, 4)").alias("z"))
    )


def _q_variant_fn(spark, sf_dir):
    """Spark 4 VARIANT surface: parse the JSON props column once into a
    typed variant, then typed extraction and arithmetic on it (⟷ DuckDB
    JSON extraction) — the semi-structured fast path that replaces
    repeated string parsing of the same column."""
    ev = tables.table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("CAST(variant_get(parse_json(props), '$.k') AS INT)").alias("k_int"),
        F.expr("CAST(variant_get(parse_json(props), '$.k') AS STRING)").alias("k_str"),
        F.expr(
            "CAST(variant_get(parse_json(props), '$.k') AS INT) * "
            "CAST(variant_get(parse_json(props), '$.k') AS INT)"
        ).alias("k_sq"),
    )


def _q_degree_gini(spark, sf_dir):
    """Gini coefficient of the kNN-graph indegree distribution — the
    single-number hubness summary (0 = every point equally cited,
    →1 = a few hub points dominate all neighbor lists). Zero-indegree
    nodes included via the left join; exact rank·count sums."""
    from .knn import K_JOIN, knn_self_join

    edges = knn_self_join(spark, sf_dir, K_JOIN).select("qid", "tid")
    nodes = tables.embeddings(spark, sf_dir).select(col("vec_id").alias("node"))
    indeg = edges.groupBy(col("tid").alias("node")).agg(F.count("*").alias("d"))
    x = nodes.join(indeg, "node", "left").select(
        "node", F.coalesce("d", lit(0)).alias("x")
    )
    # node-dimension ranks via the two-phase prefix scan — no
    # single-partition window over the node set.
    r = prefix.attach_running(x, ["x", "node"], rn="i").select("x", "i")
    g = r.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(col("i") * col("x")).alias("sx"),
    )
    return g.select(
        col("n").alias("n_nodes"),
        col("s").alias("total_edges"),
        F.expr(
            "round((2.0 * sx - (n + 1.0) * s) / (CAST(n AS DOUBLE) * s), 4)"
        ).alias("gini"),
    )


def _typed_hourly(spark, sf_dir, event_type):
    """Zero-filled hourly count series for one event type over the
    global hour spine."""
    ev = tables.table(spark, sf_dir, "events")
    hourly = (
        ev.filter(col("event_type") == event_type)
        .groupBy(F.expr("ts_us div 3600000000").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    spine = (
        ev.agg(
            F.expr("min(ts_us) div 3600000000").alias("mn"),
            F.expr("max(ts_us) div 3600000000").alias("mx"),
        )
        .select(F.explode(F.sequence(col("mn"), col("mx"))).alias("h"))
    )
    return spine.join(hourly, "h", "left").select(
        "h", F.coalesce("c", lit(0)).alias("c")
    )


def _q_cross_correlation(spark, sf_dir):
    """Cross-correlation function view→purchase at lags 0..12 hours —
    does browsing predict buying, and with what delay? Same
    exact-integer-moment expansion as ts_autocorr, applied across two
    zero-filled series: numerator from the lag equi-join, denominators
    from each series' own global moments; one double expression per
    lag."""
    x = _typed_hourly(spark, sf_dir, "view").select(
        col("h").alias("hx"), col("c").alias("cx")
    )
    y = _typed_hourly(spark, sf_dir, "purchase").select(
        col("h").alias("hy"), col("c").alias("cy")
    )
    ks = spark.range(0, 13).select(col("id").alias("k"))
    pairs = y.crossJoin(F.broadcast(ks)).join(x, col("hy") - col("k") == col("hx"))
    lagagg = pairs.groupBy("k").agg(
        F.count("*").alias("nk"),
        F.sum(col("cy") * col("cx")).alias("p"),
        F.sum("cy").alias("ay"),
        F.sum("cx").alias("bx"),
    )
    gx = x.agg(
        F.count("*").alias("n"),
        F.sum("cx").alias("sx"),
        F.sum(col("cx") * col("cx")).alias("ssx"),
    )
    gy = y.agg(F.sum("cy").alias("sy"), F.sum(col("cy") * col("cy")).alias("ssy"))
    return (
        lagagg.crossJoin(F.broadcast(gx))
        .crossJoin(F.broadcast(gy))
        .select(
            "k",
            col("nk").alias("n_pairs"),
            F.expr(
                "round(try_divide(p - (CAST(sy AS DOUBLE) / n) * bx - (CAST(sx AS DOUBLE) / n) * ay "
                "+ nk * (CAST(sy AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), "
                "sqrt(ssx - CAST(sx AS DOUBLE) * sx / n) * "
                "sqrt(ssy - CAST(sy AS DOUBLE) * sy / n)), 4)"
            ).alias("ccf"),
        )
    )


def _q_variance_time(spark, sf_dir):
    """Variance-time curve: sample variance of w-hour block sums for
    w ∈ {1,2,4,8,16,32} (complete blocks only) — the long-range-
    dependence / self-similarity diagnostic (slope ≈ 2H−2). One bounded
    6× fan-out of the hourly series; block sums and moments are exact
    integers."""
    series = _hourly_series(spark, sf_dir)
    ws = spark.range(6).select(F.expr("CAST(pow(2, id) AS BIGINT)").alias("w"))
    blocks = (
        series.crossJoin(F.broadcast(ws))
        .groupBy("w", F.expr("h div w").alias("blk"))
        .agg(F.sum("c").alias("bs"), F.count("*").alias("bn"))
        .filter(col("bn") == col("w"))
    )
    m = blocks.groupBy("w").agg(
        F.count("*").alias("nb"),
        F.sum("bs").alias("s"),
        F.sum(col("bs") * col("bs")).alias("ss"),
    )
    return m.select(
        "w",
        col("nb").alias("n_blocks"),
        F.expr(
            "round(try_divide(ss - CAST(s AS DOUBLE) * s / nb, nb - 1), 4)"
        ).alias("block_var"),
    )


def _q_histogram_log(spark, sf_dir):
    """Log₁₀-scale histogram of order totals — the one-pass skewed-
    money-distribution profile (fixed decade bins need no data-driven
    bounds broadcast, unlike rel_histogram_fixed). Bin = floor(log10 of
    exact cents), an identical double expression both engines."""
    o = tables.table(spark, sf_dir, "orders")
    return (
        o.select(
            F.expr(
                f"TRY_CAST(floor(log10({_CENTS.format(x='o_totalprice')})) AS BIGINT)"
            ).alias("decade")
        )
        .groupBy("decade")
        .agg(F.count("*").alias("n"))
    )


def _q_perplexity(spark, sf_dir):
    """Held-out perplexity under a Laplace-smoothed unigram LM trained on
    the md5-bucket train split — the language-model data-quality score
    (high perplexity = out-of-distribution document). Per-token
    log-probabilities quantize to integer nano-nats before the per-doc
    sum, so PP is exact under any partitioning; the model (vocab counts)
    is an aggregate, scoring is a broadcast-model join."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select(
        "doc_id",
        (F.substring(F.md5(col("doc_id").cast("string")), 1, 2) < "cc").alias(
            "is_train"
        ),
        F.explode("ts").alias("term"),
    )
    train = toks.filter(col("is_train"))
    counts = train.groupBy("term").agg(F.count("*").alias("c"))
    tot = train.agg(F.count("*").alias("nt"))
    vocab = counts.agg(F.count("*").alias("vs"))
    held = toks.filter(~col("is_train"))
    scored = (
        held.join(counts, "term", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(
                "TRY_CAST(round(ln((coalesce(c, 0) + 1) / "
                "CAST(nt + vs + 1 AS DOUBLE)) * 1000000000, 0) AS BIGINT)"
            ).alias("lp"),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("lp").alias("s")
    )
    return per.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "round(exp(-(s / CAST(1000000000 AS DOUBLE)) / n_tokens), 4)"
        ).alias("perplexity"),
    )


def _q_ndcg(spark, sf_dir):
    """NDCG@10 of cosine similarity search against same-label relevance —
    the IR ranking-quality metric over the graded top-k pipeline. Per-
    position DCG terms (rel/log2(rank+1)) quantize to integer nano-units
    so both the per-query DCG and the corpus mean are exact; IDCG comes
    from the same query's sorted relevance counts."""
    from .knn import knn_test_topk

    # Euclidean ranking ≡ cosine ranking on the unit-norm fixture vectors.
    t = knn_test_topk(spark, sf_dir, 10)
    terms = t.select(
        "qid",
        (col("tlabel") == col("qlabel")).cast("long").alias("rel"),
        "rnk",
    )
    dcg = terms.groupBy("qid").agg(
        F.sum(
            F.expr("TRY_CAST(round(rel / log2(rnk + 1) * 1000000000, 0) AS BIGINT)")
        ).alias("dcg_n"),
        F.sum("rel").alias("n_rel"),
    )
    # ideal DCG: the same n_rel relevant docs at ranks 1..n_rel
    ideal = dcg.select(
        "qid",
        "dcg_n",
        "n_rel",
        F.expr(
            "aggregate(sequence(1, CAST(greatest(n_rel, 1) AS INT)), 0L, "
            "(acc, i) -> acc + TRY_CAST(round(1 / log2(i + 1) * 1000000000, 0) AS BIGINT))"
        ).alias("idcg_n"),
    )
    per = ideal.select(
        "qid",
        F.expr(
            "CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT) ELSE "
            "TRY_CAST(round(dcg_n / CAST(idcg_n AS DOUBLE) * 1000000000, 0) AS BIGINT) "
            "END"
        ).alias("ndcg_n"),
    )
    return per.agg(
        F.count("*").alias("nq"), F.sum("ndcg_n").alias("sn")
    ).select(
        col("nq").alias("n_queries"),
        F.expr(
            "round(CAST(sn AS DOUBLE) / (nq * CAST(1000000000 AS DOUBLE)), 4)"
        ).alias("mean_ndcg_at10"),
    )


def _q_modularity(spark, sf_dir):
    """Newman modularity Q of the label-propagation communities over the
    mutual-kNN graph — did community detection find real structure?
    Q = Σ_c [e_c/m − (D_c/2m)²] from exact integer counts (within-
    community edges, community degree sums); per-community terms
    quantize to nano units before the cross-community sum."""
    from .knn import _q_mutual

    e = tables.embeddings(spark, sf_dir)
    edges = _q_mutual(spark, sf_dir).localCheckpoint(eager=True)
    comm = label_propagation(e.select(col("vec_id").alias("id")), edges)
    mtot = edges.agg(F.count("*").alias("m"))
    ca = comm.select(col("node").alias("a"), col("community").alias("comm_a"))
    cb = comm.select(col("node").alias("b"), col("community").alias("comm_b"))
    ec = (
        edges.join(ca, "a")
        .join(cb, "b")
        .filter(col("comm_a") == col("comm_b"))
        .groupBy(col("comm_a").alias("community"))
        .agg(F.count("*").alias("ec"))
    )
    sym = edges.select(col("a").alias("node")).unionByName(
        edges.select(col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("d"))
    dc = (
        comm.join(deg, "node", "left")
        .groupBy("community")
        .agg(F.sum(F.coalesce("d", lit(0))).alias("dc"))
    )
    terms = (
        dc.join(ec, "community", "left")
        .crossJoin(F.broadcast(mtot))
        .select(
            F.expr(
                "TRY_CAST(round((coalesce(ec, 0) / CAST(m AS DOUBLE) - "
                "(dc / CAST(2 * m AS DOUBLE)) * (dc / CAST(2 * m AS DOUBLE))) "
                "* 1000000000, 0) AS BIGINT)"
            ).alias("tq")
        )
    )
    return terms.agg(F.count("*").alias("n_communities"), F.sum("tq").alias("s")).select(
        "n_communities",
        F.expr("round(s / CAST(1000000000 AS DOUBLE), 4)").alias("modularity"),
    )


def _q_hurst_rs(spark, sf_dir):
    """Rescaled-range (R/S) statistic of the hourly series at block sizes
    8/16/32/64 — the Hurst-exponent estimator (slope of ln R/S vs ln w;
    H > ½ = persistent). The cumulative deviation is scaled by w so it
    stays an exact integer (w·C_j − j·S_b); per-block R/S values quantize
    to nano units before the per-w mean."""
    series = _hourly_series(spark, sf_dir)
    ws = spark.range(3, 7).select(F.expr("CAST(pow(2, id) AS BIGINT)").alias("w"))
    fan = series.crossJoin(F.broadcast(ws)).select(
        "w",
        F.expr("h div w").alias("blk"),
        F.expr("h % w + 1").alias("j"),
        "c",
    )
    wcum = Window.partitionBy("w", "blk").orderBy("j").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("w", "blk")
    r = (
        fan.withColumn("cj", F.sum("c").over(wcum))
        .withColumn("sb", F.sum("c").over(wall))
        .withColumn("dev", col("w") * col("cj") - col("j") * col("sb"))
    )
    blocks = r.groupBy("w", "blk").agg(
        F.max("dev").alias("mx"),
        F.min("dev").alias("mn"),
        F.sum("c").alias("s"),
        F.sum(col("c") * col("c")).alias("ss"),
        F.count("*").alias("bn"),
    )
    ok = blocks.filter((col("bn") == col("w")) & (col("w") * col("ss") > col("s") * col("s")))
    q = ok.select(
        "w",
        F.expr(
            "TRY_CAST(round(((mx - mn) / CAST(w AS DOUBLE)) / "
            "sqrt((ss - CAST(s AS DOUBLE) * s / w) / w) * 1000000000, 0) AS BIGINT)"
        ).alias("rsq"),
    )
    return q.groupBy("w").agg(F.count("*").alias("n_blocks"), F.sum("rsq").alias("sq")).select(
        "w",
        "n_blocks",
        F.expr(
            "round(sq / (n_blocks * CAST(1000000000 AS DOUBLE)), 4)"
        ).alias("mean_rs"),
    )


def _q_cluster_purity_nmi(spark, sf_dir):
    """External clustering evaluation: purity and normalized mutual
    information of the k-means assignment against the true labels — the
    did-the-clusters-find-the-classes gate. Contingency counts are exact
    integers; entropy/MI terms quantize to nano-nats before their sums;
    NMI normalizes by the arithmetic mean of the marginal entropies."""
    from .iterative import _q_kmeans

    asg = _q_kmeans(spark, sf_dir)
    lab = tables.embeddings(spark, sf_dir).select("vec_id", "label")
    j = asg.join(lab, "vec_id")
    n = j.agg(F.count("*").alias("n"))
    ct = j.groupBy("cluster", "label").agg(F.count("*").alias("c"))
    purity = (
        ct.groupBy("cluster")
        .agg(F.max("c").alias("mx"))
        .agg(F.sum("mx").alias("pure"))
    )
    a = ct.groupBy("cluster").agg(F.sum("c").alias("ac"))
    b = ct.groupBy("label").agg(F.sum("c").alias("bc"))
    mi = (
        ct.join(F.broadcast(a), "cluster")
        .join(F.broadcast(b), "label")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.expr(
                    "TRY_CAST(round(c / CAST(n AS DOUBLE) * "
                    "ln(c * CAST(n AS DOUBLE) / (ac * CAST(bc AS DOUBLE))) "
                    "* 1000000000, 0) AS BIGINT)"
                )
            ).alias("mi_n")
        )
    )
    ha = a.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.expr(
                "TRY_CAST(round(-(ac / CAST(n AS DOUBLE)) * ln(ac / CAST(n AS DOUBLE)) "
                "* 1000000000, 0) AS BIGINT)"
            )
        ).alias("ha_n")
    )
    hb = b.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.expr(
                "TRY_CAST(round(-(bc / CAST(n AS DOUBLE)) * ln(bc / CAST(n AS DOUBLE)) "
                "* 1000000000, 0) AS BIGINT)"
            )
        ).alias("hb_n")
    )
    return (
        n.crossJoin(purity)
        .crossJoin(mi)
        .crossJoin(ha)
        .crossJoin(hb)
        .select(
            "n",
            F.expr("round(pure / CAST(n AS DOUBLE), 4)").alias("purity"),
            F.expr(
                "round(2 * mi_n / CAST(ha_n + hb_n AS DOUBLE), 4)"
            ).alias("nmi"),
        )
    )


def _q_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per order year — the comparative
    KPI over the lineitem fact: exact cents per year, lag() for the
    prior year, growth as one rounded ratio of exact integers."""
    li = tables.table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.year("l_shipdate").cast("long").alias("yr")).agg(
        F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
            "rev_cents"
        )
    )
    w = Window.orderBy("yr")
    return per.withColumn("prev_cents", F.lag("rev_cents").over(w)).select(
        "yr",
        "rev_cents",
        "prev_cents",
        F.expr(
            "round((rev_cents - prev_cents) * 100 / CAST(prev_cents AS DOUBLE), 4)"
        ).alias("growth_pct"),
    )


def _q_tukey_fences(spark, sf_dir):
    """Tukey-fence outlier detection on order totals: exact quartiles
    (quantile_cont parity both engines), fences at Q1/Q3 ± 1.5·IQR,
    outlier counts from comparisons against the identical fence doubles.
    The boxplot rule as one aggregate + one filtered count."""
    o = tables.table(spark, sf_dir, "orders").select(
        cents(col("o_totalprice")).alias("tc")
    )
    q = o.agg(
        F.expr("percentile(tc, 0.25)").alias("q1"),
        F.expr("percentile(tc, 0.75)").alias("q3"),
        F.count("*").alias("n"),
    )
    return o.crossJoin(F.broadcast(q)).agg(
        F.max(F.expr("round(q1, 4)")).alias("q1"),
        F.max(F.expr("round(q3, 4)")).alias("q3"),
        F.max("n").alias("n"),
        F.sum(
            F.expr("CASE WHEN tc < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END")
        ).alias("n_low"),
        F.sum(
            F.expr("CASE WHEN tc > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END")
        ).alias("n_high"),
    )


def _q_kmeans_inertia(spark, sf_dir):
    """Within-cluster inertia of the final k-means assignment (the elbow
    statistic): squared distance of every point to its centroid,
    micro-quantized before the per-cluster and total sums. Composes the
    graded Lloyd pipeline; per-cluster rows + the k value give one elbow
    point per run."""
    from .iterative import _q_kmeans, _q_kmeans_centroids

    e = tables.embeddings(spark, sf_dir)
    asg = _q_kmeans(spark, sf_dir).select("vec_id", col("cluster").alias("c"))
    cent = _q_kmeans_centroids(spark, sf_dir)
    d = (
        e.join(asg, "vec_id")
        .join(F.broadcast(cent), "c")
        .select(
            col("c").alias("cluster"),
            F.expr(
                "TRY_CAST(round(aggregate(zip_with(emb, cent, (x, y) -> (x - y) * (x - y)), "
                "0D, (acc, v) -> acc + v) * 1000000, 0) AS BIGINT)"
            ).alias("sq_u"),
        )
    )
    return d.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.expr("round(sum(sq_u) / CAST(1000000 AS DOUBLE), 4)").alias("inertia"),
    )


def _q_lang_confusion(spark, sf_dir):
    """Confusion matrix of the n-gram language identifier against the
    true lang column — which languages the marker heuristic confuses.
    Completes the llm_lang_id eval the way knn_confusion completes the
    classifier."""
    from .llm import QUERIES as _LLM_Q

    pred = _LLM_Q["llm_lang_id"](spark, sf_dir)
    docs = tables.table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        pred.join(docs, "doc_id")
        .groupBy(col("lang").alias("true_lang"), col("pred_lang"))
        .agg(F.count("*").alias("n"))
    )


def _q_learning_curve(spark, sf_dir):
    """kNN learning curve: test accuracy when the train side is
    restricted to ~25/50/75/100% md5 buckets of the corpus — the
    sample-efficiency read a data-buying decision needs. All four
    fractions share ONE distance computation (the knn_crossval
    amortization trick); nested buckets mean each fraction is a superset
    of the previous."""
    from .knn import K_DEFAULT, _pairs

    pairs = _pairs(spark, sf_dir).withColumn(
        "bkt", F.substring(F.md5(col("tid").cast("string")), 1, 2)
    )
    fr = spark.createDataFrame(
        [(25, "40"), (50, "80"), (75, "c0"), (100, "zz")], "frac int, thr string"
    )
    fan = pairs.crossJoin(F.broadcast(fr)).filter(col("bkt") < col("thr"))
    w = Window.partitionBy("frac", "qid").orderBy(F.asc_nulls_last("dist"), "tid")
    top = fan.withColumn("rnk", F.row_number().over(w)).filter(
        col("rnk") <= K_DEFAULT
    )
    votes = top.groupBy("frac", "qid", "qlabel", "tlabel").agg(
        F.count("*").alias("v")
    )
    wv = Window.partitionBy("frac", "qid").orderBy(F.desc("v"), "tlabel")
    pred = votes.withColumn("vr", F.row_number().over(wv)).filter(col("vr") == 1)
    return pred.groupBy("frac").agg(
        F.count("*").alias("n_queries"),
        F.sum((col("tlabel") == col("qlabel")).cast("long")).alias("n_correct"),
        F.expr(
            "round(sum(CAST(tlabel = qlabel AS INT)) / CAST(count(*) AS DOUBLE), 4)"
        ).alias("accuracy"),
    )


def _q_fk_integrity(spark, sf_dir):
    """Referential-integrity audit across every fixture foreign key:
    anti-join orphan counts plus referenced-row totals, one row per FK
    edge — the data-quality gate a warehouse load runs before publishing.
    Each edge is one anti-join on its key (broadcast for dimension
    parents); a healthy catalog reads all zeros."""
    li = tables.table(spark, sf_dir, "lineitem")
    orders = tables.table(spark, sf_dir, "orders")
    cust = tables.table(spark, sf_dir, "customer")
    supp = tables.table(spark, sf_dir, "supplier")
    part = tables.table(spark, sf_dir, "part")
    nation = tables.table(spark, sf_dir, "nation")
    region = tables.table(spark, sf_dir, "region")
    edges = [
        ("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"),
        ("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        ("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
        ("supplier.s_nationkey->nation", supp, "s_nationkey", nation, "n_nationkey"),
        ("nation.n_regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        orphans = child.join(
            F.broadcast(parent.select(col(pk).alias(ck)).distinct()), ck, "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        rows = child.agg(F.count("*").alias("n_child"))
        one = (
            rows.crossJoin(orphans)
            .select(lit(name).alias("fk"), "n_child", "n_orphans")
        )
        out = one if out is None else out.unionByName(one)
    return out


def _q_user_temporal_entropy(spark, sf_dir):
    """Per-user temporal regularity: Shannon entropy of each user's
    hour-of-day activity distribution (0 = always the same hour,
    ln 24 ≈ 3.178 = uniformly spread) — the behavioral-fingerprint /
    bot-signal feature. Exact integer (user, hod) counts; entropy terms
    quantize to nano-nats per user before the sum."""
    ev = tables.table(spark, sf_dir, "events")
    per = ev.groupBy(
        "user_id", F.expr("(ts_us div 3600000000) % 24").alias("hod")
    ).agg(F.count("*").alias("c"))
    tot = per.groupBy("user_id").agg(F.sum("c").alias("tu"))
    return (
        per.join(tot, "user_id")
        .select(
            "user_id",
            "tu",
            F.expr(
                "TRY_CAST(round(-(c / CAST(tu AS DOUBLE)) * ln(c / CAST(tu AS DOUBLE)) "
                "* 1000000000, 0) AS BIGINT)"
            ).alias("hq"),
        )
        .groupBy("user_id")
        .agg(
            F.max("tu").alias("n_events"),
            F.expr(
                "round(sum(hq) / CAST(1000000000 AS DOUBLE), 4)"
            ).alias("entropy_nats"),
        )
    )


def _q_ivf_recall(spark, sf_dir):
    """Recall@10 of IVF approximate search with n_probe = 2 against the
    exact top-10 — the accuracy-vs-cost curve point that justifies the
    pruned index. Fully deterministic (coarse centroids come from the
    graded Lloyd run; probes and ranks are total-ordered), so the recall
    itself is hash-graded: the rare honest evaluation of an ANN index
    that two engines can agree on bit-for-bit."""
    from .iterative import _q_kmeans, _q_kmeans_centroids
    from .knn import knn_test_topk

    e = tables.embeddings(spark, sf_dir)
    asg = _q_kmeans(spark, sf_dir).select("vec_id", col("cluster").alias("c"))
    cent = _q_kmeans_centroids(spark, sf_dir)
    test = e.filter(col("vec_id") % 5 == 0).select(
        col("vec_id").alias("qid"), col("emb").alias("qemb")
    )
    # probe the 2 nearest coarse cells per query (rounded dist, tie → c)
    qc = test.crossJoin(F.broadcast(cent)).select(
        "qid",
        "c",
        F.round(
            F.expr(
                "aggregate(zip_with(qemb, cent, (x, y) -> (x - y) * (x - y)), "
                "0D, (acc, v) -> acc + v)"
            ),
            4,
        ).alias("cd"),
    )
    wq = Window.partitionBy("qid").orderBy(F.asc_nulls_last("cd"), "c")
    probes = qc.withColumn("pr", F.row_number().over(wq)).filter(col("pr") <= 2)
    # candidates = train points in probed cells (self excluded).
    # r12 (guide §3.1/§2.2, plans/r12/ml_ivf_recall_at10_before.txt):
    # joined on `c` — a key with only KMEANS_K distinct values — this
    # planned as a SortMergeJoin whose exchanges hash both sides into
    # ≤k usable partitions, so the ~320 k-pair euclidean fold below
    # inherited a near-serial layout. The probes side is 2 rows per
    # query (bounded, ~800 at sf0.1): broadcast it, and spread the
    # assignment stream across the session parallelism so the fold
    # fans out. Same rows, same dist values — plan shape only.
    cand = (
        asg.select(col("vec_id").alias("tid"), "c")
        .repartition(spark.sparkContext.defaultParallelism)
        .join(F.broadcast(probes.select("qid", "c")), "c")
        .filter(col("qid") != col("tid"))
    )
    tq = test.select("qid", "qemb")
    scored = (
        cand.join(F.broadcast(tq), "qid")
        .join(e.select(col("vec_id").alias("tid"), col("emb").alias("temb")), "tid")
        .select(
            "qid",
            "tid",
            F.round(
                F.expr(
                    "sqrt(aggregate(zip_with(qemb, temb, (x, y) -> (x - y) * (x - y)), "
                    "0D, (acc, v) -> acc + v))"
                ),
                4,
            ).alias("dist"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.asc_nulls_last("dist"), "tid")
    approx = scored.withColumn("rnk", F.row_number().over(wr)).filter(
        col("rnk") <= 10
    )
    exact = knn_test_topk(spark, sf_dir, 10).select("qid", "tid")
    # r12: the exact top-10 is n_test·10 skinny rows (4 k at sf0.1) —
    # broadcast the semi-join probe side instead of sort-merging two
    # exchanges (guide §3.1).
    hits = approx.select("qid", "tid").join(
        F.broadcast(exact), ["qid", "tid"], "left_semi"
    )
    per = (
        exact.groupBy("qid")
        .agg(F.count("*").alias("n_exact"))
        .join(hits.groupBy("qid").agg(F.count("*").alias("n_hit")), "qid", "left")
        .select("qid", F.coalesce("n_hit", lit(0)).alias("n_hit"), "n_exact")
    )
    return per.agg(
        F.count("*").alias("n_queries"),
        F.sum("n_hit").alias("hits"),
        F.sum("n_exact").alias("truths"),
        F.expr("round(sum(n_hit) / CAST(sum(n_exact) AS DOUBLE), 4)").alias(
            "recall_at10"
        ),
    )


def _q_lag_features(spark, sf_dir):
    """Forecasting feature matrix over the hourly series: lag-1, lag-24,
    trailing-24h mean/max, and first difference — the windowed feature
    generator every supervised time-series model trains on. One sort
    per partition key (global here, per-entity at scale); trailing mean
    is a ratio of exact integer window sums."""
    series = _hourly_series(spark, sf_dir)
    w = Window.orderBy("h")
    w24 = Window.orderBy("h").rowsBetween(-24, -1)
    return series.select(
        "h",
        "c",
        F.lag("c", 1).over(w).alias("lag_1"),
        F.lag("c", 24).over(w).alias("lag_24"),
        (col("c") - F.lag("c", 1).over(w)).alias("diff_1"),
        F.expr(
            "round(sum(c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 "
            "PRECEDING) / CAST(count(c) OVER (ORDER BY h ROWS BETWEEN 24 "
            "PRECEDING AND 1 PRECEDING) AS DOUBLE), 4)"
        ).alias("mean_24"),
        F.max("c").over(w24).alias("max_24"),
    )


def _q_embed_outliers(spark, sf_dir):
    """Embedding-space outlier score per document: distance to the
    corpus centroid, z-scored against the distance distribution — the
    filter that catches off-manifold documents before training. Centroid
    components round to 6dp (both engines weight identical doubles);
    distances round to 4dp and quantize to integer units for the moment
    sums, so the z-scores are partitioning-exact."""
    e = tables.embeddings(spark, sf_dir)
    cent = (
        e.select(F.posexplode("emb").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.transform("pm", lambda s: s["m"]).alias("cvec"))
    )
    d = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.expr(
            "TRY_CAST(round(sqrt(aggregate(zip_with(emb, cvec, (x, y) -> (x - y) * (x - y)), "
            "0D, (acc, v) -> acc + v)) * 10000, 0) AS BIGINT)"
        ).alias("dq"),
    )
    g = d.agg(
        F.count("*").alias("n"),
        F.sum("dq").alias("s"),
        F.sum(col("dq") * col("dq")).alias("ss"),
    )
    return d.crossJoin(F.broadcast(g)).select(
        "vec_id",
        F.expr("round(dq / CAST(10000 AS DOUBLE), 4)").alias("dist_centroid"),
        F.expr(
            "round(try_divide(dq - CAST(s AS DOUBLE) / n, "
            "sqrt(try_divide(ss - CAST(s AS DOUBLE) * s / n, n - 1))), 4)"
        ).alias("z"),
    )


def _q_reciprocity(spark, sf_dir):
    """Reciprocity of the directed kNN graph: the fraction of (q → t)
    edges whose reverse edge also exists — how symmetric "nearest" is in
    this embedding space (low reciprocity = hub-dominated asymmetry).
    One self-join of the edge list on the reversed key pair."""
    from .knn import K_JOIN, knn_self_join

    edges = knn_self_join(spark, sf_dir, K_JOIN).select("qid", "tid")
    rev = edges.select(col("tid").alias("qid"), col("qid").alias("tid"))
    mutual = edges.join(rev, ["qid", "tid"], "left_semi")
    n = edges.agg(F.count("*").alias("n_edges"))
    m = mutual.agg(F.count("*").alias("n_mutual"))
    return n.crossJoin(m).select(
        "n_edges",
        "n_mutual",
        F.expr("round(n_mutual / CAST(n_edges AS DOUBLE), 4)").alias("reciprocity"),
    )


def _q_hash_uniformity(spark, sf_dir):
    """χ² uniformity audit of the md5 bucket function the engine's
    deterministic splits ride on (rel_sample, llm_split_stratified,
    ml_learning_curve): doc_id buckets into 256 cells, χ² against the
    uniform expectation — the split-quality gate. Exact integer counts;
    χ² terms exact under cross-multiplication by 256."""
    docs = tables.table(spark, sf_dir, "documents")
    b = docs.select(
        F.substring(F.md5(col("doc_id").cast("string")), 1, 2).alias("bkt")
    )
    per = b.groupBy("bkt").agg(F.count("*").alias("c"))
    n = docs.agg(F.count("*").alias("n"))
    # chi2 = sum (c - n/256)^2 / (n/256) = (256 * sum(c^2) - n^2) / n
    agg = per.agg(
        F.count("*").alias("n_buckets_hit"), F.sum(col("c") * col("c")).alias("ssq")
    )
    return agg.crossJoin(F.broadcast(n)).select(
        "n_buckets_hit",
        col("n").alias("n_rows"),
        F.expr(
            "round((256 * ssq - CAST(n AS DOUBLE) * n) / n, 4)"
        ).alias("chi2_255df"),
    )


def _q_bigram_crossentropy(spark, sf_dir):
    """Held-out cross-entropy (nats/token) of a Laplace-smoothed bigram
    LM trained on the md5-bucket split — the conditional companion to
    llm_perplexity_unigram (how much does one token of context help).
    Bigram and unigram-context counts are exact integers; per-token log
    terms quantize to nano-nats; V = distinct train vocabulary."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select(
        "doc_id",
        (F.substring(F.md5(col("doc_id").cast("string")), 1, 2) < "cc").alias(
            "is_train"
        ),
        "ts",
    )
    # size >= 2 BEFORE the bigram transform: a single-token doc makes
    # sequence(1, size-1) = sequence(1, 0), which Spark evaluates
    # DESCENDING (step -1) — element_at(ts, 0) then crashes the job
    # under ANSI (INVALID_ARRAY_INDEX) where the oracle's pair
    # generation simply emits nothing (r09 degenerate-fixture sweep).
    # Same guard as _q_ngram_novelty; no fixture doc is that short, so
    # graded values are unchanged.
    big = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        "is_train",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "j -> struct(element_at(ts, j) AS w1, element_at(ts, j + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "is_train", col("bg.w1").alias("w1"), col("bg.w2").alias("w2"))
    train = big.filter(col("is_train"))
    c12 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = train.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = toks.filter(col("is_train")).select(F.explode("ts").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    held = big.filter(~col("is_train"))
    scored = (
        held.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.expr(
                "TRY_CAST(round(-ln((coalesce(c12, 0) + 1) / "
                "CAST(coalesce(c1, 0) + v AS DOUBLE)) * 1000000000, 0) AS BIGINT)"
            ).alias("nl")
        )
    )
    return scored.agg(F.count("*").alias("n_bigrams"), F.sum("nl").alias("s")).select(
        "n_bigrams",
        F.expr(
            "round(s / (n_bigrams * CAST(1000000000 AS DOUBLE)), 4)"
        ).alias("cross_entropy_nats"),
    )


def _q_skyline(spark, sf_dir):
    """Skyline (Pareto-frontier) operator over parts: rows where no other
    part is both cheaper and larger — the classic multi-criteria
    dominance query. Expressed as an anti-join against dominators; at
    scale the anti-join keys on coarse grid cells so candidates shrink
    before the pairwise test (here the dominance test is the plain
    decorrelated NOT EXISTS both engines run identically)."""
    part = tables.table(spark, sf_dir, "part").select(
        "p_partkey", cents(col("p_retailprice")).alias("price_c"), "p_size"
    )
    dom = part.select(
        col("price_c").alias("d_price"), col("p_size").alias("d_size")
    )
    return part.join(
        dom,
        (col("d_price") <= col("price_c"))
        & (col("d_size") >= col("p_size"))
        & ((col("d_price") < col("price_c")) | (col("d_size") > col("p_size"))),
        "left_anti",
    ).select("p_partkey", "price_c", "p_size")


def _q_conformal_knn(spark, sf_dir):
    """Split-conformal prediction interval for kNN regression: absolute
    residuals on the md5-bucket calibration half of the test split give
    the 90th-percentile conformal radius q̂; the other half reports
    empirical coverage of pred ± q̂ — the distribution-free uncertainty
    wrapper around the graded regressor. Residuals are exact integer
    micro-units; the quantile index is ⌈0.9(n+1)⌉ by rank (no
    interpolation), so q̂ is a single exact value both engines pick
    identically."""
    from .knn import K_DEFAULT, knn_test_topk

    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    pred = t.groupBy("qid", "qlabel").agg(
        F.expr(
            "TRY_CAST(round(avg(CAST(tlabel AS DOUBLE)) * 1000000, 0) AS BIGINT)"
        ).alias("pred_u")
    )
    scored = pred.select(
        "qid",
        (F.substring(F.md5(col("qid").cast("string")), 1, 2) < "80").alias("is_cal"),
        F.expr("abs(qlabel * 1000000 - pred_u)").alias("res_u"),
    )
    cal = scored.filter(col("is_cal"))
    ncal = cal.agg(F.count("*").alias("nc"))
    # calibration-quantile pick via the two-phase prefix scan — no
    # single-partition rank over the calibration set.
    qhat = (
        prefix.attach_running(cal, ["res_u", "qid"], rn="r")
        .crossJoin(F.broadcast(ncal))
        .filter(col("r") == F.expr("CAST(ceil(0.9 * (nc + 1)) AS BIGINT)"))
        .select(col("res_u").alias("qhat_u"))
    )
    test = scored.filter(~col("is_cal"))
    return (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.count("*").alias("n_test"),
            F.max(F.expr("round(qhat_u / CAST(1000000 AS DOUBLE), 4)")).alias(
                "qhat"
            ),
            F.sum(F.expr("CASE WHEN res_u <= qhat_u THEN 1 ELSE 0 END")).alias(
                "n_covered"
            ),
        )
        .select(
            "n_test",
            "qhat",
            "n_covered",
            F.expr("round(n_covered / CAST(n_test AS DOUBLE), 4)").alias(
                "coverage"
            ),
        )
    )


def _q_boilerplate_prefix(spark, sf_dir):
    """Boilerplate detection by shared document prefixes: groups of docs
    opening with the same first-3-token template — the cheap
    header/footer screen that runs before MinHash. One groupBy on the
    prefix; exact counts, min doc as the exemplar."""
    from .llm import _tokens

    t = _tokens(spark, sf_dir)
    pre = t.filter(F.size("ts") >= 3).select(
        "doc_id",
        F.concat_ws(" ", F.expr("slice(ts, 1, 3)")).alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("exemplar_doc"))
        .filter(col("n_docs") > 1)
    )


def _q_edit_distance_pairs(spark, sf_dir):
    """Edit-distance verification of MinHash near-dup candidates:
    Levenshtein over the first 80 characters of each candidate pair
    (bounded cost per pair), plus the normalized similarity — the
    character-level second opinion after shingle-level screening.
    Candidates come from the graded MinHash band join, so the pair space
    is already pruned."""
    from .llm import _q_dedup_near_minhash

    cand = _q_dedup_near_minhash(spark, sf_dir).select("doc_a", "doc_b")
    docs = tables.table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("t80")
    )
    return (
        cand.join(docs.select(col("doc_id").alias("doc_a"), col("t80").alias("ta")), "doc_a")
        .join(docs.select(col("doc_id").alias("doc_b"), col("t80").alias("tb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("edit_dist"),
            F.expr(
                "round(1 - levenshtein(ta, tb) / "
                "CAST(greatest(length(ta), length(tb)) AS DOUBLE), 4)"
            ).alias("sim_ratio"),
        )
    )


def _q_merge_intervals(spark, sf_dir):
    """Merge overlapping intervals (each purchase opens a 5-minute
    window): the classic stack algorithm made window-parallel — a new
    merged group starts where start > max(previous ends), group id =
    running sum of those breaks. Output: merged busy periods with exact
    µs bounds and member counts. One sort; at scale partition by the
    entity key."""
    ev = tables.table(spark, sf_dir, "events").filter(
        col("event_type") == "purchase"
    )
    iv = ev.select(
        col("ts_us").alias("s"),
        (col("ts_us") + lit(300_000_000)).alias("e"),
        "event_id",
    )
    # sweep line as two chained prefix scans (plans/prefix.py): the
    # exclusive running max of interval ends marks the breaks, the
    # inclusive running sum of breaks numbers the groups — the global
    # windows the r1 version used are gone.
    order = ["s", "event_id"]
    pm = prefix.attach_running(iv, order, maxs_excl={"e": "prev_e"})
    marked = prefix.attach_running(
        pm.withColumn(
            "brk", F.when(col("s") > col("prev_e"), 1).otherwise(0)
        ),
        order,
        sums={"brk": "grp"},
    )
    return marked.groupBy("grp").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count("*").alias("n_intervals"),
    )


def _q_backtest_snaive(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict every hour of the final
    7 days with the value 24 hours earlier, report MAE / RMSE / bias —
    the baseline every forecasting model must beat, with the error
    arithmetic exact (integer counts; squared errors summed as
    integers)."""
    series = _hourly_series(spark, sf_dir)
    w = Window.orderBy("h")
    horizon = series.agg(F.max("h").alias("mx"))
    r = (
        series.withColumn("pred", F.lag("c", 24).over(w))
        .crossJoin(F.broadcast(horizon))
        .filter(col("pred").isNotNull() & (col("h") > col("mx") - 168))
    )
    return r.agg(
        F.count("*").alias("n_hours"),
        F.expr("round(sum(abs(c - pred)) / CAST(count(*) AS DOUBLE), 4)").alias(
            "mae"
        ),
        F.expr(
            "round(sqrt(sum((c - pred) * (c - pred)) / CAST(count(*) AS DOUBLE)), 4)"
        ).alias("rmse"),
        F.expr("round(sum(c - pred) / CAST(count(*) AS DOUBLE), 4)").alias("bias"),
    )


def _q_pattern_match_seq(spark, sf_dir):
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): encode
    each user's time-ordered event types as a letter string, then count
    users whose journey matches signup → purchase with no intervening
    error ('s[^e]*p') vs those derailed by an error. Ordered string_agg
    + one regex — the sequence-motif query without a self-join
    explosion."""
    ev = tables.table(spark, sf_dir, "events")
    lett = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.expr("substring(event_type, 1, 1)").alias("l"),
    )
    seq = (
        lett.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.expr(
                    "transform(array_sort(collect_list(struct(ts_us, event_id, l))), "
                    "x -> x.l)"
                ),
            ).alias("journey")
        )
    )
    return seq.agg(
        F.count("*").alias("n_users"),
        F.sum(F.expr("CAST(journey RLIKE 's[^e]*p' AS INT)")).alias(
            "clean_converters"
        ),
        F.sum(F.expr("CAST(journey RLIKE 's.*p' AS INT)")).alias(
            "any_converters"
        ),
        F.sum(F.expr("CAST(journey RLIKE 'e' AS INT)")).alias("saw_error"),
    )


def _q_rle_sax(spark, sf_dir):
    """Run-length encoding of the SAX symbol sequence — the compressed
    motif view of the series (long 'a' runs = sustained quiet, 'd' runs
    = sustained bursts). RLE by the islands trick: run id = row_number
    minus per-symbol row_number; exact integers throughout."""
    sax = _q_sax_symbols(spark, sf_dir)
    w = Window.orderBy("h")
    ws = Window.partitionBy("sym").orderBy("h")
    runs = sax.withColumn(
        "grp", F.row_number().over(w) - F.row_number().over(ws)
    )
    return runs.groupBy("sym", "grp").agg(
        F.min("h").alias("start_h"),
        F.count("*").alias("run_len"),
    ).select("sym", "start_h", "run_len")


def _q_class_weights(spark, sf_dir):
    """Inverse-frequency class weights w_c = n/(k·n_c) (sklearn's
    'balanced' convention) for the embedding labels — the imbalance
    correction a loss function consumes. Exact integer counts; one
    rounded double per class."""
    e = tables.embeddings(spark, sf_dir)
    per = e.groupBy("label").agg(F.count("*").alias("n_c"))
    tot = e.agg(F.count("*").alias("n"))
    k = per.agg(F.count("*").alias("k"))
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(k))
        .select(
            "label",
            "n_c",
            F.expr("round(n / (k * CAST(n_c AS DOUBLE)), 4)").alias("weight"),
        )
    )


def _q_season_strength(spark, sf_dir):
    """Strength of seasonality F_s = max(0, 1 − var(residual)/var(series))
    with residual = series − hour-of-day means — one number saying how
    much of the series the daily cycle explains (the Hyndman
    feature-based strength, trend term omitted for the stationary
    fixture). Component sums quantize to milli units (overflow-safe at any
    fixture scale) so both variances are exact-integer-backed."""
    series = _hourly_series(spark, sf_dir)
    hod = series.withColumn("hod", F.expr("h % 24"))
    ws = Window.partitionBy("hod")
    parts = hod.withColumn("s_sum", F.sum("c").over(ws)).withColumn(
        "s_n", F.count("*").over(ws)
    )
    q = parts.select(
        F.expr(
            "TRY_CAST(round((c - CAST(s_sum AS DOUBLE) / s_n) * 1000, 0) AS BIGINT)"
        ).alias("rq"),
        F.expr("CAST(c AS BIGINT) * 1000").alias("cq"),
    )
    g = q.agg(
        F.count("*").alias("n"),
        F.sum("rq").alias("sr"),
        F.sum(col("rq") * col("rq")).alias("ssr"),
        F.sum("cq").alias("sc"),
        F.sum(col("cq") * col("cq")).alias("ssc"),
    )
    return g.select(
        col("n").alias("n_hours"),
        F.expr(
            "round(greatest(CAST(0 AS DOUBLE), 1 - try_divide("
            "try_divide(ssr - CAST(sr AS DOUBLE) * sr / n, n - 1), "
            "try_divide(ssc - CAST(sc AS DOUBLE) * sc / n, n - 1))), 4)"
        ).alias("season_strength"),
    )


def _q_embed_drift_ks(spark, sf_dir):
    """Embedding-distribution drift monitor: two-sample KS between the
    train and test splits' emb[0] values (micro-quantized) plus the
    √((n1+n2)/(n1·n2))-scaled 5% critical value — the
    did-my-feature-distribution-move check a serving pipeline runs per
    release, here validating the vec_id%5 split is unbiased. D·n1·n2 is
    exact integer (the graded KS machinery reused on embeddings)."""
    e = tables.embeddings(spark, sf_dir)
    vals = e.select(
        F.expr("TRY_CAST(round(emb[0] * 1000000, 0) AS BIGINT)").alias("vc"),
        F.when(col("vec_id") % 5 == 0, 2).otherwise(1).alias("grp"),
    )
    d = ks_two_sample(vals)
    return d.select(
        "n1",
        "n2",
        F.expr("round(try_divide(CAST(d_scaled AS DOUBLE), (n1 * n2)), 4)").alias("d_stat"),
        F.expr(
            "round(1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / "
            "(n1 * CAST(n2 AS DOUBLE))), 4)"
        ).alias("crit_5pct"),
        F.expr(
            "CAST(CAST(d_scaled AS DOUBLE) / (n1 * n2) > "
            "1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (n1 * CAST(n2 AS DOUBLE))) "
            "AS INT)"
        ).alias("drift_flag"),
    )


def _q_acf_significance(spark, sf_dir):
    """ACF with whiteness flags: each lag's autocorrelation against the
    ±1.96/√n large-sample band — which lags carry real structure. The
    flag compares micro-quantized acf² · n against 1.96²·10¹² in exact
    integers, so the significance decision is partitioning-proof."""
    series = _hourly_series(spark, sf_dir)
    a = autocorr(series, max_lag=24)
    n = series.agg(F.count("*").alias("n"))
    return a.crossJoin(F.broadcast(n)).select(
        "k",
        "acf",
        F.expr(
            "CAST(TRY_CAST(round(acf * 1000000, 0) AS BIGINT) * "
            "TRY_CAST(round(acf * 1000000, 0) AS BIGINT) * n > 3841600000000 "
            "AS INT)"
        ).alias("significant"),
    )


def _q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for user lifetime (first→last event,
    in days; censored if the user was still active in the final 3 days
    of the window): S(t) = Π(1 − dᵢ/nᵢ) over distinct event times.
    The product becomes a window cumsum of nano-quantized ln(1 − d/n)
    terms — exact under any partitioning; censored spells reduce the
    risk set without an event. The churn/retention curve as pure
    relational algebra."""
    ev = tables.table(spark, sf_dir, "events")
    span = ev.agg(F.max("ts_us").alias("mx"))
    life = (
        ev.groupBy("user_id")
        .agg(F.min("ts_us").alias("fu"), F.max("ts_us").alias("lu"))
        .crossJoin(F.broadcast(span))
        .select(
            F.expr("(lu - fu) div 86400000000").alias("t"),
            F.expr("CAST(lu < mx - 3 * 86400000000 AS INT)").alias("event"),
        )
    )
    n_tot = life.agg(F.count("*").alias("n0"))
    per = life.groupBy("t").agg(
        F.sum("event").alias("d"), F.count("*").alias("rem")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per.crossJoin(F.broadcast(n_tot)).withColumn(
        "n_at_risk", col("n0") - F.coalesce(F.sum("rem").over(w), lit(0))
    )
    terms = risk.withColumn(
        "lnq",
        F.expr(
            "CASE WHEN d = 0 THEN CAST(0 AS BIGINT) ELSE "
            "TRY_CAST(round(ln(1 - d / CAST(n_at_risk AS DOUBLE)) * 1000000000, 0) "
            "AS BIGINT) END"
        ),
    ).withColumn("cum_ln", F.sum("lnq").over(wc))
    return terms.select(
        "t",
        "d",
        "n_at_risk",
        F.expr("round(exp(cum_ln / CAST(1000000000 AS DOUBLE)), 4)").alias(
            "survival"
        ),
    )


def _q_transitivity(spark, sf_dir):
    """Global transitivity of the mutual-kNN graph: 3·triangles / wedges
    (wedges = ΣC(deg,2)) — the one-number closure companion to the
    per-node clustering coefficient. Exact integer counts end-to-end."""
    from .knn import _q_mutual

    m = _q_mutual(spark, sf_dir).localCheckpoint(eager=True)
    sym = m.select(col("a").alias("node")).unionByName(
        m.select(col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("wedges")
    )
    e1 = m.select(col("a").alias("x"), col("b").alias("y"))
    e2 = m.select(col("a").alias("y"), col("b").alias("z"))
    e3 = m.select(col("a").alias("x2"), col("b").alias("z2"))
    tri = (
        e1.join(e2, "y")
        .join(e3, (col("x") == col("x2")) & (col("z") == col("z2")))
        .agg(F.count("*").alias("triangles"))
    )
    return wedges.crossJoin(tri).select(
        "wedges",
        "triangles",
        F.expr("round(3 * triangles / CAST(wedges AS DOUBLE), 4)").alias(
            "transitivity"
        ),
    )


def _q_mcnemar(spark, sf_dir):
    """McNemar's paired test between the kNN and nearest-centroid
    classifiers on the shared test split: the discordant counts b (kNN
    right, centroid wrong) and c (centroid right, kNN wrong) decide
    whether the accuracy gap is real — χ² = (|b−c|−1)²/(b+c) with
    continuity correction, from exact integers. The right test when two
    models share one test set (marginals cancel)."""
    from .knn import _q_centroid, classify

    p1 = classify(spark, sf_dir).select(
        "qid", col("correct").cast("long").alias("k_ok")
    )
    p2 = _q_centroid(spark, sf_dir).select(
        "qid", col("correct").cast("long").alias("c_ok")
    )
    j = p1.join(p2, "qid")
    m = j.agg(
        F.sum(F.expr("CASE WHEN k_ok = 1 AND c_ok = 0 THEN 1 ELSE 0 END")).alias("b"),
        F.sum(F.expr("CASE WHEN k_ok = 0 AND c_ok = 1 THEN 1 ELSE 0 END")).alias("c"),
        F.count("*").alias("n"),
    )
    return m.select(
        "n",
        "b",
        "c",
        F.expr(
            "CASE WHEN b + c = 0 THEN CAST(0 AS DOUBLE) ELSE "
            "round((abs(b - c) - 1) * (abs(b - c) - 1) / CAST(b + c AS DOUBLE), 4) "
            "END"
        ).alias("chi2_1df"),
    )


def _q_cohort_ltv(spark, sf_dir):
    """Cohort LTV curve: cumulative purchase revenue per signup-day
    cohort across day offsets, per cohort user — the
    lifetime-value-by-age table a growth team reads. Cohort sizes and
    revenue are exact integers; the cumulative is a window over the
    (cohort, offset) rollup, never the raw events."""
    ev = tables.table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr("min(ts_us) div 86400000000").alias("cohort_day")
    )
    sizes = first.groupBy("cohort_day").agg(F.count("*").alias("n_users"))
    rev = (
        ev.filter(col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.expr("ts_us div 86400000000").alias("day"),
        )
        .agg(F.sum(cents(col("value"))).alias("rev_c"))
        .select(
            "cohort_day",
            (col("day") - col("cohort_day")).alias("day_offset"),
            "rev_c",
        )
    )
    w = Window.partitionBy("cohort_day").orderBy("day_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.withColumn("cum_c", F.sum("rev_c").over(w))
    return cum.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_users",
        "cum_c",
        # exact integer micro-dollars per user: cents·10⁴/users floor-div —
        # the cents convention instead of a ratio that can land on a .5
        # rounding boundary the two engines break differently
        F.expr("cum_c * 10000 div n_users").alias("ltv_per_user_micro"),
    )


def _q_lsh_bucket_stats(spark, sf_dir):
    """LSH band-bucket telemetry: the bucket-size histogram behind the
    MinHash join — the skew audit that justifies the max_bucket_size
    guard (one boilerplate bucket of B docs explodes to B² candidate
    pairs). Per (band, signature) sizes → size histogram + the candidate
    pairs each size class contributes."""
    from .llm import N_BANDS, minhash_signatures

    sig = minhash_signatures(spark, sf_dir)
    band_structs = F.array(
        *[
            F.struct(
                lit(b).cast("long").alias("band"),
                F.md5(
                    F.concat(col(f"h{2*b}"), lit("|"), col(f"h{2*b+1}"))
                ).alias("bsig"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", col("bs.band").alias("band"), col("bs.bsig").alias("bsig")
    )
    buckets = bands.groupBy("band", "bsig").agg(F.count("*").alias("sz"))
    return buckets.groupBy("sz").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("sz * (sz - 1) div 2")).alias("candidate_pairs"),
    )


def _q_weekday_weekend_profile(spark, sf_dir):
    """Hour-of-day activity profile split by weekday vs weekend — the
    two-regime seasonality view (is the daily cycle different on
    weekends). Day-of-week from the epoch day index (1970-01-01 was a
    Thursday ⇒ dow = (epoch_day + 4) % 7, 0 = Sunday); exact integer
    counts, one rounded mean per cell."""
    ev = tables.table(spark, sf_dir, "events")
    cells = ev.select(
        F.expr("(ts_us div 3600000000) % 24").alias("hod"),
        F.expr(
            "CAST(((ts_us div 86400000000) + 4) % 7 IN (0, 6) AS INT)"
        ).alias("is_weekend"),
    ).groupBy("hod", "is_weekend").agg(F.count("*").alias("c"))
    days = ev.select(
        F.expr("ts_us div 86400000000").alias("d"),
        F.expr(
            "CAST(((ts_us div 86400000000) + 4) % 7 IN (0, 6) AS INT)"
        ).alias("is_weekend"),
    ).distinct().groupBy("is_weekend").agg(F.count("*").alias("n_days"))
    return cells.join(F.broadcast(days), "is_weekend").select(
        "hod",
        "is_weekend",
        "c",
        F.expr("round(c / CAST(n_days AS DOUBLE), 4)").alias("per_day_rate"),
    )


def _q_ece(spark, sf_dir):
    """Expected calibration error of the kNN classifier: Σ (nᵦ/n)·
    |conf(b) − acc(b)| over the vote-count confidence bins — the scalar
    the calibration table (ml_calibration_knn) rolls up to. The bin
    terms |conf·k·n_b − correct·k... are cross-multiplied to exact
    integers: ECE·n·k = Σ |votes·n_b/k·... rearranged so only the final
    division floats."""
    from .knn import K_DEFAULT, knn_test_topk, majority_vote

    pred = majority_vote(knn_test_topk(spark, sf_dir, K_DEFAULT))
    bins = pred.groupBy("votes").agg(
        F.count("*").alias("nb"),
        F.sum(col("correct").cast("long")).alias("cb"),
    )
    # per-bin |votes/k − cb/nb| · nb = |votes·nb − k·cb| / k  (exact ints / k)
    g = bins.agg(
        F.sum(F.abs(col("votes") * col("nb") - lit(K_DEFAULT) * col("cb"))).alias(
            "num"
        ),
        F.sum("nb").alias("n"),
    )
    return g.select(
        "n",
        F.expr(f"round(num / (CAST(n AS DOUBLE) * {K_DEFAULT}), 4)").alias("ece"),
    )


def _q_hapax_stats(spark, sf_dir):
    """Hapax legomena audit: corpus-frequency-1 tokens per document plus
    the corpus totals — the vocabulary-tail health check (too many
    hapaxes = noise/OCR damage; too few = template text). Exact counts;
    the hapax set is vocabulary-sized."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("ts").alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("cf"))
    hapax = tf.filter(col("cf") == 1).select("term")
    per_doc = (
        toks.join(F.broadcast(hapax), "term", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hapax"))
    )
    docs = tables.table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id", F.coalesce("n_hapax", lit(0)).alias("n_hapax")
    )


def _q_join_natural(spark, sf_dir):
    """NATURAL JOIN surface (both engines): nation ⋈ region on the
    implicitly shared key after projecting region's key to the common
    name — the schema-driven join shorthand, graded like any equi-join."""
    tables.table(spark, sf_dir, "nation").createOrReplaceTempView("nation_nj")
    tables.table(spark, sf_dir, "region").selectExpr(
        "r_regionkey AS n_regionkey", "r_name"
    ).createOrReplaceTempView("region_nj")
    return spark.sql(
        "SELECT n_name, r_name FROM nation_nj NATURAL JOIN region_nj"
    )


def _q_type_correlation(spark, sf_dir):
    """Pearson correlation matrix between the five event types' hourly
    count series (which behaviors co-move) — the cross-series structure
    view. Series are zero-filled on the shared spine so moments align;
    all sums are exact integers, one double expression per pair."""
    ev = tables.table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").alias("c"))
    spine = (
        ev.agg(
            F.expr("min(ts_us) div 3600000000").alias("mn"),
            F.expr("max(ts_us) div 3600000000").alias("mx"),
        )
        .select(F.explode(F.sequence(col("mn"), col("mx"))).alias("h"))
        .crossJoin(ev.select("event_type").distinct())
    )
    z = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("c", lit(0)).alias("c")
    )
    a = z.select(col("event_type").alias("ta"), "h", col("c").alias("ca"))
    b = z.select(col("event_type").alias("tb"), "h", col("c").alias("cb"))
    j = a.join(b, "h").filter(col("ta") < col("tb"))
    g = j.groupBy("ta", "tb").agg(
        F.count("*").alias("n"),
        F.sum("ca").alias("sa"),
        F.sum("cb").alias("sb"),
        F.sum(col("ca") * col("ca")).alias("ssa"),
        F.sum(col("cb") * col("cb")).alias("ssb"),
        F.sum(col("ca") * col("cb")).alias("sab"),
    )
    return g.select(
        "ta",
        "tb",
        F.expr(
            "round(try_divide(n * sab - CAST(sa AS DOUBLE) * sb, "
            "sqrt(n * ssa - CAST(sa AS DOUBLE) * sa) * "
            "sqrt(n * ssb - CAST(sb AS DOUBLE) * sb)), 4)"
        ).alias("pearson_r"),
    )


def _q_dim_ablation(spark, sf_dir):
    """Feature-dimension ablation: kNN accuracy using only the first 32
    embedding dimensions vs the full 64, both distances computed in the
    SAME pair pass (two expressions over one join — the ablation trick
    that never rescans). Distances round to 4dp with total-order
    tie-breaks, so both rankings are engine-exact."""
    from .knn import K_DEFAULT, all_pairs, split_test, train_all

    e = tables.embeddings(spark, sf_dir)
    pairs = all_pairs(split_test(e), train_all(e))
    d = pairs.select(
        "qid",
        "qlabel",
        "tid",
        "tlabel",
        F.round(
            F.expr(
                "sqrt(aggregate(zip_with(qemb, temb, (x, y) -> (x - y) * (x - y)), "
                "0D, (acc, v) -> acc + v))"
            ),
            4,
        ).alias("d64"),
        F.round(
            F.expr(
                "sqrt(aggregate(zip_with(slice(qemb, 1, 32), slice(temb, 1, 32), "
                "(x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"
            ),
            4,
        ).alias("d32"),
    )
    # r12 (guide §2.3 — one pass over the pair space, not one per
    # variant): the old per-variant union re-evaluated the quadratic
    # BNLJ + BOTH distance folds once per branch (no ReusedExchange
    # under a BNLJ — plans/r12/ml_dim_ablation_before.txt shows the
    # join subtree twice). Melt the two rounded distances into
    # (variant, dist) rows instead: the pair pass runs ONCE, the
    # ranking/vote/accuracy pipeline is the identical logic with
    # `variant` prepended to every partition/group key, and
    # InferWindowGroupLimit still prunes to k per (variant, qid)
    # map-side. Per-variant rankings, votes, and counts are unchanged
    # row-for-row (same dist doubles, same tie-breaks).
    melted = d.select(
        "qid",
        "qlabel",
        "tid",
        "tlabel",
        F.explode(
            F.create_map(
                lit("dims_64"), col("d64"), lit("dims_32"), col("d32")
            )
        ).alias("variant", "dist"),
    )
    w = Window.partitionBy("variant", "qid").orderBy(
        F.asc_nulls_last("dist"), "tid"
    )
    top = melted.withColumn("rnk", F.row_number().over(w)).filter(
        col("rnk") <= K_DEFAULT
    )
    votes = top.groupBy("variant", "qid", "qlabel", "tlabel").agg(
        F.count("*").alias("v")
    )
    wv = Window.partitionBy("variant", "qid").orderBy(F.desc("v"), "tlabel")
    pred = votes.withColumn("vr", F.row_number().over(wv)).filter(col("vr") == 1)
    out = pred.groupBy("variant").agg(
        F.count("*").alias("n_queries"),
        F.sum((col("tlabel") == col("qlabel")).cast("long")).alias("n_correct"),
    )
    return out.select(
        "variant",
        "n_queries",
        "n_correct",
        F.expr("round(n_correct / CAST(n_queries AS DOUBLE), 4)").alias("accuracy"),
    )


def _q_new_vs_returning(spark, sf_dir):
    """Daily actives split into new (first-ever-seen that day) vs
    returning — the growth-accounting decomposition every DAU chart
    hides. First-seen day per user is one aggregate; the daily rollup
    counts distinct users per class."""
    ev = tables.table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr("min(ts_us) div 86400000000").alias("first_day")
    )
    ud = ev.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    ).distinct()
    return (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.expr("CAST(day = first_day AS INT)")).alias("new_users"),
            F.sum(F.expr("CAST(day > first_day AS INT)")).alias("returning_users"),
        )
    )


def _q_column_profile(spark, sf_dir):
    """Two-pass data-profiling of the fact table: per column, distinct
    count, null count, and min/max rendered to strings — the "describe"
    a warehouse runs on ingest.

    r11 optimization (scripts/colprofile_ab_r11.json, guide §2.3): one
    agg mixing 6 countDistinct with string min/max forced BOTH the
    Expand rewrite (×7 row multiplication for the distinct counts) AND
    SortAggregate (string min/max buffers are immutable, disabling hash
    aggregation) — a sort-based aggregate over 4.2 M expanded wide rows.
    Splitting the distinct counts into their own aggregate keeps the
    Expand path pure hash aggregation and the min/max pass Expand-free;
    the two 1-row results cross-join (bounded). Same aggregates over
    the same rows — values identical (A/B asserted, golden digests
    unchanged). Measured sf0.1: 10.96 → 2.70 s median-warm."""
    li = tables.table(spark, sf_dir, "lineitem")
    cols = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    ]
    # doubles render via exact cents so min/max stringify identically on
    # both engines (raw float formatting differs); ints/strings cast clean
    def _canon(c):
        if c in ("l_quantity", "l_extendedprice"):
            return F.expr(f"TRY_CAST(round({c} * 100, 0) AS BIGINT)")
        return col(c)

    base = li.agg(
        F.count("*").alias("n_rows"),
        *[F.sum(col(c).isNull().cast("long")).alias(f"z_{c}") for c in cols],
        *[F.min(_canon(c)).cast("string").alias(f"mn_{c}") for c in cols],
        *[F.max(_canon(c)).cast("string").alias(f"mx_{c}") for c in cols],
    )
    dist = li.agg(*[F.countDistinct(c).alias(f"d_{c}") for c in cols])
    agg = base.crossJoin(F.broadcast(dist))
    stacked = ", ".join(
        f"'{c}', d_{c}, z_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stacked}) AS (col_name, n_distinct, n_null, "
        "min_str, max_str)",
    )


def _q_completeness(spark, sf_dir):
    """Data-completeness SLA report: per day, hours with at least one
    event out of 24 — the is-the-feed-healthy gate a pipeline checks
    before publishing a partition. Exact counts from the (day, hour)
    dedup; share as integer hours over 24."""
    ev = tables.table(spark, sf_dir, "events")
    dh = ev.select(
        F.expr("ts_us div 86400000000").alias("day"),
        F.expr("ts_us div 3600000000").alias("hr"),
    ).distinct()
    return dh.groupBy("day").agg(
        F.count("*").alias("hours_present"),
        F.expr("round(count(*) / CAST(24 AS DOUBLE), 4)").alias("completeness"),
    )


def _q_label_noise_flags(spark, sf_dir):
    """Label-noise candidates (confident-learning-lite): points whose
    kNN neighborhood overwhelmingly disagrees with their own label
    (≥ 80% of the 5 nearest have a different class) — the mislabeled-
    example queue an annotation-QA loop reviews. Reuses the graded kNN
    self-join; the flag is an exact integer comparison."""
    from .knn import K_JOIN, knn_self_join

    e = tables.embeddings(spark, sf_dir)
    top = (
        knn_self_join(spark, sf_dir, K_JOIN)
        .join(e.select(col("vec_id").alias("qid"), col("label").alias("qlabel")), "qid")
        .join(e.select(col("vec_id").alias("tid"), col("label").alias("tlabel")), "tid")
    )
    agree = top.groupBy("qid", "qlabel").agg(
        F.sum((col("tlabel") == col("qlabel")).cast("long")).alias("n_same"),
        F.count("*").alias("k"),
    )
    # n_same/k ≤ 0.2 cross-multiplied: 5·n_same ≤ k — exact integers
    return agree.filter(5 * col("n_same") <= col("k")).select(
        "qid", col("qlabel").alias("label"), "n_same", "k"
    )


def _q_lowe_ratio(spark, sf_dir):
    """Lowe ratio test per query: nearest-neighbor distance over k-th
    distance (d₁/d₅) — the match-confidence measure from SIFT matching;
    ratios near 1 mean the neighborhood is ambiguous. One window pass
    extracts both ranks; distances round to 4dp so the ratio divides
    identical doubles."""
    from .knn import _pairs

    p = _pairs(spark, sf_dir).withColumn("dr", F.round("dist", 4))
    # nulls-last like DuckDB: a poisoned pair's NULL distance must not
    # claim rank 1 (r10 non-finite sweep); try_divide for the d5 = 0
    # identical-neighborhood edge (DuckDB x/0 -> NULL)
    w = Window.partitionBy("qid").orderBy(F.asc_nulls_last("dr"), "tid")
    r = p.withColumn("rnk", F.row_number().over(w)).filter(col("rnk").isin(1, 5))
    wide = r.groupBy("qid").agg(
        F.max(F.when(col("rnk") == 1, col("dr"))).alias("d1"),
        F.max(F.when(col("rnk") == 5, col("dr"))).alias("d5"),
    )
    return wide.select(
        "qid",
        "d1",
        "d5",
        F.expr("round(try_divide(d1, d5), 4)").alias("lowe_ratio"),
    )


def _q_balanced_accuracy(spark, sf_dir):
    """Balanced accuracy of the kNN classifier: mean of per-class
    recalls — the class-imbalance-proof headline number. Per-class
    recalls quantize to micro units before the cross-class mean
    (10 doubles would otherwise sum in nondeterministic order)."""
    from .knn import classify

    p = classify(spark, sf_dir)
    per = p.groupBy("true_label").agg(
        F.count("*").alias("n_c"),
        F.sum(col("correct").cast("long")).alias("ok_c"),
    )
    q = per.select(
        F.expr(
            "TRY_CAST(round(ok_c / CAST(n_c AS DOUBLE) * 1000000, 0) AS BIGINT)"
        ).alias("rq")
    )
    return q.agg(F.count("*").alias("n_classes"), F.sum("rq").alias("s")).select(
        "n_classes",
        F.expr(
            "round(s / (n_classes * CAST(1000000 AS DOUBLE)), 4)"
        ).alias("balanced_accuracy"),
    )


def _q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the hourly series' above/below-median
    sequence: too few runs = trending, too many = oscillating. The
    median is the exact lower median (rank ⌈n/2⌉); runs counted with
    lag(); the z-score is one identical double expression from integer
    counts (ties-at-median rows are dropped, the standard handling)."""
    series = _hourly_series(spark, sf_dir)
    wq = Window.orderBy("c", "h")
    n_all = series.agg(F.count("*").alias("na"))
    med = (
        series.withColumn("r", F.row_number().over(wq))
        .crossJoin(F.broadcast(n_all))
        .filter(col("r") == F.expr("CAST(ceil(na / 2.0) AS BIGINT)"))
        .select(col("c").alias("med"))
    )
    lab = (
        series.crossJoin(F.broadcast(med))
        .filter(col("c") != col("med"))
        .select("h", (col("c") > col("med")).cast("int").alias("above"))
    )
    w = Window.orderBy("h")
    runs = lab.withColumn(
        "new_run",
        F.when(F.lag("above").over(w).isNull(), 1)
        .when(F.lag("above").over(w) != col("above"), 1)
        .otherwise(0),
    )
    g = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("above").alias("n1"),
        F.sum(F.expr("1 - above")).alias("n2"),
    )
    return g.select(
        "r",
        "n1",
        "n2",
        F.expr(
            "round(try_divide(r - (2.0 * n1 * n2 / (n1 + n2) + 1), "
            "sqrt(try_divide(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2), "
            "(n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))), 4)"
        ).alias("z"),
    )


HITS_SCALE = 10**6


def _q_hits(spark, sf_dir):
    """HITS (2 unrolled iterations) over the directed kNN graph: hub
    score = sum of pointed-to authorities, authority = sum of pointing
    hubs. Scores stay in integer HITS_SCALE (ppm) units with
    floor-divided normalization by the max each half-step — exact
    integer arithmetic (raw·SCALE stays well under 2⁶³ at any degree)
    under any partitioning (the pagerank determinism convention applied
    to the two-score recursion)."""
    from .knn import K_JOIN, knn_self_join

    e = tables.embeddings(spark, sf_dir)
    nodes = e.select(col("vec_id").alias("id"))
    edges = knn_self_join(spark, sf_dir, K_JOIN).select(
        col("qid").alias("src"), col("tid").alias("dst")
    )
    h = nodes.select("id", lit(HITS_SCALE).alias("h"))
    a = None
    for _ in range(2):
        # authority ← sum of hub scores of in-neighbors, renormalized
        asum = (
            edges.join(h.select(col("id").alias("src"), col("h").alias("hs")), "src")
            .groupBy(col("dst").alias("id"))
            .agg(F.sum("hs").alias("raw"))
        )
        amax = asum.agg(F.max("raw").alias("mx"))
        a = (
            nodes.join(asum, "id", "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "id",
                F.expr(
                    f"coalesce(raw, 0) * {HITS_SCALE} div mx"
                ).alias("a"),
            )
            # truncate the per-half-step lineage (the kmeans pattern):
            # asum feeds both its max and the renormalized scores, and
            # iteration 2 nests iteration 1's whole DAG otherwise
            .localCheckpoint(eager=True)
        )
        hsum = (
            edges.join(a.select(col("id").alias("dst"), col("a").alias("av")), "dst")
            .groupBy(col("src").alias("id"))
            .agg(F.sum("av").alias("raw"))
        )
        hmax = hsum.agg(F.max("raw").alias("mx"))
        h = (
            nodes.join(hsum, "id", "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "id",
                F.expr(
                    f"coalesce(raw, 0) * {HITS_SCALE} div mx"
                ).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return h.join(a, "id").select("id", col("h").alias("hub_u"), col("a").alias("auth_u"))


def _q_stickiness(spark, sf_dir):
    """Product stickiness DAU / trailing-28-day actives per day — the
    engagement-depth ratio. The trailing-actives set reuses the bounded
    28× fan-out pattern (each (user, day) pair projects into the 28
    future days it keeps the user "monthly active" for) — map-side
    combine survives, no distinct-over-window."""
    ev = tables.table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    span = ud.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    fan = (
        ud.select(
            "user_id", F.explode(F.sequence(col("day"), col("day") + 27)).alias("day")
        )
        .distinct()
        .crossJoin(F.broadcast(span))
        .filter(col("day") <= col("mx"))
    )
    mau = fan.groupBy("day").agg(F.count("*").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.expr("round(dau / CAST(mau AS DOUBLE), 4)").alias("stickiness"),
        )
    )


def _q_youden_threshold(spark, sf_dir):
    """Youden's J optimal operating point on the ROC curve: the score
    threshold maximizing TPR − FPR, picked by exact integer
    cross-multiplication (tp·neg − fp·p), ties → higher threshold —
    turning the graded ROC sweep into a deployable cutoff."""
    pts = _emb_scored_pts(spark, sf_dir)
    cum = _score_sweep_cum(pts)  # two-phase prefix scan, no global window
    g = pts.agg(F.sum("y").alias("p"), F.expr("count(*) - sum(y)").alias("neg"))
    scored = cum.crossJoin(F.broadcast(g)).withColumn(
        "j_scaled", col("tp") * col("neg") - col("fp") * col("p")
    )
    # argmax via orderBy+limit(1) (TakeOrderedAndProject), not a global
    # rank window over the threshold sweep.
    return (
        scored.orderBy(F.desc("j_scaled"), F.desc("score"))
        .limit(1)
        .select(
            F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
            "tp",
            "fp",
            F.expr("round(try_divide(CAST(tp AS DOUBLE), p) - try_divide(CAST(fp AS DOUBLE), neg), 4)").alias(
                "youden_j"
            ),
        )
    )


def _q_average_precision(spark, sf_dir):
    """Average precision (area under the PR curve by the step rule):
    AP = Σ (R_i − R_{i−1})·P_i over distinct score thresholds — the
    single-number PR summary. Per-step terms Δtp·(tp/(tp+fp)) quantize
    to nano units before the cross-step sum; all counts exact."""
    pts = _emb_scored_pts(spark, sf_dir)
    # Δtp between consecutive thresholds is by construction this
    # threshold's own `pos` (tp = prefix-sum of pos), so the lag window
    # the r1 version used was redundant — the sweep needs no global
    # window at all (two-phase prefix scan, round-4 sweep).
    cum = _score_sweep_cum(pts).withColumn("dtp", col("pos"))
    g = pts.agg(F.sum("y").alias("p"))
    terms = cum.select(
        F.expr(
            "TRY_CAST(round(dtp * (tp / CAST(tp + fp AS DOUBLE)) * 1000000000, 0) "
            "AS BIGINT)"
        ).alias("tq")
    )
    return terms.agg(F.sum("tq").alias("s")).crossJoin(F.broadcast(g)).select(
        col("p").alias("n_pos"),
        F.expr(
            "round(try_divide(s, p * CAST(1000000000 AS DOUBLE)), 4)"
        ).alias("average_precision"),
    )


def _q_pacf_2(spark, sf_dir):
    """Partial autocorrelation at lags 1 and 2 by the Durbin-Levinson
    closed forms (φ₁₁ = r₁, φ₂₂ = (r₂ − r₁²)/(1 − r₁²)) — the AR-order
    diagnostic, derived from the same exact-integer ACF moments with
    one identical double expression per value."""
    series = _hourly_series(spark, sf_dir)
    a = autocorr(series, max_lag=2)
    wide = a.groupBy().agg(
        F.max(F.when(col("k") == 1, col("acf"))).alias("r1"),
        F.max(F.when(col("k") == 2, col("acf"))).alias("r2"),
    )
    return wide.select(
        "r1",
        "r2",
        col("r1").alias("pacf_1"),
        F.expr("round((r2 - r1 * r1) / (1 - r1 * r1), 4)").alias("pacf_2"),
    )


def _q_graph_summary(spark, sf_dir):
    """One-row graph card for the mutual-kNN graph: nodes, undirected
    edges, density, isolated-node count, average and max degree — the
    at-a-glance shape summary every downstream graph operator's cost
    model starts from. Exact integers; two rounded ratios."""
    from .knn import _q_mutual

    e = tables.embeddings(spark, sf_dir)
    nodes = e.select(col("vec_id").alias("node"))
    m = _q_mutual(spark, sf_dir)
    sym = m.select(col("a").alias("node")).unionByName(
        m.select(col("b").alias("node"))
    )
    deg = nodes.join(
        sym.groupBy("node").agg(F.count("*").alias("d")), "node", "left"
    ).select(F.coalesce("d", lit(0)).alias("d"))
    nn = nodes.agg(F.count("*").alias("n"))
    me = m.agg(F.count("*").alias("m"))
    dg = deg.agg(
        F.sum(F.expr("CAST(d = 0 AS INT)")).alias("n_isolated"),
        F.max("d").alias("max_degree"),
        F.sum("d").alias("sum_deg"),
    )
    return (
        nn.crossJoin(me)
        .crossJoin(dg)
        .select(
            "n",
            "m",
            F.expr(
                "round(2 * m / (CAST(n AS DOUBLE) * (n - 1)), 6)"
            ).alias("density"),
            "n_isolated",
            "max_degree",
            F.expr("round(sum_deg / CAST(n AS DOUBLE), 4)").alias("avg_degree"),
        )
    )


def _q_spectral_entropy(spark, sf_dir):
    """Spectral entropy of the hourly series: Shannon entropy of the
    normalized periodogram power distribution over frequencies 1..36 —
    near ln(36) = white noise, low = energy concentrated in few cycles
    (strong periodicity). Powers come from the graded periodogram's
    exact integer trig sums; shares and entropy terms quantize to nano
    units."""
    series = _hourly_series(spark, sf_dir)
    p = periodogram(series, max_k=36).select(
        "k", F.expr("TRY_CAST(round(power * 1000000, 0) AS BIGINT)").alias("pq")
    )
    tot = p.agg(F.sum("pq").alias("tp"))
    terms = p.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CASE WHEN pq = 0 THEN CAST(0 AS BIGINT) ELSE "
            "TRY_CAST(round(-(pq / CAST(tp AS DOUBLE)) * ln(pq / CAST(tp AS DOUBLE)) "
            "* 1000000000, 0) AS BIGINT) END"
        ).alias("hq")
    )
    return terms.agg(F.count("*").alias("n_freqs"), F.sum("hq").alias("s")).select(
        "n_freqs",
        F.expr(
            "round(s / CAST(1000000000 AS DOUBLE), 4)"
        ).alias("spectral_entropy_nats"),
    )


def _q_heaps_law(spark, sf_dir):
    """Heaps' law fit (V ≈ k·Nᵝ): vocabulary size vs cumulative token
    count at doc-count checkpoints 50,100,…,500, with the log-log OLS
    slope β — the vocabulary-growth exponent that sizes a tokenizer's
    future vocab. First-occurrence doc per term makes the cumulative
    vocab a count over min-doc ≤ checkpoint; log moments quantize to
    micro units for the slope."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("ts").alias("term"))
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("fd"))
    doc_tok = toks.groupBy("doc_id").agg(F.count("*").alias("nt"))
    cps = spark.range(1, 11).select((col("id") * 50).alias("cp"))
    vocab = (
        cps.join(firsts, col("fd") < col("cp"))
        .groupBy("cp")
        .agg(F.count("*").alias("v"))
    )
    ntok = (
        cps.join(doc_tok, col("doc_id") < col("cp"))
        .groupBy("cp")
        .agg(F.sum("nt").alias("n"))
    )
    pts = vocab.join(ntok, "cp").select(
        "cp",
        "n",
        "v",
        F.expr("TRY_CAST(round(ln(n) * 1000000, 0) AS BIGINT)").alias("xq"),
        F.expr("TRY_CAST(round(ln(v) * 1000000, 0) AS BIGINT)").alias("yq"),
    )
    g = pts.agg(
        F.count("*").alias("m"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(col("xq") * col("xq")).alias("sxx"),
        F.sum(col("xq") * col("yq")).alias("sxy"),
    )
    # try_divide, not /: a corpus where every checkpoint sees the same
    # cumulative token count (all docs below the first checkpoint — the
    # round-10 unicode-degenerate fixture) zeroes the x-variance, and
    # ANSI mode would crash the whole job where DuckDB's x/0 yields the
    # NULL beta the oracle already emits (scripts/unicode_sweep_r10.py).
    beta = g.select(
        F.expr(
            "round(try_divide(CAST(m * sxy - sx * sy AS DOUBLE), m * sxx - sx * sx), 4)"
        ).alias("beta")
    )
    return pts.crossJoin(F.broadcast(beta)).select("cp", "n", "v", "beta")


def _q_f1_scores(spark, sf_dir):
    """Macro and micro F1 of the kNN classifier: micro = pooled accuracy
    (single-label multi-class identity), macro = mean of per-class F1
    with 2TP/(2TP+FP+FN) terms quantized to micro units before the
    cross-class mean — the headline pair every classification report
    ends with."""
    from .knn import classify

    p = classify(spark, sf_dir).select("true_label", "pred_label")
    tp = p.filter(col("true_label") == col("pred_label")).groupBy(
        col("true_label").alias("lbl")
    ).agg(F.count("*").alias("tp"))
    actual = p.groupBy(col("true_label").alias("lbl")).agg(
        F.count("*").alias("act")
    )
    predicted = p.groupBy(col("pred_label").alias("lbl")).agg(
        F.count("*").alias("prd")
    )
    per = (
        actual.join(predicted, "lbl", "full")
        .join(tp, "lbl", "left")
        .select(
            F.coalesce("act", lit(0)).alias("act"),
            F.coalesce("prd", lit(0)).alias("prd"),
            F.coalesce("tp", lit(0)).alias("tp"),
        )
    )
    q = per.select(
        F.expr(
            "CASE WHEN act + prd = 0 THEN CAST(0 AS BIGINT) ELSE "
            "TRY_CAST(round(2 * tp / CAST(act + prd AS DOUBLE) * 1000000, 0) "
            "AS BIGINT) END"
        ).alias("f1q")
    )
    n = p.agg(
        F.count("*").alias("n"),
        F.sum((col("true_label") == col("pred_label")).cast("long")).alias("ok"),
    )
    return (
        q.agg(F.count("*").alias("k"), F.sum("f1q").alias("s"))
        .crossJoin(F.broadcast(n))
        .select(
            col("k").alias("n_classes"),
            F.expr("round(ok / CAST(n AS DOUBLE), 4)").alias("micro_f1"),
            F.expr("round(s / (k * CAST(1000000 AS DOUBLE)), 4)").alias(
                "macro_f1"
            ),
        )
    )


def _q_max_drawdown(spark, sf_dir):
    """Maximum drawdown summary over the signed cumulative purchase
    curve: the deepest peak-to-trough fall in exact cents plus its
    relative depth — the single risk number the full ts_drawdown series
    rolls up to."""
    dd = _q_drawdown(spark, sf_dir)
    return dd.agg(
        F.max("drawdown_c").alias("max_drawdown_c"),
        F.max("peak_c").alias("max_peak_c"),
        F.count("*").alias("n_points"),
    ).select(
        "n_points",
        "max_drawdown_c",
        "max_peak_c",
        F.expr(
            "round(try_divide(max_drawdown_c, CAST(max_peak_c AS DOUBLE)), 4)"
        ).alias("max_dd_over_peak"),
    )


def _q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on the hourly series: S = Σ sign(c_j −
    c_i) over ordered pairs, tie-corrected variance, continuity-
    corrected z — the nonparametric is-there-a-monotone-trend test
    (the hypothesis-test companion of the Theil-Sen slope). S and the
    tie terms are exact integers from one self-join over the bounded
    series; one double expression forms z."""
    series = _hourly_series(spark, sf_dir)
    a = series.select(col("h").alias("hi"), col("c").alias("ci"))
    b = series.select(col("h").alias("hj"), col("c").alias("cj"))
    s = (
        a.join(b, col("hi") < col("hj"))
        .agg(
            F.sum(F.expr("CAST(sign(cj - ci) AS BIGINT)")).alias("s"),
            F.count("*").alias("n_pairs"),
        )
    )
    ties = series.groupBy("c").agg(F.count("*").alias("tc")).agg(
        F.sum(F.expr("tc * (tc - 1) * (2 * tc + 5)")).alias("tie_term")
    )
    n = series.agg(F.count("*").alias("n"))
    return (
        s.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n))
        .select(
            "s",
            "n_pairs",
            F.expr(
                "round((s - sign(s)) / sqrt((CAST(n AS DOUBLE) * (n - 1) * "
                "(2 * n + 5) - tie_term) / 18), 4)"
            ).alias("z"),
        )
    )


def _q_vocab_kl(spark, sf_dir):
    """KL divergence of the held-out token distribution from the train
    split's (Laplace-smoothed over the union vocabulary) — the
    distribution-shift score between corpus slices, the token-level
    companion of ml_embed_drift_ks. Per-token contributions quantize to
    nano-nats; all counts exact."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select(
        "doc_id",
        (F.substring(F.md5(col("doc_id").cast("string")), 1, 2) < "cc").alias(
            "is_train"
        ),
        F.explode("ts").alias("term"),
    )
    per = toks.groupBy("term").agg(
        F.sum(F.expr("CAST(is_train AS INT)")).alias("ct"),
        F.sum(F.expr("CAST(NOT is_train AS INT)")).alias("ch"),
    )
    tot = per.agg(
        F.sum("ct").alias("nt"),
        F.sum("ch").alias("nh"),
        F.count("*").alias("v"),
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "TRY_CAST(round(((ch + 1) / CAST(nh + v AS DOUBLE)) * "
            "ln(((ch + 1) / CAST(nh + v AS DOUBLE)) / "
            "((ct + 1) / CAST(nt + v AS DOUBLE))) * 1000000000, 0) AS BIGINT)"
        ).alias("kq")
    )
    return terms.agg(F.count("*").alias("vocab_size"), F.sum("kq").alias("s")).select(
        "vocab_size",
        F.expr(
            "round(s / CAST(1000000000 AS DOUBLE), 4)"
        ).alias("kl_heldout_from_train"),
    )


def _q_churn_labels(spark, sf_dir):
    """Churn labeling for supervised modeling: per user, a churned flag
    (no activity in the final 7 days of the window) with the behavioral
    features a churn model trains on — event count, active days, spend
    cents, tenure, recency. One groupBy; every feature exact."""
    ev = tables.table(spark, sf_dir, "events")
    span = ev.agg(F.expr("max(ts_us) div 86400000000").alias("mxd"))
    per = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.expr("ts_us div 86400000000")).alias("active_days"),
        F.sum(
            F.when(col("event_type") == "purchase", cents(col("value"))).otherwise(0)
        ).alias("spend_c"),
        F.expr("min(ts_us) div 86400000000").alias("first_day"),
        F.expr("max(ts_us) div 86400000000").alias("last_day"),
    )
    return per.crossJoin(F.broadcast(span)).select(
        "user_id",
        "n_events",
        "active_days",
        "spend_c",
        (col("last_day") - col("first_day")).alias("tenure_days"),
        (col("mxd") - col("last_day")).alias("recency_days"),
        F.expr("CAST(last_day < mxd - 7 AS INT)").alias("churned"),
    )


def _q_persistence_error_curve(spark, sf_dir):
    """Forecast-horizon error curve: MAE/RMSE of the persistence
    forecast (predict hour t with hour t−h) at horizons 1/6/12/24 —
    how fast the series forgets itself, the curve that sizes a model's
    usable lead time. One bounded 4× fan-out + lag equi-join; exact
    integer error sums."""
    series = _hourly_series(spark, sf_dir)
    hs = spark.createDataFrame([(1,), (6,), (12,), (24,)], "hz long")
    a = series.select(col("h").alias("ht"), col("c").alias("ct"))
    b = series.select(col("h").alias("hl"), col("c").alias("cl"))
    pairs = a.crossJoin(F.broadcast(hs)).join(
        b, col("ht") - col("hz") == col("hl")
    )
    return pairs.groupBy("hz").agg(
        F.count("*").alias("n"),
        F.expr("round(sum(abs(ct - cl)) / CAST(count(*) AS DOUBLE), 4)").alias(
            "mae"
        ),
        F.expr(
            "round(sqrt(sum((ct - cl) * (ct - cl)) / CAST(count(*) AS DOUBLE)), 4)"
        ).alias("rmse"),
    )


def _q_unique_key_audit(spark, sf_dir):
    """Primary-key uniqueness audit across the catalog: for each
    declared key, the number of duplicated key values and the surplus
    rows they carry — the other half of the data-quality gate beside
    rel_fk_integrity_audit. One groupBy per key; healthy fixtures read
    all zeros."""
    checks = [
        ("events.event_id", tables.table(spark, sf_dir, "events"), ["event_id"]),
        ("documents.doc_id", tables.table(spark, sf_dir, "documents"), ["doc_id"]),
        ("embeddings.vec_id", tables.table(spark, sf_dir, "embeddings"), ["vec_id"]),
        ("orders.o_orderkey", tables.table(spark, sf_dir, "orders"), ["o_orderkey"]),
        (
            "lineitem.(l_orderkey,l_linenumber)",
            tables.table(spark, sf_dir, "lineitem"),
            ["l_orderkey", "l_linenumber"],
        ),
    ]
    out = None
    for name, df, keys in checks:
        g = df.groupBy(*keys).agg(F.count("*").alias("cnt"))
        one = g.agg(
            F.sum(F.expr("CAST(cnt > 1 AS INT)")).alias("dup_keys"),
            F.sum(F.expr("CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END")).alias(
                "surplus_rows"
            ),
            F.count("*").alias("distinct_keys"),
        ).select(lit(name).alias("key"), "distinct_keys", "dup_keys", "surplus_rows")
        out = one if out is None else out.unionByName(one)
    return out


def _q_best_f1_threshold(spark, sf_dir):
    """Best-F1 operating point on the score sweep: the threshold
    maximizing 2TP/(2TP+FP+FN) — the imbalanced-data counterpart of
    ml_youden_threshold. F1 per threshold quantizes to micro units from
    exact counts; ties break to the higher threshold."""
    pts = _emb_scored_pts(spark, sf_dir)
    cum = _score_sweep_cum(pts)  # two-phase prefix scan, no global window
    g = pts.agg(F.sum("y").alias("p"))
    scored = cum.crossJoin(F.broadcast(g)).withColumn(
        "f1q",
        F.expr(
            "TRY_CAST(round(2 * tp / CAST(2 * tp + fp + (p - tp) AS DOUBLE) "
            "* 1000000, 0) AS BIGINT)"
        ),
    )
    # argmax via orderBy+limit(1) (TakeOrderedAndProject), not a global
    # rank window over the threshold sweep.
    return (
        scored.orderBy(F.desc("f1q"), F.desc("score"))
        .limit(1)
        .select(
            F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
            "tp",
            "fp",
            F.expr("round(f1q / CAST(1000000 AS DOUBLE), 4)").alias("best_f1"),
        )
    )


def _q_gumbel_fit(spark, sf_dir):
    """Extreme-value analysis: daily block maxima of the hourly series
    with a method-of-moments Gumbel fit (scale β = s·√6/π, location
    μ = m − γβ) and the implied 30-day return level — the
    capacity-planning tail estimate. Block maxima are exact integers;
    the fit is one identical double expression."""
    series = _hourly_series(spark, sf_dir)
    maxima = series.groupBy(F.expr("h div 24").alias("day")).agg(
        F.max("c").alias("mx"), F.count("*").alias("bn")
    ).filter(col("bn") == 24)
    g = maxima.agg(
        F.count("*").alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(col("mx") * col("mx")).alias("ss"),
    )
    return g.select(
        col("n").alias("n_blocks"),
        F.expr("round(try_divide(CAST(s1 AS DOUBLE), n), 4)").alias("mean_max"),
        F.expr(
            "round(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) "
            "* sqrt(6) / pi(), 4)"
        ).alias("gumbel_beta"),
        F.expr(
            "round(CAST(s1 AS DOUBLE) / n - 0.5772156649 * "
            "(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) "
            "* sqrt(6) / pi()), 4)"
        ).alias("gumbel_mu"),
        F.expr(
            "round((CAST(s1 AS DOUBLE) / n - 0.5772156649 * "
            "(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) "
            "* sqrt(6) / pi())) - (sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) "
            "/ (n - 1)) * sqrt(6) / pi()) * ln(-ln(1 - 1 / CAST(30 AS DOUBLE))), "
            "4)"
        ).alias("return_level_30d"),
    )


def _q_term_burstiness(spark, sf_dir):
    """Church-Gale term burstiness for the 20 highest-document-frequency
    terms: variance-to-mean ratio of per-document counts (1 ≈ Poisson
    spread, higher = the term clumps into few documents) — the
    content-word vs function-word separator. Zero-filled over all docs;
    exact integer moments."""
    from .llm import _tokens

    toks = _tokens(spark, sf_dir).select("doc_id", F.explode("ts").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    top = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.sum("c").alias("cf"))
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )
    nd = tables.table(spark, sf_dir, "documents").agg(F.count("*").alias("nd"))
    m = (
        tf.join(F.broadcast(top.select("term", "df", "cf")), "term")
        .groupBy("term", "df", "cf")
        .agg(F.sum(col("c") * col("c")).alias("ss"))
    )
    # zero-filled moments over nd docs: mean = cf/nd, E[x²] = ss/nd
    return m.crossJoin(F.broadcast(nd)).select(
        "term",
        "df",
        "cf",
        F.expr(
            "round((CAST(ss AS DOUBLE) / nd - (CAST(cf AS DOUBLE) / nd) * "
            "(CAST(cf AS DOUBLE) / nd)) / (CAST(cf AS DOUBLE) / nd), 4)"
        ).alias("burstiness"),
    )


def _q_rfm_segments(spark, sf_dir):
    """Classic RFM segmentation: quintile codes for Recency (days since
    last purchase, lower = better), Frequency (purchase count) and
    Monetary (exact spend cents) per user, plus the concatenated
    segment code — the CRM workhorse. ntile(5) with unique tie-breaks
    makes every code engine-exact."""
    ev = tables.table(spark, sf_dir, "events").filter(
        col("event_type") == "purchase"
    )
    span = ev.agg(F.expr("max(ts_us) div 86400000000").alias("mxd"))
    per = ev.groupBy("user_id").agg(
        F.expr("max(ts_us) div 86400000000").alias("last_day"),
        F.count("*").alias("freq"),
        F.sum(cents(col("value"))).alias("spend_c"),
    )
    base = per.crossJoin(F.broadcast(span)).select(
        "user_id",
        (col("mxd") - col("last_day")).alias("recency_days"),
        "freq",
        "spend_c",
    )
    # three exact quintile assignments via the two-phase prefix scan
    # (plans/prefix.py) — one range shuffle each over the user dimension
    # instead of three single-partition windows.
    coded = prefix.ntile_exact(
        base, ["recency_days", "user_id"], 5, "r"
    )
    coded = prefix.ntile_exact(
        coded, [("freq", "desc"), "user_id"], 5, "f"
    )
    coded = prefix.ntile_exact(
        coded, [("spend_c", "desc"), "user_id"], 5, "m"
    ).select("user_id", "recency_days", "freq", "spend_c", "r", "f", "m")
    return coded.select(
        "user_id",
        "recency_days",
        "freq",
        "spend_c",
        "r",
        "f",
        "m",
        F.concat_ws("", col("r"), col("f"), col("m")).alias("segment"),
    )


def _q_precision_at_k(spark, sf_dir):
    """Precision@k curve (k = 1..10) of similarity search against
    same-label relevance: mean over queries of the relevant share in
    the top k — the cutoff-depth view NDCG compresses away. One top-10
    pass; per-(query, k) precision is exact (rel_count/k), the
    cross-query mean sums micro-quantized integers."""
    from .knn import knn_test_topk

    t = knn_test_topk(spark, sf_dir, 10).select(
        "qid", "rnk", (col("tlabel") == col("qlabel")).cast("long").alias("rel")
    )
    w = Window.partitionBy("qid").orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = t.withColumn("cum_rel", F.sum("rel").over(w)).select(
        col("rnk").cast("long").alias("k"),
        F.expr(
            "TRY_CAST(round(cum_rel / CAST(rnk AS DOUBLE) * 1000000, 0) AS BIGINT)"
        ).alias("pq"),
    )
    # integer half-up quantization to 4dp: round(s/(n·1e6), 4) rides a
    # decimal-half boundary that Spark (shortest-repr HALF_UP) and DuckDB
    # (binary-double nearest) settle differently (seen at sf0.001);
    # (s + n·50) div (n·100) is the same quantity, exact on both engines.
    return cum.groupBy("k").agg(
        F.count("*").alias("n_queries"), F.sum("pq").alias("s")
    ).select(
        "k",
        "n_queries",
        F.expr("(s + n_queries * 50) div (n_queries * 100)").alias("precision_q4"),
    )


def _q_dedup_cluster_langs(spark, sf_dir):
    """Language purity of the near-dup clusters: per multi-member
    cluster, member count and distinct languages — near-dups spanning
    languages signal translation pairs or hash collisions, either way a
    review queue. Composes the graded connected-components output."""
    from .iterative import _q_components

    comp = _q_components(spark, sf_dir)
    docs = tables.table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = comp.filter(col("cluster_size") > 1).join(docs, "doc_id")
    return j.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("lang").alias("first_lang"),
    )


def _q_operating_point_card(spark, sf_dir):
    """Operating-point card at the Youden-optimal threshold:
    sensitivity, specificity, PPV and NPV from the exact confusion at
    that cutoff — the four numbers a deployment review reads after
    picking the threshold. Same integer-cross-multiplied selection as
    ml_youden_threshold; each ratio is one rounded division of exact
    counts."""
    pts = _emb_scored_pts(spark, sf_dir)
    cum = _score_sweep_cum(pts)  # two-phase prefix scan, no global window
    g = pts.agg(F.sum("y").alias("p"), F.expr("count(*) - sum(y)").alias("neg"))
    scored = cum.crossJoin(F.broadcast(g)).withColumn(
        "j_scaled", col("tp") * col("neg") - col("fp") * col("p")
    )
    # argmax via orderBy+limit(1) (TakeOrderedAndProject), not a global
    # rank window over the threshold sweep.
    best = scored.orderBy(F.desc("j_scaled"), F.desc("score")).limit(1)
    return best.select(
        F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
        "tp",
        "fp",
        (col("p") - col("tp")).alias("fn"),
        (col("neg") - col("fp")).alias("tn"),
        F.expr("round(try_divide(CAST(tp AS DOUBLE), p), 4)").alias("sensitivity"),
        F.expr("round(try_divide(CAST(neg - fp AS DOUBLE), neg), 4)").alias("specificity"),
        F.expr("round(try_divide(CAST(tp AS DOUBLE), (tp + fp)), 4)").alias("ppv"),
        F.expr(
            "round(try_divide(CAST(neg - fp AS DOUBLE), (neg - fp) + (p - tp)), 4)"
        ).alias("npv"),
    )


def _q_median_filter(spark, sf_dir):
    """Rolling median-of-5 filter over the hourly series — the
    impulse-noise smoother (median kills spikes a moving average only
    spreads). The window median of 5 integers is computed exactly as
    the middle element of a sorted 5-array built from lags/leads — no
    percentile machinery, engine-exact. Edge hours (first/last two)
    pass through unfiltered."""
    series = _hourly_series(spark, sf_dir)
    w = Window.orderBy("h")
    r = (
        series.withColumn("m2", F.lag("c", 2).over(w))
        .withColumn("m1", F.lag("c", 1).over(w))
        .withColumn("p1", F.lead("c", 1).over(w))
        .withColumn("p2", F.lead("c", 2).over(w))
    )
    return r.select(
        "h",
        "c",
        F.expr(
            "CASE WHEN m2 IS NULL OR m1 IS NULL OR p1 IS NULL OR p2 IS NULL "
            "THEN c ELSE sort_array(array(m2, m1, c, p1, p2))[2] END"
        ).alias("median5"),
    )


def _q_vote_margin(spark, sf_dir):
    """kNN vote-margin distribution: per query, top-1 minus top-2 vote
    counts (0 = coin-flip decision, k = unanimous) rolled up with the
    empirical accuracy at each margin — the decision-confidence
    spectrum that says which predictions to trust. Exact integer votes
    and counts throughout."""
    from .knn import K_DEFAULT, knn_test_topk

    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    votes = t.groupBy("qid", "qlabel", "tlabel").agg(F.count("*").alias("v"))
    w = Window.partitionBy("qid").orderBy(F.desc("v"), "tlabel")
    r = votes.withColumn("vr", F.row_number().over(w)).filter(col("vr") <= 2)
    per = r.groupBy("qid").agg(
        F.max(F.when(col("vr") == 1, col("v"))).alias("v1"),
        F.coalesce(F.max(F.when(col("vr") == 2, col("v"))), lit(0)).alias("v2"),
        F.max(
            F.when(col("vr") == 1, (col("tlabel") == col("qlabel")).cast("long"))
        ).alias("ok"),
    )
    return per.groupBy((col("v1") - col("v2")).alias("margin")).agg(
        F.count("*").alias("n_queries"),
        F.sum("ok").alias("n_correct"),
        F.expr(
            "round(sum(ok) / CAST(count(*) AS DOUBLE), 4)"
        ).alias("accuracy"),
    )


def _q_recall_at_k(spark, sf_dir):
    """Recall@k curve (k = 1..10): per query, the share of ALL same-label
    train points captured in the top k, averaged over queries — the
    completeness companion of ml_precision_at_k. Per-query denominators
    come from exact label counts on the train side; per-(query, k)
    recalls quantize to micro units before the cross-query mean."""
    from .knn import knn_test_topk

    e = tables.embeddings(spark, sf_dir)
    t = knn_test_topk(spark, sf_dir, 10).select(
        "qid", "qlabel", "rnk", (col("tlabel") == col("qlabel")).cast("long").alias("rel")
    )
    # relevant set size per query: same-label points excluding the query
    lbl_counts = e.groupBy("label").agg(F.count("*").alias("n_lbl"))
    qrel = (
        t.select("qid", "qlabel").distinct()
        .join(F.broadcast(lbl_counts), col("qlabel") == col("label"))
        .select("qid", F.expr("n_lbl - 1").alias("n_rel"))
    )
    w = Window.partitionBy("qid").orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = t.withColumn("cum_rel", F.sum("rel").over(w)).join(qrel, "qid").select(
        col("rnk").cast("long").alias("k"),
        F.expr(
            "TRY_CAST(round(cum_rel / CAST(n_rel AS DOUBLE) * 1000000, 0) AS BIGINT)"
        ).alias("rq"),
    )
    return cum.groupBy("k").agg(
        F.count("*").alias("n_queries"), F.sum("rq").alias("s")
    ).select(
        "k",
        "n_queries",
        F.expr(
            "round(s / (n_queries * CAST(1000000 AS DOUBLE)), 4)"
        ).alias("recall_at_k"),
    )


def _q_edge_length_stats(spark, sf_dir):
    """Distance statistics over the mutual-kNN edges: min / mean / exact
    median / max of the edge lengths — how tight the symmetric
    neighborhood structure is, the scale parameter an ε-graph would
    need. Distances round to 4dp; the median is the exact lower median
    by rank; the mean sums the rounded values as scaled integers."""
    from .knn import K_JOIN, _q_mutual, knn_self_join

    m = _q_mutual(spark, sf_dir)
    d = knn_self_join(spark, sf_dir, K_JOIN).select(
        col("qid").alias("a"), col("tid").alias("b"), F.round("dist", 4).alias("dr")
    )
    ed = m.join(d, ["a", "b"]).select("dr")
    n = ed.agg(F.count("*").alias("n"))
    # value-at-rank via the two-phase prefix scan; the value at a rank
    # index is invariant to tie order among equal dr.
    med = (
        prefix.attach_running(ed, ["dr"], rn="r")
        .crossJoin(F.broadcast(n))
        .filter(col("r") == F.expr("CAST(ceil(n / 2.0) AS BIGINT)"))
        .select(col("dr").alias("median_d"))
    )
    agg = ed.agg(
        F.count("*").alias("n_edges"),
        F.min("dr").alias("min_d"),
        F.max("dr").alias("max_d"),
        F.sum(F.expr("TRY_CAST(round(dr * 10000, 0) AS BIGINT)")).alias("s4"),
    )
    return agg.crossJoin(med).select(
        "n_edges",
        "min_d",
        F.expr("round(s4 / (n_edges * CAST(10000 AS DOUBLE)), 4)").alias("mean_d"),
        "median_d",
        "max_d",
    )


def _q_bounce_rate(spark, sf_dir):
    """Session bounce rate per user bucket: share of 30-minute-gap
    sessions containing exactly one event — the engagement-quality
    metric on top of the graded sessionization. Sessions come from the
    lag/gap/cumsum formulation (the str_window_session twin); exact
    integer counts, deciles by user id bucket for a bounded output."""
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (col("ts_us") - F.lag("ts_us").over(w) > lit(1_800_000_000)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    ).withColumn(
        "sess",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = marked.groupBy("user_id", "sess").agg(F.count("*").alias("n_ev"))
    return sess.groupBy((col("user_id") % 10).alias("user_bucket")).agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.expr("CAST(n_ev = 1 AS INT)")).alias("n_bounces"),
        F.expr(
            "round(sum(CAST(n_ev = 1 AS INT)) / CAST(count(*) AS DOUBLE), 4)"
        ).alias("bounce_rate"),
    )


def _q_degree_entropy(spark, sf_dir):
    """Shannon entropy of the mutual-kNN degree distribution — the
    heterogeneity of the neighborhood structure in one number (0 =
    regular graph, higher = broad degree spread). Exact integer degree
    histogram; nano-quantized entropy terms."""
    from .knn import _q_mutual

    m = _q_mutual(spark, sf_dir)
    e = tables.embeddings(spark, sf_dir)
    sym = m.select(col("a").alias("node")).unionByName(
        m.select(col("b").alias("node"))
    )
    deg = (
        e.select(col("vec_id").alias("node"))
        .join(sym.groupBy("node").agg(F.count("*").alias("d")), "node", "left")
        .select(F.coalesce("d", lit(0)).alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("c"))
    n = deg.agg(F.count("*").alias("n"))
    terms = hist.crossJoin(F.broadcast(n)).select(
        F.expr(
            "TRY_CAST(round(-(c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)) "
            "* 1000000000, 0) AS BIGINT)"
        ).alias("hq")
    )
    return terms.agg(
        F.count("*").alias("n_degree_values"), F.sum("hq").alias("s")
    ).select(
        "n_degree_values",
        F.expr(
            "round(s / CAST(1000000000 AS DOUBLE), 4)"
        ).alias("degree_entropy_nats"),
    )


def _q_tpr_at_fixed_fpr(spark, sf_dir):
    """TPR at the largest threshold keeping FPR ≤ 5% — the fixed-
    false-positive-budget operating constraint (security/fraud
    deployments pick thresholds this way). The FPR cap compares
    fp·20 ≤ neg in exact integers; among admissible thresholds the
    lowest (most sensitive) wins deterministically."""
    pts = _emb_scored_pts(spark, sf_dir)
    cum = _score_sweep_cum(pts)  # two-phase prefix scan, no global window
    g = pts.agg(F.sum("y").alias("p"), F.expr("count(*) - sum(y)").alias("neg"))
    adm = cum.crossJoin(F.broadcast(g)).filter(col("fp") * 20 <= col("neg"))
    # argmax via orderBy+limit(1) (TakeOrderedAndProject), not a global
    # rank window over the admissible-threshold sweep.
    return (
        adm.orderBy(F.desc("tp"), "score")
        .limit(1)
        .select(
            F.expr("round(score, 4) + CAST(0 AS DOUBLE)").alias("threshold"),
            "tp",
            "fp",
            F.expr("round(try_divide(CAST(tp AS DOUBLE), p), 4)").alias("tpr"),
            F.expr("round(try_divide(CAST(fp AS DOUBLE), neg), 4)").alias("fpr"),
        )
    )


def _q_exceedance_episodes(spark, sf_dir):
    """Exceedance episodes: maximal runs of hours above the series'
    exact P90 (rank ⌈0.9n⌉) — how long overload conditions persist,
    the duration view ts_peak_detect's point flags miss. Islands trick
    over the thresholded hours; exact integers throughout."""
    series = _hourly_series(spark, sf_dir)
    wq = Window.orderBy("c", "h")
    n = series.agg(F.count("*").alias("n"))
    thr = (
        series.withColumn("r", F.row_number().over(wq))
        .crossJoin(F.broadcast(n))
        .filter(col("r") == F.expr("CAST(ceil(0.9 * n) AS BIGINT)"))
        .select(col("c").alias("thr"))
    )
    above = series.crossJoin(F.broadcast(thr)).filter(col("c") > col("thr"))
    w = Window.orderBy("h")
    runs = above.withColumn(
        "grp", col("h") - F.row_number().over(w)
    )
    return runs.groupBy("grp").agg(
        F.min("h").alias("start_h"),
        F.count("*").alias("duration_h"),
        F.max("c").alias("peak_c"),
    ).select("start_h", "duration_h", "peak_c")


#: Holt's linear recurrence, written ONCE as SQL lambda text shared by
#: both engines: a left fold evaluates the identical IEEE expression tree
#: on identical doubles, so the state is bit-identical — quantization
#: (×10⁴ half-up) happens only on the emitted columns. α=0.5, β=0.25.
_HOLT_STEP_L = "0.5 * x + 0.5 * (acc.l + acc.b)"
_HOLT_STEP = (
    "(acc, x) -> "
    f"struct({_HOLT_STEP_L} AS l, "
    f"0.25 * (({_HOLT_STEP_L}) - acc.l) + 0.75 * acc.b AS b)"
)


def _q_holt_linear(spark, sf_dir):
    """Holt's linear (level+trend) exponential smoothing per event type
    over the hourly count series — the trend-aware sibling of ts_ewma.
    The series is collected per key as a sorted array (series length =
    hours of history, not rows) and folded with a Catalyst `aggregate`
    lambda; DuckDB folds the same lambda text via list_reduce, so the
    doubles agree bit-for-bit and only the final ×10⁴ quantization is
    emitted. Scale: one shuffle to (type, hour), one to type; the fold
    is map-side over a bounded array."""
    ev = tables.table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").alias("c"))
    series = hourly.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(h, c))), s -> CAST(s.c AS DOUBLE))"
        ).alias("xs")
    )
    folded = series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_hours"),
        F.expr(
            "aggregate(slice(xs, 2, size(xs) - 1), "
            "struct(element_at(xs, 1) AS l, CAST(0.0 AS DOUBLE) AS b), "
            f"{_HOLT_STEP})"
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        F.expr("TRY_CAST(round(st.l * 10000) AS BIGINT)").alias("level_q4"),
        F.expr("TRY_CAST(round(st.b * 10000) AS BIGINT)").alias("trend_q4"),
        F.expr("TRY_CAST(round((st.l + st.b) * 10000) AS BIGINT)").alias("forecast1_q4"),
    )


QUERIES = {
    "ts_gaps_islands": _q_gaps_islands,
    "str_retention_cohort": _q_retention_cohort,
    "str_rolling_active": _q_rolling_active,
    "ts_autocorr": _q_autocorr,
    "ts_ewma": _q_ewma,
    "ts_holt_linear": _q_holt_linear,
    "ml_ks_test": _q_ks_test,
    "rel_join_bloom_prefilter": _q_bloom_prefilter,
    "graph_linkpred_jaccard": _q_linkpred,
    "ml_decision_stump": _q_decision_stump,
    "llm_zipf_slope": _q_zipf_slope,
    "llm_vocab_coverage": _q_vocab_coverage,
    "llm_mix_temperature": _q_mix_temperature,
    "ml_mi_lang_source": _q_mi_lang_source,
    "ts_seasonal_profile": _q_seasonal_profile,
    "ts_anomaly_rolling_z": _q_anomaly_rolling_z,
    "ts_cusum": _q_cusum,
    "ml_spearman_rho": _q_spearman,
    "ml_kendall_tau": _q_kendall,
    "graph_khop_reach": _q_khop,
    "graph_assortativity": _q_assortativity,
    "rel_top_mover": _q_top_mover,
    "str_power_users_pareto": _q_power_users,
    "ml_ab_test_proportions": _q_ab_proportions,
    "ts_changepoint": _q_changepoint,
    "llm_ngram_novelty": _q_ngram_novelty,
    "ml_feature_gain": _q_feature_gain,
    "ml_roc_curve": _q_roc_curve,
    "ml_calibration_knn": _q_calibration_knn,
    "graph_component_sizes": _q_component_sizes,
    "ts_periodogram": _q_periodogram,
    "ml_brier_score": _q_brier_score,
    "ml_log_loss": _q_log_loss,
    "llm_dedup_threshold_sweep": _q_dedup_threshold_sweep,
    "str_arrival_iat_stats": _q_arrival_iat,
    "ts_downsample_minmax": _q_downsample_minmax,
    "ts_trend_theil_sen": _q_theil_sen,
    "ts_mad_outliers": _q_mad_outliers,
    "llm_minhash_est_vs_exact": _q_minhash_est_vs_exact,
    "rel_incremental_agg": _q_incremental_agg,
    "rel_snapshot_diff": _q_snapshot_diff,
    "llm_dataset_card": _q_dataset_card,
    "graph_label_prop": _q_label_prop,
    "rel_select_except": _q_select_except,
    "rel_group_by_all": _q_group_by_all,
    "ml_psi_drift": _q_psi_drift,
    "ml_chi2_independence": _q_chi2_independence,
    "ts_ohlc": _q_ohlc,
    "ml_dist_concentration": _q_dist_concentration,
    "ts_interp_linear": _q_interp_linear,
    "ml_gini_user_activity": _q_gini_activity,
    "ml_assoc_rules": _q_assoc_rules,
    "ts_fano_burstiness": _q_fano_burstiness,
    "graph_bfs_dist": _q_bfs_dist,
    "llm_keywords_per_doc": _q_keywords_per_doc,
    "llm_tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
    "ml_pr_curve": _q_pr_curve,
    "graph_clustering_coeff": _q_clustering_coeff,
    "llm_token_entropy": _q_token_entropy,
    "ml_cohens_kappa": _q_cohens_kappa,
    "ml_gains_table": _q_gains_table,
    "str_time_to_convert": _q_time_to_convert,
    "llm_lang_vocab_overlap": _q_lang_vocab_overlap,
    "rel_order_by_all": _q_order_by_all,
    "rel_try_arith": _q_try_arith,
    "ml_logreg_irls1": _q_logreg_irls1,
    "ts_drawdown": _q_drawdown,
    "graph_kcore_peel": _q_kcore_peel,
    "ts_sax_symbols": _q_sax_symbols,
    "llm_shingle_containment": _q_shingle_containment,
    "ts_decompose_stl": _q_decompose,
    "ml_mcc": _q_mcc,
    "ml_platt_1step": _q_platt_1step,
    "ts_ljung_box": _q_ljung_box,
    "ts_peak_detect": _q_peak_detect,
    "rel_fn_variant": _q_variant_fn,
    "graph_degree_gini": _q_degree_gini,
    "ts_cross_correlation": _q_cross_correlation,
    "ts_variance_time": _q_variance_time,
    "rel_histogram_log": _q_histogram_log,
    "llm_perplexity_unigram": _q_perplexity,
    "ml_ndcg_at10": _q_ndcg,
    "graph_modularity": _q_modularity,
    "ts_hurst_rs": _q_hurst_rs,
    "ml_cluster_purity_nmi": _q_cluster_purity_nmi,
    "rel_yoy_growth": _q_yoy_growth,
    "ml_tukey_fences": _q_tukey_fences,
    "ml_kmeans_inertia": _q_kmeans_inertia,
    "llm_lang_confusion": _q_lang_confusion,
    "ml_learning_curve": _q_learning_curve,
    "rel_fk_integrity_audit": _q_fk_integrity,
    "str_user_temporal_entropy": _q_user_temporal_entropy,
    "ml_ivf_recall_at10": _q_ivf_recall,
    "ts_lag_features": _q_lag_features,
    "llm_embed_outliers": _q_embed_outliers,
    "graph_reciprocity": _q_reciprocity,
    "rel_hash_uniformity_chi2": _q_hash_uniformity,
    "llm_bigram_crossentropy": _q_bigram_crossentropy,
    "rel_skyline_pareto": _q_skyline,
    "ml_conformal_knn": _q_conformal_knn,
    "llm_boilerplate_prefix": _q_boilerplate_prefix,
    "llm_edit_distance_pairs": _q_edit_distance_pairs,
    "ts_merge_intervals": _q_merge_intervals,
    "ts_backtest_snaive": _q_backtest_snaive,
    "str_pattern_match_seq": _q_pattern_match_seq,
    "ts_rle_sax": _q_rle_sax,
    "ml_class_weights": _q_class_weights,
    "ts_season_strength": _q_season_strength,
    "ml_embed_drift_ks": _q_embed_drift_ks,
    "ts_acf_significance": _q_acf_significance,
    "ml_kaplan_meier": _q_kaplan_meier,
    "graph_transitivity": _q_transitivity,
    "ml_mcnemar_test": _q_mcnemar,
    "str_cohort_ltv": _q_cohort_ltv,
    "llm_lsh_bucket_stats": _q_lsh_bucket_stats,
    "ts_weekday_weekend_profile": _q_weekday_weekend_profile,
    "ml_ece": _q_ece,
    "llm_hapax_stats": _q_hapax_stats,
    "rel_join_natural": _q_join_natural,
    "ts_type_correlation_matrix": _q_type_correlation,
    "ml_dim_ablation": _q_dim_ablation,
    "str_new_vs_returning": _q_new_vs_returning,
    "rel_column_profile": _q_column_profile,
    "ts_completeness": _q_completeness,
    "ml_label_noise_flags": _q_label_noise_flags,
    "ml_lowe_ratio": _q_lowe_ratio,
    "ml_balanced_accuracy": _q_balanced_accuracy,
    "ts_runs_test": _q_runs_test,
    "graph_hits": _q_hits,
    "str_stickiness": _q_stickiness,
    "ml_youden_threshold": _q_youden_threshold,
    "ml_average_precision": _q_average_precision,
    "ts_pacf_2": _q_pacf_2,
    "graph_summary_stats": _q_graph_summary,
    "ts_spectral_entropy": _q_spectral_entropy,
    "llm_heaps_law": _q_heaps_law,
    "ml_f1_scores": _q_f1_scores,
    "ts_max_drawdown": _q_max_drawdown,
    "ts_mann_kendall": _q_mann_kendall,
    "llm_vocab_kl_divergence": _q_vocab_kl,
    "str_churn_labels": _q_churn_labels,
    "ts_persistence_error_curve": _q_persistence_error_curve,
    "rel_unique_key_audit": _q_unique_key_audit,
    "ml_best_f1_threshold": _q_best_f1_threshold,
    "ts_gumbel_fit": _q_gumbel_fit,
    "llm_term_burstiness": _q_term_burstiness,
    "str_rfm_segments": _q_rfm_segments,
    "ml_precision_at_k": _q_precision_at_k,
    "llm_dedup_cluster_langs": _q_dedup_cluster_langs,
    "ml_operating_point_card": _q_operating_point_card,
    "ts_median_filter": _q_median_filter,
    "ml_vote_margin": _q_vote_margin,
    "ml_recall_at_k": _q_recall_at_k,
    "graph_edge_length_stats": _q_edge_length_stats,
    "str_bounce_rate": _q_bounce_rate,
    "graph_degree_entropy": _q_degree_entropy,
    "ml_tpr_at_fixed_fpr": _q_tpr_at_fixed_fpr,
    "ts_exceedance_episodes": _q_exceedance_episodes,
}


# ------------------------------------------------------------------- oracle

_UD = f"WITH {_EVD}, ud AS (SELECT DISTINCT user_id, day FROM evd)"

# Mutual-kNN edge list (a < b), k=5 — mirrors operators/knn.py K_JOIN.
_MUTUAL = (
    "emb AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings), "
    "pairs AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
    "list_distance(q.emb, t.emb) AS dist FROM emb q, emb t WHERE t.vec_id <> q.vec_id), "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "e AS (SELECT qid, tid FROM ranked WHERE rnk <= 5), "
    "m AS (SELECT a.qid AS a, a.tid AS b FROM e a JOIN e b "
    "ON a.qid = b.tid AND a.tid = b.qid WHERE a.qid < a.tid)"
)

ORACLE = {
    "ts_gaps_islands": (
        f"{_UD}, g AS (SELECT user_id, day, "
        "day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM ud) "
        "SELECT user_id, min(day) AS start_day, max(day) AS end_day, "
        "count(*) AS n_days FROM g GROUP BY user_id, grp"
    ),
    "str_retention_cohort": (
        f"{_UD}, cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id) "
        "SELECT cohort_day, day - cohort_day AS day_offset, "
        "count(DISTINCT ud.user_id) AS n_users "
        "FROM ud JOIN cohort ON ud.user_id = cohort.user_id "
        "GROUP BY cohort_day, day_offset"
    ),
    "str_rolling_active": (
        f"{_UD}, ex AS (SELECT user_id, day + k AS d FROM ud, range(7) t(k)) "
        "SELECT d, count(DISTINCT user_id) AS actives_7d FROM ex "
        "WHERE d <= (SELECT max(day) FROM ud) GROUP BY d"
    ),
    "ts_autocorr": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "lagagg AS (SELECT k, count(*) AS nk, sum(a.c * b.c) AS p, "
        "sum(a.c) AS ak, sum(b.c) AS bk "
        "FROM s a, range(1, 25) t(k), s b WHERE a.h - k = b.h GROUP BY k), "
        "g AS (SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS ss FROM s), "
        "j AS (SELECT *, s1 / n AS m FROM lagagg, g) "
        "SELECT k, nk AS n_pairs, "
        "round((p - m * (ak + bk) + nk * m * m) / (ss - n * m * m), 4) AS acf FROM j"
    ),
    "ts_holt_linear": materialize_ctes(
        # recursive CTE replays the identical fold arithmetic (DuckDB
        # 1.0's list_reduce evaluates struct fields sequentially — the
        # b-expression would see the already-updated l — so the fold is
        # written as standard recursion instead)
        f"WITH RECURSIVE {_EVD}, "
        "hourly AS (SELECT event_type, h, count(*) AS c FROM evd GROUP BY event_type, h), "
        "ordered AS (SELECT event_type, CAST(c AS DOUBLE) AS x, "
        "row_number() OVER (PARTITION BY event_type ORDER BY h) AS i FROM hourly), "
        "nn AS (SELECT event_type, max(i) AS nmax FROM ordered GROUP BY event_type), "
        "rec AS ("
        "SELECT event_type, i, x AS l, CAST(0.0 AS DOUBLE) AS b FROM ordered WHERE i = 1 "
        "UNION ALL "
        "SELECT r.event_type, r.i + 1, "
        "0.5 * o.x + 0.5 * (r.l + r.b) AS l, "
        "0.25 * ((0.5 * o.x + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b AS b "
        "FROM rec r JOIN ordered o ON o.event_type = r.event_type AND o.i = r.i + 1) "
        "SELECT r.event_type, nn.nmax AS n_hours, "
        "TRY_CAST(round(r.l * 10000) AS BIGINT) AS level_q4, "
        "TRY_CAST(round(r.b * 10000) AS BIGINT) AS trend_q4, "
        "TRY_CAST(round((r.l + r.b) * 10000) AS BIGINT) AS forecast1_q4 "
        "FROM rec r JOIN nn ON r.event_type = nn.event_type WHERE r.i = nn.nmax"
    ),
    "ts_ewma": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "contrib AS (SELECT t.h AS ht, t.c AS ct, "
        "j.c * (CAST(1 AS BIGINT) << CAST(19 - k AS INT)) AS w "
        "FROM s t, range(20) r(k), s j WHERE t.h - k = j.h) "
        "SELECT ht AS h, ct AS c, round(sum(w) / 1048576.0, 4) AS ewma "
        "FROM contrib GROUP BY ht, ct"
    ),
    "ml_ks_test": (
        # value IS NOT NULL: NULL measurements are excluded from the
        # distribution on both engines (see ks_two_sample)
        f"WITH g AS (SELECT {_CENTS.format(x='value')} AS vc, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS grp FROM events "
        "WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL), "
        "per AS (SELECT vc, sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a, "
        "sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS b FROM g GROUP BY vc), "
        "cum AS (SELECT sum(a) OVER w AS ca, sum(b) OVER w AS cb FROM per "
        "WINDOW w AS (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "t AS (SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
        "CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2 FROM g), "
        "d AS (SELECT n1, n2, CAST(max(abs(ca * n2 - cb * n1)) AS BIGINT) AS d_scaled "
        "FROM cum, t GROUP BY n1, n2) "
        "SELECT n1, n2, d_scaled, "
        "round(CAST(d_scaled AS DOUBLE) / (n1 * n2), 4) AS d_stat FROM d"
    ),
    "rel_join_bloom_prefilter": (
        "SELECT o.o_orderstatus AS status, count(*) AS n_items, "
        f"CAST(sum({_CENTS.format(x=_REV)}) AS BIGINT) AS rev_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderpriority = '1-URGENT' GROUP BY o.o_orderstatus"
    ),
    "graph_linkpred_jaccard": (
        f"WITH {_MUTUAL}, "
        "sym AS (SELECT a, b FROM m UNION ALL SELECT b AS a, a AS b FROM m), "
        "deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a), "
        "cand AS (SELECT s1.a AS x, s2.a AS y, count(*) AS cn "
        "FROM sym s1 JOIN sym s2 ON s1.b = s2.b AND s1.a < s2.a "
        "GROUP BY s1.a, s2.a), "
        "nocand AS (SELECT * FROM cand c WHERE NOT EXISTS "
        "(SELECT 1 FROM m WHERE m.a = c.x AND m.b = c.y)), "
        "scored AS (SELECT x, y, cn, cn / (dx.deg + dy.deg - cn) AS jac "
        "FROM nocand JOIN deg dx ON nocand.x = dx.a JOIN deg dy ON nocand.y = dy.a) "
        "SELECT x, y, cn AS common_neighbors, round(jac, 4) AS jaccard "
        "FROM scored ORDER BY jac DESC, x, y LIMIT 20"
    ),
    "ml_decision_stump": (
        # pts0/pts split: poisoned vectors leave the stump like the
        # engine's NULL-dropping scalar read (r10 sweep)
        "WITH pts0 AS (SELECT CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] AS x, "
        "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
        "pts AS (SELECT * FROM pts0 WHERE x IS NOT NULL), "
        "per AS (SELECT x, count(*) AS n, sum(y) AS pos FROM pts GROUP BY x), "
        "cum AS (SELECT x, sum(n) OVER w AS cn, sum(pos) OVER w AS cp FROM per "
        "WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "g AS (SELECT count(*) AS nn, sum(y) AS p FROM pts), "
        "scored AS (SELECT x, nn, nn - p + 2 * cp - cn AS acc_pos_left, "
        "cn + p - 2 * cp AS acc_neg_left FROM cum, g), "
        "best AS (SELECT x, nn, greatest(acc_pos_left, acc_neg_left) AS correct, "
        "CASE WHEN acc_pos_left >= acc_neg_left THEN 1 ELSE 0 END AS pos_left "
        "FROM scored) "
        "SELECT round(x, 4) AS threshold, pos_left, CAST(correct AS BIGINT) AS correct, "
        "round(CAST(correct AS DOUBLE) / nn, 4) AS accuracy, nn AS n "
        "FROM best ORDER BY correct DESC, x LIMIT 1"
    ),
    "llm_zipf_slope": (
        f"WITH {_TOKS}, "
        "top AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq "
        "QUALIFY r <= 100), "
        "q AS (SELECT TRY_CAST(round(ln(CAST(r AS DOUBLE)) * 1000000, 0) AS BIGINT) AS xi, "
        "TRY_CAST(round(ln(CAST(f AS DOUBLE)) * 1000000, 0) AS BIGINT) AS yi FROM top), "
        "mom AS (SELECT count(*) AS n, sum(xi) AS sx, sum(yi) AS sy, "
        "sum(xi * yi) AS sxy, sum(xi * xi) AS sxx FROM q) "
        "SELECT n AS n_top, "
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope, "
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) "
        "/ (n * 1000000.0), 4) AS intercept_ln FROM mom"
    ),
    "llm_vocab_coverage": (
        f"WITH {_TOKS}, "
        "ranked AS (SELECT row_number() OVER (ORDER BY f DESC, tok) AS r, "
        "sum(f) OVER (ORDER BY f DESC, tok ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS cum FROM freq), "
        "tot AS (SELECT sum(f) AS t FROM freq), "
        "thr AS (SELECT unnest([50, 90, 99]) AS threshold_pct), "
        "hit AS (SELECT threshold_pct, min(r) AS vocab_size "
        "FROM ranked, tot, thr WHERE cum * 100 >= threshold_pct * t "
        "GROUP BY threshold_pct) "
        "SELECT threshold_pct, vocab_size, CAST(cum AS BIGINT) AS covered_tokens "
        "FROM hit JOIN ranked ON hit.vocab_size = ranked.r"
    ),
    "llm_mix_temperature": (
        "WITH byl AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), "
        "tot AS (SELECT count(*) AS nn FROM documents), "
        "q AS (SELECT lang, n, nn, "
        "TRY_CAST(round(sqrt(n / nn) * 1000000, 0) AS BIGINT) AS wi FROM byl, tot), "
        "sw AS (SELECT sum(wi) AS sw FROM q) "
        "SELECT lang, n AS n_docs, round(n / nn, 4) AS share_raw, "
        "round(wi / sw, 4) AS share_temp FROM q, sw"
    ),
    "ts_seasonal_profile": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "prof AS (SELECT h % 24 AS hod, count(*) AS n_hours, "
        "CAST(sum(c) AS BIGINT) AS total_events FROM s GROUP BY h % 24), "
        "g AS (SELECT count(*) AS n_all, CAST(sum(c) AS BIGINT) AS s_all FROM s) "
        "SELECT hod, n_hours, total_events, "
        "round(CAST(total_events AS DOUBLE) / n_hours, 4) AS mean_per_hour, "
        "round(CAST(total_events * n_all AS DOUBLE) / (n_hours * s_all), 4) "
        "AS rel_to_overall FROM prof, g"
    ),
    "ts_anomaly_rolling_z": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "scored AS (SELECT h, c, count(c) OVER w AS nn, sum(c) OVER w AS mn, "
        "sum(c * c) OVER w AS ss FROM s "
        "WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) "
        "SELECT h, c, round((c - CAST(mn AS DOUBLE) / nn) / "
        "sqrt((ss - CAST(mn AS DOUBLE) * mn / nn) / (nn - 1)), 4) AS z "
        "FROM scored WHERE nn >= 24 AND ss * nn > mn * mn"
    ),
    "ts_cusum": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "g AS (SELECT count(*) AS n_all, CAST(sum(c) AS BIGINT) AS s_all FROM s), "
        "d AS (SELECT h, c, n_all, c * n_all - s_all AS d FROM s, g), "
        "r AS (SELECT h, c, n_all, sum(d) OVER (ORDER BY h ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM d) "
        "SELECT h, c, round((r - min(r) OVER (ORDER BY h ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW)) / CAST(n_all AS DOUBLE), 4) "
        "AS cusum FROM r"
    ),
    "ml_spearman_rho": (
        # pts0/pts split: the engine reads scalars off the POISONED
        # vector and drops NULL rows before ranking (posexplode-class
        # exclusion), so the oracle must too (r10 non-finite sweep)
        "WITH pts0 AS (SELECT CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] AS x, "
        "CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[2] AS y FROM embeddings), "
        "pts AS (SELECT * FROM pts0 WHERE x IS NOT NULL AND y IS NOT NULL), "
        "r AS (SELECT 2 * rank() OVER (ORDER BY x) + count(*) OVER "
        "(PARTITION BY x) - 1 AS rx, 2 * rank() OVER (ORDER BY y) + count(*) OVER "
        "(PARTITION BY y) - 1 AS ry FROM pts), "
        "m AS (SELECT count(*) AS n, CAST(sum(rx) AS BIGINT) AS sx, "
        "CAST(sum(ry) AS BIGINT) AS sy, CAST(sum(rx * ry) AS BIGINT) AS sxy, "
        "CAST(sum(rx * rx) AS BIGINT) AS sxx, CAST(sum(ry * ry) AS BIGINT) AS syy "
        "FROM r) "
        "SELECT n, round((n * sxy - sx * sy) / "
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 4) AS rho "
        "FROM m"
    ),
    "ml_kendall_tau": (
        "WITH pts AS (SELECT vec_id AS id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] AS x, "
        "CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[2] AS y FROM embeddings), "
        "pair AS (SELECT a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj "
        "FROM pts a JOIN pts b ON a.id < b.id), "
        "cd AS (SELECT CAST(sum(CASE WHEN (xi < xj AND yi < yj) OR "
        "(xi > xj AND yi > yj) THEN 1 ELSE 0 END) AS BIGINT) AS nc, "
        "CAST(sum(CASE WHEN (xi < xj AND yi > yj) OR (xi > xj AND yi < yj) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS nd FROM pair), "
        "n0 AS (SELECT CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n0 FROM pts), "
        "tx AS (SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1 FROM "
        "(SELECT count(*) AS t FROM pts GROUP BY x)), "
        "ty AS (SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2 FROM "
        "(SELECT count(*) AS t FROM pts GROUP BY y)) "
        "SELECT nc, nd, round((nc - nd) / "
        "sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)), 4) AS tau_b "
        "FROM cd, n0, tx, ty"
    ),
    "graph_khop_reach": (
        f"WITH {_MUTUAL}, "
        "sym AS (SELECT a, b FROM m UNION ALL SELECT b AS a, a AS b FROM m), "
        "deg AS (SELECT a, count(*) AS n_1hop FROM sym GROUP BY a), "
        "h2 AS (SELECT DISTINCT s1.a AS u, s2.b AS w FROM sym s1 "
        "JOIN sym s2 ON s1.b = s2.a WHERE s1.a <> s2.b), "
        "h2x AS (SELECT u, w FROM h2 WHERE NOT EXISTS "
        "(SELECT 1 FROM sym WHERE sym.a = h2.u AND sym.b = h2.w)), "
        "hop2 AS (SELECT u, count(*) AS n_2hop FROM h2x GROUP BY u) "
        "SELECT deg.a AS node, n_1hop, COALESCE(n_2hop, 0) AS n_2hop "
        "FROM deg LEFT JOIN hop2 ON deg.a = hop2.u"
    ),
    "graph_assortativity": (
        f"WITH {_MUTUAL}, "
        "sym AS (SELECT a, b FROM m UNION ALL SELECT b AS a, a AS b FROM m), "
        "deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a), "
        "pair AS (SELECT da.deg AS da, db.deg AS db FROM sym "
        "JOIN deg da ON sym.a = da.a JOIN deg db ON sym.b = db.a), "
        "m2 AS (SELECT count(*) AS n, CAST(sum(da) AS BIGINT) AS sx, "
        "CAST(sum(db) AS BIGINT) AS sy, CAST(sum(da * db) AS BIGINT) AS sxy, "
        "CAST(sum(da * da) AS BIGINT) AS sxx, CAST(sum(db * db) AS BIGINT) AS syy "
        "FROM pair) "
        "SELECT n, round((n * sxy - sx * sy) / "
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 4) "
        "AS assortativity FROM m2"
    ),
    "rel_top_mover": (
        f"WITH {_EVD}, "
        "daily AS (SELECT event_type, day, count(*) AS cnt FROM evd "
        "GROUP BY event_type, day), "
        "d AS (SELECT event_type, day, cnt, lag(cnt) OVER "
        "(PARTITION BY event_type ORDER BY day) AS prev FROM daily) "
        "SELECT event_type, day, cnt, prev, cnt - prev AS delta FROM d "
        "WHERE prev IS NOT NULL "
        "ORDER BY abs(cnt - prev) DESC, event_type, day LIMIT 5"
    ),
    "str_power_users_pareto": (
        f"WITH {_EVD}, "
        "per AS (SELECT user_id, count(*) AS c FROM evd GROUP BY user_id), "
        "ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn "
        "FROM per), "
        "g AS (SELECT count(*) AS n_users, CAST(sum(c) AS BIGINT) AS total_events "
        "FROM per), "
        "top AS (SELECT n_users, total_events, count(*) AS top_users, "
        "CAST(sum(c) AS BIGINT) AS top_events FROM ranked, g "
        "WHERE rn * 10 <= n_users + 9 GROUP BY n_users, total_events) "
        "SELECT n_users, top_users, total_events, top_events, "
        "round(CAST(top_events AS DOUBLE) / total_events, 4) AS share FROM top"
    ),
    "ml_ab_test_proportions": (
        "WITH per AS (SELECT user_id % 2 AS bucket, count(*) AS n, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS x FROM events GROUP BY user_id % 2), "
        "a AS (SELECT n AS n1, x AS x1 FROM per WHERE bucket = 0), "
        "b AS (SELECT n AS n2, x AS x2 FROM per WHERE bucket = 1) "
        "SELECT n1, x1, n2, x2, "
        "round(CAST(x1 AS DOUBLE) / n1, 4) AS p1, "
        "round(CAST(x2 AS DOUBLE) / n2, 4) AS p2, "
        "round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2) / "
        "sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2)) * "
        "(1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2)) * "
        "(CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)), 4) AS z "
        "FROM a, b"
    ),
    "ts_changepoint": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "g AS (SELECT count(*) AS n_all, CAST(sum(c) AS BIGINT) AS s_all FROM s), "
        "cum AS (SELECT h, row_number() OVER (ORDER BY h) AS rn, "
        "CAST(sum(c) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS cs FROM s), "
        "cand AS (SELECT * FROM cum, g WHERE rn >= 24 AND rn <= n_all - 24), "
        "scored AS (SELECT h, round(CAST(cs AS DOUBLE) / rn, 4) AS mean_left, "
        "round(CAST(s_all - cs AS DOUBLE) / (n_all - rn), 4) AS mean_right, "
        "round(abs(CAST(cs AS DOUBLE) / rn - "
        "CAST(s_all - cs AS DOUBLE) / (n_all - rn)), 4) AS score, "
        "abs(CAST(cs AS DOUBLE) / rn - "
        "CAST(s_all - cs AS DOUBLE) / (n_all - rn)) AS raw FROM cand) "
        "SELECT h AS split_h, mean_left, mean_right, score FROM scored "
        "ORDER BY raw DESC, h LIMIT 1"
    ),
    "llm_ngram_novelty": (
        "WITH toksd AS (SELECT doc_id, string_split(text, ' ') AS ts "
        "FROM documents WHERE len(string_split(text, ' ')) >= 2), "
        "bi AS (SELECT DISTINCT doc_id, ts[CAST(i AS INTEGER)] || ' ' || "
        "ts[CAST(i + 1 AS INTEGER)] AS bg FROM toksd, range(1, 300) t(i) "
        "WHERE i <= len(ts) - 1), "
        "test AS (SELECT * FROM bi WHERE doc_id % 10 = 0), "
        "train AS (SELECT DISTINCT bg FROM bi WHERE doc_id % 10 <> 0), "
        "unseen AS (SELECT doc_id, count(*) AS n_unseen FROM test "
        "WHERE NOT EXISTS (SELECT 1 FROM train WHERE train.bg = test.bg) "
        "GROUP BY doc_id), "
        "per AS (SELECT doc_id, count(*) AS n_bigrams FROM test GROUP BY doc_id) "
        "SELECT per.doc_id, n_bigrams, COALESCE(n_unseen, 0) AS n_unseen, "
        "round(CAST(COALESCE(n_unseen, 0) AS DOUBLE) / n_bigrams, 4) AS novelty "
        "FROM per LEFT JOIN unseen ON per.doc_id = unseen.doc_id"
    ),
    "ml_feature_gain": (
        "WITH embd AS (SELECT CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb, "
        "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
        # emb IS NOT NULL: poisoned vectors leave the stump sweep like
        # the engine's posexplode (r10 sweep)
        "pts AS (SELECT i - 1 AS dim, emb[CAST(i AS INTEGER)] AS x, y "
        "FROM embd, range(1, 9) t(i) WHERE emb IS NOT NULL), "
        "per AS (SELECT dim, x, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
        "FROM pts GROUP BY dim, x), "
        "cum AS (SELECT dim, x, CAST(sum(n) OVER w AS BIGINT) AS cn, "
        "CAST(sum(pos) OVER w AS BIGINT) AS cp FROM per "
        "WINDOW w AS (PARTITION BY dim ORDER BY x ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "g AS (SELECT dim, count(*) AS nn, CAST(sum(y) AS BIGINT) AS p "
        "FROM pts GROUP BY dim), "
        "scored AS (SELECT cum.dim, nn, "
        "greatest(nn - p + 2 * cp - cn, cn + p - 2 * cp) AS correct "
        "FROM cum JOIN g ON cum.dim = g.dim), "
        "best AS (SELECT dim, nn, CAST(max(correct) AS BIGINT) AS best_correct "
        "FROM scored GROUP BY dim, nn) "
        "SELECT dim, best_correct, "
        "round(CAST(best_correct AS DOUBLE) / nn, 4) AS accuracy FROM best"
    ),
    "ml_roc_curve": (
        "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
        "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
        "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
        "FROM pts GROUP BY score), "
        "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
        "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
        "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW)), "
        "g AS (SELECT CAST(sum(y) AS BIGINT) AS p, "
        "CAST(count(*) - sum(y) AS BIGINT) AS neg FROM pts) "
        "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
        "round(CAST(tp AS DOUBLE) / p, 4) AS tpr, "
        "round(CAST(fp AS DOUBLE) / neg, 4) AS fpr FROM cum, g"
    ),
    "graph_component_sizes": None,  # filled below (needs iterative CTE)
    "ml_calibration_knn": None,  # filled below (needs knn CTEs)
    "ts_periodogram": (
        f"WITH {_EVD}, {_HOURLY_SQL}, "
        "tt AS (SELECT c, row_number() OVER (ORDER BY h) - 1 AS t FROM s), "
        "nn AS (SELECT count(*) AS n FROM s), "
        "terms AS (SELECT k, n, TRY_CAST(round(c * cos(2 * pi() * k * t / n) "
        "* 100000000, 0) AS BIGINT) AS ca, "
        "TRY_CAST(round(c * sin(2 * pi() * k * t / n) * 100000000, 0) AS BIGINT) AS cb "
        "FROM tt, range(1, 37) r(k), nn), "
        "agg AS (SELECT k, n, CAST(sum(ca) AS BIGINT) AS a, "
        "CAST(sum(cb) AS BIGINT) AS b FROM terms GROUP BY k, n) "
        "SELECT k, round(((CAST(a AS DOUBLE) / 100000000) * "
        "(CAST(a AS DOUBLE) / 100000000) + (CAST(b AS DOUBLE) / 100000000) * "
        "(CAST(b AS DOUBLE) / 100000000)) / n, 4) AS power FROM agg"
    ),
    "ml_mi_lang_source": (
        "WITH cells AS (SELECT lang, source, count(*) AS nls FROM documents "
        "GROUP BY lang, source), "
        "ml AS (SELECT lang, count(*) AS nl FROM documents GROUP BY lang), "
        "ms AS (SELECT source, count(*) AS ns FROM documents GROUP BY source), "
        "tot AS (SELECT count(*) AS nn FROM documents), "
        "terms AS (SELECT TRY_CAST(round((nls / nn) * ln((CAST(nls AS DOUBLE) * nn) / "
        "(CAST(nl AS DOUBLE) * ns)) * 1000000000, 0) AS BIGINT) AS ti "
        "FROM cells JOIN ml USING (lang) JOIN ms USING (source), tot), "
        "mi AS (SELECT count(*) AS n_cells, "
        "round(sum(ti) / 1000000000.0, 4) AS mi_nats FROM terms), "
        "hl AS (SELECT round(sum(TRY_CAST(round(-(nl / nn) * ln(nl / nn) * 1000000000, 0) "
        "AS BIGINT)) / 1000000000.0, 4) AS h_lang_nats FROM ml, tot), "
        "hs AS (SELECT round(sum(TRY_CAST(round(-(ns / nn) * ln(ns / nn) * 1000000000, 0) "
        "AS BIGINT)) / 1000000000.0, 4) AS h_source_nats FROM ms, tot) "
        "SELECT * FROM mi, hl, hs"
    ),
}

# Oracles composed from other tiers' proven CTEs (imported at the bottom
# to keep module import order acyclic).
from .knn import _EMB as _KNN_EMB, _PAIRS as _KNN_PAIRS, _TOPK as _KNN_TOPK  # noqa: E402
from .knn import K_DEFAULT as _K  # noqa: E402
from .iterative import _COMPONENTS_SQL  # noqa: E402

ORACLE["ml_calibration_knn"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, {_KNN_TOPK}, "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT *, row_number() OVER (PARTITION BY qid "
    "ORDER BY votes DESC, tlabel) AS rn FROM votes) "
    "SELECT votes AS conf_votes, count(*) AS n, "
    "CAST(sum(CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct, "
    f"round(CAST(votes AS DOUBLE) / {_K}, 4) AS confidence, "
    "round(CAST(sum(CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ count(*), 4) AS empirical_acc "
    "FROM pred WHERE rn = 1 GROUP BY votes"
)

ORACLE["graph_component_sizes"] = materialize_ctes(
    f"WITH comp AS ({_COMPONENTS_SQL}) "
    "SELECT cluster_size AS size, count(DISTINCT cluster) AS n_clusters "
    "FROM comp GROUP BY cluster_size"
)

from .llm import _SH as _LLM_SH, _TOKS as _LLM_TOKS  # noqa: E402

ORACLE["ml_brier_score"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, {_KNN_TOPK}, "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "per AS (SELECT qid, CAST(sum(votes * votes) AS BIGINT) AS sv, "
    "CAST(sum(CASE WHEN tlabel = qlabel THEN votes ELSE 0 END) AS BIGINT) AS vy "
    "FROM votes GROUP BY qid), "
    f"scored AS (SELECT sv - 2 * {_K} * vy + {_K * _K} AS qs FROM per), "
    "agg AS (SELECT count(*) AS n_test, CAST(sum(qs) AS BIGINT) AS total FROM scored) "
    f"SELECT n_test, round(CAST(total AS DOUBLE) / (n_test * {_K * _K}), 4) AS brier "
    "FROM agg"
)

ORACLE["ml_log_loss"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, {_KNN_TOPK}, "
    "vy AS (SELECT qid, CAST(sum(CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END) "
    "AS BIGINT) AS vy FROM topk GROUP BY qid), "
    "terms AS (SELECT TRY_CAST(round(-ln((vy + 1) / "
    f"CAST({_K} + 10 AS DOUBLE)) * 1000000000, 0) AS BIGINT) AS ti FROM vy), "
    "agg AS (SELECT count(*) AS n_test, CAST(sum(ti) AS BIGINT) AS tsum FROM terms) "
    "SELECT n_test, round(tsum / CAST(1000000000 AS DOUBLE) / n_test, 4) AS log_loss "
    "FROM agg"
)

ORACLE["llm_dedup_threshold_sweep"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, "
    "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "j AS (SELECT i, sa.n AS na, sb.n AS nb FROM inter "
    "JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id), "
    "thr AS (SELECT unnest([50, 70, 90]) AS threshold_pct), "
    "hits AS (SELECT threshold_pct, count(*) AS c FROM j, thr "
    "WHERE i * 100 >= threshold_pct * (na + nb - i) GROUP BY threshold_pct) "
    "SELECT thr.threshold_pct, COALESCE(c, 0) AS n_pairs "
    "FROM thr LEFT JOIN hits ON thr.threshold_pct = hits.threshold_pct"
)

ORACLE["str_arrival_iat_stats"] = (
    "WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id FROM events), "
    "gaps AS (SELECT event_type, ts_us - lag(ts_us) OVER "
    "(PARTITION BY event_type ORDER BY ts_us, event_id) AS gap FROM ev) "
    "SELECT event_type, count(*) AS n_gaps, CAST(sum(gap) AS BIGINT) AS total_us, "
    "round(CAST(sum(gap) AS DOUBLE) / count(*), 4) AS mean_us, "
    "round(quantile_cont(gap, 0.5), 4) AS median_us, "
    "CAST(max(gap) AS BIGINT) AS max_us "
    "FROM gaps WHERE gap IS NOT NULL GROUP BY event_type"
)

ORACLE["ts_downsample_minmax"] = (
    f"WITH {_EVD}, {_HOURLY_SQL} "
    "SELECT h // 12 AS bucket, count(*) AS n, min(c) AS c_min, max(c) AS c_max, "
    "arg_min(c, h) AS c_first, arg_max(c, h) AS c_last FROM s GROUP BY h // 12"
)

from .llm import _BANDS as _LLM_BANDS, _MINHASH as _LLM_MINHASH, N_MINHASH as _NMH  # noqa: E402

ORACLE["ts_trend_theil_sen"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "slopes AS (SELECT (b.c - a.c) / CAST(b.h - a.h AS DOUBLE) AS slope "
    "FROM s a JOIN s b ON a.h < b.h) "
    "SELECT count(*) AS n_pairs, "
    "round(quantile_cont(slope, 0.5), 4) AS trend_per_hour FROM slopes"
)

ORACLE["ts_mad_outliers"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "med AS (SELECT quantile_cont(c, 0.5) AS med FROM s), "
    "dev AS (SELECT c, med, abs(c - med) AS adev FROM s, med), "
    "madv AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev) "
    "SELECT count(*) AS n, round(any_value(med), 4) AS median, "
    "round(any_value(mad), 4) AS mad, "
    "CAST(sum(CASE WHEN adev > 3 * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_outliers FROM dev, madv"
)

ORACLE["llm_minhash_est_vs_exact"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, {_LLM_MINHASH}, {_LLM_BANDS}, "
    "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig "
    "AND a.doc_id < b.doc_id), "
    "est AS (SELECT doc_a, doc_b, CAST("
    + " + ".join(
        f"(CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END)" for k in range(8)
    )
    + " AS BIGINT) AS est_matches FROM pairs "
    "JOIN sig sa ON pairs.doc_a = sa.doc_id JOIN sig sb ON pairs.doc_b = sb.doc_id), "
    "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT est.doc_a, est.doc_b, est_matches, "
    "CAST(COALESCE(i, 0) AS BIGINT) AS i, "
    f"round(CAST(est_matches AS DOUBLE) / {_NMH}, 4) AS jaccard_est, "
    "round(CAST(COALESCE(i, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(i, 0)), 4) "
    "AS jaccard_exact "
    "FROM est LEFT JOIN inter ON est.doc_a = inter.doc_a AND est.doc_b = inter.doc_b "
    "JOIN sizes sa ON est.doc_a = sa.doc_id JOIN sizes sb ON est.doc_b = sb.doc_id"
)

ORACLE["rel_incremental_agg"] = (
    "WITH p0 AS (SELECT l_returnflag, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS s, "
    "count(*) AS n FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY l_returnflag), "
    "p1 AS (SELECT l_returnflag, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS s, "
    "count(*) AS n FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY l_returnflag), "
    "u AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1), "
    "m AS (SELECT l_returnflag, CAST(sum(s) AS BIGINT) AS price_cents, "
    "CAST(sum(n) AS BIGINT) AS n_items FROM u GROUP BY l_returnflag) "
    "SELECT l_returnflag, price_cents, n_items, "
    "round(price_cents / CAST(n_items AS DOUBLE) / 100, 4) AS avg_price FROM m"
)

ORACLE["rel_snapshot_diff"] = (
    f"WITH {_EVD}, "
    "per AS (SELECT user_id, "
    "CAST(sum(CASE WHEN day - 19723 < 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_then, "
    "CAST(sum(CASE WHEN day - 19723 < 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_now "
    "FROM evd GROUP BY user_id) "
    "SELECT CASE WHEN n_now = 0 THEN 'absent' WHEN n_then = 0 THEN 'added' "
    "WHEN n_now > n_then THEN 'grown' ELSE 'unchanged' END AS status, "
    "count(*) AS n_users FROM per GROUP BY 1"
)

ORACLE["llm_dataset_card"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, {_LLM_MINHASH}, {_LLM_BANDS}, "
    "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig "
    "AND a.doc_id < b.doc_id), "
    "base AS (SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs, "
    "count(DISTINCT source) AS n_sources, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
    "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens "
    "FROM documents), "
    "dups AS (SELECT count(*) AS n_dup_docs FROM (SELECT DISTINCT d FROM "
    "(SELECT doc_a AS d FROM pairs UNION ALL SELECT doc_b AS d FROM pairs))) "
    "SELECT n_docs, n_langs, n_sources, total_chars, total_tokens, n_dup_docs, "
    "round(CAST(n_dup_docs AS DOUBLE) / n_docs, 4) AS dup_rate, "
    "round(CAST(total_tokens AS DOUBLE) / n_docs, 4) AS mean_tokens_per_doc "
    "FROM base, dups"
)

ORACLE["graph_label_prop"] = (
    f"WITH {_MUTUAL}, "
    "sym AS (SELECT a, b FROM m UNION ALL SELECT b AS a, a AS b FROM m), "
    "l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings), "
    "nb1 AS (SELECT sym.a, min(l0.lbl) AS mn FROM sym "
    "JOIN l0 ON sym.b = l0.id GROUP BY sym.a), "
    "l1 AS (SELECT l0.id, least(l0.lbl, COALESCE(nb1.mn, l0.lbl)) AS lbl "
    "FROM l0 LEFT JOIN nb1 ON l0.id = nb1.a), "
    "nb2 AS (SELECT sym.a, min(l1.lbl) AS mn FROM sym "
    "JOIN l1 ON sym.b = l1.id GROUP BY sym.a), "
    "l2 AS (SELECT l1.id, least(l1.lbl, COALESCE(nb2.mn, l1.lbl)) AS lbl "
    "FROM l1 LEFT JOIN nb2 ON l1.id = nb2.a) "
    "SELECT id AS node, lbl AS community FROM l2"
)

ORACLE["rel_select_except"] = (
    "SELECT * EXCLUDE (text) FROM documents WHERE doc_id < 50"
)

ORACLE["rel_group_by_all"] = (
    "SELECT l_returnflag, l_linestatus, count(*) AS n, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS price_cents "
    "FROM lineitem GROUP BY ALL"
)

ORACLE["ml_psi_drift"] = (
    f"WITH {_EVD}, "
    "binned AS (SELECT CASE WHEN day - 19723 < 15 THEN 1 ELSE 2 END AS win, "
    f"least(TRY_CAST(floor({_CENTS.format(x='value')} / 5000) AS BIGINT), 9) AS b "
    "FROM evd), "
    "per AS (SELECT b, CAST(sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    "CAST(sum(CASE WHEN win = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nb "
    "FROM binned GROUP BY b), "
    "g AS (SELECT CAST(sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ta, "
    "CAST(sum(CASE WHEN win = 2 THEN 1 ELSE 0 END) AS BIGINT) AS tb FROM binned), "
    "terms AS (SELECT TRY_CAST(round(((na + 1) / CAST(ta + 10 AS DOUBLE) - "
    "(nb + 1) / CAST(tb + 10 AS DOUBLE)) * "
    "ln(((na + 1) / CAST(ta + 10 AS DOUBLE)) / "
    "((nb + 1) / CAST(tb + 10 AS DOUBLE))) * 1000000000, 0) AS BIGINT) AS ti "
    "FROM per, g), "
    "agg AS (SELECT count(*) AS n_bins, CAST(sum(ti) AS BIGINT) AS s FROM terms) "
    "SELECT n_bins, round(s / CAST(1000000000 AS DOUBLE), 4) AS psi FROM agg"
)

ORACLE["ml_chi2_independence"] = (
    "WITH cells AS (SELECT event_type, user_id % 2 AS bucket, count(*) AS o "
    "FROM events GROUP BY event_type, user_id % 2), "
    "r AS (SELECT event_type, count(*) AS nr FROM events GROUP BY event_type), "
    "c AS (SELECT user_id % 2 AS bucket, count(*) AS nc FROM events "
    "GROUP BY user_id % 2), "
    "tot AS (SELECT count(*) AS nn FROM events), "
    "terms AS (SELECT TRY_CAST(round(pow(o - CAST(nr AS DOUBLE) * nc / nn, 2) / "
    "(CAST(nr AS DOUBLE) * nc / nn) * 1000000000, 0) AS BIGINT) AS ti "
    "FROM cells JOIN r USING (event_type) JOIN c USING (bucket), tot), "
    "dims AS (SELECT (SELECT count(*) FROM r) AS rr, (SELECT count(*) FROM c) AS cc) "
    "SELECT round(sum(ti) / CAST(1000000000 AS DOUBLE), 4) AS chi2, "
    "CAST((rr - 1) * (cc - 1) AS BIGINT) AS dof FROM terms, dims GROUP BY rr, cc"
)

ORACLE["ts_ohlc"] = (
    "WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS h, "
    f"{_CENTS.format(x='value')} AS vc, epoch_us(ts) AS ts_us, event_id "
    "FROM events), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY ts_us, event_id) "
    "AS ra, row_number() OVER (PARTITION BY h ORDER BY ts_us DESC, event_id DESC) "
    "AS rd FROM ev) "
    "SELECT h, CAST(max(CASE WHEN ra = 1 THEN vc END) AS BIGINT) AS open_cents, "
    "CAST(max(vc) AS BIGINT) AS high_cents, CAST(min(vc) AS BIGINT) AS low_cents, "
    "CAST(max(CASE WHEN rd = 1 THEN vc END) AS BIGINT) AS close_cents, "
    "count(*) AS n, CAST(sum(vc) AS BIGINT) AS vol_cents FROM r GROUP BY h"
)

ORACLE["ml_dist_concentration"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "q AS (SELECT TRY_CAST(round(dist * 1000000, 0) AS BIGINT) AS di FROM pairs), "
    "m AS (SELECT count(*) AS n, CAST(sum(di) AS BIGINT) AS s, "
    "CAST(sum(di * di) AS BIGINT) AS ss, CAST(min(di) AS BIGINT) AS mn, "
    "CAST(max(di) AS BIGINT) AS mx FROM q) "
    "SELECT n AS n_pairs, round(s / CAST(n AS DOUBLE) / 1000000, 4) AS mean_dist, "
    "round(sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) / "
    "(s / CAST(n AS DOUBLE)), 4) AS cv, "
    "round((mx - mn) / CAST(mn AS DOUBLE), 4) AS rel_contrast FROM m"
)

ORACLE["ts_interp_linear"] = (
    "WITH p AS (SELECT epoch_us(ts) AS t, "
    f"{_CENTS.format(x='value')} AS vc, event_id, 0 AS is_grid "
    "FROM events WHERE event_type = 'purchase'), "
    "b AS (SELECT min(t) AS mn, max(t) AS mx FROM p), "
    "g AS (SELECT unnest(generate_series((mn + 3599999999) // 3600000000, "
    "mx // 3600000000)) AS h FROM b), "
    "u AS (SELECT t, vc, event_id, is_grid FROM p UNION ALL "
    "SELECT h * 3600000000, NULL, NULL, 1 FROM g), "
    "w AS (SELECT t, is_grid, "
    "last_value(vc IGNORE NULLS) OVER wp AS pv, "
    "last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wp AS pt, "
    "first_value(vc IGNORE NULLS) OVER wn AS nv, "
    "first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wn AS nt "
    "FROM u WINDOW "
    "wp AS (ORDER BY t, is_grid, coalesce(event_id, -1) "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
    "wn AS (ORDER BY t, is_grid, coalesce(event_id, -1) "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
    "SELECT t // 3600000000 AS h, "
    "round((pv * (nt - t) + nv * (t - pt)) / CAST(nt - pt AS DOUBLE) / 100, 4) "
    "AS value_interp FROM w "
    "WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL"
)

ORACLE["ml_gini_user_activity"] = (
    "WITH per AS (SELECT user_id, count(*) AS x FROM events GROUP BY user_id), "
    "r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM per), "
    "g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s, "
    "CAST(sum(i * x) AS BIGINT) AS sx FROM r) "
    "SELECT n AS n_users, s AS total_events, "
    "round((2.0 * sx - (n + 1.0) * s) / (CAST(n AS DOUBLE) * s), 4) AS gini FROM g"
)

ORACLE["ml_assoc_rules"] = (
    "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
    "nn AS (SELECT count(DISTINCT user_id) AS n FROM events), "
    "na AS (SELECT event_type, count(*) AS cnt FROM ut GROUP BY event_type), "
    "ab AS (SELECT x.event_type AS a, y.event_type AS b, count(*) AS n_ab "
    "FROM ut x JOIN ut y ON x.user_id = y.user_id AND x.event_type < y.event_type "
    "GROUP BY a, b) "
    "SELECT a, b, n_ab, pa.cnt AS n_a, pb.cnt AS n_b, "
    "round(n_ab / CAST(pa.cnt AS DOUBLE), 4) AS conf_a_to_b, "
    "round(CAST(n_ab AS DOUBLE) * n / (CAST(pa.cnt AS DOUBLE) * pb.cnt), 4) AS lift "
    "FROM ab JOIN na pa ON ab.a = pa.event_type "
    "JOIN na pb ON ab.b = pb.event_type, nn"
)

ORACLE["ts_fano_burstiness"] = (
    "WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h, "
    "count(*) AS c FROM events GROUP BY event_type, h), "
    "b AS (SELECT min(epoch_us(ts)) // 3600000000 AS mn, "
    "max(epoch_us(ts)) // 3600000000 AS mx FROM events), "
    "spine AS (SELECT t.event_type, g.h FROM "
    "(SELECT unnest(generate_series(mn, mx)) AS h FROM b) g, "
    "(SELECT DISTINCT event_type FROM events) t), "
    "z AS (SELECT spine.event_type, coalesce(hourly.c, 0) AS c FROM spine "
    "LEFT JOIN hourly ON spine.event_type = hourly.event_type AND spine.h = hourly.h), "
    "m AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s, "
    "CAST(sum(c * c) AS BIGINT) AS ss FROM z GROUP BY event_type) "
    "SELECT event_type, n AS n_hours, s AS total, "
    "round(CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * s), 4) AS fano FROM m"
)

ORACLE["graph_bfs_dist"] = materialize_ctes(
    f"WITH RECURSIVE {_MUTUAL}, "
    "sym AS (SELECT a AS src, b AS dst FROM m UNION ALL SELECT b, a FROM m), "
    "bfs AS (SELECT CAST(0 AS BIGINT) AS id, 0 AS dist "
    "UNION ALL SELECT sym.dst, bfs.dist + 1 FROM bfs "
    "JOIN sym ON sym.src = bfs.id WHERE bfs.dist < 3) "
    "SELECT id, min(dist) AS dist FROM bfs GROUP BY id"
)

ORACLE["llm_keywords_per_doc"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term), "
    "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term), "
    "n AS (SELECT count(*) AS n_docs FROM documents), "
    "scored AS (SELECT tf.doc_id, tf.term, "
    "TRY_CAST(round(tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1) * 1000000, 0) "
    "AS BIGINT) AS siq FROM tf JOIN df ON tf.term = df.term, n), "
    "r AS (SELECT *, row_number() OVER "
    "(PARTITION BY doc_id ORDER BY siq DESC, term) AS rnk FROM scored) "
    "SELECT doc_id, rnk, term, siq FROM r WHERE rnk <= 3"
)

ORACLE["llm_tfidf_cosine_pairs"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "sel AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term), "
    "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term), "
    "n AS (SELECT count(*) AS n_docs FROM documents), "
    "wq AS (SELECT tf.doc_id, tf.term, "
    "TRY_CAST(round(tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1) * 1000000, 0) "
    "AS BIGINT) AS w FROM tf JOIN sel ON tf.doc_id = sel.doc_id "
    "JOIN df ON tf.term = df.term, n), "
    "norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nrm2 FROM wq "
    "GROUP BY doc_id), "
    "dots AS (SELECT x.doc_id AS a, y.doc_id AS b, "
    "CAST(sum(x.w * y.w) AS BIGINT) AS dot FROM wq x "
    "JOIN wq y ON x.term = y.term AND x.doc_id < y.doc_id GROUP BY a, b) "
    "SELECT a, b, dot, "
    "round(dot / (sqrt(CAST(pa.nrm2 AS DOUBLE)) * sqrt(CAST(pb.nrm2 AS DOUBLE))), 4) "
    "AS cosine FROM dots JOIN norms pa ON dots.a = pa.doc_id "
    "JOIN norms pb ON dots.b = pb.doc_id"
)

ORACLE["ml_pr_curve"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, sum(y) AS pos FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW)), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM pts) "
    "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
    "round(CAST(tp AS DOUBLE) / (tp + fp), 4) AS precision, "
    "round(CAST(tp AS DOUBLE) / p, 4) AS recall FROM cum, g"
)

ORACLE["graph_clustering_coeff"] = (
    f"WITH {_MUTUAL}, "
    "sym AS (SELECT a AS node FROM m UNION ALL SELECT b FROM m), "
    "deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node), "
    "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM m e1 "
    "JOIN m e2 ON e1.b = e2.a JOIN m e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "pn AS (SELECT node, count(*) AS tri FROM "
    "(SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
    "UNION ALL SELECT z FROM tri) GROUP BY node) "
    "SELECT d.node, d.deg, coalesce(pn.tri, 0) AS tri, "
    "round(CAST(2 * coalesce(pn.tri, 0) AS DOUBLE) / (d.deg * (d.deg - 1)), 4) AS cc "
    "FROM deg d LEFT JOIN pn ON d.node = pn.node WHERE d.deg >= 2"
)

ORACLE["llm_token_entropy"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term), "
    "per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS L, "
    "CAST(sum(TRY_CAST(round(c * ln(c) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS s "
    "FROM tf GROUP BY doc_id) "
    "SELECT doc_id, L AS n_tokens, "
    "round(ln(CAST(L AS DOUBLE)) - s / (CAST(L AS DOUBLE) * 1000000000), 4) "
    "AS entropy_nats FROM per"
)

ORACLE["ml_cohens_kappa"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, tlabel, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "knnp AS (SELECT qid, tlabel AS p1 FROM pred WHERE vr = 1), "
    "tr AS (SELECT * FROM emb WHERE vec_id % 5 <> 0), "
    "cent AS (SELECT label AS clabel, i, "
    "round(avg(emb[CAST(i + 1 AS INT)]), 6) AS mc "
    "FROM tr, range(64) t(i) GROUP BY clabel, i), "
    "test AS (SELECT vec_id AS qid, emb FROM emb WHERE vec_id % 5 = 0), "
    "d AS (SELECT qid, clabel, sum(pow(emb[CAST(i + 1 AS INT)] - mc, 2)) AS sq "
    "FROM test, cent GROUP BY qid, clabel), "
    "r AS (SELECT qid, clabel, "
    "row_number() OVER (PARTITION BY qid ORDER BY sq, clabel) AS rn FROM d), "
    "cenp AS (SELECT qid, clabel AS p2 FROM r WHERE rn = 1), "
    "j AS (SELECT p1, p2 FROM knnp JOIN cenp USING (qid)), "
    "mm AS (SELECT count(*) AS n, "
    "CAST(sum(CASE WHEN p1 = p2 THEN 1 ELSE 0 END) AS BIGINT) AS agree FROM j), "
    "c1 AS (SELECT p1 AS lbl, count(*) AS n1 FROM j GROUP BY p1), "
    "c2 AS (SELECT p2 AS lbl, count(*) AS n2 FROM j GROUP BY p2), "
    "pe AS (SELECT CAST(sum(n1 * n2) AS BIGINT) AS s FROM c1 JOIN c2 USING (lbl)) "
    "SELECT n, agree, "
    "round(CAST(agree * n - s AS DOUBLE) / (CAST(n AS DOUBLE) * n - s), 4) AS kappa "
    "FROM mm, pe"
)

ORACLE["ml_gains_table"] = (
    "WITH pts AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "dd AS (SELECT y, ntile(10) OVER (ORDER BY score DESC, vec_id) AS decile "
    "FROM pts), "
    "per AS (SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM dd GROUP BY decile), "
    "cum AS (SELECT decile, n, pos, "
    "CAST(sum(n) OVER w AS BIGINT) AS cum_n, "
    "CAST(sum(pos) OVER w AS BIGINT) AS cum_pos FROM per "
    "WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW)), "
    "tot AS (SELECT CAST(sum(y) AS BIGINT) AS p, count(*) AS nn FROM pts) "
    "SELECT decile, n, pos, round(cum_pos / CAST(p AS DOUBLE), 4) AS capture, "
    "round((CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(p AS DOUBLE) / nn), 4) AS lift "
    "FROM cum, tot"
)

ORACLE["str_time_to_convert"] = (
    "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events), "
    "s AS (SELECT user_id, min(t) AS s_us FROM ev "
    "WHERE event_type = 'signup' GROUP BY user_id), "
    "fp AS (SELECT s.user_id, s.s_us, min(p.t) AS p_us FROM s "
    "JOIN ev p ON p.user_id = s.user_id AND p.event_type = 'purchase' "
    "AND p.t >= s.s_us GROUP BY s.user_id, s.s_us) "
    "SELECT user_id, (p_us - s_us) // 1000000 AS delta_s FROM fp"
)

ORACLE["llm_lang_vocab_overlap"] = (
    "WITH v AS (SELECT DISTINCT lang, "
    "unnest(string_split(text, ' ')) AS term FROM documents), "
    "sizes AS (SELECT lang, count(*) AS vsz FROM v GROUP BY lang), "
    "inter AS (SELECT x.lang AS a, y.lang AS b, count(*) AS n_common "
    "FROM v x JOIN v y ON x.term = y.term AND x.lang < y.lang GROUP BY a, b) "
    "SELECT a, b, n_common, sa.vsz AS n_a, sb.vsz AS n_b, "
    "round(n_common / CAST(sa.vsz + sb.vsz - n_common AS DOUBLE), 4) AS jaccard "
    "FROM inter JOIN sizes sa ON inter.a = sa.lang "
    "JOIN sizes sb ON inter.b = sb.lang"
)

ORACLE["rel_order_by_all"] = (
    "SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n "
    "FROM events GROUP BY ALL ORDER BY ALL LIMIT 20"
)

ORACLE["rel_try_arith"] = (
    "SELECT event_id, "
    "round(TRY_CAST(round(value * 100, 0) AS BIGINT) / "
    "NULLIF(CAST(json_extract_string(props, '$.k') AS INT), 0), 4) AS cents_per_k, "
    "TRY_CAST(event_type AS INT) AS bad_cast, "
    "coalesce(CAST(json_extract_string(props, '$.k') AS INT), -1) AS k_or_default "
    "FROM events"
)

ORACLE["ml_logreg_irls1"] = (
    "WITH pts AS (SELECT TRY_CAST(round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] * 1000000, 0) "
    "AS BIGINT) AS xq, CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "m AS (SELECT count(*) AS n, CAST(sum(xq) AS BIGINT) AS u, "
    "CAST(sum(xq * xq) AS BIGINT) AS v, CAST(sum(y) AS BIGINT) AS sy, "
    "CAST(sum(xq * y) AS BIGINT) AS sxy FROM pts) "
    "SELECT n, "
    "round(CAST(2 * (v * (2 * sy - n) - u * (2 * sxy - u)) AS DOUBLE) "
    "/ (n * v - u * u), 6) AS beta0, "
    "round(CAST(2 * (n * (2 * sxy - u) - u * (2 * sy - n)) AS DOUBLE) "
    "/ (n * v - u * u) * 1000000, 6) AS beta1 FROM m"
)

ORACLE["ts_drawdown"] = (
    "WITH p AS (SELECT event_id, epoch_us(ts) AS t, "
    "CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END * "
    f"{_CENTS.format(x='value')} AS delta_c "
    "FROM events WHERE event_type = 'purchase'), "
    # COALESCE(…, 0): a NULL delta (ingest-NULLed non-finite value) leaves
    # the running balance UNMOVED — the engine prefix scan folds from 0 and
    # skips missing ticks, so an all-NULL prefix is balance 0, not NULL
    # (r11 non-finite sweep).
    "cc AS (SELECT event_id, t, "
    "CAST(COALESCE(sum(delta_c) OVER (ORDER BY t, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS cum_c "
    "FROM p), "
    "r AS (SELECT event_id, cum_c, "
    "CAST(max(cum_c) OVER (ORDER BY t, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_c "
    "FROM cc) "
    "SELECT event_id, cum_c, peak_c, peak_c - cum_c AS drawdown_c FROM r"
)

ORACLE["graph_kcore_peel"] = (
    # mm AS MATERIALIZED: the edge list is referenced six times below —
    # without materialization DuckDB inlines the kNN ranking per reference.
    f"WITH {_MUTUAL}, "
    "mm AS MATERIALIZED (SELECT a, b FROM m), "
    "d0 AS (SELECT node, count(*) AS deg FROM "
    "(SELECT a AS node FROM mm UNION ALL SELECT b FROM mm) GROUP BY node), "
    "rm1 AS (SELECT node FROM d0 WHERE deg < 3), "
    "e1 AS (SELECT a, b FROM mm WHERE a NOT IN (SELECT node FROM rm1) "
    "AND b NOT IN (SELECT node FROM rm1)), "
    "d1 AS (SELECT node, count(*) AS deg FROM "
    "(SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY node), "
    "rm2 AS (SELECT node FROM d1 WHERE deg < 3), "
    "e2 AS (SELECT a, b FROM e1 WHERE a NOT IN (SELECT node FROM rm2) "
    "AND b NOT IN (SELECT node FROM rm2)), "
    "d2 AS (SELECT node, count(*) AS deg FROM "
    "(SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) GROUP BY node) "
    "SELECT d2.node, d0.deg AS deg0, d2.deg AS deg_after_peel2 "
    "FROM d2 JOIN d0 ON d2.node = d0.node"
)

ORACLE["ts_sax_symbols"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "g AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s, "
    "CAST(sum(c * c) AS BIGINT) AS ss FROM s) "
    "SELECT h, c, "
    "CASE WHEN (c - CAST(s AS DOUBLE) / n) / "
    "sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) < -0.6745 THEN 'a' "
    "WHEN (c - CAST(s AS DOUBLE) / n) / "
    "sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) < 0 THEN 'b' "
    "WHEN (c - CAST(s AS DOUBLE) / n) / "
    "sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) < 0.6745 THEN 'c' "
    "ELSE 'd' END AS sym FROM s, g"
)

ORACLE["llm_shingle_containment"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, "
    "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, i, sa.n AS n_a, sb.n AS n_b, "
    "round(i / CAST(sa.n AS DOUBLE), 4) AS contain_a, "
    "round(i / CAST(sb.n AS DOUBLE), 4) AS contain_b "
    "FROM inter JOIN sizes sa ON doc_a = sa.doc_id "
    "JOIN sizes sb ON doc_b = sb.doc_id WHERE i >= 5"
)

ORACLE["ts_decompose_stl"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "g AS (SELECT count(*) AS gn, CAST(sum(c) AS BIGINT) AS gs FROM s), "
    "r AS (SELECT h, c, "
    "CAST(sum(c) OVER (PARTITION BY h % 24) AS BIGINT) AS s_sum, "
    "count(*) OVER (PARTITION BY h % 24) AS s_n, "
    "CAST(sum(c) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) "
    "AS BIGINT) AS t_sum, "
    "count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) "
    "AS t_n FROM s) "
    "SELECT h, c, round(CAST(s_sum AS DOUBLE) / s_n, 4) AS seasonal, "
    "round(CAST(t_sum AS DOUBLE) / t_n, 4) AS trend, "
    "round(c - CAST(s_sum AS DOUBLE) / s_n - CAST(t_sum AS DOUBLE) / t_n "
    "+ CAST(gs AS DOUBLE) / gn, 4) AS residual FROM r, g"
)

ORACLE["ml_mcc"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, qlabel, tlabel, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "p AS (SELECT CASE WHEN tlabel >= 5 THEN 1 ELSE 0 END AS yp, "
    "CASE WHEN qlabel >= 5 THEN 1 ELSE 0 END AS yt FROM pred WHERE vr = 1), "
    "m AS (SELECT "
    "CAST(sum(CASE WHEN yp = 1 AND yt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
    "CAST(sum(CASE WHEN yp = 0 AND yt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn, "
    "CAST(sum(CASE WHEN yp = 1 AND yt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
    "CAST(sum(CASE WHEN yp = 0 AND yt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn "
    "FROM p) "
    "SELECT tp, tn, fp, fn, "
    "round(CAST(tp * tn - fp * fn AS DOUBLE) / "
    "sqrt(CAST((tp + fp) AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)), 4) "
    "AS mcc FROM m"
)

ORACLE["ml_platt_1step"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "predr AS (SELECT qid, qlabel, tlabel, votes, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "pts AS (SELECT votes AS xq, "
    "CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END AS y FROM predr WHERE vr = 1), "
    "m AS (SELECT count(*) AS n, CAST(sum(xq) AS BIGINT) AS u, "
    "CAST(sum(xq * xq) AS BIGINT) AS v, CAST(sum(y) AS BIGINT) AS sy, "
    "CAST(sum(xq * y) AS BIGINT) AS sxy FROM pts) "
    "SELECT n, "
    "round(CAST(2 * (v * (2 * sy - n) - u * (2 * sxy - u)) AS DOUBLE) "
    "/ (n * v - u * u), 6) AS beta0, "
    "round(CAST(2 * (n * (2 * sxy - u) - u * (2 * sy - n)) AS DOUBLE) "
    "/ (n * v - u * u), 6) AS beta1_per_vote FROM m"
)

ORACLE["ts_ljung_box"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "lagagg AS (SELECT k, count(*) AS nk, sum(a.c * b.c) AS p, "
    "sum(a.c) AS ak, sum(b.c) AS bk "
    "FROM s a, range(1, 11) t(k), s b WHERE a.h - k = b.h GROUP BY k), "
    "g AS (SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS ss FROM s), "
    "terms AS (SELECT n, TRY_CAST(round("
    "pow((p - (s1 / n) * (ak + bk) + nk * (s1 / n) * (s1 / n)) / "
    "(ss - n * (s1 / n) * (s1 / n)), 2) / (n - k) * 1000000000000, 0) AS BIGINT) "
    "AS tq FROM lagagg, g), "
    "agg AS (SELECT n, CAST(sum(tq) AS BIGINT) AS s FROM terms GROUP BY n) "
    "SELECT n AS n_hours, 10 AS lags, "
    "round(n * (n + 2) * (s / CAST(1000000000000 AS DOUBLE)), 4) AS q_stat FROM agg"
)

ORACLE["ts_peak_detect"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "g AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sg, "
    "CAST(sum(c * c) AS BIGINT) AS ss FROM s), "
    "nb AS (SELECT h, c, lag(c) OVER (ORDER BY h) AS cp, "
    "lead(c) OVER (ORDER BY h) AS cn FROM s) "
    "SELECT h, c, "
    "round((c - CAST(sg AS DOUBLE) / n) / "
    "sqrt((ss - CAST(sg AS DOUBLE) * sg / n) / (n - 1)), 4) AS z "
    "FROM nb, g WHERE cp IS NOT NULL AND cn IS NOT NULL "
    "AND c > cp AND c > cn AND "
    "(c - CAST(sg AS DOUBLE) / n) / "
    "sqrt((ss - CAST(sg AS DOUBLE) * sg / n) / (n - 1)) > 1.0"
)

ORACLE["rel_fn_variant"] = (
    "SELECT event_id, "
    "CAST(json_extract_string(props, '$.k') AS INT) AS k_int, "
    "json_extract_string(props, '$.k') AS k_str, "
    "CAST(json_extract_string(props, '$.k') AS INT) * "
    "CAST(json_extract_string(props, '$.k') AS INT) AS k_sq "
    "FROM events"
)

ORACLE["graph_degree_gini"] = (
    f"WITH {_KNN_EMB}, "
    "pairs AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
    "list_distance(q.emb, t.emb) AS dist FROM emb q, emb t "
    "WHERE t.vec_id <> q.vec_id), "
    "ranked AS (SELECT qid, tid, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "e AS (SELECT qid, tid FROM ranked WHERE rnk <= 5), "
    "indeg AS (SELECT tid AS node, count(*) AS d FROM e GROUP BY tid), "
    "x AS (SELECT emb.vec_id AS node, coalesce(indeg.d, 0) AS x FROM emb "
    "LEFT JOIN indeg ON emb.vec_id = indeg.node), "
    "r AS (SELECT x, row_number() OVER (ORDER BY x, node) AS i FROM x), "
    "g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s, "
    "CAST(sum(i * x) AS BIGINT) AS sx FROM r) "
    "SELECT n AS n_nodes, s AS total_edges, "
    "round((2.0 * sx - (n + 1.0) * s) / (CAST(n AS DOUBLE) * s), 4) AS gini FROM g"
)

ORACLE["ts_cross_correlation"] = (
    "WITH ev AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events), "
    "b AS (SELECT min(h) AS mn, max(h) AS mx FROM ev), "
    "spine AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b), "
    "xv AS (SELECT spine.h, coalesce(c, 0) AS c FROM spine LEFT JOIN "
    "(SELECT h, count(*) AS c FROM ev WHERE event_type = 'view' GROUP BY h) hx "
    "ON spine.h = hx.h), "
    "yv AS (SELECT spine.h, coalesce(c, 0) AS c FROM spine LEFT JOIN "
    "(SELECT h, count(*) AS c FROM ev WHERE event_type = 'purchase' GROUP BY h) hy "
    "ON spine.h = hy.h), "
    "lagagg AS (SELECT k, count(*) AS nk, sum(y.c * x.c) AS p, "
    "sum(y.c) AS ay, sum(x.c) AS bx "
    "FROM yv y, range(0, 13) t(k), xv x WHERE y.h - k = x.h GROUP BY k), "
    "gx AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sx, "
    "CAST(sum(c * c) AS BIGINT) AS ssx FROM xv), "
    "gy AS (SELECT CAST(sum(c) AS BIGINT) AS sy, "
    "CAST(sum(c * c) AS BIGINT) AS ssy FROM yv) "
    "SELECT k, nk AS n_pairs, "
    "round((p - (CAST(sy AS DOUBLE) / n) * bx - (CAST(sx AS DOUBLE) / n) * ay "
    "+ nk * (CAST(sy AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / "
    "(sqrt(ssx - CAST(sx AS DOUBLE) * sx / n) * "
    "sqrt(ssy - CAST(sy AS DOUBLE) * sy / n)), 4) AS ccf "
    "FROM lagagg, gx, gy"
)

ORACLE["ts_variance_time"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "ws AS (SELECT CAST(pow(2, i) AS BIGINT) AS w FROM range(6) t(i)), "
    "blocks AS (SELECT w, h // w AS blk, CAST(sum(c) AS BIGINT) AS bs, "
    "count(*) AS bn FROM s, ws GROUP BY w, blk), "
    "cb AS (SELECT * FROM blocks WHERE bn = w), "
    "m AS (SELECT w, count(*) AS nb, CAST(sum(bs) AS BIGINT) AS s, "
    "CAST(sum(bs * bs) AS BIGINT) AS ss FROM cb GROUP BY w) "
    "SELECT w, nb AS n_blocks, "
    "round((ss - CAST(s AS DOUBLE) * s / nb) / (nb - 1), 4) AS block_var FROM m"
)

ORACLE["rel_histogram_log"] = (
    "SELECT TRY_CAST(floor(log10("
    f"{_CENTS.format(x='o_totalprice')}"
    ")) AS BIGINT) AS decade, count(*) AS n FROM orders GROUP BY decade"
)

ORACLE["llm_perplexity_unigram"] = (
    "WITH tok AS (SELECT doc_id, "
    "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' AS is_train, "
    "unnest(string_split(text, ' ')) AS term FROM documents), "
    "train AS (SELECT term FROM tok WHERE is_train), "
    "counts AS (SELECT term, count(*) AS c FROM train GROUP BY term), "
    "tot AS (SELECT count(*) AS nt FROM train), "
    "vocab AS (SELECT count(*) AS vs FROM counts), "
    "held AS (SELECT doc_id, term FROM tok WHERE NOT is_train), "
    "scored AS (SELECT doc_id, "
    "TRY_CAST(round(ln((coalesce(c, 0) + 1) / CAST(nt + vs + 1 AS DOUBLE)) "
    "* 1000000000, 0) AS BIGINT) AS lp "
    "FROM held LEFT JOIN counts ON held.term = counts.term, tot, vocab), "
    "per AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(lp) AS BIGINT) AS s "
    "FROM scored GROUP BY doc_id) "
    "SELECT doc_id, n_tokens, "
    "round(exp(-(s / CAST(1000000000 AS DOUBLE)) / n_tokens), 4) AS perplexity "
    "FROM per"
)

ORACLE["ml_ndcg_at10"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "terms AS (SELECT qid, CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END AS rel, "
    "rnk FROM topk), "
    "dcg AS (SELECT qid, "
    "CAST(sum(TRY_CAST(round(rel / log2(rnk + 1) * 1000000000, 0) AS BIGINT)) "
    "AS BIGINT) AS dcg_n, CAST(sum(rel) AS BIGINT) AS n_rel "
    "FROM terms GROUP BY qid), "
    "pos AS (SELECT i, TRY_CAST(round(1 / log2(i + 1) * 1000000000, 0) AS BIGINT) "
    "AS g FROM range(1, 11) t(i)), "
    "lut AS (SELECT p1.i AS n, CAST(sum(p2.g) AS BIGINT) AS idcg_n "
    "FROM pos p1 JOIN pos p2 ON p2.i <= p1.i GROUP BY p1.i), "
    "ideal AS (SELECT qid, dcg_n, n_rel, lut.idcg_n FROM dcg "
    "LEFT JOIN lut ON lut.n = greatest(dcg.n_rel, 1)), "
    "per AS (SELECT qid, CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT) ELSE "
    "TRY_CAST(round(dcg_n / CAST(idcg_n AS DOUBLE) * 1000000000, 0) AS BIGINT) END "
    "AS ndcg_n FROM ideal) "
    "SELECT count(*) AS n_queries, "
    "round(CAST(sum(ndcg_n) AS DOUBLE) / "
    "(count(*) * CAST(1000000000 AS DOUBLE)), 4) AS mean_ndcg_at10 FROM per"
)

ORACLE["graph_modularity"] = (
    f"WITH {_MUTUAL}, "
    "mm AS MATERIALIZED (SELECT a, b FROM m), "
    "sym AS (SELECT a, b FROM mm UNION ALL SELECT b AS a, a AS b FROM mm), "
    "l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings), "
    "nb1 AS (SELECT sym.a, min(l0.lbl) AS mn FROM sym "
    "JOIN l0 ON sym.b = l0.id GROUP BY sym.a), "
    "l1 AS (SELECT l0.id, least(l0.lbl, COALESCE(nb1.mn, l0.lbl)) AS lbl "
    "FROM l0 LEFT JOIN nb1 ON l0.id = nb1.a), "
    "nb2 AS (SELECT sym.a, min(l1.lbl) AS mn FROM sym "
    "JOIN l1 ON sym.b = l1.id GROUP BY sym.a), "
    "l2 AS (SELECT l1.id, least(l1.lbl, COALESCE(nb2.mn, l1.lbl)) AS lbl "
    "FROM l1 LEFT JOIN nb2 ON l1.id = nb2.a), "
    "mt AS (SELECT count(*) AS m FROM mm), "
    "ec AS (SELECT x.lbl AS community, count(*) AS ec FROM mm "
    "JOIN l2 x ON mm.a = x.id JOIN l2 y ON mm.b = y.id "
    "WHERE x.lbl = y.lbl GROUP BY x.lbl), "
    "deg AS (SELECT node, count(*) AS d FROM "
    "(SELECT a AS node FROM mm UNION ALL SELECT b FROM mm) GROUP BY node), "
    "dcs AS (SELECT l2.lbl AS community, "
    "CAST(sum(coalesce(deg.d, 0)) AS BIGINT) AS dc FROM l2 "
    "LEFT JOIN deg ON l2.id = deg.node GROUP BY l2.lbl), "
    "terms AS (SELECT TRY_CAST(round((coalesce(ec.ec, 0) / CAST(m AS DOUBLE) - "
    "(dc / CAST(2 * m AS DOUBLE)) * (dc / CAST(2 * m AS DOUBLE))) "
    "* 1000000000, 0) AS BIGINT) AS tq "
    "FROM dcs LEFT JOIN ec ON dcs.community = ec.community, mt) "
    "SELECT count(*) AS n_communities, "
    "round(CAST(sum(tq) AS BIGINT) / CAST(1000000000 AS DOUBLE), 4) AS modularity "
    "FROM terms"
)

ORACLE["ts_hurst_rs"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "ws AS (SELECT CAST(pow(2, i) AS BIGINT) AS w FROM range(3, 7) t(i)), "
    "fan AS (SELECT w, h // w AS blk, h % w + 1 AS j, c FROM s, ws), "
    "r AS (SELECT w, blk, j, c, "
    "CAST(sum(c) OVER (PARTITION BY w, blk ORDER BY j "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cj, "
    "CAST(sum(c) OVER (PARTITION BY w, blk) AS BIGINT) AS sb FROM fan), "
    "d AS (SELECT w, blk, c, w * cj - j * sb AS dev FROM r), "
    "blocks AS (SELECT w, blk, CAST(max(dev) AS BIGINT) AS mx, "
    "CAST(min(dev) AS BIGINT) AS mn, CAST(sum(c) AS BIGINT) AS s, "
    "CAST(sum(c * c) AS BIGINT) AS ss, count(*) AS bn "
    "FROM d GROUP BY w, blk), "
    "ok AS (SELECT * FROM blocks WHERE bn = w AND w * ss > s * s), "
    "q AS (SELECT w, TRY_CAST(round(((mx - mn) / CAST(w AS DOUBLE)) / "
    "sqrt((ss - CAST(s AS DOUBLE) * s / w) / w) * 1000000000, 0) AS BIGINT) "
    "AS rsq FROM ok) "
    "SELECT w, count(*) AS n_blocks, "
    "round(CAST(sum(rsq) AS BIGINT) / "
    "(count(*) * CAST(1000000000 AS DOUBLE)), 4) AS mean_rs FROM q GROUP BY w"
)

from .iterative import _KMEANS_SQL as _KM_SQL  # noqa: E402

ORACLE["ml_cluster_purity_nmi"] = (
    f"WITH asg AS ({_KM_SQL}), "
    "j AS (SELECT asg.cluster, e.label FROM asg "
    "JOIN embeddings e ON asg.vec_id = e.vec_id), "
    "nn AS (SELECT count(*) AS n FROM j), "
    "ct AS (SELECT cluster, label, count(*) AS c FROM j GROUP BY cluster, label), "
    "pur AS (SELECT CAST(sum(mx) AS BIGINT) AS pure FROM "
    "(SELECT cluster, max(c) AS mx FROM ct GROUP BY cluster)), "
    "am AS (SELECT cluster, CAST(sum(c) AS BIGINT) AS ac FROM ct GROUP BY cluster), "
    "bm AS (SELECT label, CAST(sum(c) AS BIGINT) AS bc FROM ct GROUP BY label), "
    "mi AS (SELECT CAST(sum(TRY_CAST(round(c / CAST(n AS DOUBLE) * "
    "ln(c * CAST(n AS DOUBLE) / (ac * CAST(bc AS DOUBLE))) * 1000000000, 0) "
    "AS BIGINT)) AS BIGINT) AS mi_n FROM ct "
    "JOIN am ON ct.cluster = am.cluster JOIN bm ON ct.label = bm.label, nn), "
    "ha AS (SELECT CAST(sum(TRY_CAST(round(-(ac / CAST(n AS DOUBLE)) * "
    "ln(ac / CAST(n AS DOUBLE)) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS ha_n "
    "FROM am, nn), "
    "hb AS (SELECT CAST(sum(TRY_CAST(round(-(bc / CAST(n AS DOUBLE)) * "
    "ln(bc / CAST(n AS DOUBLE)) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS hb_n "
    "FROM bm, nn) "
    "SELECT n, round(pure / CAST(n AS DOUBLE), 4) AS purity, "
    "round(2 * mi_n / CAST(ha_n + hb_n AS DOUBLE), 4) AS nmi "
    "FROM nn, pur, mi, ha, hb"
)

ORACLE["rel_yoy_growth"] = (
    "WITH per AS (SELECT year(l_shipdate) AS yr, "
    f"CAST(sum({_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) AS BIGINT) "
    "AS rev_cents FROM lineitem GROUP BY yr), "
    "r AS (SELECT yr, rev_cents, "
    "lag(rev_cents) OVER (ORDER BY yr) AS prev_cents FROM per) "
    "SELECT yr, rev_cents, prev_cents, "
    "round((rev_cents - prev_cents) * 100 / CAST(prev_cents AS DOUBLE), 4) "
    "AS growth_pct FROM r"
)

ORACLE["ml_tukey_fences"] = (
    "WITH o AS (SELECT TRY_CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tc "
    "FROM orders), "
    "q AS (SELECT quantile_cont(tc, 0.25) AS q1, quantile_cont(tc, 0.75) AS q3, "
    "count(*) AS n FROM o) "
    "SELECT max(round(q1, 4)) AS q1, max(round(q3, 4)) AS q3, max(n) AS n, "
    "CAST(sum(CASE WHEN tc < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_low, "
    "CAST(sum(CASE WHEN tc > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_high FROM o, q"
)

from .llm import _LANG_COUNTS as _LC, _TOKS as _LT, _lang_pred_case as _lpc  # noqa: E402

ORACLE["ml_kmeans_inertia"] = (
    f"WITH asg AS ({_KM_SQL}), "
    "emb2 AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings), "
    "cd AS (SELECT asg.cluster AS c, i, "
    "round(avg(emb[CAST(i + 1 AS INT)]), 4) AS cm "
    "FROM asg JOIN emb2 ON asg.vec_id = emb2.vec_id, range(64) t(i) "
    "GROUP BY c, i), "
    "cent AS (SELECT c, list(cm ORDER BY i) AS cl FROM cd GROUP BY c), "
    "d AS (SELECT asg.cluster, "
    "TRY_CAST(round(list_aggregate(list_transform(list_zip(emb, cl), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') * 1000000, 0) AS BIGINT) AS sq_u "
    "FROM asg JOIN emb2 ON asg.vec_id = emb2.vec_id "
    "JOIN cent ON asg.cluster = cent.c) "
    "SELECT cluster, count(*) AS n_members, "
    "round(CAST(sum(sq_u) AS BIGINT) / CAST(1000000 AS DOUBLE), 4) AS inertia "
    "FROM d GROUP BY cluster"
)

ORACLE["llm_lang_confusion"] = (
    f"WITH {_LT}, scored AS (SELECT doc_id, lang, {_LC} FROM toks), "
    f"p AS (SELECT doc_id, lang, {_lpc()} AS pred_lang FROM scored) "
    "SELECT lang AS true_lang, pred_lang, count(*) AS n "
    "FROM p GROUP BY true_lang, pred_lang"
)

ORACLE["ml_learning_curve"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "pb AS (SELECT pairs.*, substring(md5(CAST(tid AS VARCHAR)), 1, 2) AS bkt "
    "FROM pairs), "
    "fr AS (SELECT * FROM (VALUES (25, '40'), (50, '80'), (75, 'c0'), "
    "(100, 'zz')) t(frac, thr)), "
    "fan AS (SELECT fr.frac, pb.* FROM pb, fr WHERE pb.bkt < fr.thr), "
    "ranked AS (SELECT *, row_number() OVER "
    "(PARTITION BY frac, qid ORDER BY dist, tid) AS rnk FROM fan), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT frac, qid, qlabel, tlabel, count(*) AS v FROM topk "
    "GROUP BY frac, qid, qlabel, tlabel), "
    "pred AS (SELECT *, row_number() OVER "
    "(PARTITION BY frac, qid ORDER BY v DESC, tlabel) AS vr FROM votes) "
    "SELECT frac, count(*) AS n_queries, "
    "CAST(sum(CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_correct, "
    "round(sum(CAST(tlabel = qlabel AS INT)) / CAST(count(*) AS DOUBLE), 4) "
    "AS accuracy FROM pred WHERE vr = 1 GROUP BY frac"
)

ORACLE["rel_fk_integrity_audit"] = (
    "SELECT 'lineitem.l_orderkey->orders' AS fk, "
    "(SELECT count(*) FROM lineitem) AS n_child, "
    "(SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
    "(SELECT o_orderkey FROM orders)) AS n_orphans "
    "UNION ALL SELECT 'lineitem.l_partkey->part', "
    "(SELECT count(*) FROM lineitem), "
    "(SELECT count(*) FROM lineitem WHERE l_partkey NOT IN "
    "(SELECT p_partkey FROM part)) "
    "UNION ALL SELECT 'lineitem.l_suppkey->supplier', "
    "(SELECT count(*) FROM lineitem), "
    "(SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN "
    "(SELECT s_suppkey FROM supplier)) "
    "UNION ALL SELECT 'orders.o_custkey->customer', "
    "(SELECT count(*) FROM orders), "
    "(SELECT count(*) FROM orders WHERE o_custkey NOT IN "
    "(SELECT c_custkey FROM customer)) "
    "UNION ALL SELECT 'customer.c_nationkey->nation', "
    "(SELECT count(*) FROM customer), "
    "(SELECT count(*) FROM customer WHERE c_nationkey NOT IN "
    "(SELECT n_nationkey FROM nation)) "
    "UNION ALL SELECT 'supplier.s_nationkey->nation', "
    "(SELECT count(*) FROM supplier), "
    "(SELECT count(*) FROM supplier WHERE s_nationkey NOT IN "
    "(SELECT n_nationkey FROM nation)) "
    "UNION ALL SELECT 'nation.n_regionkey->region', "
    "(SELECT count(*) FROM nation), "
    "(SELECT count(*) FROM nation WHERE n_regionkey NOT IN "
    "(SELECT r_regionkey FROM region))"
)

ORACLE["str_user_temporal_entropy"] = (
    "WITH per AS (SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hod, "
    "count(*) AS c FROM events GROUP BY user_id, hod), "
    "tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS tu FROM per "
    "GROUP BY user_id), "
    "q AS (SELECT per.user_id, tu, "
    "TRY_CAST(round(-(c / CAST(tu AS DOUBLE)) * ln(c / CAST(tu AS DOUBLE)) "
    "* 1000000000, 0) AS BIGINT) AS hq "
    "FROM per JOIN tot ON per.user_id = tot.user_id) "
    "SELECT user_id, max(tu) AS n_events, "
    "round(CAST(sum(hq) AS BIGINT) / CAST(1000000000 AS DOUBLE), 4) "
    "AS entropy_nats FROM q GROUP BY user_id"
)

ORACLE["ml_ivf_recall_at10"] = (
    f"WITH asg AS ({_KM_SQL}), "
    "emb2 AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings), "
    "cd AS (SELECT asg.cluster AS c, i, "
    "round(avg(emb[CAST(i + 1 AS INT)]), 4) AS cm "
    "FROM asg JOIN emb2 ON asg.vec_id = emb2.vec_id, range(64) t(i) "
    "GROUP BY c, i), "
    "cent AS (SELECT c, list(cm ORDER BY i) AS cl FROM cd GROUP BY c), "
    "test AS (SELECT vec_id AS qid, emb AS qemb FROM emb2 "
    "WHERE vec_id % 5 = 0), "
    "qc AS (SELECT qid, c, round(list_aggregate(list_transform("
    "list_zip(qemb, cl), p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 4) AS cdist "
    "FROM test, cent), "
    "probes AS (SELECT qid, c FROM (SELECT qid, c, row_number() OVER "
    "(PARTITION BY qid ORDER BY cdist, c) AS pr FROM qc) WHERE pr <= 2), "
    "cand AS (SELECT probes.qid, asg.vec_id AS tid FROM probes "
    "JOIN asg ON probes.c = asg.cluster WHERE asg.vec_id <> probes.qid), "
    "scored AS (SELECT cand.qid, cand.tid, "
    "round(sqrt(list_aggregate(list_transform(list_zip(tq.qemb, te.emb), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')), 4) AS dist "
    "FROM cand JOIN test tq ON cand.qid = tq.qid "
    "JOIN emb2 te ON cand.tid = te.vec_id), "
    "approx AS (SELECT qid, tid FROM (SELECT qid, tid, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM scored) WHERE rnk <= 10), "
    "exact_p AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
    "list_distance(q.emb2c, t.emb2c) AS dist FROM "
    "(SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb2c FROM embeddings) q, "
    "(SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb2c FROM embeddings) t "
    "WHERE q.vec_id % 5 = 0 AND t.vec_id <> q.vec_id), "
    "exact AS (SELECT qid, tid FROM (SELECT qid, tid, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM exact_p) WHERE rnk <= 10), "
    "hits AS (SELECT approx.qid, count(*) AS n_hit FROM approx "
    "JOIN exact ON approx.qid = exact.qid AND approx.tid = exact.tid "
    "GROUP BY approx.qid), "
    "per AS (SELECT exact.qid, count(*) AS n_exact, "
    "coalesce(max(hits.n_hit), 0) AS n_hit FROM exact "
    "LEFT JOIN hits ON exact.qid = hits.qid GROUP BY exact.qid) "
    "SELECT count(*) AS n_queries, CAST(sum(n_hit) AS BIGINT) AS hits, "
    "CAST(sum(n_exact) AS BIGINT) AS truths, "
    "round(sum(n_hit) / CAST(sum(n_exact) AS DOUBLE), 4) AS recall_at10 FROM per"
)

ORACLE["ts_lag_features"] = (
    f"WITH {_EVD}, {_HOURLY_SQL} "
    "SELECT h, c, lag(c, 1) OVER (ORDER BY h) AS lag_1, "
    "lag(c, 24) OVER (ORDER BY h) AS lag_24, "
    "c - lag(c, 1) OVER (ORDER BY h) AS diff_1, "
    "round(sum(c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) "
    "/ CAST(count(c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 "
    "PRECEDING) AS DOUBLE), 4) AS mean_24, "
    "max(c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) "
    "AS max_24 FROM s"
)

ORACLE["llm_embed_outliers"] = (
    "WITH emb2 AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb "
    "FROM embeddings), "
    "cd AS (SELECT i, round(avg(emb[CAST(i + 1 AS INT)]), 6) AS m "
    "FROM emb2, range(64) t(i) GROUP BY i), "
    "cent AS (SELECT list(m ORDER BY i) AS cvec FROM cd), "
    "d AS (SELECT vec_id, TRY_CAST(round(sqrt(list_aggregate(list_transform("
    "list_zip(emb, cvec), p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')) "
    "* 10000, 0) AS BIGINT) AS dq FROM emb2, cent), "
    "g AS (SELECT count(*) AS n, CAST(sum(dq) AS BIGINT) AS s, "
    "CAST(sum(dq * dq) AS BIGINT) AS ss FROM d) "
    "SELECT vec_id, round(dq / CAST(10000 AS DOUBLE), 4) AS dist_centroid, "
    "round((dq - CAST(s AS DOUBLE) / n) / "
    "sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)), 4) AS z FROM d, g"
)

ORACLE["graph_reciprocity"] = (
    f"WITH {_KNN_EMB}, "
    "pairs AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
    "list_distance(q.emb, t.emb) AS dist FROM emb q, emb t "
    "WHERE t.vec_id <> q.vec_id), "
    "ranked AS (SELECT qid, tid, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "e AS (SELECT qid, tid FROM ranked WHERE rnk <= 5), "
    "mu AS (SELECT count(*) AS n_mutual FROM e a WHERE EXISTS "
    "(SELECT 1 FROM e b WHERE b.qid = a.tid AND b.tid = a.qid)), "
    "ne AS (SELECT count(*) AS n_edges FROM e) "
    "SELECT n_edges, n_mutual, "
    "round(n_mutual / CAST(n_edges AS DOUBLE), 4) AS reciprocity FROM ne, mu"
)

ORACLE["rel_hash_uniformity_chi2"] = (
    "WITH b AS (SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) "
    "AS bkt FROM documents), "
    "per AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt), "
    "nn AS (SELECT count(*) AS n FROM documents), "
    "agg AS (SELECT count(*) AS n_buckets_hit, "
    "CAST(sum(c * c) AS BIGINT) AS ssq FROM per) "
    "SELECT n_buckets_hit, n AS n_rows, "
    "round((256 * ssq - CAST(n AS DOUBLE) * n) / n, 4) AS chi2_255df "
    "FROM agg, nn"
)

ORACLE["llm_bigram_crossentropy"] = (
    "WITH tok AS (SELECT doc_id, "
    "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' AS is_train, "
    "string_split(text, ' ') AS ts FROM documents), "
    "big AS (SELECT doc_id, is_train, ts[j] AS w1, ts[j + 1] AS w2 "
    "FROM tok, unnest(range(1, len(ts))) t(j)), "
    "train AS (SELECT w1, w2 FROM big WHERE is_train), "
    "c12 AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY w1, w2), "
    "c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1), "
    "vocab AS (SELECT count(DISTINCT w) AS v FROM "
    "(SELECT unnest(ts) AS w FROM tok WHERE is_train)), "
    "held AS (SELECT big.w1, big.w2 FROM big WHERE NOT is_train), "
    "scored AS (SELECT TRY_CAST(round(-ln((coalesce(c12.c12, 0) + 1) / "
    "CAST(coalesce(c1.c1, 0) + v AS DOUBLE)) * 1000000000, 0) AS BIGINT) AS nl "
    "FROM held LEFT JOIN c12 ON held.w1 = c12.w1 AND held.w2 = c12.w2 "
    "LEFT JOIN c1 ON held.w1 = c1.w1, vocab) "
    "SELECT count(*) AS n_bigrams, "
    "round(CAST(sum(nl) AS BIGINT) / "
    "(count(*) * CAST(1000000000 AS DOUBLE)), 4) AS cross_entropy_nats "
    "FROM scored"
)

ORACLE["rel_skyline_pareto"] = (
    "WITH p AS (SELECT p_partkey, "
    f"{_CENTS.format(x='p_retailprice')} AS price_c, p_size FROM part) "
    "SELECT p_partkey, price_c, p_size FROM p a WHERE NOT EXISTS ("
    "SELECT 1 FROM p b WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size "
    "AND (b.price_c < a.price_c OR b.p_size > a.p_size))"
)

from .llm import _BANDS as _LLM_BANDS2, _MINHASH as _LLM_MINHASH2  # noqa: E402

ORACLE["ml_conformal_knn"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "pred AS (SELECT qid, qlabel, "
    "TRY_CAST(round(avg(CAST(tlabel AS DOUBLE)) * 1000000, 0) AS BIGINT) AS pred_u "
    "FROM topk GROUP BY qid, qlabel), "
    "scored AS (SELECT qid, "
    "substring(md5(CAST(qid AS VARCHAR)), 1, 2) < '80' AS is_cal, "
    "abs(qlabel * 1000000 - pred_u) AS res_u FROM pred), "
    "cal AS (SELECT * FROM scored WHERE is_cal), "
    "nc AS (SELECT count(*) AS nc FROM cal), "
    "qh AS (SELECT res_u AS qhat_u FROM "
    "(SELECT res_u, row_number() OVER (ORDER BY res_u, qid) AS r FROM cal), nc "
    "WHERE r = CAST(ceil(0.9 * (nc + 1)) AS BIGINT)), "
    "test AS (SELECT * FROM scored WHERE NOT is_cal) "
    "SELECT count(*) AS n_test, "
    "max(round(qhat_u / CAST(1000000 AS DOUBLE), 4)) AS qhat, "
    "CAST(sum(CASE WHEN res_u <= qhat_u THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_covered, "
    "round(sum(CASE WHEN res_u <= qhat_u THEN 1 ELSE 0 END) / "
    "CAST(count(*) AS DOUBLE), 4) AS coverage FROM test, qh"
)

ORACLE["llm_boilerplate_prefix"] = (
    f"WITH {_LLM_TOKS} "
    "SELECT array_to_string(ts[1:3], ' ') AS prefix, count(*) AS n_docs, "
    "min(doc_id) AS exemplar_doc FROM toks WHERE len(ts) >= 3 "
    "GROUP BY prefix HAVING count(*) > 1"
)

ORACLE["llm_edit_distance_pairs"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, {_LLM_MINHASH2}, {_LLM_BANDS2}, "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig "
    "AND a.doc_id < b.doc_id), "
    "d AS (SELECT doc_id, substring(text, 1, 80) AS t80 FROM documents) "
    "SELECT doc_a, doc_b, "
    "CAST(levenshtein(da.t80, db.t80) AS BIGINT) AS edit_dist, "
    "round(1 - levenshtein(da.t80, db.t80) / "
    "CAST(greatest(length(da.t80), length(db.t80)) AS DOUBLE), 4) AS sim_ratio "
    "FROM cand JOIN d da ON cand.doc_a = da.doc_id "
    "JOIN d db ON cand.doc_b = db.doc_id"
)

ORACLE["ts_merge_intervals"] = (
    "WITH iv AS (SELECT epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e, "
    "event_id FROM events WHERE event_type = 'purchase'), "
    "marked AS (SELECT s, e, "
    "CASE WHEN s > max(e) OVER (ORDER BY s, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END "
    "AS brk FROM iv), "
    "grps AS (SELECT s, e, CAST(sum(brk) OVER (ORDER BY s "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp "
    "FROM marked) "
    "SELECT grp, CAST(min(s) AS BIGINT) AS start_us, "
    "CAST(max(e) AS BIGINT) AS end_us, count(*) AS n_intervals "
    "FROM grps GROUP BY grp"
)

ORACLE["ts_backtest_snaive"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "horizon AS (SELECT max(h) AS mx FROM s), "
    "r AS (SELECT h, c, lag(c, 24) OVER (ORDER BY h) AS pred FROM s) "
    "SELECT count(*) AS n_hours, "
    "round(sum(abs(c - pred)) / CAST(count(*) AS DOUBLE), 4) AS mae, "
    "round(sqrt(sum((c - pred) * (c - pred)) / CAST(count(*) AS DOUBLE)), 4) "
    "AS rmse, "
    "round(sum(c - pred) / CAST(count(*) AS DOUBLE), 4) AS bias "
    "FROM r, horizon WHERE pred IS NOT NULL AND h > mx - 168"
)

ORACLE["str_pattern_match_seq"] = (
    "WITH lett AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
    "substring(event_type, 1, 1) AS l FROM events), "
    "seq AS (SELECT user_id, string_agg(l, '' ORDER BY t, event_id) "
    "AS journey FROM lett GROUP BY user_id) "
    "SELECT count(*) AS n_users, "
    "CAST(sum(CASE WHEN regexp_matches(journey, 's[^e]*p') THEN 1 ELSE 0 END) "
    "AS BIGINT) AS clean_converters, "
    "CAST(sum(CASE WHEN regexp_matches(journey, 's.*p') THEN 1 ELSE 0 END) "
    "AS BIGINT) AS any_converters, "
    "CAST(sum(CASE WHEN regexp_matches(journey, 'e') THEN 1 ELSE 0 END) "
    "AS BIGINT) AS saw_error FROM seq"
)

_SAX_SQL = (
    "g2 AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sg, "
    "CAST(sum(c * c) AS BIGINT) AS ss FROM s), "
    "sax AS (SELECT h, c, CASE WHEN (c - CAST(sg AS DOUBLE) / n) / "
    "sqrt((ss - CAST(sg AS DOUBLE) * sg / n) / (n - 1)) < -0.6745 THEN 'a' "
    "WHEN (c - CAST(sg AS DOUBLE) / n) / "
    "sqrt((ss - CAST(sg AS DOUBLE) * sg / n) / (n - 1)) < 0 THEN 'b' "
    "WHEN (c - CAST(sg AS DOUBLE) / n) / "
    "sqrt((ss - CAST(sg AS DOUBLE) * sg / n) / (n - 1)) < 0.6745 THEN 'c' "
    "ELSE 'd' END AS sym FROM s, g2)"
)

ORACLE["ts_rle_sax"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, {_SAX_SQL}, "
    "runs AS (SELECT sym, h, row_number() OVER (ORDER BY h) - "
    "row_number() OVER (PARTITION BY sym ORDER BY h) AS grp FROM sax) "
    "SELECT sym, min(h) AS start_h, count(*) AS run_len "
    "FROM runs GROUP BY sym, grp"
)

ORACLE["ml_class_weights"] = (
    "WITH per AS (SELECT label, count(*) AS n_c FROM embeddings GROUP BY label), "
    "tot AS (SELECT count(*) AS n FROM embeddings), "
    "kk AS (SELECT count(*) AS k FROM per) "
    "SELECT label, n_c, round(n / (k * CAST(n_c AS DOUBLE)), 4) AS weight "
    "FROM per, tot, kk"
)

ORACLE["ts_season_strength"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "parts AS (SELECT h, c, "
    "CAST(sum(c) OVER (PARTITION BY h % 24) AS BIGINT) AS s_sum, "
    "count(*) OVER (PARTITION BY h % 24) AS s_n FROM s), "
    "q AS (SELECT TRY_CAST(round((c - CAST(s_sum AS DOUBLE) / s_n) * 1000, 0) "
    "AS BIGINT) AS rq, CAST(c AS BIGINT) * 1000 AS cq FROM parts), "
    "g AS (SELECT count(*) AS n, CAST(sum(rq) AS BIGINT) AS sr, "
    "CAST(sum(rq * rq) AS BIGINT) AS ssr, CAST(sum(cq) AS BIGINT) AS sc, "
    "CAST(sum(cq * cq) AS BIGINT) AS ssc FROM q) "
    "SELECT n AS n_hours, "
    "round(greatest(CAST(0 AS DOUBLE), 1 - "
    "((ssr - CAST(sr AS DOUBLE) * sr / n) / (n - 1)) / "
    "((ssc - CAST(sc AS DOUBLE) * sc / n) / (n - 1))), 4) AS season_strength "
    "FROM g"
)

ORACLE["ml_embed_drift_ks"] = (
    "WITH vals AS (SELECT TRY_CAST(round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1] * 1000000, 0) "
    "AS BIGINT) AS vc, CASE WHEN vec_id % 5 = 0 THEN 2 ELSE 1 END AS grp "
    # vc IS NOT NULL: poisoned vectors leave the distribution on both
    # engines (ks_two_sample's NULL-measurement exclusion)
    "FROM embeddings), "
    "vals2 AS (SELECT * FROM vals WHERE vc IS NOT NULL), "
    "per AS (SELECT vc, "
    "CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a, "
    "CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b "
    "FROM vals2 GROUP BY vc), "
    "cum AS (SELECT CAST(sum(a) OVER w AS BIGINT) AS ca, "
    "CAST(sum(b) OVER w AS BIGINT) AS cb FROM per "
    "WINDOW w AS (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW)), "
    "g AS (SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n1, CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2 "
    "FROM vals2), "
    "ds AS (SELECT n1, n2, max(abs(ca * n2 - cb * n1)) AS d_scaled "
    "FROM cum, g GROUP BY n1, n2) "
    "SELECT n1, n2, round(CAST(d_scaled AS DOUBLE) / (n1 * n2), 4) AS d_stat, "
    "round(1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / "
    "(n1 * CAST(n2 AS DOUBLE))), 4) AS crit_5pct, "
    "CAST(CAST(d_scaled AS DOUBLE) / (n1 * n2) > "
    "1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (n1 * CAST(n2 AS DOUBLE))) "
    "AS INT) AS drift_flag FROM ds"
)

ORACLE["ts_acf_significance"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "lagagg AS (SELECT k, count(*) AS nk, sum(a.c * b.c) AS p, "
    "sum(a.c) AS ak, sum(b.c) AS bk "
    "FROM s a, range(1, 25) t(k), s b WHERE a.h - k = b.h GROUP BY k), "
    "g AS (SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS ss FROM s), "
    "j AS (SELECT *, s1 / n AS m FROM lagagg, g), "
    "r AS (SELECT k, n, "
    "round((p - m * (ak + bk) + nk * m * m) / (ss - n * m * m), 4) AS acf "
    "FROM j) "
    "SELECT k, acf, "
    "CAST(TRY_CAST(round(acf * 1000000, 0) AS BIGINT) * "
    "TRY_CAST(round(acf * 1000000, 0) AS BIGINT) * n > 3841600000000 AS INT) "
    "AS significant FROM r"
)

ORACLE["ml_kaplan_meier"] = (
    "WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events), "
    "span AS (SELECT max(t) AS mx FROM ev), "
    "life AS (SELECT (max(t) - min(t)) // 86400000000 AS t, "
    "CAST(max(t) < (SELECT mx FROM span) - 3 * 86400000000 AS INT) AS event "
    "FROM ev GROUP BY user_id), "
    "n0 AS (SELECT count(*) AS n0 FROM life), "
    "per AS (SELECT t, CAST(sum(event) AS BIGINT) AS d, count(*) AS rem "
    "FROM life GROUP BY t), "
    "risk AS (SELECT t, d, n0 - coalesce(CAST(sum(rem) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), "
    "0) AS n_at_risk FROM per, n0), "
    "terms AS (SELECT t, d, n_at_risk, "
    "CASE WHEN d = 0 THEN CAST(0 AS BIGINT) ELSE "
    "TRY_CAST(round(ln(1 - d / CAST(n_at_risk AS DOUBLE)) * 1000000000, 0) "
    "AS BIGINT) END AS lnq FROM risk), "
    "cum AS (SELECT t, d, n_at_risk, CAST(sum(lnq) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS cum_ln FROM terms) "
    "SELECT t, d, n_at_risk, "
    "round(exp(cum_ln / CAST(1000000000 AS DOUBLE)), 4) AS survival FROM cum"
)

ORACLE["graph_transitivity"] = (
    f"WITH {_MUTUAL}, "
    "mm AS MATERIALIZED (SELECT a, b FROM m), "
    "deg AS (SELECT node, count(*) AS deg FROM "
    "(SELECT a AS node FROM mm UNION ALL SELECT b FROM mm) GROUP BY node), "
    "wg AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges "
    "FROM deg), "
    "tri AS (SELECT count(*) AS triangles FROM mm e1 "
    "JOIN mm e2 ON e1.b = e2.a JOIN mm e3 ON e3.a = e1.a AND e3.b = e2.b) "
    "SELECT wedges, triangles, "
    "round(3 * triangles / CAST(wedges AS DOUBLE), 4) AS transitivity "
    "FROM wg, tri"
)

ORACLE["ml_mcnemar_test"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, CAST(tlabel = qlabel AS INT) AS k_ok, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "knn_ok AS (SELECT qid, k_ok FROM pred WHERE vr = 1), "
    "tr AS (SELECT * FROM emb WHERE vec_id % 5 <> 0), "
    "cent AS (SELECT label AS clabel, i, "
    "round(avg(emb[CAST(i + 1 AS INT)]), 6) AS mc "
    "FROM tr, range(64) t(i) GROUP BY clabel, i), "
    "test AS (SELECT vec_id AS qid, emb, label AS qlabel FROM emb "
    "WHERE vec_id % 5 = 0), "
    "dc AS (SELECT qid, qlabel, clabel, "
    "sum(pow(emb[CAST(i + 1 AS INT)] - mc, 2)) AS sq "
    "FROM test, cent GROUP BY qid, qlabel, clabel), "
    "rc AS (SELECT qid, CAST(clabel = qlabel AS INT) AS c_ok, "
    "row_number() OVER (PARTITION BY qid ORDER BY sq, clabel) AS rn FROM dc), "
    "cen_ok AS (SELECT qid, c_ok FROM rc WHERE rn = 1), "
    "j AS (SELECT k_ok, c_ok FROM knn_ok JOIN cen_ok USING (qid)), "
    "m2 AS (SELECT CAST(sum(CASE WHEN k_ok = 1 AND c_ok = 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS b, "
    "CAST(sum(CASE WHEN k_ok = 0 AND c_ok = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS c, count(*) AS n FROM j) "
    "SELECT n, b, c, "
    "CASE WHEN b + c = 0 THEN CAST(0 AS DOUBLE) ELSE "
    "round((abs(b - c) - 1) * (abs(b - c) - 1) / CAST(b + c AS DOUBLE), 4) END "
    "AS chi2_1df FROM m2"
)

ORACLE["str_cohort_ltv"] = (
    "WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS t "
    "FROM events), "
    "fu AS (SELECT user_id, min(t) // 86400000000 AS cohort_day "
    "FROM ev GROUP BY user_id), "
    "sizes AS (SELECT cohort_day, count(*) AS n_users FROM fu "
    "GROUP BY cohort_day), "
    "rev AS (SELECT cohort_day, (t // 86400000000) - cohort_day AS offs, "
    f"CAST(sum({_CENTS.format(x='value')}) AS BIGINT) AS rev_c "
    "FROM ev JOIN fu ON ev.user_id = fu.user_id "
    "WHERE event_type = 'purchase' "
    "GROUP BY cohort_day, offs), "
    "cum AS (SELECT cohort_day, offs AS day_offset, rev_c, "
    "CAST(sum(rev_c) OVER (PARTITION BY cohort_day ORDER BY offs "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c "
    "FROM rev) "
    "SELECT cohort_day, day_offset, n_users, cum_c, "
    "cum_c * 10000 // n_users AS ltv_per_user_micro "
    "FROM cum JOIN sizes USING (cohort_day)"
)

ORACLE["llm_lsh_bucket_stats"] = (
    f"WITH {_LLM_TOKS}, {_LLM_SH}, {_LLM_MINHASH2}, {_LLM_BANDS2}, "
    "buckets AS (SELECT band, bsig, count(*) AS sz FROM bands "
    "GROUP BY band, bsig) "
    "SELECT sz, count(*) AS n_buckets, "
    "CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs "
    "FROM buckets GROUP BY sz"
)

ORACLE["ts_weekday_weekend_profile"] = (
    "WITH ev AS (SELECT epoch_us(ts) AS t FROM events), "
    "cells AS (SELECT (t // 3600000000) % 24 AS hod, "
    "CAST(((t // 86400000000) + 4) % 7 IN (0, 6) AS INT) AS is_weekend, "
    "count(*) AS c FROM ev GROUP BY hod, is_weekend), "
    "days AS (SELECT is_weekend, count(*) AS n_days FROM "
    "(SELECT DISTINCT t // 86400000000 AS d, "
    "CAST(((t // 86400000000) + 4) % 7 IN (0, 6) AS INT) AS is_weekend "
    "FROM ev) GROUP BY is_weekend) "
    "SELECT hod, is_weekend, c, "
    "round(c / CAST(n_days AS DOUBLE), 4) AS per_day_rate "
    "FROM cells JOIN days USING (is_weekend)"
)

ORACLE["ml_ece"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, votes, CAST(tlabel = qlabel AS INT) AS correct, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "bins AS (SELECT votes, count(*) AS nb, "
    "CAST(sum(correct) AS BIGINT) AS cb FROM pred WHERE vr = 1 "
    "GROUP BY votes), "
    "g AS (SELECT CAST(sum(abs(votes * nb - 10 * cb)) AS BIGINT) AS num, "
    "CAST(sum(nb) AS BIGINT) AS n FROM bins) "
    "SELECT n, round(num / (CAST(n AS DOUBLE) * 10), 4) AS ece FROM g"
)

ORACLE["llm_hapax_stats"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "tf AS (SELECT term, count(*) AS cf FROM tok GROUP BY term), "
    "hapax AS (SELECT term FROM tf WHERE cf = 1), "
    "per AS (SELECT doc_id, count(*) AS n_hapax FROM tok "
    "WHERE term IN (SELECT term FROM hapax) GROUP BY doc_id) "
    "SELECT d.doc_id, coalesce(per.n_hapax, 0) AS n_hapax "
    "FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"
)

ORACLE["rel_join_natural"] = (
    "SELECT n_name, r_name FROM nation NATURAL JOIN "
    "(SELECT r_regionkey AS n_regionkey, r_name FROM region) r"
)

ORACLE["ts_type_correlation_matrix"] = (
    "WITH ev AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h "
    "FROM events), "
    "hourly AS (SELECT event_type, h, count(*) AS c FROM ev "
    "GROUP BY event_type, h), "
    "b AS (SELECT min(h) AS mn, max(h) AS mx FROM ev), "
    "spine AS (SELECT t.event_type, g.h FROM "
    "(SELECT unnest(generate_series(mn, mx)) AS h FROM b) g, "
    "(SELECT DISTINCT event_type FROM ev) t), "
    "z AS (SELECT spine.event_type, spine.h, coalesce(hourly.c, 0) AS c "
    "FROM spine LEFT JOIN hourly ON spine.event_type = hourly.event_type "
    "AND spine.h = hourly.h), "
    "j AS (SELECT x.event_type AS ta, y.event_type AS tb, x.c AS ca, "
    "y.c AS cb FROM z x JOIN z y ON x.h = y.h "
    "AND x.event_type < y.event_type), "
    "g AS (SELECT ta, tb, count(*) AS n, CAST(sum(ca) AS BIGINT) AS sa, "
    "CAST(sum(cb) AS BIGINT) AS sb, CAST(sum(ca * ca) AS BIGINT) AS ssa, "
    "CAST(sum(cb * cb) AS BIGINT) AS ssb, "
    "CAST(sum(ca * cb) AS BIGINT) AS sab FROM j GROUP BY ta, tb) "
    "SELECT ta, tb, "
    "round((n * sab - CAST(sa AS DOUBLE) * sb) / "
    "(sqrt(n * ssa - CAST(sa AS DOUBLE) * sa) * "
    "sqrt(n * ssb - CAST(sb AS DOUBLE) * sb)), 4) AS pearson_r FROM g"
)

ORACLE["ml_dim_ablation"] = (
    f"WITH {_KNN_EMB}, "
    "p AS (SELECT q.vec_id AS qid, q.label AS qlabel, t.vec_id AS tid, "
    "t.label AS tlabel, "
    "round(sqrt(list_aggregate(list_transform(list_zip(q.emb, t.emb), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum')), 4) AS d64, "
    "round(sqrt(list_aggregate(list_transform(list_zip(q.emb[1:32], "
    "t.emb[1:32]), x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum')), 4) AS d32 "
    "FROM emb q, emb t WHERE q.vec_id % 5 = 0 AND t.vec_id <> q.vec_id), "
    "r64 AS (SELECT qid, qlabel, tlabel, row_number() OVER "
    "(PARTITION BY qid ORDER BY d64, tid) AS rnk FROM p), "
    "v64 AS (SELECT qid, qlabel, tlabel, count(*) AS v FROM r64 "
    "WHERE rnk <= 10 GROUP BY qid, qlabel, tlabel), "
    "pr64 AS (SELECT qid, CAST(tlabel = qlabel AS INT) AS ok, row_number() "
    "OVER (PARTITION BY qid ORDER BY v DESC, tlabel) AS vr FROM v64), "
    "a64 AS (SELECT 'dims_64' AS variant, count(*) AS n_queries, "
    "CAST(sum(ok) AS BIGINT) AS n_correct FROM pr64 WHERE vr = 1), "
    "r32 AS (SELECT qid, qlabel, tlabel, row_number() OVER "
    "(PARTITION BY qid ORDER BY d32, tid) AS rnk FROM p), "
    "v32 AS (SELECT qid, qlabel, tlabel, count(*) AS v FROM r32 "
    "WHERE rnk <= 10 GROUP BY qid, qlabel, tlabel), "
    "pr32 AS (SELECT qid, CAST(tlabel = qlabel AS INT) AS ok, row_number() "
    "OVER (PARTITION BY qid ORDER BY v DESC, tlabel) AS vr FROM v32), "
    "a32 AS (SELECT 'dims_32' AS variant, count(*) AS n_queries, "
    "CAST(sum(ok) AS BIGINT) AS n_correct FROM pr32 WHERE vr = 1), "
    "u AS (SELECT * FROM a64 UNION ALL SELECT * FROM a32) "
    "SELECT variant, n_queries, n_correct, "
    "round(n_correct / CAST(n_queries AS DOUBLE), 4) AS accuracy FROM u"
)

ORACLE["str_new_vs_returning"] = (
    "WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day "
    "FROM events), "
    "fu AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id), "
    "ud AS (SELECT DISTINCT user_id, day FROM ev) "
    "SELECT day, "
    "CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) "
    "AS new_users, "
    "CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) "
    "AS returning_users "
    "FROM ud JOIN fu USING (user_id) GROUP BY day"
)

ORACLE["rel_column_profile"] = (
    "WITH agg AS (SELECT count(*) AS n_rows, "
    "count(DISTINCT l_orderkey) AS d1, "
    "CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z1, "
    "CAST(min(l_orderkey) AS VARCHAR) AS mn1, CAST(max(l_orderkey) AS VARCHAR) AS mx1, "
    "count(DISTINCT l_partkey) AS d2, "
    "CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z2, "
    "CAST(min(l_partkey) AS VARCHAR) AS mn2, CAST(max(l_partkey) AS VARCHAR) AS mx2, "
    "count(DISTINCT l_suppkey) AS d3, "
    "CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z3, "
    "CAST(min(l_suppkey) AS VARCHAR) AS mn3, CAST(max(l_suppkey) AS VARCHAR) AS mx3, "
    "count(DISTINCT l_quantity) AS d4, "
    "CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z4, "
    "CAST(min(TRY_CAST(round(l_quantity * 100, 0) AS BIGINT)) AS VARCHAR) AS mn4, "
    "CAST(max(TRY_CAST(round(l_quantity * 100, 0) AS BIGINT)) AS VARCHAR) AS mx4, "
    "count(DISTINCT l_extendedprice) AS d5, "
    "CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z5, "
    "CAST(min(TRY_CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS VARCHAR) AS mn5, "
    "CAST(max(TRY_CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS VARCHAR) AS mx5, "
    "count(DISTINCT l_returnflag) AS d6, "
    "CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS z6, "
    "CAST(min(l_returnflag) AS VARCHAR) AS mn6, "
    "CAST(max(l_returnflag) AS VARCHAR) AS mx6 "
    "FROM lineitem) "
    "SELECT n_rows, t.* FROM agg, LATERAL (VALUES "
    "('l_orderkey', d1, z1, mn1, mx1), ('l_partkey', d2, z2, mn2, mx2), "
    "('l_suppkey', d3, z3, mn3, mx3), ('l_quantity', d4, z4, mn4, mx4), "
    "('l_extendedprice', d5, z5, mn5, mx5), "
    "('l_returnflag', d6, z6, mn6, mx6)) "
    "t(col_name, n_distinct, n_null, min_str, max_str)"
)

ORACLE["ts_completeness"] = (
    "WITH dh AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, "
    "epoch_us(ts) // 3600000000 AS hr FROM events) "
    "SELECT day, count(*) AS hours_present, "
    "round(count(*) / CAST(24 AS DOUBLE), 4) AS completeness "
    "FROM dh GROUP BY day"
)

ORACLE["ml_label_noise_flags"] = (
    f"WITH {_KNN_EMB}, "
    "pairs AS (SELECT q.vec_id AS qid, q.label AS qlabel, t.vec_id AS tid, "
    "t.label AS tlabel, list_distance(q.emb, t.emb) AS dist "
    "FROM emb q, emb t WHERE t.vec_id <> q.vec_id), "
    "ranked AS (SELECT qid, qlabel, tlabel, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "agree AS (SELECT qid, qlabel, "
    "CAST(sum(CASE WHEN tlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_same, count(*) AS k FROM ranked WHERE rnk <= 5 "
    "GROUP BY qid, qlabel) "
    "SELECT qid, qlabel AS label, n_same, k FROM agree "
    "WHERE 5 * n_same <= k"
)

ORACLE["ml_lowe_ratio"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "p2 AS (SELECT qid, tid, round(dist, 4) AS dr FROM pairs), "
    "r AS (SELECT qid, dr, row_number() OVER "
    "(PARTITION BY qid ORDER BY dr, tid) AS rnk FROM p2), "
    "wide AS (SELECT qid, max(CASE WHEN rnk = 1 THEN dr END) AS d1, "
    "max(CASE WHEN rnk = 5 THEN dr END) AS d5 FROM r "
    "WHERE rnk IN (1, 5) GROUP BY qid) "
    "SELECT qid, d1, d5, round(d1 / d5, 4) AS lowe_ratio FROM wide"
)

ORACLE["ml_balanced_accuracy"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, qlabel, CAST(tlabel = qlabel AS INT) AS ok, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "per AS (SELECT qlabel, count(*) AS n_c, CAST(sum(ok) AS BIGINT) AS ok_c "
    "FROM pred WHERE vr = 1 GROUP BY qlabel), "
    "q AS (SELECT TRY_CAST(round(ok_c / CAST(n_c AS DOUBLE) * 1000000, 0) "
    "AS BIGINT) AS rq FROM per) "
    "SELECT count(*) AS n_classes, "
    "round(CAST(sum(rq) AS BIGINT) / "
    "(count(*) * CAST(1000000 AS DOUBLE)), 4) AS balanced_accuracy FROM q"
)

ORACLE["ts_runs_test"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "na AS (SELECT count(*) AS na FROM s), "
    "med AS (SELECT c AS med FROM "
    "(SELECT c, row_number() OVER (ORDER BY c, h) AS r FROM s), na "
    "WHERE r = CAST(ceil(na / 2.0) AS BIGINT)), "
    "lab AS (SELECT h, CAST(c > med AS INT) AS above FROM s, med "
    "WHERE c <> med), "
    "runs AS (SELECT above, CASE WHEN lag(above) OVER (ORDER BY h) IS NULL "
    "THEN 1 WHEN lag(above) OVER (ORDER BY h) <> above THEN 1 ELSE 0 END "
    "AS new_run FROM lab), "
    "g AS (SELECT CAST(sum(new_run) AS BIGINT) AS r, "
    "CAST(sum(above) AS BIGINT) AS n1, "
    "CAST(sum(1 - above) AS BIGINT) AS n2 FROM runs) "
    "SELECT r, n1, n2, "
    "round((r - (2.0 * n1 * n2 / (n1 + n2) + 1)) / "
    "sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / "
    "((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4) AS z FROM g"
)

ORACLE["graph_hits"] = (
    f"WITH {_KNN_EMB}, "
    "pairs AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
    "list_distance(q.emb, t.emb) AS dist FROM emb q, emb t "
    "WHERE t.vec_id <> q.vec_id), "
    "ranked AS (SELECT qid, tid, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "edges AS (SELECT qid AS src, tid AS dst FROM ranked WHERE rnk <= 5), "
    "nodes AS (SELECT vec_id AS id FROM embeddings), "
    "h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes), "
    "as1 AS (SELECT dst AS id, CAST(sum(h) AS BIGINT) AS raw FROM edges "
    "JOIN h0 ON edges.src = h0.id GROUP BY dst), "
    "am1 AS (SELECT max(raw) AS mx FROM as1), "
    "a1 AS (SELECT nodes.id, coalesce(raw, 0) * 1000000 // mx AS a "
    "FROM nodes LEFT JOIN as1 ON nodes.id = as1.id, am1), "
    "hs1 AS (SELECT src AS id, CAST(sum(a) AS BIGINT) AS raw FROM edges "
    "JOIN a1 ON edges.dst = a1.id GROUP BY src), "
    "hm1 AS (SELECT max(raw) AS mx FROM hs1), "
    "h1 AS (SELECT nodes.id, coalesce(raw, 0) * 1000000 // mx AS h "
    "FROM nodes LEFT JOIN hs1 ON nodes.id = hs1.id, hm1), "
    "as2 AS (SELECT dst AS id, CAST(sum(h) AS BIGINT) AS raw FROM edges "
    "JOIN h1 ON edges.src = h1.id GROUP BY dst), "
    "am2 AS (SELECT max(raw) AS mx FROM as2), "
    "a2 AS (SELECT nodes.id, coalesce(raw, 0) * 1000000 // mx AS a "
    "FROM nodes LEFT JOIN as2 ON nodes.id = as2.id, am2), "
    "hs2 AS (SELECT src AS id, CAST(sum(a) AS BIGINT) AS raw FROM edges "
    "JOIN a2 ON edges.dst = a2.id GROUP BY src), "
    "hm2 AS (SELECT max(raw) AS mx FROM hs2), "
    "h2 AS (SELECT nodes.id, coalesce(raw, 0) * 1000000 // mx AS h "
    "FROM nodes LEFT JOIN hs2 ON nodes.id = hs2.id, hm2) "
    "SELECT h2.id, h2.h AS hub_u, a2.a AS auth_u "
    "FROM h2 JOIN a2 ON h2.id = a2.id"
)

ORACLE["str_stickiness"] = (
    "WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day "
    "FROM events), "
    "dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day), "
    "span AS (SELECT min(day) AS mn, max(day) AS mx FROM ud), "
    "fan AS (SELECT DISTINCT user_id, f.day FROM ud, span, "
    "LATERAL (SELECT unnest(generate_series(ud.day, ud.day + 27)) AS day) f "
    "WHERE f.day <= span.mx), "
    "mau AS (SELECT day, count(*) AS mau FROM fan GROUP BY day) "
    "SELECT day, dau, mau, round(dau / CAST(mau AS DOUBLE), 4) AS stickiness "
    "FROM dau JOIN mau USING (day)"
)

ORACLE["ml_youden_threshold"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW)), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p, "
    "CAST(count(*) - sum(y) AS BIGINT) AS neg FROM pts), "
    "scored AS (SELECT score, tp, fp, tp * neg - fp * p AS j_scaled, p, neg "
    "FROM cum, g), "
    "best AS (SELECT *, row_number() OVER "
    "(ORDER BY j_scaled DESC, score DESC) AS rn FROM scored) "
    "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
    "round(CAST(tp AS DOUBLE) / p - CAST(fp AS DOUBLE) / neg, 4) AS youden_j "
    "FROM best WHERE rn = 1"
)

ORACLE["ml_average_precision"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW)), "
    "steps AS (SELECT tp, fp, tp - coalesce(lag(tp) OVER "
    "(ORDER BY score DESC), 0) AS dtp FROM cum), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM pts), "
    "terms AS (SELECT TRY_CAST(round(dtp * (tp / CAST(tp + fp AS DOUBLE)) "
    "* 1000000000, 0) AS BIGINT) AS tq FROM steps) "
    "SELECT p AS n_pos, "
    "round(CAST(sum(tq) AS BIGINT) / (p * CAST(1000000000 AS DOUBLE)), 4) "
    "AS average_precision FROM terms, g GROUP BY p"
)

ORACLE["ts_pacf_2"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "lagagg AS (SELECT k, count(*) AS nk, sum(a.c * b.c) AS p, "
    "sum(a.c) AS ak, sum(b.c) AS bk "
    "FROM s a, range(1, 3) t(k), s b WHERE a.h - k = b.h GROUP BY k), "
    "g AS (SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS ss FROM s), "
    "j AS (SELECT *, s1 / n AS m FROM lagagg, g), "
    "r AS (SELECT k, round((p - m * (ak + bk) + nk * m * m) / "
    "(ss - n * m * m), 4) AS acf FROM j), "
    "wide AS (SELECT max(CASE WHEN k = 1 THEN acf END) AS r1, "
    "max(CASE WHEN k = 2 THEN acf END) AS r2 FROM r) "
    "SELECT r1, r2, r1 AS pacf_1, "
    "round((r2 - r1 * r1) / (1 - r1 * r1), 4) AS pacf_2 FROM wide"
)

ORACLE["graph_summary_stats"] = (
    f"WITH {_MUTUAL}, "
    "mm AS MATERIALIZED (SELECT a, b FROM m), "
    "nodes AS (SELECT vec_id AS node FROM embeddings), "
    "dg0 AS (SELECT node, count(*) AS d FROM "
    "(SELECT a AS node FROM mm UNION ALL SELECT b FROM mm) GROUP BY node), "
    "deg AS (SELECT coalesce(dg0.d, 0) AS d FROM nodes "
    "LEFT JOIN dg0 ON nodes.node = dg0.node), "
    "nn AS (SELECT count(*) AS n FROM nodes), "
    "me AS (SELECT count(*) AS m FROM mm), "
    "dg AS (SELECT CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_isolated, CAST(max(d) AS BIGINT) AS max_degree, "
    "CAST(sum(d) AS BIGINT) AS sum_deg FROM deg) "
    "SELECT n, m, round(2 * m / (CAST(n AS DOUBLE) * (n - 1)), 6) AS density, "
    "n_isolated, max_degree, "
    "round(sum_deg / CAST(n AS DOUBLE), 4) AS avg_degree FROM nn, me, dg"
)

ORACLE["ts_spectral_entropy"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "tt AS (SELECT c, row_number() OVER (ORDER BY h) - 1 AS t FROM s), "
    "nn AS (SELECT count(*) AS n FROM s), "
    "terms0 AS (SELECT k, n, TRY_CAST(round(c * cos(2 * pi() * k * t / n) "
    "* 100000000, 0) AS BIGINT) AS ca, "
    "TRY_CAST(round(c * sin(2 * pi() * k * t / n) * 100000000, 0) AS BIGINT) AS cb "
    "FROM tt, range(1, 37) r(k), nn), "
    "agg AS (SELECT k, n, CAST(sum(ca) AS BIGINT) AS a, "
    "CAST(sum(cb) AS BIGINT) AS b FROM terms0 GROUP BY k, n), "
    "pw AS (SELECT k, TRY_CAST(round(round(((CAST(a AS DOUBLE) / 100000000) * "
    "(CAST(a AS DOUBLE) / 100000000) + (CAST(b AS DOUBLE) / 100000000) * "
    "(CAST(b AS DOUBLE) / 100000000)) / n, 4) * 1000000, 0) AS BIGINT) AS pq "
    "FROM agg), "
    "tot AS (SELECT CAST(sum(pq) AS BIGINT) AS tp FROM pw), "
    "hterms AS (SELECT CASE WHEN pq = 0 THEN CAST(0 AS BIGINT) ELSE "
    "TRY_CAST(round(-(pq / CAST(tp AS DOUBLE)) * ln(pq / CAST(tp AS DOUBLE)) "
    "* 1000000000, 0) AS BIGINT) END AS hq FROM pw, tot) "
    "SELECT count(*) AS n_freqs, "
    "round(CAST(sum(hq) AS BIGINT) / CAST(1000000000 AS DOUBLE), 4) "
    "AS spectral_entropy_nats FROM hterms"
)

ORACLE["llm_heaps_law"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "firsts AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term), "
    "doc_tok AS (SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id), "
    "cps AS (SELECT i * 50 AS cp FROM range(1, 11) t(i)), "
    "vocab AS (SELECT cp, count(*) AS v FROM cps JOIN firsts ON fd < cp "
    "GROUP BY cp), "
    "ntok AS (SELECT cp, CAST(sum(nt) AS BIGINT) AS n FROM cps "
    "JOIN doc_tok ON doc_id < cp GROUP BY cp), "
    "pts AS (SELECT cp, n, v, "
    "TRY_CAST(round(ln(n) * 1000000, 0) AS BIGINT) AS xq, "
    "TRY_CAST(round(ln(v) * 1000000, 0) AS BIGINT) AS yq FROM vocab "
    "JOIN ntok USING (cp)), "
    "g AS (SELECT count(*) AS m, CAST(sum(xq) AS BIGINT) AS sx, "
    "CAST(sum(yq) AS BIGINT) AS sy, CAST(sum(xq * xq) AS BIGINT) AS sxx, "
    "CAST(sum(xq * yq) AS BIGINT) AS sxy FROM pts), "
    "beta AS (SELECT round(CAST(m * sxy - sx * sy AS DOUBLE) / "
    "(m * sxx - sx * sx), 4) AS beta FROM g) "
    "SELECT cp, n, v, beta FROM pts, beta"
)

ORACLE["ml_f1_scores"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS votes FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "pred AS (SELECT qid, qlabel AS true_label, tlabel AS pred_label, "
    "row_number() OVER (PARTITION BY qid ORDER BY votes DESC, tlabel) AS vr "
    "FROM votes), "
    "p AS (SELECT true_label, pred_label FROM pred WHERE vr = 1), "
    "tp AS (SELECT true_label AS lbl, count(*) AS tp FROM p "
    "WHERE true_label = pred_label GROUP BY true_label), "
    "act AS (SELECT true_label AS lbl, count(*) AS act FROM p "
    "GROUP BY true_label), "
    "prd AS (SELECT pred_label AS lbl, count(*) AS prd FROM p "
    "GROUP BY pred_label), "
    "per AS (SELECT coalesce(act.act, 0) AS act, coalesce(prd.prd, 0) AS prd, "
    "coalesce(tp.tp, 0) AS tp FROM act FULL JOIN prd ON act.lbl = prd.lbl "
    "LEFT JOIN tp ON coalesce(act.lbl, prd.lbl) = tp.lbl), "
    "q AS (SELECT CASE WHEN act + prd = 0 THEN CAST(0 AS BIGINT) ELSE "
    "TRY_CAST(round(2 * tp / CAST(act + prd AS DOUBLE) * 1000000, 0) AS BIGINT) "
    "END AS f1q FROM per), "
    "nn AS (SELECT count(*) AS n, CAST(sum(CASE WHEN true_label = pred_label "
    "THEN 1 ELSE 0 END) AS BIGINT) AS ok FROM p) "
    "SELECT (SELECT count(*) FROM q) AS n_classes, "
    "round(ok / CAST(n AS DOUBLE), 4) AS micro_f1, "
    "round((SELECT CAST(sum(f1q) AS BIGINT) FROM q) / "
    "((SELECT count(*) FROM q) * CAST(1000000 AS DOUBLE)), 4) AS macro_f1 "
    "FROM nn"
)

ORACLE["ts_max_drawdown"] = (
    "WITH p AS (SELECT event_id, epoch_us(ts) AS t, "
    "CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END * "
    f"{_CENTS.format(x='value')} AS delta_c "
    "FROM events WHERE event_type = 'purchase'), "
    # COALESCE(…, 0): a NULL delta (ingest-NULLed non-finite value) leaves
    # the running balance UNMOVED — the engine prefix scan folds from 0 and
    # skips missing ticks, so an all-NULL prefix is balance 0, not NULL
    # (r11 non-finite sweep).
    "cc AS (SELECT event_id, t, "
    "CAST(COALESCE(sum(delta_c) OVER (ORDER BY t, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS cum_c "
    "FROM p), "
    "r AS (SELECT event_id, cum_c, "
    "CAST(max(cum_c) OVER (ORDER BY t, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_c "
    "FROM cc) "
    "SELECT count(*) AS n_points, "
    "CAST(max(peak_c - cum_c) AS BIGINT) AS max_drawdown_c, "
    "CAST(max(peak_c) AS BIGINT) AS max_peak_c, "
    "round(max(peak_c - cum_c) / CAST(max(peak_c) AS DOUBLE), 4) "
    "AS max_dd_over_peak FROM r"
)

ORACLE["ts_mann_kendall"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "sp AS (SELECT CAST(sum(CAST(sign(b.c - a.c) AS BIGINT)) AS BIGINT) AS s, "
    "count(*) AS n_pairs FROM s a JOIN s b ON a.h < b.h), "
    "ties AS (SELECT CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) "
    "AS tie_term FROM (SELECT count(*) AS tc FROM s GROUP BY c)), "
    "nn AS (SELECT count(*) AS n FROM s) "
    "SELECT s, n_pairs, "
    "round((s - sign(s)) / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) "
    "- tie_term) / 18), 4) AS z FROM sp, ties, nn"
)

ORACLE["llm_vocab_kl_divergence"] = (
    "WITH tok AS (SELECT doc_id, "
    "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' AS is_train, "
    "unnest(string_split(text, ' ')) AS term FROM documents), "
    "per AS (SELECT term, "
    "CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS ct, "
    "CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS ch "
    "FROM tok GROUP BY term), "
    "tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, "
    "CAST(sum(ch) AS BIGINT) AS nh, count(*) AS v FROM per), "
    "terms AS (SELECT TRY_CAST(round(((ch + 1) / CAST(nh + v AS DOUBLE)) * "
    "ln(((ch + 1) / CAST(nh + v AS DOUBLE)) / "
    "((ct + 1) / CAST(nt + v AS DOUBLE))) * 1000000000, 0) AS BIGINT) AS kq "
    "FROM per, tot) "
    "SELECT count(*) AS vocab_size, "
    "round(CAST(sum(kq) AS BIGINT) / CAST(1000000000 AS DOUBLE), 4) "
    "AS kl_heldout_from_train FROM terms"
)

ORACLE["str_churn_labels"] = (
    "WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS t "
    "FROM events), "
    "span AS (SELECT max(t) // 86400000000 AS mxd FROM ev), "
    "per AS (SELECT user_id, count(*) AS n_events, "
    "count(DISTINCT t // 86400000000) AS active_days, "
    "CAST(sum(CASE WHEN event_type = 'purchase' THEN "
    f"{_CENTS.format(x='value')} ELSE 0 END) AS BIGINT) AS spend_c, "
    "min(t) // 86400000000 AS first_day, max(t) // 86400000000 AS last_day "
    "FROM ev GROUP BY user_id) "
    "SELECT user_id, n_events, active_days, spend_c, "
    "last_day - first_day AS tenure_days, mxd - last_day AS recency_days, "
    "CAST(last_day < mxd - 7 AS INT) AS churned FROM per, span"
)

ORACLE["ts_persistence_error_curve"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "hs AS (SELECT CAST(unnest([1, 6, 12, 24]) AS BIGINT) AS hz), "
    "pairs AS (SELECT hz, a.c AS ct, b.c AS cl FROM s a, hs, s b "
    "WHERE a.h - hz = b.h) "
    "SELECT hz, count(*) AS n, "
    "round(sum(abs(ct - cl)) / CAST(count(*) AS DOUBLE), 4) AS mae, "
    "round(sqrt(sum((ct - cl) * (ct - cl)) / CAST(count(*) AS DOUBLE)), 4) "
    "AS rmse FROM pairs GROUP BY hz"
)

ORACLE["rel_unique_key_audit"] = (
    "WITH e1 AS (SELECT count(*) AS cnt FROM events GROUP BY event_id), "
    "d1 AS (SELECT count(*) AS cnt FROM documents GROUP BY doc_id), "
    "v1 AS (SELECT count(*) AS cnt FROM embeddings GROUP BY vec_id), "
    "o1 AS (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey), "
    "l1 AS (SELECT count(*) AS cnt FROM lineitem "
    "GROUP BY l_orderkey, l_linenumber) "
    "SELECT 'events.event_id' AS key, count(*) AS distinct_keys, "
    "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys, "
    "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) "
    "AS surplus_rows FROM e1 "
    "UNION ALL SELECT 'documents.doc_id', count(*), "
    "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) FROM d1 "
    "UNION ALL SELECT 'embeddings.vec_id', count(*), "
    "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) FROM v1 "
    "UNION ALL SELECT 'orders.o_orderkey', count(*), "
    "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) FROM o1 "
    "UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber)', count(*), "
    "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) FROM l1"
)

ORACLE["ml_best_f1_threshold"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW)), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM pts), "
    "scored AS (SELECT score, tp, fp, "
    "TRY_CAST(round(2 * tp / CAST(2 * tp + fp + (p - tp) AS DOUBLE) * 1000000, 0) "
    "AS BIGINT) AS f1q FROM cum, g), "
    "best AS (SELECT *, row_number() OVER "
    "(ORDER BY f1q DESC, score DESC) AS rn FROM scored) "
    "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
    "round(f1q / CAST(1000000 AS DOUBLE), 4) AS best_f1 "
    "FROM best WHERE rn = 1"
)

ORACLE["ts_gumbel_fit"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "maxima AS (SELECT h // 24 AS day, CAST(max(c) AS BIGINT) AS mx, "
    "count(*) AS bn FROM s GROUP BY day), "
    "ok AS (SELECT * FROM maxima WHERE bn = 24), "
    "g AS (SELECT count(*) AS n, CAST(sum(mx) AS BIGINT) AS s1, "
    "CAST(sum(mx * mx) AS BIGINT) AS ss FROM ok) "
    "SELECT n AS n_blocks, round(CAST(s1 AS DOUBLE) / n, 4) AS mean_max, "
    "round(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) "
    "* sqrt(6) / pi(), 4) AS gumbel_beta, "
    "round(CAST(s1 AS DOUBLE) / n - 0.5772156649 * "
    "(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) * sqrt(6) / pi()), "
    "4) AS gumbel_mu, "
    "round((CAST(s1 AS DOUBLE) / n - 0.5772156649 * "
    "(sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) * sqrt(6) / pi())) "
    "- (sqrt((ss - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) * sqrt(6) / pi()) "
    "* ln(-ln(1 - 1 / CAST(30 AS DOUBLE))), 4) AS return_level_30d FROM g"
)

ORACLE["llm_term_burstiness"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    "FROM documents), "
    "tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term), "
    "top AS (SELECT term, count(DISTINCT doc_id) AS df, "
    "CAST(sum(c) AS BIGINT) AS cf FROM tf GROUP BY term "
    "ORDER BY df DESC, term LIMIT 20), "
    "nd AS (SELECT count(*) AS nd FROM documents), "
    "m AS (SELECT tf.term, top.df, top.cf, "
    "CAST(sum(tf.c * tf.c) AS BIGINT) AS ss FROM tf "
    "JOIN top ON tf.term = top.term GROUP BY tf.term, top.df, top.cf) "
    "SELECT term, df, cf, "
    "round((CAST(ss AS DOUBLE) / nd - (CAST(cf AS DOUBLE) / nd) * "
    "(CAST(cf AS DOUBLE) / nd)) / (CAST(cf AS DOUBLE) / nd), 4) AS burstiness "
    "FROM m, nd"
)

ORACLE["str_rfm_segments"] = (
    "WITH ev AS (SELECT user_id, value, epoch_us(ts) AS t FROM events "
    "WHERE event_type = 'purchase'), "
    "span AS (SELECT max(t) // 86400000000 AS mxd FROM ev), "
    "per AS (SELECT user_id, max(t) // 86400000000 AS last_day, "
    "count(*) AS freq, "
    f"CAST(sum({_CENTS.format(x='value')}) AS BIGINT) AS spend_c "
    "FROM ev GROUP BY user_id), "
    "base AS (SELECT user_id, mxd - last_day AS recency_days, freq, spend_c "
    "FROM per, span), "
    "coded AS (SELECT user_id, recency_days, freq, spend_c, "
    "ntile(5) OVER (ORDER BY recency_days, user_id) AS r, "
    "ntile(5) OVER (ORDER BY freq DESC, user_id) AS f, "
    "ntile(5) OVER (ORDER BY spend_c DESC, user_id) AS m FROM base) "
    "SELECT user_id, recency_days, freq, spend_c, r, f, m, "
    "CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) "
    "AS segment FROM coded"
)

ORACLE["ml_precision_at_k"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT qid, rnk, CAST(tlabel = qlabel AS INT) AS rel "
    "FROM ranked WHERE rnk <= 10), "
    "cum AS (SELECT qid, rnk AS k, "
    "TRY_CAST(round(CAST(sum(rel) OVER (PARTITION BY qid ORDER BY rnk "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
    "/ rnk * 1000000, 0) AS BIGINT) AS pq FROM topk) "
    "SELECT k, count(*) AS n_queries, "
    "(CAST(sum(pq) AS BIGINT) + count(*) * 50) // (count(*) * 100) "
    "AS precision_q4 FROM cum GROUP BY k"
)

ORACLE["llm_dedup_cluster_langs"] = materialize_ctes(
    f"WITH comp AS ({_COMPONENTS_SQL}) "
    "SELECT cluster, count(*) AS n_members, "
    "count(DISTINCT d.lang) AS n_langs, min(d.lang) AS first_lang "
    "FROM comp JOIN documents d ON comp.doc_id = d.doc_id "
    "WHERE comp.cluster_size > 1 GROUP BY cluster"
)

ORACLE["ml_operating_point_card"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW)), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p, "
    "CAST(count(*) - sum(y) AS BIGINT) AS neg FROM pts), "
    "scored AS (SELECT score, tp, fp, tp * neg - fp * p AS j_scaled, p, neg "
    "FROM cum, g), "
    "best AS (SELECT *, row_number() OVER "
    "(ORDER BY j_scaled DESC, score DESC) AS rn FROM scored) "
    "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
    "p - tp AS fn, neg - fp AS tn, "
    "round(CAST(tp AS DOUBLE) / p, 4) AS sensitivity, "
    "round(CAST(neg - fp AS DOUBLE) / neg, 4) AS specificity, "
    "round(CAST(tp AS DOUBLE) / (tp + fp), 4) AS ppv, "
    "round(CAST(neg - fp AS DOUBLE) / ((neg - fp) + (p - tp)), 4) AS npv "
    "FROM best WHERE rn = 1"
)

ORACLE["ts_median_filter"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "r AS (SELECT h, c, lag(c, 2) OVER (ORDER BY h) AS m2, "
    "lag(c, 1) OVER (ORDER BY h) AS m1, "
    "lead(c, 1) OVER (ORDER BY h) AS p1, "
    "lead(c, 2) OVER (ORDER BY h) AS p2 FROM s) "
    "SELECT h, c, "
    "CASE WHEN m2 IS NULL OR m1 IS NULL OR p1 IS NULL OR p2 IS NULL "
    "THEN c ELSE list_sort([m2, m1, c, p1, p2])[3] END AS median5 FROM r"
)

ORACLE["ml_vote_margin"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
    "votes AS (SELECT qid, qlabel, tlabel, count(*) AS v FROM topk "
    "GROUP BY qid, qlabel, tlabel), "
    "r AS (SELECT *, row_number() OVER "
    "(PARTITION BY qid ORDER BY v DESC, tlabel) AS vr FROM votes), "
    "per AS (SELECT qid, max(CASE WHEN vr = 1 THEN v END) AS v1, "
    "coalesce(max(CASE WHEN vr = 2 THEN v END), 0) AS v2, "
    "max(CASE WHEN vr = 1 THEN CAST(tlabel = qlabel AS INT) END) AS ok "
    "FROM r WHERE vr <= 2 GROUP BY qid) "
    "SELECT v1 - v2 AS margin, count(*) AS n_queries, "
    "CAST(sum(ok) AS BIGINT) AS n_correct, "
    "round(sum(ok) / CAST(count(*) AS DOUBLE), 4) AS accuracy "
    "FROM per GROUP BY margin"
)

ORACLE["ml_recall_at_k"] = (
    f"WITH {_KNN_EMB}, {_KNN_PAIRS}, "
    "ranked AS (SELECT pairs.*, row_number() OVER "
    "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
    "topk AS (SELECT qid, qlabel, rnk, CAST(tlabel = qlabel AS INT) AS rel "
    "FROM ranked WHERE rnk <= 10), "
    "lbl AS (SELECT label, count(*) AS n_lbl FROM embeddings GROUP BY label), "
    "qrel AS (SELECT DISTINCT topk.qid, lbl.n_lbl - 1 AS n_rel FROM topk "
    "JOIN lbl ON topk.qlabel = lbl.label), "
    "cum AS (SELECT topk.qid, rnk AS k, "
    "TRY_CAST(round(CAST(sum(rel) OVER (PARTITION BY topk.qid ORDER BY rnk "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
    "/ n_rel * 1000000, 0) AS BIGINT) AS rq "
    "FROM topk JOIN qrel ON topk.qid = qrel.qid) "
    "SELECT k, count(*) AS n_queries, "
    "round(CAST(sum(rq) AS BIGINT) / "
    "(count(*) * CAST(1000000 AS DOUBLE)), 4) AS recall_at_k "
    "FROM cum GROUP BY k"
)

ORACLE["graph_edge_length_stats"] = (
    f"WITH {_MUTUAL}, "
    "ed AS (SELECT round(p.dist, 4) AS dr FROM m "
    "JOIN pairs p ON m.a = p.qid AND m.b = p.tid), "
    "nn AS (SELECT count(*) AS n FROM ed), "
    "med AS (SELECT dr AS median_d FROM "
    "(SELECT dr, row_number() OVER (ORDER BY dr) AS r FROM ed), nn "
    "WHERE r = CAST(ceil(n / 2.0) AS BIGINT)), "
    "agg AS (SELECT count(*) AS n_edges, min(dr) AS min_d, max(dr) AS max_d, "
    "CAST(sum(TRY_CAST(round(dr * 10000, 0) AS BIGINT)) AS BIGINT) AS s4 FROM ed) "
    "SELECT n_edges, min_d, "
    "round(s4 / (n_edges * CAST(10000 AS DOUBLE)), 4) AS mean_d, "
    "median_d, max_d FROM agg, med"
)

ORACLE["str_bounce_rate"] = (
    "WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events), "
    "marked AS (SELECT user_id, t, event_id, "
    "CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000 "
    "THEN 1 ELSE 0 END AS brk FROM ev "
    "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
    "sessed AS (SELECT user_id, CAST(sum(brk) OVER "
    "(PARTITION BY user_id ORDER BY t, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess "
    "FROM marked), "
    "sess AS (SELECT user_id, sess, count(*) AS n_ev FROM sessed "
    "GROUP BY user_id, sess) "
    "SELECT user_id % 10 AS user_bucket, count(*) AS n_sessions, "
    "CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces, "
    "round(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) / "
    "CAST(count(*) AS DOUBLE), 4) AS bounce_rate "
    "FROM sess GROUP BY user_bucket"
)

ORACLE["graph_degree_entropy"] = (
    f"WITH {_MUTUAL}, "
    "sym AS (SELECT a AS node FROM m UNION ALL SELECT b FROM m), "
    "dg0 AS (SELECT node, count(*) AS d FROM sym GROUP BY node), "
    "deg AS (SELECT coalesce(dg0.d, 0) AS d FROM embeddings "
    "LEFT JOIN dg0 ON embeddings.vec_id = dg0.node), "
    "hist AS (SELECT d, count(*) AS c FROM deg GROUP BY d), "
    "nn AS (SELECT count(*) AS n FROM deg), "
    "terms AS (SELECT TRY_CAST(round(-(c / CAST(n AS DOUBLE)) * "
    "ln(c / CAST(n AS DOUBLE)) * 1000000000, 0) AS BIGINT) AS hq "
    "FROM hist, nn) "
    "SELECT count(*) AS n_degree_values, "
    "round(CAST(sum(hq) AS BIGINT) / CAST(1000000000 AS DOUBLE), 4) "
    "AS degree_entropy_nats FROM terms"
)

ORACLE["ml_tpr_at_fixed_fpr"] = (
    "WITH pts AS (SELECT round(CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END[1], 4) "
    "+ CAST(0 AS DOUBLE) AS score, "
    "CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings), "
    "per AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos "
    "FROM pts GROUP BY score), "
    "cum AS (SELECT score, CAST(sum(pos) OVER w AS BIGINT) AS tp, "
    "CAST(sum(n) OVER w - sum(pos) OVER w AS BIGINT) AS fp FROM per "
    "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW)), "
    "g AS (SELECT CAST(sum(y) AS BIGINT) AS p, "
    "CAST(count(*) - sum(y) AS BIGINT) AS neg FROM pts), "
    "adm AS (SELECT * FROM cum, g WHERE fp * 20 <= neg), "
    "best AS (SELECT *, row_number() OVER (ORDER BY tp DESC, score) AS rn "
    "FROM adm) "
    "SELECT round(score, 4) + CAST(0 AS DOUBLE) AS threshold, tp, fp, "
    "round(CAST(tp AS DOUBLE) / p, 4) AS tpr, "
    "round(CAST(fp AS DOUBLE) / neg, 4) AS fpr FROM best WHERE rn = 1"
)

ORACLE["ts_exceedance_episodes"] = (
    f"WITH {_EVD}, {_HOURLY_SQL}, "
    "nn AS (SELECT count(*) AS n FROM s), "
    "thr AS (SELECT c AS thr FROM "
    "(SELECT c, row_number() OVER (ORDER BY c, h) AS r FROM s), nn "
    "WHERE r = CAST(ceil(0.9 * n) AS BIGINT)), "
    "above AS (SELECT h, c FROM s, thr WHERE c > thr), "
    "runs AS (SELECT h, c, h - row_number() OVER (ORDER BY h) AS grp "
    "FROM above) "
    "SELECT min(h) AS start_h, count(*) AS duration_h, "
    "CAST(max(c) AS BIGINT) AS peak_c FROM runs GROUP BY grp"
)
