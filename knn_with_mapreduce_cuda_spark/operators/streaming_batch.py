"""T4 — streaming surface, batch-equivalent graded forms (SURVEY.md §2.T4).

Structured Streaming can't run under the DuckDB oracle, so each operator
ships here as its batch-equivalent query — using the *real* streaming
operators (``window``, ``session_window``) where they exist in batch —
while the true ``readStream``/``writeStream`` forms live in
``streaming/jobs.py`` and are exercised by tests/test_streaming.py
against these same batch results.

Scale notes: windowed aggregations shuffle on (key, window) — bounded
state per watermark delay; session windows use Spark's native
session_window operator (mergeable state); the sink demo writes
partitionBy(lang) parquet — the layout a 100 TB corpus would use for
partition-pruned reads.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from .relational import _CENTS, cents, _sum_cents_sql

_CENTS_VALUE = _CENTS.format(x="value")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")

_EV = (
    "ev AS (SELECT event_id, user_id, event_type, value, "
    "epoch_us(ts) AS ts_us, CAST(ts AS TIMESTAMP) AS tsu FROM events)"
)

_HOUR_US = 3_600_000_000
_Q15_US = 900_000_000


def _q_window_tumbling(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum(cents(col("value"))).alias("value_cents"))
        .select(
            F.unix_micros(col("win.start")).alias("ws_us"),
            "event_type",
            "cnt",
            "value_cents",
        )
    )


def _q_window_distinct(spark, sf_dir):
    """Windowed distinct cardinality — per-hour unique users per type.
    Streaming form uses approx_count_distinct (exact distinct is
    unsupported in update-mode streaming aggs); the graded batch form is
    exact. Scale: distinct expands (window, type, user) before the final
    count — two-level aggregation keeps the combine map-side."""
    ev = tables.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.countDistinct("user_id").alias("uniq_users"))
        .select(
            F.unix_micros(col("win.start")).alias("ws_us"),
            "event_type",
            "uniq_users",
        )
    )


def _q_window_sliding(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_micros(col("win.start")).alias("ws_us"), "cnt")
    )


def _q_window_session(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(cents(col("value"))).alias("value_cents"))
        .select(
            "user_id",
            F.unix_micros(col("win.start")).alias("start_us"),
            "n_events",
            "value_cents",
        )
    )


def _q_session_stats(spark, sf_dir):
    """Session-length distribution: sessionize (native session_window),
    then aggregate sessions by event count — the funnel/engagement rollup
    over the sessionization output. Session duration is derived from the
    window bounds (end = last event + gap, so duration = end - start -
    gap). Two shuffles total at any scale: one on user for the session
    merge, one on n_events for the distribution."""
    ev = tables.table(spark, sf_dir, "events")
    sess = ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_micros(col("win.end"))
            - F.unix_micros(col("win.start"))
            - lit(1_800_000_000)
        ).alias("dur_us"),
    )
    return sess.groupBy("n_events").agg(
        F.count("*").alias("n_sessions"),
        F.sum("dur_us").alias("total_dur_us"),
        F.max("dur_us").alias("max_dur_us"),
    )


def _q_resample_locf(spark, sf_dir):
    """Time-series resampling to an hourly grid with
    last-observation-carried-forward gap filling — the standard prep step
    before windowed feature extraction. Per-user spine generated with
    ``sequence`` (no driver loop), left-joined to the hourly rollup, gaps
    filled by ``last(..., ignorenulls)`` over a running frame. One
    shuffle on user_id covers rollup, join, and window. Bounded to
    user_id <= 30 to keep the graded output small; the plan is
    user-count-independent."""
    ev = tables.table(spark, sf_dir, "events").filter(col("user_id") <= 30)
    hour = (col("ts_us") - col("ts_us") % _HOUR_US).alias("hour_us")
    hourly = ev.groupBy("user_id", hour).agg(
        F.count("*").alias("cnt"), F.sum(cents(col("value"))).alias("val_cents")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    col("mn") - col("mn") % _HOUR_US,
                    col("mx") - col("mx") % _HOUR_US,
                    lit(_HOUR_US),
                )
            ).alias("hour_us"),
        )
    )
    joined = spine.join(hourly, ["user_id", "hour_us"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_us",
        F.coalesce(col("cnt"), lit(0)).cast("long").alias("cnt"),
        F.last("val_cents", ignorenulls=True).over(w).alias("locf_cents"),
        col("val_cents").isNull().cast("int").alias("is_gap"),
    )


FUNNEL_STEPS = ["signup", "click", "purchase"]


def _q_funnel(spark, sf_dir):
    """Ordered 3-step funnel (signup → click → purchase): per user, the
    earliest signup, the earliest click AFTER that signup, the earliest
    purchase after that click — the product-analytics sequence query.
    One shuffle on user_id; each stage is a conditional min over the
    user's partition (no self-joins, no explosion). Output: per-step
    reached-user counts."""
    ev = tables.table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(col("event_type") == FUNNEL_STEPS[0], col("ts_us"))).alias("t1")
    )
    ev2 = ev.join(per_user, "user_id")
    step2 = ev2.groupBy("user_id", "t1").agg(
        F.min(
            F.when(
                (col("event_type") == FUNNEL_STEPS[1]) & (col("ts_us") > col("t1")),
                col("ts_us"),
            )
        ).alias("t2")
    )
    ev3 = ev.join(step2, "user_id")
    step3 = ev3.groupBy("user_id", "t1", "t2").agg(
        F.min(
            F.when(
                (col("event_type") == FUNNEL_STEPS[2]) & (col("ts_us") > col("t2")),
                col("ts_us"),
            )
        ).alias("t3")
    )
    return step3.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("reached_signup"),
        F.count("t2").alias("reached_click"),
        F.count("t3").alias("reached_purchase"),
    )


def _q_markov_transitions(spark, sf_dir):
    """First-order Markov transition estimation over per-user event
    sequences: lag() pairs up consecutive event types, counts become the
    transition matrix, probabilities are exact-count ratios rounded
    once. The sequence-mining primitive (next-event prediction, anomaly
    scoring). One shuffle on user_id for the lag; one on the (from, to)
    pair for the counts."""
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        col("event_type").alias("to_type"),
    ).filter(col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("cnt"))
    row_tot = counts.groupBy("from_type").agg(F.sum("cnt").alias("row_cnt"))
    return counts.join(row_tot, "from_type").select(
        "from_type",
        "to_type",
        "cnt",
        F.round(col("cnt") / col("row_cnt"), 4).alias("p"),
    )


def _q_interval_overlap(spark, sf_dir):
    """Interval-overlap self-join over the SCD2 validity intervals of two
    user groups: classic temporal predicate a.start < b.end AND
    b.start < a.end. Bounded input (users ≤ 20 vs 21..40) keeps the
    graded output small; at scale this is the range-bucket join problem
    (rel_join_range_bucket shows the partitioned strategy)."""
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    iv = ev.select(
        "user_id",
        col("event_id").alias("iv_id"),
        col("ts_us").alias("s"),
        F.lead("ts_us").over(w).alias("e"),
    ).filter(col("e").isNotNull())
    a = iv.filter(col("user_id") <= 20).select(
        col("iv_id").alias("a_id"), col("s").alias("a_s"), col("e").alias("a_e")
    )
    b = iv.filter((col("user_id") > 20) & (col("user_id") <= 40)).select(
        col("iv_id").alias("b_id"), col("s").alias("b_s"), col("e").alias("b_e")
    )
    j = a.join(b, (col("a_s") < col("b_e")) & (col("b_s") < col("a_e")))
    return j.select(
        "a_id",
        "b_id",
        (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).alias("overlap_us"),
    )


def _q_dedup_watermark(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    hour = (col("ts_us") - col("ts_us") % _HOUR_US).alias("hour_us")
    w = Window.partitionBy("user_id", "event_type", "hour_us").orderBy("event_id")
    return (
        ev.select("event_id", "user_id", "event_type", hour)
        .withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("user_id", "event_type", "hour_us", "event_id")
    )


def _q_late_data(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts_us") - lit(600_000_000)).alias("wm"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(col("ts_us") >= col("wm"))
        .select("event_id", "user_id", "event_type")
    )


def _q_join_stream_static(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    cust = tables.table(spark, sf_dir, "customer")
    return ev.join(F.broadcast(cust), col("user_id") == col("c_custkey")).select(
        "event_id", "user_id", "c_mktsegment", "value"
    )


def _q_join_stream_stream(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_id"), col("user_id").alias("p_user"), col("ts_us").alias("p_ts")
    )
    c = ev.filter(col("event_type") == "click").select(
        col("event_id").alias("c_id"), col("user_id").alias("c_user"), col("ts_us").alias("c_ts")
    )
    return p.join(
        c,
        (col("p_user") == col("c_user"))
        & (col("c_ts") >= col("p_ts") - lit(600_000_000))
        & (col("c_ts") <= col("p_ts") + lit(600_000_000)),
    ).select("p_id", "c_id", (col("c_ts") - col("p_ts")).alias("delta_us"))


def _q_join_stream_stream_outer(spark, sf_dir):
    """Batch twin of the watermarked LEFT OUTER stream-stream join:
    purchases keep a row even when no click falls in the ±10-minute
    band (the state-timeout null-emission path of streaming outer
    joins). The true readStream form runs in tests/test_streaming.py;
    this bounded-input equivalent is the graded semantics."""
    ev = tables.table(spark, sf_dir, "events")
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_id"),
        col("user_id").alias("p_user"),
        col("ts_us").alias("p_ts"),
    )
    c = ev.filter(col("event_type") == "click").select(
        col("event_id").alias("c_id"),
        col("user_id").alias("c_user"),
        col("ts_us").alias("c_ts"),
    )
    return p.join(
        c,
        (col("p_user") == col("c_user"))
        & (col("c_ts") >= col("p_ts") - lit(600_000_000))
        & (col("c_ts") <= col("p_ts") + lit(600_000_000)),
        "left",
    ).select(
        "p_id",
        "c_id",
        (col("c_ts") - col("p_ts")).alias("delta_us"),
        col("c_id").isNull().cast("int").alias("unmatched"),
    )


def _q_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's cents split
    equally across the user's clicks in the preceding 24 h; the integer
    remainder goes to the earliest touch, so attributed cents sum back
    to the purchase exactly (conservation under any partitioning — the
    cents convention applied to allocation). Touchless purchases emit an
    unattributed marker row."""
    ev = tables.table(spark, sf_dir, "events")
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_id"),
        col("user_id").alias("p_user"),
        col("ts_us").alias("p_ts"),
        cents(col("value")).alias("p_cents"),
    )
    c = ev.filter(col("event_type") == "click").select(
        col("event_id").alias("c_id"),
        col("user_id").alias("c_user"),
        col("ts_us").alias("c_ts"),
    )
    touches = p.join(
        c,
        (col("p_user") == col("c_user"))
        & (col("c_ts") < col("p_ts"))
        & (col("c_ts") >= col("p_ts") - lit(86_400_000_000)),
        "left",
    )
    w = Window.partitionBy("p_id")
    worder = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    r = (
        touches.withColumn("n_touch", F.count("c_id").over(w))
        .withColumn("tr", F.row_number().over(worder))
    )
    # pmod-based floor split: Spark `div` truncates toward zero while
    # DuckDB `//` floors, so refunds (negative cents) would diverge;
    # pmod(a,n) ≥ 0 with (a - pmod)/n is floor-consistent on both
    # engines and still conserves: fd·n + pm = a (ADVICE r01).
    return r.select(
        "p_id",
        F.coalesce("c_id", lit(-1)).alias("touch_id"),
        "n_touch",
        F.expr(
            "CASE WHEN n_touch = 0 THEN p_cents ELSE "
            "(p_cents - pmod(p_cents, n_touch)) div n_touch "
            "+ CASE WHEN tr = 1 THEN pmod(p_cents, n_touch) ELSE 0 END END"
        ).alias("attr_cents"),
    )


def _q_stateful_map(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.sum(cents(col("value"))).over(w).alias("run_cents")
    )


def _q_sink(spark, sf_dir):
    docs = tables.table(spark, sf_dir, "documents")
    out = os.path.join(SCRATCH, "sink_lang")
    shutil.rmtree(out, ignore_errors=True)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("lang").agg(F.count("*").alias("cnt"))


QUERIES = {
    "str_window_tumbling": _q_window_tumbling,
    "str_window_distinct": _q_window_distinct,
    "str_window_sliding": _q_window_sliding,
    "str_window_session": _q_window_session,
    "str_session_stats": _q_session_stats,
    "ts_resample_locf": _q_resample_locf,
    "rel_funnel_3step": _q_funnel,
    "ml_markov_transitions": _q_markov_transitions,
    "rel_join_interval_overlap": _q_interval_overlap,
    "str_dedup_watermark": _q_dedup_watermark,
    "str_late_data": _q_late_data,
    "str_join_stream_static": _q_join_stream_static,
    "str_join_stream_stream": _q_join_stream_stream,
    "str_join_stream_stream_outer": _q_join_stream_stream_outer,
    "str_attribution_linear": _q_attribution_linear,
    "str_stateful_map": _q_stateful_map,
    "str_sink": _q_sink,
}

ORACLE = {
    "str_window_tumbling": (
        f"WITH {_EV} SELECT CAST(epoch_us(date_trunc('hour', tsu)) AS BIGINT) AS ws_us, "
        "event_type, count(*) AS cnt, "
        + _sum_cents_sql("value")
        + " AS value_cents FROM ev GROUP BY 1, 2"
    ),
    "str_window_distinct": (
        f"WITH {_EV} SELECT CAST(epoch_us(date_trunc('hour', tsu)) AS BIGINT) AS ws_us, "
        "event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users "
        "FROM ev GROUP BY 1, 2"
    ),
    "str_window_sliding": (
        # floor-mod base, NOT `//`: DuckDB integer `//` TRUNCATES toward
        # zero while Spark's F.window grid FLOORS — for a pre-1970 event
        # the truncated base lands one slide HIGH, fabricating a window
        # that starts after the event (r11 temporal sweep; same idiom as
        # the pareto p_cents split below).
        f"WITH {_EV}, slid AS (SELECT ts_us, "
        f"ts_us - ((ts_us % {_Q15_US}) + {_Q15_US}) % {_Q15_US} "
        f"- k * {_Q15_US} AS ws_us "
        "FROM ev, range(4) t(k)) "
        f"SELECT ws_us, count(*) AS cnt FROM slid WHERE ws_us > ts_us - {_HOUR_US} "
        "GROUP BY ws_us"
    ),
    "str_window_session": (
        f"WITH {_EV}, o AS (SELECT user_id, ts_us, value, "
        "CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) "
        "> 1800000000 THEN 1 ELSE 0 END AS brk FROM ev), "
        "s AS (SELECT user_id, ts_us, value, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
        "SELECT user_id, CAST(min(ts_us) AS BIGINT) AS start_us, count(*) AS n_events, "
        + _sum_cents_sql("value")
        + " AS value_cents FROM s GROUP BY user_id, sid"
    ),
    "str_session_stats": (
        f"WITH {_EV}, o AS (SELECT user_id, ts_us, "
        "CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) "
        "> 1800000000 THEN 1 ELSE 0 END AS brk FROM ev), "
        "s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
        "sess AS (SELECT user_id, sid, count(*) AS n_events, "
        "max(ts_us) - min(ts_us) AS dur_us FROM s GROUP BY user_id, sid) "
        "SELECT n_events, count(*) AS n_sessions, "
        "CAST(sum(dur_us) AS BIGINT) AS total_dur_us, "
        "CAST(max(dur_us) AS BIGINT) AS max_dur_us "
        "FROM sess GROUP BY n_events"
    ),
    "ts_resample_locf": (
        f"WITH {_EV}, evf AS (SELECT * FROM ev WHERE user_id <= 30), "
        f"hourly AS (SELECT user_id, ts_us - ts_us % {_HOUR_US} AS hour_us, "
        "count(*) AS cnt, "
        "CAST(sum(TRY_CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS val_cents "
        "FROM evf GROUP BY 1, 2), "
        f"bounds AS (SELECT user_id, min(ts_us) - min(ts_us) % {_HOUR_US} AS mn, "
        f"max(ts_us) - max(ts_us) % {_HOUR_US} AS mx FROM evf GROUP BY user_id), "
        f"spine AS (SELECT user_id, mn + {_HOUR_US} * i AS hour_us "
        f"FROM bounds, range(1000) t(i) WHERE mn + {_HOUR_US} * i <= mx), "
        "j AS (SELECT s.user_id, s.hour_us, h.cnt, h.val_cents "
        "FROM spine s LEFT JOIN hourly h "
        "ON h.user_id = s.user_id AND h.hour_us = s.hour_us) "
        "SELECT user_id, CAST(hour_us AS BIGINT) AS hour_us, "
        "CAST(coalesce(cnt, 0) AS BIGINT) AS cnt, "
        "last_value(val_cents IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY hour_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS locf_cents, "
        "CAST(val_cents IS NULL AS INTEGER) AS is_gap FROM j"
    ),
    "rel_funnel_3step": (
        f"WITH {_EV}, "
        "s1 AS (SELECT user_id, min(CASE WHEN event_type = 'signup' "
        "THEN ts_us END) AS t1 FROM ev GROUP BY user_id), "
        "s2 AS (SELECT ev.user_id, s1.t1, min(CASE WHEN event_type = 'click' "
        "AND ts_us > s1.t1 THEN ts_us END) AS t2 "
        "FROM ev JOIN s1 ON s1.user_id = ev.user_id GROUP BY ev.user_id, s1.t1), "
        "s3 AS (SELECT ev.user_id, s2.t1, s2.t2, "
        "min(CASE WHEN event_type = 'purchase' AND ts_us > s2.t2 "
        "THEN ts_us END) AS t3 "
        "FROM ev JOIN s2 ON s2.user_id = ev.user_id "
        "GROUP BY ev.user_id, s2.t1, s2.t2) "
        "SELECT count(*) AS n_users, "
        "CAST(count(t1) AS BIGINT) AS reached_signup, "
        "CAST(count(t2) AS BIGINT) AS reached_click, "
        "CAST(count(t3) AS BIGINT) AS reached_purchase FROM s3"
    ),
    "ml_markov_transitions": (
        f"WITH {_EV}, "
        "p AS (SELECT lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id) AS from_type, event_type AS to_type FROM ev), "
        "c AS (SELECT from_type, to_type, count(*) AS cnt FROM p "
        "WHERE from_type IS NOT NULL GROUP BY from_type, to_type), "
        "rt AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_cnt "
        "FROM c GROUP BY from_type) "
        "SELECT c.from_type, c.to_type, c.cnt, "
        "round(c.cnt / rt.row_cnt, 4) AS p "
        "FROM c JOIN rt ON rt.from_type = c.from_type"
    ),
    "rel_join_interval_overlap": (
        f"WITH {_EV}, "
        "iv AS (SELECT user_id, event_id AS iv_id, ts_us AS s, "
        "lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS e "
        "FROM ev), "
        "a AS (SELECT iv_id AS a_id, s AS a_s, e AS a_e FROM iv "
        "WHERE e IS NOT NULL AND user_id <= 20), "
        "b AS (SELECT iv_id AS b_id, s AS b_s, e AS b_e FROM iv "
        "WHERE e IS NOT NULL AND user_id > 20 AND user_id <= 40) "
        "SELECT a_id, b_id, "
        "CAST(least(a_e, b_e) - greatest(a_s, b_s) AS BIGINT) AS overlap_us "
        "FROM a JOIN b ON a_s < b_e AND b_s < a_e"
    ),
    "str_dedup_watermark": (
        f"WITH {_EV} SELECT user_id, event_type, hour_us, event_id FROM ("
        f"SELECT user_id, event_type, ts_us - ts_us % {_HOUR_US} AS hour_us, event_id, "
        "row_number() OVER (PARTITION BY user_id, event_type, "
        f"ts_us - ts_us % {_HOUR_US} ORDER BY event_id) AS rn FROM ev) WHERE rn = 1"
    ),
    "str_late_data": (
        f"WITH {_EV} SELECT event_id, user_id, event_type FROM ev "
        "WHERE ts_us >= (SELECT max(ts_us) FROM ev) - 600000000"
    ),
    "str_join_stream_static": (
        f"WITH {_EV} SELECT event_id, user_id, c_mktsegment, value "
        "FROM ev JOIN customer ON user_id = c_custkey"
    ),
    "str_join_stream_stream": (
        f"WITH {_EV}, "
        "p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM ev "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id AS c_id, user_id, ts_us AS c_ts FROM ev "
        "WHERE event_type = 'click') "
        "SELECT p_id, c_id, c_ts - p_ts AS delta_us FROM p JOIN c ON p.user_id = c.user_id "
        "AND c.c_ts >= p.p_ts - 600000000 AND c.c_ts <= p.p_ts + 600000000"
    ),
    "str_join_stream_stream_outer": (
        f"WITH {_EV}, "
        "p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM ev "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id AS c_id, user_id, ts_us AS c_ts FROM ev "
        "WHERE event_type = 'click') "
        "SELECT p_id, c_id, c_ts - p_ts AS delta_us, "
        "CAST(c_id IS NULL AS INTEGER) AS unmatched "
        "FROM p LEFT JOIN c ON p.user_id = c.user_id "
        "AND c.c_ts >= p.p_ts - 600000000 AND c.c_ts <= p.p_ts + 600000000"
    ),
    "str_attribution_linear": (
        f"WITH {_EV}, "
        "p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts, "
        f"{_CENTS_VALUE} AS p_cents FROM ev WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id AS c_id, user_id, ts_us AS c_ts FROM ev "
        "WHERE event_type = 'click'), "
        "touches AS (SELECT p.p_id, p.p_cents, c.c_id, c.c_ts "
        "FROM p LEFT JOIN c ON p.user_id = c.user_id "
        "AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - 86400000000), "
        "r AS (SELECT p_id, p_cents, c_id, "
        "count(c_id) OVER (PARTITION BY p_id) AS n_touch, "
        "row_number() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS tr "
        "FROM touches) "
        "SELECT p_id, coalesce(c_id, -1) AS touch_id, n_touch, "
        "CASE WHEN n_touch = 0 THEN p_cents ELSE "
        "(p_cents - ((p_cents % n_touch) + n_touch) % n_touch) // n_touch "
        "+ CASE WHEN tr = 1 THEN ((p_cents % n_touch) + n_touch) % n_touch "
        "ELSE 0 END END AS attr_cents FROM r"
    ),
    "str_stateful_map": (
        f"WITH {_EV} SELECT event_id, user_id, "
        "CAST(sum(" + _CENTS_VALUE + ") OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents FROM ev"
    ),
    "str_sink": "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
}
