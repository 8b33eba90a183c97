"""T2 — relational operator surface (SURVEY.md §2.T2).

The engine layer the reference repo class never had (its only "query" is
the kNN CLI invocation — SURVEY.md §1.1): scans, joins of every shape,
hash/rollup aggregation, windows, set ops, subqueries, and the scalar
function library, all declarative DataFrame/SQL so Catalyst supplies
pushdown, pruning, partial aggregation, and join selection (SURVEY.md §4).

Scale notes per operator family:
- Joins: dimension sides are broadcast (`F.broadcast`); fact-fact joins
  use sort-merge (hinted where the local fixtures are small enough that
  Catalyst would otherwise broadcast); AQE handles skew at runtime.
- Aggregations: expressed as groupBy().agg() so partial aggregation
  (map-side combine) happens before the exchange.
- Monetary sums are integerized to cents *before* summing
  (``try_cast(round(x*100) as bigint)``): integer sums are
  order-independent, so the
  result is bit-identical across Spark's partitioned sum, a 1000-executor
  cluster sum, and DuckDB's sequential sum — the float-determinism
  convention of SURVEY.md §7.2 taken to its safe endpoint.
- Window/top-k: every ORDER BY ends in a unique key (total order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import col, lit

from .. import tables


def cents(x: Column) -> Column:
    """Integerize a monetary double to exact cents (order-independent sum).

    try_cast, not cast: a money double outside the cents-representable
    domain (|x| ≳ 9.2e16, e.g. DBL_MAX from a corrupt feed, or an Inf
    sum) quantizes to NULL — aggregations then skip the corrupt row on
    both engines — instead of crashing ANSI CAST_OVERFLOW where DuckDB's
    TRY_CAST twin yields NULL (r11 magnitude convention — README
    §Corrupt-data contract; identity on
    every in-range value, golden digests unchanged)."""
    return F.round(x * 100, 0).try_cast("long")


_CENTS = "TRY_CAST(round({x} * 100, 0) AS BIGINT)"

#: int64-domain bound for floor/ceil quantization of an unbounded
#: double. Spark's floor/ceil(DOUBLE) return LONG and silently SATURATE
#: at ±2⁶³ on overflow (floor(1.7e308) = Long.MAX — try_cast after the
#: fact cannot help), while DuckDB floors in DOUBLE and TRY_CAST yields
#: NULL; the only twin-exact idiom is the SAME explicit domain guard on
#: both engines. 9.2e18 < 2⁶³ ≈ 9.223e18, so every guarded value
#: floors/ceils into int64 exactly; outside → NULL on both sides.
_Q_BOUND = 9.2e18
_Q_GUARD = "CASE WHEN abs({x}) < 9.2e18 THEN TRY_CAST({f}({x}) AS BIGINT) END"


def q_floor(x: Column) -> Column:
    """floor to BIGINT, NULL outside the int64 domain (see _Q_BOUND)."""
    return F.when(F.abs(x) < lit(_Q_BOUND), F.floor(x))


def q_ceil(x: Column) -> Column:
    """ceil to BIGINT, NULL outside the int64 domain (see _Q_BOUND)."""
    return F.when(F.abs(x) < lit(_Q_BOUND), F.ceil(x))


def _sum_cents_sql(x: str) -> str:
    return f"CAST(sum({_CENTS.format(x=x)}) AS BIGINT)"


# ---------------------------------------------------------------- queries


def _q_scan_project_filter(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return li.filter(
        col("l_quantity").between(5, 30)
        & col("l_returnflag").isin("A", "R")
        & col("l_shipdate").isNotNull()
        & ((col("l_discount") < 0.05) | (col("l_tax") > 0.04))
        & col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def _q_join_broadcast(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    part = tables.table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias("revenue_cents"),
            F.count("*").alias("cnt"),
        )
    )


def _q_join_shuffle(spark, sf_dir):
    orders = tables.table(spark, sf_dir, "orders")
    li = tables.table(spark, sf_dir, "lineitem")
    joined = orders.hint("merge").join(li, col("o_orderkey") == col("l_orderkey"))
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(col("l_extendedprice"))).alias("price_cents"),
    )


def _q_join_outer(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer").filter(col("c_custkey") <= 1000)
    ordagg = (
        tables.table(spark, sf_dir, "orders")
        .filter(col("o_custkey") >= 500)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    cond = col("c_custkey") == col("o_custkey")
    sel = [
        col("c_custkey"),
        col("o_custkey"),
        col("n_orders"),
    ]
    left = cust.join(ordagg, cond, "left").select(lit("L").alias("side"), *sel)
    right = cust.join(ordagg, cond, "right").select(lit("R").alias("side"), *sel)
    full = cust.join(ordagg, cond, "full").select(lit("F").alias("side"), *sel)
    return left.unionByName(right).unionByName(full)


def _q_join_semi_anti(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    orders = tables.table(spark, sf_dir, "orders")
    cond = col("c_custkey") == col("o_custkey")
    semi = cust.join(orders, cond, "left_semi").select(lit("semi").alias("kind"), "c_custkey")
    anti = cust.join(orders, cond, "left_anti").select(lit("anti").alias("kind"), "c_custkey")
    return semi.unionByName(anti)


def _q_join_theta_range(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    a = ev.select(col("event_id").alias("a_id"), col("user_id").alias("a_user"), col("ts_us").alias("a_ts"))
    b = ev.select(col("event_id").alias("b_id"), col("user_id").alias("b_user"), col("ts_us").alias("b_ts"))
    return a.join(
        b,
        (col("a_user") == col("b_user"))
        & (col("b_ts") > col("a_ts"))
        & (col("b_ts") <= col("a_ts") + lit(600_000_000)),
    ).select("a_id", "b_id", (col("b_ts") - col("a_ts")).alias("gap_us"))


def _q_join_asof(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_id"), col("user_id").alias("p_user"), col("ts_us").alias("p_ts")
    )
    c = ev.filter(col("event_type") == "click").select(
        col("event_id").alias("c_id"), col("user_id").alias("c_user"), col("ts_us").alias("c_ts")
    )
    j = p.join(c, (col("p_user") == col("c_user")) & (col("c_ts") <= col("p_ts")), "left")
    w = Window.partitionBy("p_id").orderBy(
        F.desc_nulls_last("c_ts"), F.desc_nulls_last("c_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("p_id", "c_id", (col("p_ts") - col("c_ts")).alias("gap_us"))
    )


def _q_stat_chi2_benford(spark, sf_dir):
    """Chi-square goodness-of-fit of o_totalprice leading digits against
    Benford's law — the fraud/data-quality screen. Observed counts are
    exact integers; expected counts and the χ² statistic are closed-form
    arithmetic on (count, log10 constants) — identical doubles on both
    engines. One aggregation, nine output rows plus the statistic."""
    o = tables.table(spark, sf_dir, "orders")
    d = o.select(F.substring(col("o_totalprice").cast("string"), 1, 1).alias("digit"))
    obs = d.filter(col("digit").between("1", "9")).groupBy("digit").agg(
        F.count("*").alias("obs")
    )
    tot = obs.agg(F.sum("obs").alias("n"))
    withexp = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "obs",
        (col("n") * (F.log10(col("digit").cast("double") + 1) - F.log10("digit"))).alias(
            "exp"
        ),
    )
    per_digit = withexp.select(
        "digit",
        "obs",
        F.round("exp", 4).alias("expected"),
        F.round((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp"), 4)
        .alias("chi2_term"),
    )
    return per_digit


def _q_ttest_welch(spark, sf_dir):
    """Welch's two-sample t-test between purchase and click event values
    — the A/B-testing primitive, from five exact moments per group
    (integer cents sums): means, sample variances, t statistic, and
    Welch–Satterthwaite degrees of freedom, all closed-form. One
    aggregation pass per group; no per-row Python anywhere."""
    ev = tables.table(spark, sf_dir, "events")
    g = ev.filter(col("event_type").isin("purchase", "click")).select(
        "event_type", cents(col("value")).alias("vc")
    )
    m = g.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vc").alias("s"),
        F.sum(col("vc") * col("vc")).alias("ss"),
    )
    a = m.filter(col("event_type") == "purchase").select(
        col("n").alias("na"), col("s").alias("sa"), col("ss").alias("ssa")
    )
    b = m.filter(col("event_type") == "click").select(
        col("n").alias("nb"), col("s").alias("sb"), col("ss").alias("ssb")
    )
    j = a.crossJoin(b)
    # try_divide on every degenerate-able denominator (r11 temporal
    # sweep: a single-event group makes n-1 = 0, and identical values
    # in both groups make the pooled SE 0) — DuckDB's x/0 → NULL is
    # the twin; values identical on every non-degenerate input.
    mean_a = col("sa") / col("na") / 100.0
    mean_b = col("sb") / col("nb") / 100.0
    var_a = F.try_divide(
        col("ssa") - col("sa") * col("sa") / col("na"), col("na") - 1
    ) / 10000.0
    var_b = F.try_divide(
        col("ssb") - col("sb") * col("sb") / col("nb"), col("nb") - 1
    ) / 10000.0
    se2 = var_a / col("na") + var_b / col("nb")
    t = F.try_divide(mean_a - mean_b, F.sqrt(se2))
    dof = F.try_divide(
        se2 * se2,
        (var_a / col("na")) * (var_a / col("na")) / (col("na") - 1)
        + (var_b / col("nb")) * (var_b / col("nb")) / (col("nb") - 1),
    )
    return j.select(
        "na",
        "nb",
        F.round(mean_a, 4).alias("mean_purchase"),
        F.round(mean_b, 4).alias("mean_click"),
        F.round(t, 4).alias("t_stat"),
        F.round(dof, 2).alias("dof"),
    )


ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour


def _q_join_asof_tolerance(spark, sf_dir):
    """As-of join with a tolerance bound (pandas merge_asof semantics):
    each purchase matches its latest preceding click only if it happened
    within the last hour — stale matches become nulls instead of joining
    arbitrarily far back. The band predicate ALSO shrinks the join's
    candidate set, which at 100 TB is the difference between a bounded
    range join and an unbounded backward scan per row."""
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
    j = p.join(
        c,
        (col("p_user") == col("c_user"))
        & (col("c_ts") <= col("p_ts"))
        & (col("c_ts") > col("p_ts") - ASOF_TOLERANCE_US),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy(
        F.desc_nulls_last("c_ts"), F.desc_nulls_last("c_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("p_id", "c_id", (col("p_ts") - col("c_ts")).alias("gap_us"))
    )


def _q_agg_hash(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    disc_price = col("l_extendedprice") * (1 - col("l_discount"))
    charge = disc_price * (1 + col("l_tax"))
    return (
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.sum(cents(col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc_price)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_agg_distinct(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.round(F.sum_distinct(col("l_quantity")), 4).alias("sum_dist_qty"),
    )


def _q_agg_approx(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_cnt"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    )
    return agg.select(
        "exact_cnt",
        (
            F.abs(col("approx") - col("exact_cnt")) / col("exact_cnt") < 0.05
        ).alias("within_5pct"),
    )


def _q_agg_approx_quantile(spark, sf_dir):
    """Approximate percentile (GK/KLL-style sketch) gated within 1% of
    the exact quantile — the rel_agg_approx pattern applied to order
    statistics. At 100 TB the sketch is the only viable path (exact
    quantiles need a full sort); the gate embeds the exact value so the
    hash compare stays engine-independent."""
    li = tables.table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("approx_med"),
    )
    return agg.select(
        "l_returnflag",
        F.round("exact_med", 4).alias("exact_med"),
        # small-group escape (r10 sweep): on a handful of rows the
        # sketch returns an actual data point while the exact median
        # interpolates — the 1% bound is unattainable by construction,
        # not an estimator regression, so tiny groups pass the gate.
        (
            (col("n") <= 10)
            | (F.abs(col("approx_med") - col("exact_med")) / col("exact_med") < 0.01)
        ).alias("within_1pct"),
    )


def _q_agg_sketch_hll(spark, sf_dir):
    """Mergeable HLL sketch (Apache DataSketches, Spark 3.5+): per-group
    sketches built map-side, merged at the exchange — the 100 TB path for
    distinct counts (sketch bytes shuffle, not keys). Graded like
    rel_agg_approx: the estimate must land within 5% of the embedded exact
    count, so the hash compares (group, exact, gate) — engine-independent."""
    ev = tables.table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(col("est") - col("exact_users")) / col("exact_users") < 0.05).alias(
            "within_5pct"
        ),
    )


def _q_agg_grouping_sets(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(col("l_extendedprice"))).alias("price_cents"),
        (F.grouping("l_returnflag").cast("long") * 2 + F.grouping("l_linestatus").cast("long")).alias(
            "g_id"
        ),
    )


def _q_window_rank(spark, sf_dir):
    orders = tables.table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .filter(col("rn") <= 3)
    )


def _q_window_analytic(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_value"),
        F.last("value").over(wf).alias("last_value"),
        (col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


def _q_window_frame(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    mov = w.rowsBetween(-3, 0)
    rng = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-600_000_000, 0)
    return ev.select(
        "event_id",
        F.round(F.avg("value").over(mov), 4).alias("mov_avg"),
        F.count("*").over(rng).alias("rng_cnt"),
    )


def _q_sort_limit(spark, sf_dir):
    orders = tables.table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


def _q_topk_per_group(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


def _q_setop_union(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    supp = tables.table(spark, sf_dir, "supplier")
    a = cust.filter(col("c_mktsegment") == "BUILDING").select(col("c_nationkey").alias("nkey"))
    b = supp.select(col("s_nationkey").alias("nkey"))
    dist = a.union(b).distinct().select(lit("dist").alias("kind"), "nkey")
    allrows = a.union(b).select(lit("all").alias("kind"), "nkey")
    return dist.unionByName(allrows)


def _q_setop_intersect_except(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    supp = tables.table(spark, sf_dir, "supplier")
    a = cust.select(col("c_nationkey").alias("nkey"))
    b = supp.select(col("s_nationkey").alias("nkey"))
    out = (
        a.intersect(b).select(lit("intersect").alias("kind"), "nkey")
        .unionByName(a.exceptAll(b).select(lit("except_all").alias("kind"), "nkey"))
        .unionByName(a.subtract(b).select(lit("except").alias("kind"), "nkey"))
        .unionByName(a.intersectAll(b).select(lit("intersect_all").alias("kind"), "nkey"))
    )
    return out


def _q_subquery(spark, sf_dir):
    tables.table(spark, sf_dir, "part").createOrReplaceTempView("part")
    tables.table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
          AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
        """
    )


def _q_cte_recursive(spark, sf_dir):
    """Recursive CTE (new in Spark 4) — calendar-spine generation joined
    back to facts, so months with zero orders still appear. Scale note:
    the recursion materializes 84 rows on the driver side of the plan; the
    fact side aggregates per month BEFORE the spine join at 100 TB (here
    the left join + group keeps the graded shape simple)."""
    tables.table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(m, 1) FROM months WHERE m < DATE '2001-12-01'
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY m
        """
    )


def _q_fn_string(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.trim(F.lpad("c_name", 25, " ")).alias("trimmed"),
        F.lpad(col("c_custkey").cast("string"), 9, "0").alias("padded"),
        F.size(F.split("c_name", "#")).cast("long").alias("n_parts"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("masked"),
        F.length("c_name").cast("long").alias("len"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
    )


def _q_fn_date(spark, sf_dir):
    orders = tables.table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        # regexp strip of the ISO expanded-year sign: a computed date
        # past 9999-12-31 renders '+10000-01-30' in Spark but
        # '10000-01-30' in DuckDB's strftime (r11 temporal sweep) —
        # identity for every 4-digit year.
        F.regexp_replace(
            F.date_format(F.date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"),
            r"^\+",
            "",
        ).alias("plus30"),
        F.datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_days"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), lit(1)), "yyyy-MM-dd"
        ).alias("made"),
    )


def _q_fn_math(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(col("l_discount") - 0.05).alias("a"),
        q_ceil(col("l_extendedprice")).alias("c"),
        q_floor(col("l_extendedprice")).alias("f"),
        F.round("l_extendedprice", 1).alias("r1"),
        F.pow("l_quantity", 2).alias("q2"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.exp("l_discount"), 4).alias("ex"),
        F.round(F.log(lit(1.0) + col("l_discount")), 4).alias("ln1p"),
        F.round(F.log10("l_extendedprice"), 4).alias("lg"),
        F.signum(col("l_discount") - 0.05).cast("long").alias("sgn"),
        F.greatest("l_quantity", "l_discount", "l_tax").alias("g"),
        F.least("l_quantity", "l_discount", "l_tax").alias("l"),
        (col("l_orderkey") % 7).alias("m7"),
    )


def _q_fn_conditional(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bucket"),
        F.coalesce(F.nullif("c_mktsegment", lit("BUILDING")), lit("NONE")).alias("seg_nb"),
        F.nvl(F.nullif(col("c_nationkey"), lit(0)), lit(-1)).alias("nat_nz"),
    )


def _q_fn_array(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    # every rounded double gets the §7.2 `+ 0.0` negative-zero
    # normalization — a -0.00004 element rounds to -0.0 on one engine
    # and 0.0 on the other (hit at sf0.1)
    return e.select(
        "vec_id",
        F.size("emb").cast("long").alias("dim"),
        (F.round(F.element_at("emb", 1), 4) + 0.0).alias("first_el"),
        (F.round(F.array_min("emb"), 4) + 0.0).alias("min_el"),
        (F.round(F.array_max("emb"), 4) + 0.0).alias("max_el"),
        F.size(F.filter("emb", lambda x: x > 0)).cast("long").alias("n_pos"),
        (F.round(F.aggregate("emb", lit(0.0), lambda s, x: s + x), 4) + 0.0).alias("sum_el"),
        F.size(F.array_distinct("emb")).cast("long").alias("n_distinct"),
        (
            F.round(
                F.aggregate(F.slice(F.sort_array("emb"), 1, 8), lit(0.0), lambda s, x: s + x), 4
            )
            + 0.0
        ).alias("bottom8_sum"),
    )


def _q_fn_map_struct(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    m = F.create_map(lit("seg"), col("c_mktsegment"), lit("name"), col("c_name"))
    st = F.struct(col("c_custkey").alias("k"), col("c_acctbal").alias("bal"))
    return cust.select(
        "c_custkey",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "seg").alias("seg_val"),
        st.getField("bal").alias("st_bal"),
        F.map_contains_key(m, "name").alias("has_name"),
    )


def _q_fn_json(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        F.from_json("props", "k INT").getField("k").alias("k_from"),
    )


def _q_dedup_exact(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def _q_window_percentiles(spark, sf_dir):
    """Per-priority percent_rank / cume_dist / 3rd-lowest price over all
    orders, scale-safely: o_orderpriority has ~5 values, so the naive
    ``Window.partitionBy(priority)`` folds a fifth of the table through
    ONE task each (the low-cardinality-group window cliff, cf.
    llm_pack_sequences). With the unique total order (o_totalprice,
    o_orderkey) the window functions reduce to closed forms over the
    per-group row number: percent_rank = (rn-1)/(n-1) (0 when n = 1),
    cume_dist = rn/n — the SAME double divisions Spark's window
    implementations execute, so values are bit-identical. rn comes from
    the grouped two-phase prefix scan (plans/prefix), n rides a 5-row
    broadcast, and the 3rd value is a rank-3 filter that compiles to
    WindowGroupLimit (map-side partial top-3, never a full per-group
    sort) joined back by priority.

    percent_rank/cume_dist are rationals → floor-scaled (round()
    half-tie hazard, see quality_score)."""
    from ..plans.prefix import attach_running_grouped

    orders = tables.table(spark, sf_dir, "orders")
    d = orders.select("o_orderkey", "o_orderpriority", "o_totalprice").withColumn(
        "_one", lit(1)
    )
    r = attach_running_grouped(
        d, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], sums={"_one": "_rn"}
    )
    n = orders.groupBy("o_orderpriority").agg(F.count("*").alias("_n"))
    w3 = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    third = (
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("_rn3", F.row_number().over(w3))
        .filter(col("_rn3") == 3)  # WindowGroupLimit: bounded per group
        .select("o_orderpriority", col("o_totalprice").alias("third_price"))
    )
    out = r.join(F.broadcast(n), "o_orderpriority").join(
        F.broadcast(third), "o_orderpriority", "left"
    )
    pr = F.when(col("_n") > 1, (col("_rn") - 1) / (col("_n") - 1)).otherwise(lit(0.0))
    cd = col("_rn") / col("_n")
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(pr * 10000).cast("long").alias("pr_q4"),
        F.floor(cd * 10000).cast("long").alias("cd_q4"),
        "third_price",
    )


def _q_string_agg(spark, sf_dir):
    """string_agg / group_concat semantics: one sorted, comma-joined
    string of supplier names per nation. Scale note: the output ROW is
    group-sized by the operator's own contract (SQL string_agg returns
    the concatenation) — that is the user's stated intent, not a plan
    defect; the aggregation itself is a map-side partial collect merged
    per group, and a bounded alternative (top-N names + count) is what a
    pipeline should ask for at corpus-sized groups."""
    supp = tables.table(spark, sf_dir, "supplier")
    nation = tables.table(spark, sf_dir, "nation")
    j = supp.join(F.broadcast(nation), col("s_nationkey") == col("n_nationkey"))
    return j.groupBy("n_name").agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
        F.count("*").alias("n_supp"),
    )


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Skew-mitigation join (SURVEY.md §4): salt the big side's key with a
    random-uniform shard id and explode the small side across all shards,
    so one hot key spreads over n_salts reducers instead of one. AQE's
    skew-join split handles moderate skew automatically; this is the
    explicit operator for pathological keys. Result ≡ plain inner join
    (asserted in tests)."""
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = big.sparkSession.range(n_salts).select(col("id").cast("int").alias("_salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def _q_agg_percentile(spark, sf_dir):
    """Exact percentiles (linear interpolation) — the order-statistics
    aggregate family. Scale note: exact percentile needs a per-group sort;
    the sketch path at 100 TB is approx_percentile (t-digest), declared in
    the rel_agg_approx style with an error gate."""
    li = tables.table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("price_p90"),
    )


def _q_fn_bitwise(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        (k.bitwiseAND(lit(15))).alias("k_and"),
        (k.bitwiseOR(lit(32))).alias("k_or"),
        (k.bitwiseXOR(lit(21))).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 1).alias("k_shr"),
    )


BUCKET_US = 600_000_000  # == the theta-range band width


def _q_join_range_bucket(spark, sf_dir):
    """Bucketed range join — the 100 TB physical strategy for
    rel_join_theta_range. A band predicate |t2-t1| <= W becomes an
    EQUI-join on coarse time buckets of width W (each left row probes its
    own bucket and the next one), turning the O(n²) BroadcastNestedLoopJoin
    into a shuffle hash join keyed on (user, bucket) + a residual filter.
    Semantics (and oracle) identical to the plain theta join."""
    ev = tables.table(spark, sf_dir, "events")
    bkt = F.floor(col("ts_us") / BUCKET_US)
    a = ev.select(
        col("event_id").alias("a_id"),
        "user_id",
        col("ts_us").alias("a_ts"),
        F.explode(F.array(bkt, bkt + 1)).alias("bucket"),
    )
    b = ev.select(
        col("event_id").alias("b_id"),
        "user_id",
        col("ts_us").alias("b_ts"),
        bkt.alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .filter((col("b_ts") > col("a_ts")) & (col("b_ts") <= col("a_ts") + lit(BUCKET_US)))
        .select("a_id", "b_id", (col("b_ts") - col("a_ts")).alias("gap_us"))
    )


def _q_fn_string2(spark, sf_dir):
    """Second string-function sweep: edit distance + codec-ish helpers
    (levenshtein/translate/repeat/reverse — both engines, same names)."""
    cust = tables.table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.levenshtein(col("c_name"), F.reverse(col("c_name"))).cast("long").alias("pal_dist"),
        F.translate(col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_tr"),
        F.repeat(F.substring(col("c_name"), 1, 3), 2).alias("rep3"),
        F.reverse(col("c_mktsegment")).alias("seg_rev"),
    )


def _q_fn_math2(spark, sf_dir):
    """Second math sweep: trig, roots, logs, combinatorics, bit ops."""
    ev = tables.table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    v = col("value")
    # + 0.0 on the sign-crossing functions: §7.2 negative-zero
    # normalization (cos/sin/deg/rad of near-zero inputs round to ±0.0
    # differently across engines; hit at sf0.1)
    return ev.select(
        "event_id",
        (F.round(F.sin(v), 4) + 0.0).alias("sin_v"),
        (F.round(F.cos(v), 4) + 0.0).alias("cos_v"),
        (F.round(F.atan2(v, lit(2.0)), 4) + 0.0).alias("atan2_v"),
        (F.round(F.degrees(v), 4) + 0.0).alias("deg_v"),
        (F.round(F.radians(v), 4) + 0.0).alias("rad_v"),
        F.round(F.cbrt(F.abs(v)), 4).alias("cbrt_v"),
        F.round(F.log2(F.abs(v) + 1.0), 4).alias("log2_v"),
        F.factorial(F.pmod(k, 10).cast("int")).cast("long").alias("fact_k"),
        F.bit_count(k).cast("long").alias("bits_k"),
    )


def _q_unpivot(spark, sf_dir):
    """unpivot/melt — wide measures to (measure, value) rows. Scale note:
    unpivot is a generate (no shuffle); row count multiplies by the
    measure count, so project the id/measure columns first."""
    li = tables.table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .select("l_orderkey", "l_linenumber", "measure", F.round("val", 4).alias("val"))
    )


def _q_sample(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    bucket = F.substring(F.md5(col("l_orderkey").cast("string")), 1, 2)
    return li.filter(bucket < "1a").select("l_orderkey", "l_linenumber", "l_quantity")


def _q_pivot(spark, sf_dir):
    ev = tables.table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = ev.groupBy("user_id").pivot("event_type", types).count().na.fill(0)
    return piv.select("user_id", *[col(t).cast("long").alias(t) for t in types])


def _q_agg_stats(spark, sf_dir):
    """Bivariate statistics (corr / covariance / linear regression) per
    group — one pass, all rewritten by Catalyst into the partial/final
    aggregate pair, so the exchange carries only the moment tuples
    (count, sums, sums of squares/products), not rows: the same
    constant-size-state property HLL gives distinct counts. Scale-safe at
    100 TB by construction."""
    li = tables.table(spark, sf_dir, "lineitem")
    # corr assembled from the same one-pass moments with try_divide,
    # not F.corr: under ANSI mode the builtin CRASHES on a zero-variance
    # group (r10 non-finite sweep) where DuckDB's corr yields NULL;
    # covar_pop / (stddev_pop · stddev_pop) carries identical state, so
    # values are unchanged on every non-degenerate group (golden-pinned).
    # quantizable-domain row filter (r11 magnitude convention): a money
    # value whose cents overflow int64 (DBL_MAX from a corrupt feed) is
    # excluded from the moments on BOTH engines — DuckDB's STDDEV_POP
    # raises Out of Range on the squared sum where Spark yields Inf, so
    # neither engine's native overflow behavior can be the twin.
    li = li.filter(cents(col("l_extendedprice")).isNotNull())
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.try_divide(
                F.covar_pop("l_quantity", "l_extendedprice"),
                F.stddev_pop("l_quantity") * F.stddev_pop("l_extendedprice"),
            ),
            4,
        ).alias("corr_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_p"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_s"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
    )


def _q_agg_collect(spark, sf_dir):
    """Array aggregation: collect a group's values into a sorted list.
    ``collect_set`` + ``array_sort`` makes the result order-independent —
    the only oracle-stable way to materialize a list aggregate (raw
    collect_list order is partitioning-dependent)."""
    sup = tables.table(spark, sf_dir, "supplier")
    nat = tables.table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), col("s_nationkey") == col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("s_name")), "|").alias("suppliers"),
            F.count("*").alias("cnt"),
        )
    )


def _q_fn_date2(spark, sf_dir):
    """Second date-function sweep: quarter / ISO week / day-of-week /
    last_day / add_months. Spark's dayofweek is 1=Sunday; DuckDB's is
    0=Sunday — the oracle adds 1 (SURVEY.md §7.2 rule 6: prefer explicit
    arithmetic over trusting dialect sugar)."""
    o = tables.table(spark, sf_dir, "orders").filter(col("o_orderkey") <= 3000)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_wk"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        # see _q_fn_date plus30: strip the ISO expanded-year '+'
        F.regexp_replace(
            F.date_format(F.add_months("o_orderdate", 2), "yyyy-MM-dd"), r"^\+", ""
        ).alias("plus2m"),
    )


def _q_window_range_interval(spark, sf_dir):
    """Time-interval RANGE frame: per-user trailing-1-hour event count and
    value sum. The frame is expressed over ``ts_us`` (µs since epoch) so
    both engines bound it with identical integer arithmetic; the sum is
    integerized to cents (order-independent). This is the sliding-window
    analytic that at 100 TB runs per-user-partition — shuffle on user_id
    once, then a single sorted pass per partition."""
    ev = tables.table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("trail_cnt"),
        F.sum(cents(col("value"))).over(w).alias("trail_cents"),
    )


def _q_gen_range(spark, sf_dir):
    """Distributed data generation: ``spark.range`` is a parallel source
    (one partition per slice, no driver loop, no shuffle) — the 100 TB way
    to synthesize spines, ids, and test corpora. Knuth-hash and modulus
    columns make the output content-bearing, all in bigint (exact)."""
    return spark.range(0, 100_000).select(
        col("id"),
        ((col("id") * 2654435761) % 1000003).alias("h"),
        (col("id") % 7).alias("m"),
    )


def _q_window_cume(spark, sf_dir):
    """Distribution windows: percent_rank / cume_dist / nth_value — the
    remaining ranking-family functions. Total-ordered on (o_totalprice,
    o_orderkey) so peer groups are singletons and the running nth_value
    frame agrees across engines."""
    o = tables.table(spark, sf_dir, "orders").filter(col("o_custkey") <= 300)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


def _q_fn_format(spark, sf_dir):
    """printf-style formatting (format_string ⟷ DuckDB printf): string,
    zero-padded decimal, hex. Floats are deliberately excluded — Java
    String.format rounds half-up, C printf half-even; integers format
    identically (SURVEY.md §7.2 rule 6)."""
    c = tables.table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.format_string("%s|%07d|%x", "c_mktsegment", "c_custkey", "c_custkey").alias(
            "tag"
        ),
        F.format_string("[%-10s]", F.substring("c_name", 1, 8)).alias("padded"),
    )


def _q_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (upsert) without a table format: target ⟵
    source where matched rows take the source's values and unmatched
    source rows are inserted. Expressed as a full outer join + coalesce —
    the exact relational algebra a Delta/Iceberg MERGE compiles to, minus
    the transactional commit. Source here: orders with o_orderkey ≤ 1000
    get a 10% price bump, plus 100 synthetic new keys. At 100 TB the join
    shuffles on the merge key once; with a bucketed target it's
    shuffle-free (rel_join_range_bucket shows that layout)."""
    orders = tables.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents(col("o_totalprice")).alias("price_c")
    )
    src = orders.filter(col("o_orderkey") <= 1000).select(
        "o_orderkey",
        "o_custkey",
        F.expr("(price_c * 11) div 10").alias("price_c"),
    )
    new_rows = spark.range(1, 101).select(
        (col("id") + 10_000_000).alias("o_orderkey"),
        lit(1).alias("o_custkey"),
        lit(10_000).cast("long").alias("price_c"),
    )
    source = src.unionByName(new_rows)
    t = orders.select(
        col("o_orderkey").alias("k"),
        col("o_custkey").alias("t_cust"),
        col("price_c").alias("t_price_c"),
    )
    s = source.select(
        col("o_orderkey").alias("k"),
        col("o_custkey").alias("s_cust"),
        col("price_c").alias("s_price_c"),
    )
    merged = t.join(s, "k", "full")
    return merged.select(
        col("k").alias("o_orderkey"),
        F.coalesce("s_cust", "t_cust").cast("long").alias("o_custkey"),
        F.coalesce("s_price_c", "t_price_c").alias("o_totalprice_cents"),
        F.when(col("s_cust").isNotNull() & col("t_cust").isNotNull(), lit("update"))
        .when(col("t_cust").isNull(), lit("insert"))
        .otherwise(lit("keep"))
        .alias("action"),
    )


def _q_scd2_intervals(spark, sf_dir):
    """SCD-type-2 dimension build: each user's event_type history becomes
    validity intervals [ts, next_ts) via lead() — the
    change-data-capture → warehouse-dimension transform. One shuffle on
    user_id; interval derivation is a single sorted pass per
    partition."""
    ev = tables.table(spark, sf_dir, "events").filter(col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "user_id",
        col("event_type").alias("state"),
        col("ts_us").alias("valid_from_us"),
        F.coalesce(F.lead("ts_us").over(w), lit(-1)).alias("valid_to_us"),
        (F.lead("ts_us").over(w).isNull()).cast("int").alias("is_current"),
    )


HIST_BINS = 20


def _q_histogram_fixed(spark, sf_dir):
    """Fixed-width histogram with data-driven bounds: global min/max by
    aggregate (broadcast back as 1 row), bin = floor((x-min)/width)
    clamped to HIST_BINS-1. Two map-side-combined aggregations and one
    1-row broadcast — no sort, no driver collect; the same plan at any
    scale. Bin edges integerized to cents so both engines bin on
    identical doubles."""
    li = tables.table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        cents(F.min("l_extendedprice")).alias("lo_c"),
        cents(F.max("l_extendedprice")).alias("hi_c"),
    )
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (cents(col("l_extendedprice")) - col("lo_c"))
                * HIST_BINS
                / (col("hi_c") - col("lo_c") + 1)
            ),
            lit(HIST_BINS - 1),
        )
        .cast("long")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("cnt"))


def _q_linreg_normal(spark, sf_dir):
    """Two-feature linear regression solved by the normal equations in
    ONE aggregation pass — closed-form distributed ML: all 8 moments
    (sums, cross-products) are exact integer sums (quantity is integral,
    discount integerized ×100, price floored to whole dollars so n·Σ
    terms stay < 2⁶³ through sf ≥ 1), the 2×2 solve is arithmetic on
    those exact scalars. No iteration, no collect, one map-side-combined
    shuffle of 8 numbers — the pattern for any moment-expressible model
    at 100 TB."""
    li = tables.table(spark, sf_dir, "lineitem").select(
        col("l_quantity").cast("long").alias("x1"),
        F.round(col("l_discount") * 100, 0).try_cast("long").alias("x2"),
        q_floor(col("l_extendedprice")).alias("y"),
    ).filter(col("y").isNotNull())
    m = li.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(col("x1") * col("x1")).alias("s11"),
        F.sum(col("x2") * col("x2")).alias("s22"),
        F.sum(col("x1") * col("x2")).alias("s12"),
        F.sum(col("x1") * col("y")).alias("s1y"),
        F.sum(col("x2") * col("y")).alias("s2y"),
    )
    # centered (×n) second moments — still exact integers
    # centered (×n) moments stay exact bigints; the 2×2 solve then runs in
    # double (identical IEEE ops on identical inputs on every engine —
    # bigint products would overflow int64)
    c = m.select(
        "n",
        "s1",
        "s2",
        "sy",
        (col("n") * col("s11") - col("s1") * col("s1")).cast("double").alias("m11"),
        (col("n") * col("s22") - col("s2") * col("s2")).cast("double").alias("m22"),
        (col("n") * col("s12") - col("s1") * col("s2")).cast("double").alias("m12"),
        (col("n") * col("s1y") - col("s1") * col("sy")).cast("double").alias("m1y"),
        (col("n") * col("s2y") - col("s2") * col("sy")).cast("double").alias("m2y"),
    )
    det = col("m11") * col("m22") - col("m12") * col("m12")
    # try_divide: a singular normal matrix (constant feature — the r10
    # degenerate fixtures) yields NULL betas, matching DuckDB x/0
    b1 = F.try_divide(col("m1y") * col("m22") - col("m2y") * col("m12"), det)
    b2 = F.try_divide(col("m2y") * col("m11") - col("m1y") * col("m12"), det)
    return c.select(
        "n",
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round((col("sy") - b1 * col("s1") - b2 * col("s2")) / col("n"), 4).alias(
            "intercept"
        ),
    )


WSAMPLE_N = 100


def _q_sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement, Efraimidis-Spirakis A-ES:
    every row draws a deterministic uniform u from md5 of its key and
    ranks by ln(u)/w — the top-N by that score IS a weight-proportional
    sample without replacement. Weights here are the order value in
    exact cents.

    Scale design: A-ES is the distributed weighted-sampling algorithm —
    the score is map-side per row and Catalyst rewrites the rank-limit
    into TakeOrderedAndProject (per-partition bounded heaps, one N-row
    merge; PLANS.md), so the wire carries ~N rows per partition
    regardless of table size.
    Determinism: u is integer-derived (first 8 md5 hex digits) and the
    score quantizes to int64 nano-units for ordering and output. The
    quantum is deliberately coarse (1e9, not 1e12): the score passes
    through a transcendental (ln), so the two engines' libm results can
    differ in the last ulp — a ~1e-16 relative wobble. At 1e9 a flip
    needs the true value within ~1e-7 of a .5 boundary (odds ~1e-9 per
    row vs ~1e-6 at 1e12); ties between equal quantized scores are
    already broken exactly on o_orderkey."""
    o = tables.table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(col("o_totalprice")).alias("w_cents")
    )
    h = F.conv(
        F.substring(F.md5(col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + lit(1)) / lit(4294967297.0)
    scored = o.withColumn(
        "score_q", F.round(F.log(u) / col("w_cents") * lit(1e9)).try_cast("long")
    )
    # explicit top-N via orderBy+limit (TakeOrderedAndProject, bounded
    # per-partition heaps); the rank window then runs over N rows only.
    top = scored.orderBy(col("score_q").desc(), "o_orderkey").limit(WSAMPLE_N)
    w = Window.orderBy(col("score_q").desc(), "o_orderkey")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "rnk", "o_orderkey", "w_cents", "score_q"
    )


def _q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum rates via md5
    buckets (en ≈ 25%, others ≈ 6%) — the corpus-rebalancing primitive of
    training-data pipelines, reproducible across engines and runs (no
    RNG). Map-only at any scale; the hash IS the sampling decision, so
    resampling with a different rate never reshuffles prior picks
    (consistent-hash property)."""
    docs = tables.table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(col("doc_id").cast("string")), 1, 2)
    thresh = F.when(col("lang") == "en", lit("40")).otherwise(lit("10"))
    return docs.filter(bucket < thresh).select("doc_id", "lang", "source")


def _q_agg_bool(spark, sf_dir):
    """Boolean/conditional aggregates: count_if, the SQL FILTER clause,
    bool_and / bool_or — via spark.sql so the ANSI FILTER syntax itself
    is exercised through the full parse → Catalyst pipeline."""
    tables.table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        "SELECT l_returnflag, "
        "count_if(l_quantity > 25) AS n_heavy, "
        "count(*) FILTER (WHERE l_discount > 0.05) AS n_disc, "
        "bool_and(l_quantity > 0) AS all_pos, "
        "bool_or(l_tax > 0.07) AS any_hi_tax "
        "FROM lineitem_v GROUP BY l_returnflag"
    )


def _q_join_existence_flag(spark, sf_dir):
    """Existence-flag join: every left row kept, with a boolean marker
    for match — the third member beside semi (matches only) and anti
    (non-matches only). One distinct-key build side, broadcast."""
    cust = tables.table(spark, sf_dir, "customer")
    keys = (
        tables.table(spark, sf_dir, "orders")
        .select(col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("mark", lit(1))
    )
    return cust.join(F.broadcast(keys), "c_custkey", "left").select(
        "c_custkey",
        col("mark").isNotNull().alias("has_order"),
    )


def _q_window_hourly_top_type(spark, sf_dir):
    """Top event type per hour (grouped count + per-hour rank=1) — the
    trending-item query; count shuffle then a tiny rank partition per
    hour."""
    ev = tables.table(spark, sf_dir, "events")
    hour = (col("ts_us") - col("ts_us") % 3_600_000_000).alias("hour_us")
    counts = ev.groupBy(hour, "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("hour_us").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("hour_us", col("event_type").alias("top_type"), "cnt")
    )


def _q_fn_null(spark, sf_dir):
    """Null-semantics sweep: nullif-manufactured nulls, null-safe
    equality (<=> ⟷ IS NOT DISTINCT FROM), coalesce defaults, and the
    count(col)-skips-nulls vs count(*) distinction attached to every
    row. The global counts ride a 1-row aggregate broadcast-cross-joined
    back — NOT ``count(...) over (Window.partitionBy())``, whose
    unpartitioned window is an Exchange SinglePartition folding the
    whole relation through one task (the same values, computed as a
    tree-reduced scalar instead)."""
    o = tables.table(spark, sf_dir, "orders")
    st = F.nullif(col("o_orderstatus"), lit("O"))
    counts = o.agg(
        F.count(st).alias("n_nonnull"), F.count("*").alias("n_all")
    )
    return o.crossJoin(F.broadcast(counts)).select(
        "o_orderkey",
        st.alias("st"),
        st.eqNullSafe(lit("F")).alias("nsafe_f"),
        st.eqNullSafe(F.lit(None).cast("string")).alias("nsafe_null"),
        F.coalesce(st, lit("?")).alias("st_or_q"),
        "n_nonnull",
        "n_all",
    )


def _q_stat_crosstab(spark, sf_dir):
    """DataFrame stat API: contingency table (crosstab) of user-id bucket
    × event type. Column names come from the data values — the crosstab
    contract; cast to long for engine-identical types."""
    ev = tables.table(spark, sf_dir, "events").select(
        (col("user_id") % 4).cast("string").alias("ubucket"), "event_type"
    )
    types = ["click", "error", "purchase", "signup", "view"]
    ct = ev.stat.crosstab("ubucket", "event_type")
    # crosstab materializes columns only for OBSERVED values — a dataset
    # missing one event type made the hardcoded col(t) an
    # UNRESOLVED_COLUMN crash (r09 degenerate-fixture sweep). An absent
    # type is a zero count, which is also what the oracle's per-type
    # conditional counts produce.
    present = set(ct.columns)
    return ct.select(
        col("ubucket_event_type").alias("ubucket"),
        *[
            (col(t) if t in present else F.lit(0)).cast("long").alias(t)
            for t in types
        ],
    )


def _q_join_lateral(spark, sf_dir):
    """Correlated LATERAL subquery join (Spark ≥3.2 / ANSI lateral): for
    each filtered order, its top lineitem by extendedprice — the
    per-row-subquery SQL surface beside the window formulation. Catalyst
    decorrelates it into a join; DuckDB runs the same text."""
    tables.table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    tables.table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        "SELECT o.o_orderkey, t.l_linenumber, t.price_cents "
        "FROM orders_v o, "
        "LATERAL (SELECT l_linenumber, "
        "TRY_CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents "
        "FROM lineitem_v WHERE l_orderkey = o.o_orderkey "
        "ORDER BY l_extendedprice DESC, l_linenumber LIMIT 1) t "
        "WHERE o.o_orderkey <= 2000"
    )


def _q_lateral_view(spark, sf_dir):
    """HiveQL LATERAL VIEW explode surface (the spark.sql spelling of
    explode): token stream with position via posexplode."""
    tables.table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT doc_id, pos, tok FROM documents_v "
        "LATERAL VIEW posexplode(split(text, ' ')) x AS pos, tok "
        "WHERE doc_id <= 50"
    )


def _q_values_inline(spark, sf_dir):
    """Inline VALUES relation joined against a fixture — literal data as
    a first-class source (lookup/seed tables without files)."""
    tables.table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        "SELECT v.code, v.label, n.n_name "
        "FROM VALUES (0, 'zero'), (1, 'one'), (2, 'two') AS v(code, label) "
        "JOIN nation_v n ON n.n_regionkey = v.code"
    )


def _q_fn_higher_order2(spark, sf_dir):
    """Second higher-order-function sweep: exists / forall /
    filter-with-index / aggregate-with-finish over the embedding arrays.
    DuckDB mirrors via list_filter length identities (it has no boolean
    list quantifiers in 1.0)."""
    e = tables.embeddings(spark, sf_dir)
    return e.select(
        "vec_id",
        F.exists("emb", lambda x: x > 0.3).alias("any_big"),
        F.forall("emb", lambda x: F.abs(x) < 1.0).alias("all_small"),
        F.size(F.filter("emb", lambda x, i: (x > 0) & (i % 2 == 0)))
        .cast("long")
        .alias("n_pos_even"),
        F.round(
            F.aggregate(
                "emb",
                F.lit(0.0),
                lambda acc, x: acc + x * x,
                lambda acc: F.sqrt(acc),
            ),
            4,
        ).alias("norm_via_finish"),
    )


QUERIES = {
    "rel_scan_project_filter": _q_scan_project_filter,
    "rel_join_broadcast": _q_join_broadcast,
    "rel_join_shuffle": _q_join_shuffle,
    "rel_join_outer": _q_join_outer,
    "rel_join_semi_anti": _q_join_semi_anti,
    "rel_join_theta_range": _q_join_theta_range,
    "rel_join_asof": _q_join_asof,
    "rel_agg_hash": _q_agg_hash,
    "rel_agg_distinct": _q_agg_distinct,
    "rel_agg_approx": _q_agg_approx,
    "rel_agg_sketch_hll": _q_agg_sketch_hll,
    "rel_agg_grouping_sets": _q_agg_grouping_sets,
    "rel_window_rank": _q_window_rank,
    "rel_window_analytic": _q_window_analytic,
    "rel_window_frame": _q_window_frame,
    "rel_sort_limit": _q_sort_limit,
    "rel_topk_per_group": _q_topk_per_group,
    "rel_setop_union": _q_setop_union,
    "rel_setop_intersect_except": _q_setop_intersect_except,
    "rel_subquery": _q_subquery,
    "rel_fn_string": _q_fn_string,
    "rel_fn_date": _q_fn_date,
    "rel_fn_math": _q_fn_math,
    "rel_fn_conditional": _q_fn_conditional,
    "rel_fn_array": _q_fn_array,
    "rel_fn_map_struct": _q_fn_map_struct,
    "rel_fn_json": _q_fn_json,
    "rel_dedup_exact": _q_dedup_exact,
    "rel_sample": _q_sample,
    "rel_explain_pivot": _q_pivot,
    "rel_window_percentiles": _q_window_percentiles,
    "rel_string_agg": _q_string_agg,
    "rel_agg_percentile": _q_agg_percentile,
    "rel_fn_bitwise": _q_fn_bitwise,
    "rel_join_range_bucket": _q_join_range_bucket,
    "rel_unpivot": _q_unpivot,
    "rel_cte_recursive": _q_cte_recursive,
    "rel_fn_string2": _q_fn_string2,
    "rel_fn_math2": _q_fn_math2,
    "rel_agg_stats": _q_agg_stats,
    "rel_agg_collect": _q_agg_collect,
    "rel_fn_date2": _q_fn_date2,
    "rel_window_range_interval": _q_window_range_interval,
    "rel_gen_range": _q_gen_range,
    "rel_window_cume": _q_window_cume,
    "rel_fn_format": _q_fn_format,
    "rel_agg_approx_quantile": _q_agg_approx_quantile,
    "rel_merge_upsert": _q_merge_upsert,
    "rel_scd2_intervals": _q_scd2_intervals,
    "rel_histogram_fixed": _q_histogram_fixed,
    "ml_linreg_normal": _q_linreg_normal,
    "rel_sample_stratified": _q_sample_stratified,
    "rel_sample_weighted": _q_sample_weighted,
    "rel_agg_bool": _q_agg_bool,
    "rel_join_existence_flag": _q_join_existence_flag,
    "rel_window_hourly_top_type": _q_window_hourly_top_type,
    "rel_fn_null": _q_fn_null,
    "rel_stat_crosstab": _q_stat_crosstab,
    "rel_join_lateral": _q_join_lateral,
    "rel_lateral_view": _q_lateral_view,
    "rel_values_inline": _q_values_inline,
    "rel_fn_higher_order2": _q_fn_higher_order2,
    "rel_join_asof_tolerance": _q_join_asof_tolerance,
    "rel_stat_chi2_benford": _q_stat_chi2_benford,
    "ml_ttest_welch": _q_ttest_welch,
}


# ------------------------------------------------------------------- oracle

_EV = (
    "ev AS (SELECT event_id, user_id, event_type, value, props, "
    "epoch_us(ts) AS ts_us FROM events)"
)

ORACLE = {
    "rel_scan_project_filter": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem "
        "WHERE l_quantity BETWEEN 5 AND 30 AND l_returnflag IN ('A','R') "
        "AND l_shipdate IS NOT NULL AND (l_discount < 0.05 OR l_tax > 0.04) "
        "AND l_linestatus LIKE 'F%'"
    ),
    "rel_join_broadcast": (
        "SELECT p_brand, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount)")
        + " AS revenue_cents, count(*) AS cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"
    ),
    "rel_join_shuffle": (
        "SELECT o_orderpriority, count(*) AS cnt, "
        + _sum_cents_sql("l_extendedprice")
        + " AS price_cents "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority"
    ),
    "rel_join_outer": (
        "WITH a AS (SELECT c_custkey FROM customer WHERE c_custkey <= 1000), "
        "b AS (SELECT o_custkey, count(*) AS n_orders FROM orders WHERE o_custkey >= 500 "
        "GROUP BY o_custkey) "
        "SELECT 'L' AS side, c_custkey, o_custkey, n_orders FROM a LEFT JOIN b "
        "ON c_custkey = o_custkey "
        "UNION ALL SELECT 'R', c_custkey, o_custkey, n_orders FROM a RIGHT JOIN b "
        "ON c_custkey = o_custkey "
        "UNION ALL SELECT 'F', c_custkey, o_custkey, n_orders FROM a FULL JOIN b "
        "ON c_custkey = o_custkey"
    ),
    "rel_join_semi_anti": (
        "SELECT 'semi' AS kind, c_custkey FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "UNION ALL "
        "SELECT 'anti', c_custkey FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "rel_join_theta_range": (
        f"WITH {_EV} "
        "SELECT a.event_id AS a_id, b.event_id AS b_id, b.ts_us - a.ts_us AS gap_us "
        "FROM ev a JOIN ev b ON a.user_id = b.user_id AND b.ts_us > a.ts_us "
        "AND b.ts_us <= a.ts_us + 600000000"
    ),
    "rel_join_asof": (
        f"WITH {_EV}, "
        "p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM ev "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id AS c_id, user_id, ts_us AS c_ts FROM ev "
        "WHERE event_type = 'click'), "
        "j AS (SELECT p.p_id, c.c_id, p.p_ts, c.c_ts, row_number() OVER ("
        "PARTITION BY p.p_id ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn "
        "FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts) "
        "SELECT p_id, c_id, p_ts - c_ts AS gap_us FROM j WHERE rn = 1"
    ),
    "rel_stat_chi2_benford": (
        "WITH d AS (SELECT substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS digit "
        "FROM orders), "
        "obs AS (SELECT digit, count(*) AS obs FROM d "
        "WHERE digit BETWEEN '1' AND '9' GROUP BY digit), "
        "tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs) "
        "SELECT digit, obs, "
        "round(n * (log10(CAST(digit AS DOUBLE) + 1) - log10(CAST(digit AS DOUBLE))), 4) "
        "AS expected, "
        "round(pow(obs - n * (log10(CAST(digit AS DOUBLE) + 1) "
        "- log10(CAST(digit AS DOUBLE))), 2) "
        "/ (n * (log10(CAST(digit AS DOUBLE) + 1) - log10(CAST(digit AS DOUBLE)))), 4) "
        "AS chi2_term FROM obs, tot"
    ),
    "ml_ttest_welch": (
        f"WITH g AS (SELECT event_type, {_CENTS.format(x='value')} AS vc "
        "FROM events WHERE event_type IN ('purchase', 'click')), "
        "m AS (SELECT event_type, count(*) AS n, CAST(sum(vc) AS BIGINT) AS s, "
        "CAST(sum(vc * vc) AS BIGINT) AS ss FROM g GROUP BY event_type), "
        "a AS (SELECT n AS na, s AS sa, ss AS ssa FROM m WHERE event_type = 'purchase'), "
        "b AS (SELECT n AS nb, s AS sb, ss AS ssb FROM m WHERE event_type = 'click'), "
        "c AS (SELECT na, nb, sa / na / 100.0 AS ma, sb / nb / 100.0 AS mb, "
        "(ssa - sa * sa / na) / (na - 1) / 10000.0 AS va, "
        "(ssb - sb * sb / nb) / (nb - 1) / 10000.0 AS vb FROM a, b) "
        "SELECT na, nb, round(ma, 4) AS mean_purchase, round(mb, 4) AS mean_click, "
        "round((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_stat, "
        "round(pow(va / na + vb / nb, 2) / "
        "(pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 2) AS dof "
        "FROM c"
    ),
    "rel_join_asof_tolerance": (
        f"WITH {_EV}, "
        "p AS (SELECT event_id AS p_id, user_id, ts_us AS p_ts FROM ev "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id AS c_id, user_id, ts_us AS c_ts FROM ev "
        "WHERE event_type = 'click'), "
        "j AS (SELECT p.p_id, c.c_id, p.p_ts, c.c_ts, row_number() OVER ("
        "PARTITION BY p.p_id ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn "
        "FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts "
        f"AND c.c_ts > p.p_ts - {ASOF_TOLERANCE_US}) "
        "SELECT p_id, c_id, p_ts - c_ts AS gap_us FROM j WHERE rn = 1"
    ),
    "rel_agg_hash": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, "
        + _sum_cents_sql("l_extendedprice")
        + " AS sum_base_cents, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount)")
        + " AS sum_disc_cents, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")
        + " AS sum_charge_cents, "
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "rel_agg_distinct": (
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part, "
        "count(DISTINCT l_suppkey) AS nd_supp, "
        "round(sum(DISTINCT l_quantity), 4) AS sum_dist_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_agg_approx": (
        "SELECT count(DISTINCT l_partkey) AS exact_cnt, true AS within_5pct FROM lineitem"
    ),
    "rel_agg_sketch_hll": (
        "SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS within_5pct "
        "FROM events GROUP BY event_type"
    ),
    "rel_agg_grouping_sets": (
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        + _sum_cents_sql("l_extendedprice")
        + " AS price_cents, "
        "CAST(grouping(l_returnflag) AS BIGINT) * 2 + CAST(grouping(l_linestatus) AS BIGINT) "
        "AS g_id FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    "rel_window_rank": (
        "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, row_number() OVER w AS rn, "
        "ntile(4) OVER w AS quartile FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) "
        "WHERE rn <= 3"
    ),
    "rel_window_analytic": (
        f"WITH {_EV} "
        "SELECT event_id, user_id, lag(value) OVER w AS prev_value, "
        "lead(value) OVER w AS next_value, "
        "first_value(value) OVER wf AS first_value, last_value(value) OVER wf AS last_value, "
        "ts_us - lag(ts_us) OVER w AS gap_us FROM ev "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id), "
        "wf AS (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    "rel_window_frame": (
        f"WITH {_EV} "
        "SELECT event_id, round(avg(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg, "
        "count(*) OVER (PARTITION BY user_id ORDER BY ts_us "
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS rng_cnt FROM ev"
    ),
    "rel_sort_limit": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"
    ),
    "rel_topk_per_group": (
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM ("
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, "
        "row_number() OVER (PARTITION BY l_returnflag "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn FROM lineitem) "
        "WHERE rn <= 3"
    ),
    "rel_setop_union": (
        "WITH a AS (SELECT c_nationkey AS nkey FROM customer WHERE c_mktsegment = 'BUILDING'), "
        "b AS (SELECT s_nationkey AS nkey FROM supplier) "
        "SELECT 'dist' AS kind, nkey FROM (SELECT nkey FROM a UNION SELECT nkey FROM b) "
        "UNION ALL "
        "SELECT 'all' AS kind, nkey FROM (SELECT nkey FROM a UNION ALL SELECT nkey FROM b)"
    ),
    "rel_setop_intersect_except": (
        "WITH a AS (SELECT c_nationkey AS nkey FROM customer), "
        "b AS (SELECT s_nationkey AS nkey FROM supplier) "
        "SELECT 'intersect' AS kind, nkey FROM (SELECT nkey FROM a INTERSECT SELECT nkey FROM b) "
        "UNION ALL SELECT 'except_all', nkey FROM (SELECT nkey FROM a EXCEPT ALL "
        "SELECT nkey FROM b) "
        "UNION ALL SELECT 'except', nkey FROM (SELECT nkey FROM a EXCEPT SELECT nkey FROM b) "
        "UNION ALL SELECT 'intersect_all', nkey FROM (SELECT nkey FROM a INTERSECT ALL "
        "SELECT nkey FROM b)"
    ),
    "rel_subquery": (
        "SELECT p_partkey, p_retailprice FROM part "
        "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) "
        "AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)"
    ),
    "rel_fn_string": (
        "SELECT c_custkey, lower(c_name) AS lo, upper(c_mktsegment) AS up, "
        "substring(c_name, 1, 8) AS sub, "
        "concat_ws('|', c_mktsegment, c_name) AS joined, "
        "trim(lpad(c_name, 25, ' ')) AS trimmed, "
        "lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded, "
        "CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts, "
        "regexp_extract(c_name, '([0-9]+)', 1) AS digits, "
        "regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked, "
        "CAST(length(c_name) AS BIGINT) AS len, "
        "CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos "
        "FROM customer"
    ),
    "rel_fn_date": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr, "
        "CAST(month(o_orderdate) AS BIGINT) AS mo, "
        "CAST(day(o_orderdate) AS BIGINT) AS dom, "
        "strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start, "
        "strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30, "
        "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) "
        "AS epoch_days, "
        "strftime(make_date(CAST(year(o_orderdate) AS INTEGER), "
        "CAST(month(o_orderdate) AS INTEGER), 1), '%Y-%m-%d') AS made FROM orders"
    ),
    "rel_fn_math": (
        "SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS a, "
        "CASE WHEN abs(l_extendedprice) < 9.2e18 THEN "
        "TRY_CAST(ceil(l_extendedprice) AS BIGINT) END AS c, "
        "CASE WHEN abs(l_extendedprice) < 9.2e18 THEN "
        "TRY_CAST(floor(l_extendedprice) AS BIGINT) END AS f, "
        "round(l_extendedprice, 1) AS r1, "
        "pow(l_quantity, 2) AS q2, round(sqrt(l_extendedprice), 4) AS sq, "
        "round(exp(l_discount), 4) AS ex, round(ln(1.0 + l_discount), 4) AS ln1p, "
        "round(log10(l_extendedprice), 4) AS lg, "
        "CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn, "
        "greatest(l_quantity, l_discount, l_tax) AS g, "
        "least(l_quantity, l_discount, l_tax) AS l, "
        "l_orderkey % 7 AS m7 FROM lineitem"
    ),
    "rel_fn_conditional": (
        "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' "
        "WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket, "
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_nb, "
        "coalesce(nullif(c_nationkey, 0), -1) AS nat_nz FROM customer"
    ),
    "rel_fn_array": (
        "WITH emb AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings) "
        "SELECT vec_id, CAST(len(emb) AS BIGINT) AS dim, round(emb[1], 4) + 0.0 AS first_el, "
        "round(list_aggregate(emb, 'min'), 4) + 0.0 AS min_el, "
        "round(list_aggregate(emb, 'max'), 4) + 0.0 AS max_el, "
        "CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_pos, "
        "round(list_aggregate(emb, 'sum'), 4) + 0.0 AS sum_el, "
        "CAST(len(list_distinct(emb)) AS BIGINT) AS n_distinct, "
        "round(list_aggregate(list_slice(list_sort(emb), 1, 8), 'sum'), 4) + 0.0 AS bottom8_sum "
        "FROM emb"
    ),
    "rel_fn_map_struct": (
        "SELECT c_custkey, array_to_string(map_keys(MAP {'seg': c_mktsegment, 'name': c_name}), "
        "',') AS keys_csv, "
        "map_extract(MAP {'seg': c_mktsegment, 'name': c_name}, 'seg')[1] AS seg_val, "
        "{'k': c_custkey, 'bal': c_acctbal}.bal AS st_bal, "
        "list_contains(map_keys(MAP {'seg': c_mktsegment, 'name': c_name}), 'name') AS has_name "
        "FROM customer"
    ),
    "rel_fn_json": (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k_get, "
        "CAST(json_extract(props, '$.k') AS INTEGER) AS k_from FROM events"
    ),
    "rel_dedup_exact": (
        "SELECT user_id, event_type, event_id FROM ("
        "SELECT user_id, event_type, event_id, row_number() OVER ("
        "PARTITION BY user_id, event_type ORDER BY event_id) AS rn FROM events) WHERE rn = 1"
    ),
    "rel_sample": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '1a'"
    ),
    "rel_window_percentiles": (
        "SELECT o_orderkey, o_orderpriority, "
        "TRY_CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pr_q4, "
        "TRY_CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cd_q4, "
        "nth_value(o_totalprice, 3) OVER wf AS third_price FROM orders "
        "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), "
        "wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    "rel_string_agg": (
        "SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers, "
        "count(*) AS n_supp FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    "rel_agg_percentile": (
        "SELECT l_returnflag, "
        "round(quantile_cont(l_quantity, 0.25), 4) AS p25, "
        "round(quantile_cont(l_quantity, 0.5), 4) AS median, "
        "round(quantile_cont(l_quantity, 0.75), 4) AS p75, "
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_fn_bitwise": (
        f"WITH {_EV} SELECT event_id, "
        "CAST(json_extract(props, '$.k') AS BIGINT) & 15 AS k_and, "
        "CAST(json_extract(props, '$.k') AS BIGINT) | 32 AS k_or, "
        "xor(CAST(json_extract(props, '$.k') AS BIGINT), 21) AS k_xor, "
        "CAST(json_extract(props, '$.k') AS BIGINT) << 2 AS k_shl, "
        "CAST(json_extract(props, '$.k') AS BIGINT) >> 1 AS k_shr FROM ev"
    ),
    "rel_join_range_bucket": (
        # identical semantics to rel_join_theta_range — the bucket join is a
        # physical strategy, not a semantic change.
        f"WITH {_EV} "
        "SELECT a.event_id AS a_id, b.event_id AS b_id, b.ts_us - a.ts_us AS gap_us "
        "FROM ev a JOIN ev b ON a.user_id = b.user_id AND b.ts_us > a.ts_us "
        "AND b.ts_us <= a.ts_us + 600000000"
    ),
    "rel_cte_recursive": (
        "WITH RECURSIVE months(m) AS ("
        "SELECT DATE '1995-01-01' "
        "UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months "
        "WHERE m < DATE '2001-12-01') "
        "SELECT strftime(m, '%Y-%m') AS month, count(o_orderkey) AS n_orders "
        "FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m "
        "GROUP BY m"
    ),
    "rel_fn_string2": (
        "SELECT c_custkey, "
        "CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS pal_dist, "
        "translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr, "
        "repeat(substring(c_name, 1, 3), 2) AS rep3, "
        "reverse(c_mktsegment) AS seg_rev FROM customer"
    ),
    "rel_fn_math2": (
        f"WITH {_EV} SELECT event_id, "
        "round(sin(value), 4) + 0.0 AS sin_v, round(cos(value), 4) + 0.0 AS cos_v, "
        "round(atan2(value, 2.0), 4) + 0.0 AS atan2_v, "
        "round(degrees(value), 4) + 0.0 AS deg_v, round(radians(value), 4) + 0.0 AS rad_v, "
        "round(cbrt(abs(value)), 4) AS cbrt_v, "
        "round(log2(abs(value) + 1.0), 4) AS log2_v, "
        "CAST(factorial(CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS INT)) "
        "AS BIGINT) AS fact_k, "
        "CAST(bit_count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS bits_k "
        "FROM ev"
    ),
    "rel_unpivot": (
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
        "round(l_quantity, 4) AS val FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', "
        "round(l_discount, 4) FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', "
        "round(l_tax, 4) FROM lineitem"
    ),
    "rel_explain_pivot": (
        "SELECT user_id, "
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
        "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
        "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
        "FROM events GROUP BY user_id"
    ),
    "rel_agg_stats": (
        "SELECT l_returnflag, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qp, "
        "round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p, "
        "round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s, "
        "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
        "round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept, "
        "round(regr_r2(l_extendedprice, l_quantity), 4) AS r2 "
        "FROM lineitem "
        f"WHERE {_CENTS.format(x='l_extendedprice')} IS NOT NULL "
        "GROUP BY l_returnflag"
    ),
    "rel_agg_collect": (
        "SELECT n_name, "
        "array_to_string(list_sort(list(DISTINCT s_name)), '|') AS suppliers, "
        "count(*) AS cnt "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
    ),
    "rel_fn_date2": (
        "SELECT o_orderkey, "
        "CAST(quarter(o_orderdate) AS BIGINT) AS qtr, "
        "CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_wk, "
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, "
        "strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end, "
        "strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m "
        "FROM orders WHERE o_orderkey <= 3000"
    ),
    "rel_window_range_interval": (
        f"WITH {_EV} SELECT event_id, user_id, "
        "count(*) OVER w AS trail_cnt, "
        f"CAST(sum({_CENTS.format(x='value')}) OVER w AS BIGINT) AS trail_cents "
        "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us "
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
    ),
    "rel_gen_range": (
        "SELECT CAST(range AS BIGINT) AS id, "
        "CAST((range * 2654435761) % 1000003 AS BIGINT) AS h, "
        "CAST(range % 7 AS BIGINT) AS m FROM range(100000)"
    ),
    "rel_window_cume": (
        "SELECT o_orderkey, o_custkey, "
        "round(percent_rank() OVER w, 4) AS pct_rank, "
        "round(cume_dist() OVER w, 4) AS cume, "
        "nth_value(o_orderkey, 2) OVER w AS second_key "
        "FROM orders WHERE o_custkey <= 300 "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)"
    ),
    "rel_fn_format": (
        "SELECT c_custkey, "
        "printf('%s|%07d|%x', c_mktsegment, c_custkey, c_custkey) AS tag, "
        "printf('[%-10s]', substring(c_name, 1, 8)) AS padded "
        "FROM customer"
    ),
    "rel_agg_approx_quantile": (
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_med, "
        "true AS within_1pct FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_merge_upsert": (
        "WITH t AS (SELECT o_orderkey AS k, o_custkey AS t_cust, "
        f"{_CENTS.format(x='o_totalprice')} AS t_price_c FROM orders), "
        "src AS (SELECT k, o_custkey AS s_cust, (t_price_c * 11) // 10 AS s_price_c "
        "FROM t JOIN orders ON t.k = o_orderkey WHERE k <= 1000 "
        "UNION ALL SELECT CAST(i + 10000001 AS BIGINT), 1, 10000 FROM range(100) t(i)), "
        "m AS (SELECT coalesce(t.k, src.k) AS k, t_cust, t_price_c, s_cust, s_price_c "
        "FROM t FULL OUTER JOIN src ON t.k = src.k) "
        "SELECT k AS o_orderkey, "
        "CAST(coalesce(s_cust, t_cust) AS BIGINT) AS o_custkey, "
        "CAST(coalesce(s_price_c, t_price_c) AS BIGINT) AS o_totalprice_cents, "
        "CASE WHEN s_cust IS NOT NULL AND t_cust IS NOT NULL THEN 'update' "
        "WHEN t_cust IS NULL THEN 'insert' ELSE 'keep' END AS action FROM m"
    ),
    "rel_scd2_intervals": (
        f"WITH {_EV} SELECT user_id, event_type AS state, "
        "CAST(ts_us AS BIGINT) AS valid_from_us, "
        "CAST(coalesce(lead(ts_us) OVER w, -1) AS BIGINT) AS valid_to_us, "
        "CAST(lead(ts_us) OVER w IS NULL AS INTEGER) AS is_current "
        "FROM ev WHERE user_id <= 50 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    ),
    "rel_histogram_fixed": (
        "WITH b AS (SELECT "
        f"{_CENTS.format(x='min(l_extendedprice)')} AS lo_c, "
        f"{_CENTS.format(x='max(l_extendedprice)')} AS hi_c FROM lineitem) "
        "SELECT CAST(least(floor("
        f"({_CENTS.format(x='l_extendedprice')} - lo_c) * {HIST_BINS} "
        f"/ (hi_c - lo_c + 1)), {HIST_BINS - 1}) AS BIGINT) AS bin, "
        "count(*) AS cnt FROM lineitem, b GROUP BY bin"
    ),
    "ml_linreg_normal": (
        "WITH d AS (SELECT * FROM (SELECT CAST(l_quantity AS BIGINT) AS x1, "
        "TRY_CAST(round(l_discount * 100, 0) AS BIGINT) AS x2, "
        "CASE WHEN abs(l_extendedprice) < 9.2e18 THEN "
        "TRY_CAST(floor(l_extendedprice) AS BIGINT) END AS y FROM lineitem) "
        "WHERE y IS NOT NULL), "
        "m AS (SELECT count(*) AS n, CAST(sum(x1) AS BIGINT) AS s1, "
        "CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x2 * x2) AS BIGINT) AS s22, "
        "CAST(sum(x1 * x2) AS BIGINT) AS s12, CAST(sum(x1 * y) AS BIGINT) AS s1y, "
        "CAST(sum(x2 * y) AS BIGINT) AS s2y FROM d), "
        "c AS (SELECT n, s1, s2, sy, "
        "CAST(n * s11 - s1 * s1 AS DOUBLE) AS m11, "
        "CAST(n * s22 - s2 * s2 AS DOUBLE) AS m22, "
        "CAST(n * s12 - s1 * s2 AS DOUBLE) AS m12, "
        "CAST(n * s1y - s1 * sy AS DOUBLE) AS m1y, "
        "CAST(n * s2y - s2 * sy AS DOUBLE) AS m2y FROM m) "
        "SELECT n, "
        "round((m1y * m22 - m2y * m12) / (m11 * m22 - m12 * m12), 6) AS beta_qty, "
        "round((m2y * m11 - m1y * m12) / (m11 * m22 - m12 * m12), 6) AS beta_disc, "
        "round((sy - (m1y * m22 - m2y * m12) / (m11 * m22 - m12 * m12) * s1 "
        "- (m2y * m11 - m1y * m12) / (m11 * m22 - m12 * m12) * s2) / n, 4) "
        "AS intercept FROM c"
    ),
    "rel_sample_weighted": (
        "WITH o AS (SELECT o_orderkey, "
        f"{_CENTS.format(x='o_totalprice')} AS w_cents FROM orders), "
        "s AS (SELECT o_orderkey, w_cents, TRY_CAST(round(ln((CAST(('0x' || "
        "substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) + 1) "
        "/ 4294967297.0) / w_cents * 1e9) AS BIGINT) AS score_q FROM o) "
        "SELECT rnk, o_orderkey, w_cents, score_q FROM (SELECT *, row_number() "
        "OVER (ORDER BY score_q DESC, o_orderkey) AS rnk FROM s) "
        f"WHERE rnk <= {WSAMPLE_N}"
    ),
    "rel_sample_stratified": (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < "
        "CASE WHEN lang = 'en' THEN '40' ELSE '10' END"
    ),
    "rel_agg_bool": (
        "SELECT l_returnflag, "
        "count(*) FILTER (WHERE l_quantity > 25) AS n_heavy, "
        "count(*) FILTER (WHERE l_discount > 0.05) AS n_disc, "
        "bool_and(l_quantity > 0) AS all_pos, "
        "bool_or(l_tax > 0.07) AS any_hi_tax "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_join_existence_flag": (
        "SELECT c_custkey, "
        "c_custkey IN (SELECT o_custkey FROM orders) AS has_order FROM customer"
    ),
    "rel_fn_null": (
        "WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st "
        "FROM orders) "
        "SELECT o_orderkey, st, "
        "st IS NOT DISTINCT FROM 'F' AS nsafe_f, "
        "st IS NOT DISTINCT FROM NULL AS nsafe_null, "
        "coalesce(st, '?') AS st_or_q, "
        "count(st) OVER () AS n_nonnull, "
        "count(*) OVER () AS n_all FROM o"
    ),
    "rel_stat_crosstab": (
        "SELECT CAST(user_id % 4 AS VARCHAR) AS ubucket, "
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
        "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
        "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
        "FROM events GROUP BY 1"
    ),
    "rel_join_lateral": (
        "SELECT o.o_orderkey, t.l_linenumber, t.price_cents "
        "FROM orders o, "
        "LATERAL (SELECT l_linenumber, "
        "TRY_CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents "
        "FROM lineitem WHERE l_orderkey = o.o_orderkey "
        "ORDER BY l_extendedprice DESC, l_linenumber LIMIT 1) t "
        "WHERE o.o_orderkey <= 2000"
    ),
    "rel_lateral_view": (
        "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ts[CAST(i AS INTEGER)] AS tok "
        "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents "
        "WHERE doc_id <= 50), range(1, 4096) t(i) WHERE i <= len(ts)"
    ),
    "rel_values_inline": (
        "SELECT v.code, v.label, n.n_name "
        "FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) v(code, label) "
        "JOIN nation n ON n.n_regionkey = v.code"
    ),
    "rel_fn_higher_order2": (
        "WITH emb AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings) "
        "SELECT vec_id, "
        "len(list_filter(emb, x -> x > 0.3)) > 0 AS any_big, "
        "len(list_filter(emb, x -> abs(x) < 1.0)) = len(emb) AS all_small, "
        "CAST(len(list_filter(emb, (x, i) -> x > 0 AND (i - 1) % 2 = 0)) AS BIGINT) "
        "AS n_pos_even, "
        "round(sqrt(list_aggregate(list_transform(emb, x -> x * x), 'sum')), 4) "
        "AS norm_via_finish FROM emb"
    ),
    "rel_window_hourly_top_type": (
        f"WITH {_EV}, h AS (SELECT ts_us - ts_us % 3600000000 AS hour_us, "
        "event_type, count(*) AS cnt FROM ev GROUP BY 1, 2), "
        "r AS (SELECT hour_us, event_type, cnt, row_number() OVER "
        "(PARTITION BY hour_us ORDER BY cnt DESC, event_type) AS rn FROM h) "
        "SELECT CAST(hour_us AS BIGINT) AS hour_us, event_type AS top_type, cnt "
        "FROM r WHERE rn = 1"
    ),
}
