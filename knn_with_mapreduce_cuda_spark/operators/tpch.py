"""Named TPC-H queries (Q1/Q3/Q5/Q6), adapted to the driver's fixture
schema — the standard decision-support suite run end-to-end, not just
"shapes". Adaptations, forced by missing fixture columns (TESTDATA.md):
Q3 drops o_shippriority from the output; Q5 keeps the full
region→nation→{customer,supplier} star but joins supplier on nationkey
only (no l_suppkey⋈s_suppkey nation-match semantics change — the fixture
supplier table IS keyed consistently, so the classic join applies).
Dates use the fixture range (1995-01-01 … 2001-11-04).

Oracle-match conventions as everywhere (SURVEY.md §7.2): monetary sums
integerized to cents pre-sum, every top-k total-ordered.

Scale notes: Q1 is the partial-agg workhorse (map-side combine, 4-group
output); Q3/Q5 are broadcast-dim + shuffled-fact joins Catalyst reorders
freely; Q6 is a pure scan-filter-agg — pushdown visible in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from .relational import _CENTS, _sum_cents_sql, cents


def _q1(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return (
        li.filter(col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.sum(cents(col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.sum(
                cents(col("l_extendedprice") * (1 - col("l_discount")) * (1 + col("l_tax")))
            ).alias("sum_charge_cents"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q3(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer").filter(
        col("c_mktsegment") == "BUILDING"
    )
    orders = tables.table(spark, sf_dir, "orders").filter(
        col("o_orderdate") < F.lit("1998-03-15")
    )
    li = tables.table(spark, sf_dir, "lineitem").filter(
        col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(F.broadcast(cust), col("o_custkey") == col("c_custkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


def _q5(spark, sf_dir):
    region = tables.table(spark, sf_dir, "region").filter(col("r_name") == "ASIA")
    nation = tables.table(spark, sf_dir, "nation")
    cust = tables.table(spark, sf_dir, "customer")
    orders = tables.table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01"))
        & (col("o_orderdate") < F.lit("1997-01-01"))
    )
    supplier = tables.table(spark, sf_dir, "supplier")
    li = tables.table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(cust, col("o_custkey") == col("c_custkey"))
        .join(
            supplier,
            (col("l_suppkey") == col("s_suppkey"))
            & (col("c_nationkey") == col("s_nationkey")),
        )
        .join(F.broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .join(F.broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(cents(col("l_extendedprice") * (1 - col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "n_name")
    )


def _q6(spark, sf_dir):
    li = tables.table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (col("l_shipdate") >= F.lit("1996-01-01"))
            & (col("l_shipdate") < F.lit("1997-01-01"))
            & col("l_discount").between(0.03, 0.05)
            & (col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(col("l_extendedprice") * col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count("*").alias("n"),
        )
    )


QUERIES = {
    "tpch_q1": _q1,
    "tpch_q3": _q3,
    "tpch_q5": _q5,
    "tpch_q6": _q6,
}

ORACLE = {
    "tpch_q1": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, "
        + _sum_cents_sql("l_extendedprice")
        + " AS sum_base_cents, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount)")
        + " AS sum_disc_cents, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")
        + " AS sum_charge_cents, "
        "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "tpch_q3": (
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount)")
        + " AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' "
        "AND l_shipdate > TIMESTAMP '1998-03-15' "
        "GROUP BY l_orderkey, o_date ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
    ),
    "tpch_q5": (
        "SELECT n_name, "
        + _sum_cents_sql("l_extendedprice * (1 - l_discount)")
        + " AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name ORDER BY revenue_cents DESC, n_name"
    ),
    "tpch_q6": (
        "SELECT "
        + _sum_cents_sql("l_extendedprice * l_discount")
        + " AS revenue_cents, count(*) AS n FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24"
    ),
}
