"""plans/prefix.py: two-phase running aggregates must be bit-identical
to the single-partition global window they replace."""

import pytest
from pyspark.sql import Window, functions as F
from pyspark.sql.functions import col, lit

from knn_with_mapreduce_cuda_spark.plans import prefix


def _data(spark, n=501, parts_in=5):
    # ties in the order key, nulls in the values, negative values
    return (
        spark.range(n)
        .repartition(parts_in)
        .select(
            (col("id") % 97).alias("k"),  # tied order key
            col("id").alias("tie"),  # tie-break
            F.when(col("id") % 11 == 0, None)
            .otherwise((col("id") * 7) % 50 - 25)
            .cast("long")
            .alias("v"),
        )
    )


@pytest.mark.parametrize(
    "strategy", ["distributive", "collect", "localCheckpoint", "persist"]
)
@pytest.mark.parametrize("parts", [1, 3, 32])
@pytest.mark.parametrize("desc", [False, True])
def test_attach_running_matches_global_window(spark, parts, desc, strategy):
    d = _data(spark)
    spec = [("k", "desc"), "tie"] if desc else ["k", "tie"]
    order = prefix._order(spec)
    got = prefix.attach_running(
        d, spec, sums={"v": "cs"}, maxs={"v": "cm"}, rn="rn", parts=parts,
        strategy=strategy,
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = (
        d.withColumn("cs", F.coalesce(F.sum("v").over(w), lit(0)))
        .withColumn("cm", F.max("v").over(w))
        .withColumn("rn", F.row_number().over(Window.orderBy(*order)).cast("long"))
    )
    cols = ["k", "tie", "v", "cs", "cm", "rn"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


@pytest.mark.parametrize("parts", [1, 4, 32])
def test_attach_running_exclusive_max(spark, parts):
    d = _data(spark)
    order = [col("k"), col("tie")]
    got = prefix.attach_running(d, ["k", "tie"], maxs_excl={"v": "pm"}, parts=parts)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = d.withColumn("pm", F.max("v").over(w))
    cols = ["k", "tie", "v", "pm"]
    assert sorted(
        map(tuple, got.select(cols).collect()), key=repr
    ) == sorted(map(tuple, want.select(cols).collect()), key=repr)


@pytest.mark.parametrize("parts", [1, 4, 32])
def test_attach_running_last_non_null(spark, parts):
    d = _data(spark)  # v is null on every 11th row
    order = [col("k"), col("tie")]
    got = prefix.attach_running(d, ["k", "tie"], lasts={"v": "ff"}, parts=parts)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = d.withColumn("ff", F.last("v", ignorenulls=True).over(w))
    cols = ["k", "tie", "v", "ff"]
    assert sorted(
        map(tuple, got.select(cols).collect()), key=repr
    ) == sorted(map(tuple, want.select(cols).collect()), key=repr)


def test_attach_running_all_null_prefix(spark):
    # leading rows all-null: running max must stay null until a value
    d = spark.createDataFrame(
        [(i, None if i < 4 else i * 2) for i in range(8)], "o INT, v BIGINT"
    )
    got = {
        r["o"]: r["cm"]
        for r in prefix.attach_running(
            d, ["o"], maxs={"v": "cm"}, parts=3
        ).collect()
    }
    assert got == {0: None, 1: None, 2: None, 3: None, 4: 8, 5: 10, 6: 12, 7: 14}


@pytest.mark.parametrize("n_rows,k", [(0, 4), (3, 10), (10, 10), (37, 5), (501, 10)])
def test_ntile_exact_matches_spark_ntile(spark, n_rows, k):
    d = spark.range(n_rows).select(
        ((col("id") * 13) % 29).alias("s"), col("id").alias("tie")
    )
    got = prefix.ntile_exact(d, [("s", "desc"), "tie"], k, "b", parts=7)
    want = d.withColumn(
        "b", F.ntile(k).over(Window.orderBy(F.desc("s"), col("tie"))).cast("long")
    )
    assert sorted(map(tuple, got.select("s", "tie", "b").collect())) == sorted(
        map(tuple, want.select("s", "tie", "b").collect())
    )


@pytest.mark.parametrize("strategy", ["distributive", "localCheckpoint", "persist"])
def test_attach_running_strategies_full_surface(spark, strategy):
    """Every non-default phase-2 strategy over the FULL aggregate
    surface at once (sums + maxs + maxs_excl + lasts + rn, nulls in the
    source) must be bit-identical to the collect form — the r09
    strategy switch (VERDICT r08 #4) may never change values."""
    d = _data(spark)
    kw = dict(
        sums={"v": "cs"},
        maxs={"v": "cm"},
        maxs_excl={"v": "pm"},
        lasts={"v": "ff"},
        rn="rn",
        parts=5,
    )
    got = prefix.attach_running(d, ["k", "tie"], strategy=strategy, **kw)
    want = prefix.attach_running(d, ["k", "tie"], strategy="collect", **kw)
    cols = ["k", "tie", "v", "cs", "cm", "pm", "ff", "rn"]
    assert sorted(
        map(tuple, got.select(cols).collect()), key=repr
    ) == sorted(map(tuple, want.select(cols).collect()), key=repr)


def test_attach_running_distributive_all_null_prefix(spark):
    # leading rows all-null under the r09 default strategy too
    d = spark.createDataFrame(
        [(i, None if i < 4 else i * 2) for i in range(8)], "o INT, v BIGINT"
    )
    got = {
        r["o"]: (r["cm"], r["ff"])
        for r in prefix.attach_running(
            d, ["o"], maxs={"v": "cm"}, lasts={"v": "ff"}, parts=3,
            strategy="distributive",
        ).collect()
    }
    assert got == {
        0: (None, None), 1: (None, None), 2: (None, None), 3: (None, None),
        4: (8, 8), 5: (10, 10), 6: (12, 12), 7: (14, 14),
    }


def test_attach_running_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError, match="strategy"):
        prefix.attach_running(_data(spark), ["k", "tie"], rn="rn", strategy="eager")


def test_order_spec_rejects_column_expressions(spark):
    d = _data(spark)
    with pytest.raises(TypeError, match="order element"):
        prefix.attach_running(d, [F.desc("k"), col("tie")], rn="rn", parts=3)
    with pytest.raises(TypeError, match="order element"):
        prefix.attach_running(d, [col("k") + 1], rn="rn", parts=3)


def _grouped_data(spark, n=600, n_groups=4, parts_in=5):
    # few skewed groups (group 0 holds half the rows), unique order key,
    # nulls and negatives in the summed value
    return (
        spark.range(n)
        .repartition(parts_in)
        .select(
            F.when(col("id") % 2 == 0, lit(0))
            .otherwise(col("id") % n_groups)
            .cast("long")
            .alias("g"),
            col("id").alias("o"),  # unique order key
            F.when(col("id") % 13 == 0, None)
            .otherwise((col("id") * 3) % 40 - 20)
            .cast("long")
            .alias("v"),
        )
    )


@pytest.mark.parametrize("parts", [1, 3, 32])
@pytest.mark.parametrize("desc", [False, True])
def test_grouped_matches_plain_window(spark, parts, desc):
    d = _grouped_data(spark)
    spec = [("o", "desc")] if desc else ["o"]
    got = prefix.attach_running_grouped(
        d, ["g"], spec, sums={"v": "cs"}, sums_excl={"v": "cse"}, parts=parts
    )
    w = Window.partitionBy("g").orderBy(*prefix._order(spec))
    want = d.withColumn(
        "cs",
        F.coalesce(
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(0)
        ),
    ).withColumn(
        "cse",
        F.coalesce(
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)
        ),
    )
    cols = ["g", "o", "v", "cs", "cse"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_grouped_string_group_key(spark):
    # string GROUP key is fine (only the leading ORDER column drives the
    # slicing); values must still match the per-group window
    d = _grouped_data(spark).select(
        F.concat(lit("lang_"), col("g")).alias("g"), "o", "v"
    )
    got = prefix.attach_running_grouped(d, ["g"], ["o"], sums={"v": "cs"}, parts=7)
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = d.withColumn("cs", F.coalesce(F.sum("v").over(w), lit(0)))
    cols = ["g", "o", "v", "cs"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_grouped_null_group_key_rows_survive(spark):
    """A NULL group key is a real group, not lost rows: windows and
    groupBy treat NULL as one group and the recombine join is
    eqNullSafe — with a plain == the null-group rows would vanish from
    the output entirely (ADVICE r06 #1)."""
    d = _grouped_data(spark).select(
        F.when(col("g") == 0, None).otherwise(col("g")).alias("g"), "o", "v"
    )
    n_null = d.filter(col("g").isNull()).count()
    assert n_null > 0  # the fixture must exercise the null group
    got = prefix.attach_running_grouped(
        d, ["g"], ["o"], sums={"v": "cs"}, sums_excl={"v": "cse"}, parts=7
    )
    assert got.count() == d.count()
    w = Window.partitionBy("g").orderBy("o")
    want = d.withColumn(
        "cs",
        F.coalesce(
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(0)
        ),
    ).withColumn(
        "cse",
        F.coalesce(
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)
        ),
    )
    cols = ["g", "o", "v", "cs", "cse"]
    assert sorted(
        map(tuple, got.select(cols).fillna({"g": -999}).collect())
    ) == sorted(map(tuple, want.select(cols).fillna({"g": -999}).collect()))


def test_grouped_rejects_duplicate_outputs(spark):
    d = _grouped_data(spark)
    with pytest.raises(ValueError, match="duplicate output"):
        prefix.attach_running_grouped(
            d, ["g"], ["o"], sums={"v": "x"}, sums_excl={"v": "x"}, parts=3
        )


def test_pack_sequences_plan_is_sliced_not_per_lang(spark):
    """llm_pack_sequences must run the grouped two-phase scan: the plan
    carries the slice-id hash repartition, and no window in the plan is
    partitioned by lang ALONE (the per-group single-task fold)."""
    import re

    from knn_with_mapreduce_cuda_spark.operators import llm
    from tests.conftest import SF_SMOKE

    df = llm._q_pack_sequences(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert prefix._PID in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "lang" in spec:
            assert prefix._PID in spec, f"per-lang-only window in plan: {spec}"
