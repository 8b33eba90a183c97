"""Globally-ordered running aggregates without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` is correct but executes
by moving EVERY row to one partition (Spark warns: "No Partition Defined
for Window operation") — the one shape in this engine that cannot
survive a corpus-sized input at 100 TB. This module is the scalable
replacement, the classic two-phase prefix scan (the same layout
``RDD.zipWithIndex`` uses, lifted to DataFrames and generalized to any
associative running aggregate):

1. **Literal range boundaries**: one ``approxQuantile`` pass over the
   leading order column, collected once and baked into the plan as
   literals. The slice id is then a PURE FUNCTION of the row (count of
   boundaries ≤ value, flipped for descending orders) — NOT
   ``repartitionByRange``, whose boundary sampling is seeded per RDD id
   and can pick DIFFERENT boundaries in the offsets job vs the main job
   (observed at 5M rows, scripts/window_stress.py; invisible at fixture
   scale where the reservoir sample is the whole partition). With
   literal boundaries the two jobs agree by construction.
2. **Window WITHIN each slice** (``partitionBy(_pid)`` after a hash
   repartition on the slice id) — fully parallel, per-slice running
   aggregates.
3. **Shift by slice offsets** — each slice reduces to ONE row of
   totals (≤ ``parts`` rows); the exclusive prefix over that bounded
   relation is a window ordered by slice id, broadcast-joined back on
   the slice id. Phase 2 stays lazy (the r09 default — SCALE.md §9l),
   so both phases share one job and ReuseExchange evaluates the slice
   exchange once; the historical driver-side recombine (and two
   materialization variants) remain selectable via ``strategy=``.

Exactness: sums/counts/max/min over int64 are associative, the order
columns must form a *total* order (pass tie-broken orders, as every
call-site in this repo already does), and equal leading keys map to the
same slice (the id is a function of the value) — the result is
bit-identical to the global window. Boundary PLACEMENT only affects
load balance, never values, so the result is reproducible across runs
even though ``approxQuantile`` itself is merge-order-dependent.

Driver traffic is ≤ ``parts`` boundary values (the ``collect``
strategy adds ≤ ``parts`` rows of int64 totals) — the same bounded
model-broadcast pattern as the GEMM query block and the PQ LUT build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import col, lit

from .. import tables

#: column name carrying the physical partition id through the two phases.
_PID = "_prefix_pid"


def _parse_spec(spec) -> tuple[str, bool]:
    """One order element → (column name, descending). Accepted forms:
    ``"name"`` (ascending) or ``("name", "asc"|"desc")`` — explicit
    direction, never parsed out of ``Column.__repr__`` (VERDICT r04 #6:
    the repr is not API, and an expression column or non-default null
    ordering would silently mis-slice). Default null placement (NULLS
    FIRST asc / NULLS LAST desc) is part of the contract."""
    if isinstance(spec, str):
        return spec, False
    if (
        isinstance(spec, tuple)
        and len(spec) == 2
        and isinstance(spec[0], str)
        and spec[1] in ("asc", "desc")
    ):
        return spec[0], spec[1] == "desc"
    raise TypeError(
        f"prefix order element must be 'name' or (name, 'asc'|'desc'); got {spec!r}"
    )


def _order(order_cols) -> list[Column]:
    """Order spec → Window.orderBy columns (shared with callers that
    need the equivalent single-window shape, e.g. scripts/window_stress)."""
    out = []
    for spec in order_cols:
        name, desc = _parse_spec(spec)
        out.append(col(name).desc() if desc else col(name))
    return out


#: literal quantile boundaries memo — boundary PLACEMENT only affects
#: load balance, never values (module docstring), so serving memoized
#: boundaries for a semantically-equal plan is always sound; it saves
#: the approxQuantile job the ROC/PR/calibration family would otherwise
#: re-run per operator on the same scored relation (VERDICT r04 #6).
_BOUNDS_MEMO = tables.SessionMemo()


def _bounds(df: DataFrame, name: str, parts: int) -> list[float]:
    try:
        memo_key = ("prefix_bounds", df.semanticHash(), name, parts)
    except Exception:  # semanticHash unavailable — compute uncached
        memo_key = None
    if memo_key is not None:
        hit = _BOUNDS_MEMO.get(df.sparkSession, memo_key)
        if hit is not None:
            return hit
    probs = [i / parts for i in range(1, parts)]
    bounds = sorted(
        set(
            df.select(col(name).cast("double").alias("_b")).approxQuantile(
                "_b", probs, 0.001
            )
        )
    )
    if memo_key is not None:
        _BOUNDS_MEMO.put(df.sparkSession, memo_key, bounds)
    return bounds


def _slice_id(df: DataFrame, order_cols, parts: int) -> Column:
    """Slice id for the two-phase scan: count of literal quantile
    boundaries ≤ the leading order column (flipped when it sorts
    descending) — monotone in the total order, equal keys share a
    slice, and (being a pure function of the row with the boundaries
    baked in as literals) identical in every job that evaluates it."""
    name, descending = _parse_spec(order_cols[0])
    if parts <= 1:
        return lit(0)
    from pyspark.sql.types import (
        BooleanType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    # Slice ONLY on types whose cast('double') is monotone in the
    # column's sort order. A string column is NOT (review r08: '9' and
    # '10' cast to 9.0 < 10.0 but sort as '10' < '9', so quantile
    # slicing would place '9' in an earlier slice than a row that
    # precedes it globally — silently wrong running sums); degrade such
    # columns to one slice, which is what the module docstring always
    # promised ("values stay correct, parallelism collapses").
    if not isinstance(
        df.schema[name].dataType,
        (NumericType, BooleanType, TimestampType, TimestampNTZType),
    ):
        return lit(0)
    bounds = _bounds(df, name, parts)
    if not bounds:  # empty input
        return lit(0)
    c = col(name).cast("double")
    ge: Column = lit(0)
    for b in bounds:
        ge = ge + (c >= lit(b)).cast("int")
    pid = (lit(len(bounds)) - ge) if descending else ge
    # null order keys: first slice for ASC (NULLS FIRST), last for DESC
    return F.coalesce(pid, lit(len(bounds)) if descending else lit(0))


def attach_running(
    df: DataFrame,
    order_cols,
    sums: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    maxs_excl: dict[str, str] | None = None,
    lasts: dict[str, str] | None = None,
    rn: str | None = None,
    parts: int | None = None,
    strategy: str = "distributive",
) -> DataFrame:
    """Attach global running aggregates in the total order ``order_cols``.

    ``order_cols`` elements are ``"name"`` (ascending) or
    ``("name", "asc"|"desc")`` — explicit direction, see ``_parse_spec``.
    sums / maxs: {source_column: output_column} running SUM / MAX over
    ``rowsBetween(unboundedPreceding, currentRow)``; ``maxs_excl``: MAX
    over ``rowsBetween(unboundedPreceding, -1)`` (current row excluded —
    the sweep-line shape; null on the first row, like the window it
    replaces); ``lasts``: ``F.last(src, ignorenulls=True)`` over the
    inclusive frame — the forward-fill shape (run it over the reversed
    order for a backward fill); ``rn``: output column for the global
    ``row_number()``.
    Source columns must be integral (the engine's quantized-int64
    convention) so the two-phase recombination is exact. Null sources
    contribute 0 to sums and are ignored by maxs/lasts, matching the
    window functions they replace.

    ``strategy`` picks how phase 2 (per-slice totals → exclusive prefix
    offsets) recombines — all four are bit-identical in value
    (tests/test_prefix.py runs the parametrized net over each):

    - ``"distributive"`` (default since r09): totals stay a DataFrame;
      the exclusive prefix over ≤ ``parts`` total-rows is a window over
      that tiny relation and broadcast-joins back — ONE job, so
      Catalyst's ReuseExchange evaluates the sliced input ONCE (the
      ``collect`` form's totals job was a full second pass over the
      window input — invisible at sf0.1, real at 100 TB; VERDICT r08
      #4, measured in SCALE.md §9k). Nothing is collected to the
      driver, which also removes attach_running from the driver-side
      collect() audit surface.
    - ``"collect"``: the r01–r08 form — totals collected (≤ ``parts``
      rows), exclusive prefix computed driver-side, offsets re-shipped
      as a broadcast join. Two jobs ⇒ the sliced input evaluates twice.
    - ``"localCheckpoint"`` / ``"persist"``: the ``collect`` form with
      the sliced input materialized first, so pass 2 re-reads blocks
      instead of recomputing. localCheckpoint truncates lineage — an
      executor loss at scale makes the result unrecoverable — and
      persist has no sound unpersist point in a lazy builder (the cache
      entry outlives the call); both kept for the A/B record, neither
      is the scale answer.
    """
    sums, maxs = dict(sums or {}), dict(maxs or {})
    maxs_excl, lasts = dict(maxs_excl or {}), dict(lasts or {})
    if strategy not in ("distributive", "collect", "localCheckpoint", "persist"):
        raise ValueError(f"unknown attach_running strategy {strategy!r}")
    spark = df.sparkSession
    if parts is None:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order = _order(order_cols)
    d = df.withColumn(_PID, _slice_id(df, order_cols, parts).cast("int")).repartition(
        parts, col(_PID)
    )
    if strategy == "localCheckpoint":
        # lazy: the totals job materializes the blocks, pass 2 reuses them
        d = d.localCheckpoint(eager=False)
    elif strategy == "persist":
        d = d.persist()
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = d
    for src, dst in sums.items():
        out = out.withColumn(dst, F.coalesce(F.sum(src).over(w), lit(0)))
    for src, dst in maxs.items():
        out = out.withColumn(dst, F.max(src).over(w))
    for src, dst in maxs_excl.items():
        out = out.withColumn(dst, F.max(src).over(w_excl))
    for src, dst in lasts.items():
        out = out.withColumn(dst, F.last(src, ignorenulls=True).over(w))
    if rn:
        out = out.withColumn(
            rn,
            F.row_number()
            .over(Window.partitionBy(_PID).orderBy(*order))
            .cast("long"),
        )

    # phase 2: per-partition totals -> exclusive prefix offsets. The agg
    # reduces each partition to ONE row; ≤ `parts` rows total.
    aggs = [F.count(lit(1)).alias("_n")]
    aggs += [F.sum(src).alias(f"_s_{dst}") for src, dst in sums.items()]
    all_maxs = list(maxs.items()) + list(maxs_excl.items())
    aggs += [F.max(src).alias(f"_m_{dst}") for src, dst in all_maxs]
    dd = d
    if lasts:
        # per-partition last non-null = max_by over the in-partition row
        # number, restricted to non-null source rows (all-null -> null).
        dd = d.withColumn(
            "_rnl", F.row_number().over(Window.partitionBy(_PID).orderBy(*order))
        )
        aggs += [
            F.max_by(src, F.when(col(src).isNotNull(), col("_rnl"))).alias(
                f"_l_{dst}"
            )
            for src, dst in lasts.items()
        ]
    totals_df = dd.groupBy(_PID).agg(*aggs)

    if strategy == "distributive":
        # exclusive prefix over the ≤ `parts`-row totals relation as a
        # window ordered by slice id — deliberately unpartitioned: its
        # input is one row per SLICE (bounded by the shuffle-partition
        # ceiling, never corpus-sized), the same bounded-relation shape
        # attach_running_grouped has always used. Keeping phase 2 lazy
        # puts both phases in ONE job, where ReuseExchange evaluates
        # the repartition-by-slice exchange once.
        w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
        off_cols = [col(_PID), F.coalesce(F.sum("_n").over(w_off), lit(0)).alias("_off_n")]
        off_cols += [
            F.coalesce(F.sum(f"_s_{dst}").over(w_off), lit(0)).alias(f"_off_s_{i}")
            for i, dst in enumerate(sums.values())
        ]
        off_cols += [
            F.max(f"_m_{dst}").over(w_off).alias(f"_off_m_{i}")
            for i, (_, dst) in enumerate(all_maxs)
        ]
        off_cols += [
            F.last(f"_l_{dst}", ignorenulls=True).over(w_off).alias(f"_off_l_{i}")
            for i, dst in enumerate(lasts.values())
        ]
        off = totals_df.select(*off_cols)
    else:
        totals = {r[_PID]: r for r in totals_df.collect()}
        rows = []
        run_n = 0
        run_s = {dst: 0 for dst in sums.values()}
        run_m = {dst: None for _, dst in all_maxs}
        run_l = {dst: None for dst in lasts.values()}
        for pid in sorted(totals):
            t = totals[pid]
            rows.append(
                (
                    pid,
                    run_n,
                    *[run_s[dst] for dst in sums.values()],
                    *[run_m[dst] for _, dst in all_maxs],
                    *[run_l[dst] for dst in lasts.values()],
                )
            )
            run_n += t["_n"]
            for src, dst in sums.items():
                run_s[dst] += t[f"_s_{dst}"] or 0
            for _, dst in all_maxs:
                m = t[f"_m_{dst}"]
                if m is not None and (run_m[dst] is None or m > run_m[dst]):
                    run_m[dst] = m
            for _, dst in lasts.items():
                v = t[f"_l_{dst}"]
                if v is not None:
                    run_l[dst] = v

        fields = [f"{_PID} INT", "_off_n BIGINT"]
        fields += [f"_off_s_{i} BIGINT" for i in range(len(sums))]
        fields += [f"_off_m_{i} BIGINT" for i in range(len(all_maxs))]
        fields += [f"_off_l_{i} BIGINT" for i in range(len(lasts))]
        off = spark.createDataFrame(rows, ", ".join(fields))

    out = out.join(F.broadcast(off), _PID)
    for i, dst in enumerate(sums.values()):
        out = out.withColumn(dst, col(dst) + col(f"_off_s_{i}"))
    # offset = inclusive max of every previous partition — correct for
    # both max frames (the current row is never on the offset side).
    for i, (_, dst) in enumerate(all_maxs):
        out = out.withColumn(
            dst,
            F.when(
                col(f"_off_m_{i}").isNull(), col(dst)
            ).otherwise(F.greatest(F.coalesce(col(dst), col(f"_off_m_{i}")), col(f"_off_m_{i}"))),
        )
    for i, dst in enumerate(lasts.values()):
        out = out.withColumn(dst, F.coalesce(col(dst), col(f"_off_l_{i}")))
    if rn:
        out = out.withColumn(rn, col(rn) + col("_off_n"))
    drop = [_PID, "_off_n"]
    drop += [f"_off_s_{i}" for i in range(len(sums))]
    drop += [f"_off_m_{i}" for i in range(len(all_maxs))]
    drop += [f"_off_l_{i}" for i in range(len(lasts))]
    return out.drop(*drop)


def attach_running_grouped(
    df: DataFrame,
    group_cols,
    order_cols,
    sums: dict[str, str] | None = None,
    sums_excl: dict[str, str] | None = None,
    parts: int | None = None,
) -> DataFrame:
    """Per-GROUP running sums in the order ``order_cols``, without a
    per-group single-task fold.

    ``Window.partitionBy(*group_cols)`` executes each group's cumsum in
    ONE task — correct, but a low-cardinality or skewed group key (a
    language column, a tenant id) caps parallelism at the number of
    groups and folds a corpus-sized group through a single executor
    thread: the same cliff the module docstring describes for the
    unpartitioned window, just sharded |groups| ways. This is the
    scalable replacement, the two-phase scan generalized per group:

    1. slice on the leading ORDER column exactly like ``attach_running``
       (literal quantile boundaries — the slice id is a pure function of
       the row), so every slice holds rows of MANY groups;
    2. window within ``(slice, *group_cols)`` — parallelism is
       ``parts``, independent of the group cardinality;
    3. shift by per-(slice, group) offsets recombined DISTRIBUTIVELY:
       the totals relation is ≤ ``parts × |groups|`` rows, its
       per-group exclusive prefix across slices is a window over
       ≤ ``parts`` rows per group (never a corpus-sized partition), and
       the offsets broadcast-join back on (slice, group). Nothing is
       collected to the driver.

    ``sums`` attaches running SUM over ``rowsBetween(unboundedPreceding,
    currentRow)``; ``sums_excl`` over ``(unboundedPreceding, -1)`` (the
    exclusive sweep shape, 0 on each group's first row — matching
    ``coalesce(sum over excl, 0)``). Exactness rules as attach_running:
    integral sources, ``order_cols`` must totally order rows WITHIN each
    group, and the leading order column should be numeric and
    high-cardinality (a string leading column degrades every row to one
    slice BY CONSTRUCTION — _slice_id only slices types whose double
    cast is monotone in the sort order — so values stay correct and
    parallelism collapses back to per-group). A NULL group key is a group of its own, consistently:
    the windows/groupBy treat NULL as one group and the recombine join
    is null-safe (``eqNullSafe``), so null-group rows carry correct
    running sums instead of vanishing (ADVICE r06 #1)."""
    spark = df.sparkSession
    if parts is None:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    gcols = list(group_cols)
    order = _order(order_cols)
    items = [(src, dst, False) for src, dst in (sums or {}).items()]
    items += [(src, dst, True) for src, dst in (sums_excl or {}).items()]
    dsts = [dst for _, dst, _ in items]
    if len(set(dsts)) != len(dsts):
        raise ValueError(f"duplicate output columns across sums/sums_excl: {dsts}")

    d = df.withColumn(_PID, _slice_id(df, order_cols, parts).cast("int")).repartition(
        parts, col(_PID)
    )
    w = (
        Window.partitionBy(_PID, *gcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy(_PID, *gcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = d
    for src, dst, excl in items:
        frame = w_excl if excl else w
        out = out.withColumn(dst, F.coalesce(F.sum(src).over(frame), lit(0)))

    # per-(slice, group) totals — the exclusive-frame offset is the SAME
    # full-slice total (previous slices contribute whole, so both frames
    # shift by the inclusive per-slice sums of earlier slices).
    totals = d.groupBy(_PID, *gcols).agg(
        *[F.sum(src).alias(f"_t_{dst}") for src, dst, _ in items]
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        col(_PID).alias("_opid"),
        *[col(g).alias(f"_og_{i}") for i, g in enumerate(gcols)],
        *[
            F.coalesce(F.sum(f"_t_{dst}").over(w_off), lit(0)).alias(f"_off_{dst}")
            for _, dst, _ in items
        ],
    )
    cond = col(_PID) == col("_opid")
    for i, g in enumerate(gcols):
        # eqNullSafe, not ==: partitionBy and groupBy above both treat
        # NULL as its own group, so a null group key must also survive
        # this recombine join — a plain equality would silently DROP
        # every null-group row from the output (ADVICE r06 #1).
        cond = cond & (col(g).eqNullSafe(col(f"_og_{i}")))
    out = out.join(F.broadcast(offs), cond)
    for _, dst, _ in items:
        out = out.withColumn(dst, col(dst) + col(f"_off_{dst}"))
    drop = [_PID, "_opid"]
    drop += [f"_og_{i}" for i in range(len(gcols))]
    drop += [f"_off_{dst}" for _, dst, _ in items]
    return out.drop(*drop)


def ntile_exact(
    df: DataFrame,
    order_cols,
    n_buckets: int,
    out: str,
    parts: int | None = None,
) -> DataFrame:
    """Exact ``F.ntile(n)`` over a global order, scalably.

    Spark's ntile gives the first ``N mod n`` buckets ``ceil(N/n)`` rows
    and the rest ``floor(N/n)``; given the global row number and N the
    bucket is closed-form, so this is ``attach_running(rn=...)`` plus a
    broadcast of the single-row count — no single-partition exchange.
    """
    rn = f"_{out}_rn"
    ranked = attach_running(df, order_cols, rn=rn, parts=parts)
    nrow = df.agg(F.count(lit(1)).alias("_N"))
    k = int(n_buckets)
    # q = floor bucket size, r = buckets that get one extra row,
    # (q+1)*r = rows covered by the size-(q+1) buckets. All int64 DIV/%.
    bucket = F.expr(
        f"CAST(CASE "
        f"WHEN {rn} <= ((_N DIV {k}) + 1) * (_N % {k}) "
        f"THEN (({rn} - 1) DIV ((_N DIV {k}) + 1)) + 1 "
        f"WHEN _N DIV {k} > 0 "
        f"THEN (_N % {k}) + (({rn} - ((_N DIV {k}) + 1) * (_N % {k}) - 1) "
        f"DIV (_N DIV {k})) + 1 "
        f"ELSE {rn} END AS BIGINT)"  # N < n_buckets: one row per bucket
    )
    return (
        ranked.join(F.broadcast(nrow), how="cross")
        .withColumn(out, bucket)
        .drop(rn, "_N")
    )
