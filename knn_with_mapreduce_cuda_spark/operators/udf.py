"""T5 — UDF/UDAF/UDTF surface (SURVEY.md §2.T5), the "CUDA kernel slot".

The reference's custom compute lives in a Java Mapper loop and a CUDA
kernel; the Spark-native ladder is:

- ``udf_scalar_py`` — row-at-a-time Python UDF (the slow rung; kept for
  parity and as the correctness twin of the expression distance).
- ``udf_pandas_vectorized`` — Arrow-batched ``@pandas_udf`` with NumPy
  math: the JVM→Python Arrow transfer is the engine's ``cudaMemcpy``
  (SURVEY.md §3.2); swap NumPy→CuPy for the GPU variant.
- ``udf_grouped_agg`` — ``applyInPandas`` per-query-group top-k + vote:
  the Reducer analog.
- ``udf_map_arrow`` — whole-partition ``mapInPandas`` GEMM kNN
  (plans/gemm_knn.py): the tiled-kernel analog and the 100 TB path.
  Graded exactly: GEMM selects the top-k pairs, then distances are
  re-derived with the same Catalyst expression the oracle mirrors, so
  BLAS float noise can't leak into the hash.
- ``udf_grouped_map`` — ``applyInPandas`` grouped transform (per-user
  z-score): N rows in → N rows out per group.
- ``udf_udtf`` — Spark 4 Python UDTF exploding packed top-k lists.

All six are hash-graded (the kNN ones against the same SQL oracles as
T1; the grouped map against its window-SQL twin).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import Window, functions as F
from pyspark.sql.functions import col
from pyspark.sql.types import DoubleType

from .. import tables
from ..functions.vector import sq_euclidean
from ..plans.gemm_knn import knn_topk_gemm
from .knn import (
    K_DEFAULT,
    all_pairs,
    knn_test_topk,
    split_test,
    train_all,
    with_distance,
)

_PAIRS_SQL_T5 = (
    # poisoned-vector convention (r10 non-finite sweep): NULL/non-finite
# component => NULL vector, matching tables.embeddings
"WITH emb AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb, label FROM embeddings), "
    "pairs AS (SELECT q.vec_id AS qid, q.label AS qlabel, t.vec_id AS tid, t.label AS tlabel, "
    "list_distance(q.emb, t.emb) AS dist "
    "FROM emb q, emb t WHERE q.vec_id % 5 = 0 AND t.vec_id <> q.vec_id)"
)


#: GEMM-backed variant: the kernel EXCLUDES poisoned (NULL) vectors at
#: the boundary (r09 exclusion covering the r10 component poisoning),
#: so the udf_map_arrow oracle filters them where the row-UDF twins
#: keep them ranked last.
_PAIRS_SQL_T5_XP = _PAIRS_SQL_T5.replace(
    "AND t.vec_id <> q.vec_id)",
    "AND t.vec_id <> q.vec_id AND q.emb IS NOT NULL AND t.emb IS NOT NULL)",
)


def _q_scalar_py(spark, sf_dir):
    @F.udf(DoubleType())
    def py_euclidean(a, b):
        # poisoned (NULL) vectors yield NULL dist, like the SQL fold
        if a is None or b is None:
            return None
        return float(sum((x - y) * (x - y) for x, y in zip(a, b))) ** 0.5

    e = tables.embeddings(spark, sf_dir)
    q = split_test(e).filter(col("qid") % 25 == 0)
    pairs = all_pairs(q, train_all(e))
    return pairs.select(
        "qid", "tid", F.round(py_euclidean("qemb", "temb"), 4).alias("dist")
    )


def _q_arrow_scalar(spark, sf_dir):
    """Spark 4 Arrow-optimized scalar UDF (``useArrow=True``) — the
    seventh ladder rung between the pickled row UDF and the pandas UDF:
    row-at-a-time Python logic, but Arrow-batch serialization instead of
    pickle framing. Same subset + oracle as udf_scalar_py."""

    @F.udf(DoubleType(), useArrow=True)
    def arrow_euclidean(a, b):
        # poisoned (NULL) vectors yield NULL dist, like the SQL fold
        if a is None or b is None:
            return None
        return float(sum((x - y) * (x - y) for x, y in zip(a, b))) ** 0.5

    e = tables.embeddings(spark, sf_dir)
    q = split_test(e).filter(col("qid") % 25 == 0)
    pairs = all_pairs(q, train_all(e))
    return pairs.select(
        "qid", "tid", F.round(arrow_euclidean("qemb", "temb"), 4).alias("dist")
    )


def _q_pandas_vectorized(spark, sf_dir):
    import numpy as np

    @F.pandas_udf(DoubleType())
    def np_euclidean(a: pd.Series, b: pd.Series) -> pd.Series:
        # same left-to-right accumulation order as the Catalyst fold and
        # DuckDB's list_distance? No — but round(4) on irrational sqrt
        # values is stable; verified against the oracle. Poisoned (None)
        # vectors yield NULL dist (nullable Float64 -> Arrow null).
        mask = a.notna() & b.notna()
        res = np.full(len(a), np.nan)
        if mask.any():
            am = np.stack(a[mask].to_numpy())
            bm = np.stack(b[mask].to_numpy())
            d = am - bm
            res[mask.to_numpy()] = np.sqrt((d * d).sum(axis=1))
        return pd.Series(res).astype("Float64")

    e = tables.embeddings(spark, sf_dir)
    pairs = all_pairs(split_test(e), train_all(e))
    return pairs.select(
        "qid", "tid", F.round(np_euclidean("qemb", "temb"), 4).alias("dist")
    )


def _q_grouped_agg(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    pairs = with_distance(all_pairs(split_test(e), train_all(e)))

    def vote(pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values(["dist", "tid"]).head(K_DEFAULT)
        votes = top.groupby("tlabel").size().reset_index(name="votes")
        votes = votes.sort_values(["votes", "tlabel"], ascending=[False, True])
        return pd.DataFrame(
            {"qid": [pdf["qid"].iloc[0]], "pred_label": [int(votes["tlabel"].iloc[0])]}
        )

    return pairs.select("qid", "tid", "tlabel", "dist").groupBy("qid").applyInPandas(
        vote, "qid long, pred_label int"
    )


def _q_grouped_map(spark, sf_dir):
    """applyInPandas as a grouped TRANSFORM (N rows in → N rows out per
    group), distinct from the grouped-agg reduction above: per-user
    z-score of event values, oracle-twinned to the window SQL. The pandas
    ddof=0 std matches stddev_pop. Scale: one shuffle on the group key;
    each group must fit in one worker's memory — the documented constraint
    of the grouped-map shape (use window functions when it doesn't)."""
    ev = tables.table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=0)
        out = pdf[["event_id", "user_id"]].copy()
        z = (pdf["value"] - mu) / sd if sd > 0 else pdf["value"] * 0.0
        # round(,4) (irrational values — safe) and +0.0 to normalize any
        # -0.0 so both engines hash identically; nullable Float64 so a
        # NULL input value yields SQL NULL (not NaN) like the oracle
        out["z"] = pd.array(z.round(4) + 0.0, dtype="Float64")
        return out

    return (
        ev.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, z double")
    )


def _q_map_arrow(spark, sf_dir):
    e = tables.embeddings(spark, sf_dir)
    q = split_test(e).select("qid", "qemb")
    t = train_all(e).select("tid", "temb")
    sel = knn_topk_gemm(q, t, K_DEFAULT).select("qid", "tid")
    # Re-derive the distance with the exact Catalyst expression so the
    # emitted doubles are bit-identical to the non-GEMM path and oracle.
    j = (
        sel.join(q, "qid")
        .join(t, "tid")
        .withColumn("dist", F.sqrt(sq_euclidean("qemb", "temb")))
    )
    w = Window.partitionBy("qid").orderBy(F.asc_nulls_last("dist"), "tid")
    return j.select(
        "qid",
        "tid",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.round("dist", 4).alias("dist"),
    )


def _q_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="tid bigint, rnk bigint")
    class ExplodeTopk:
        def eval(self, csv: str):
            if not csv:
                return
            for rnk, tid in enumerate(csv.split(","), start=1):
                yield int(tid), rnk

    spark.udtf.register("explode_topk", ExplodeTopk)
    t = knn_test_topk(spark, sf_dir, K_DEFAULT)
    # collect_list gives NO ordering guarantee across the aggregation
    # shuffle (a pre-groupBy orderBy held only by luck at sf0.01 and
    # broke at sf0.1): collect (rnk, tid) structs and array_sort so the
    # CSV is rank-ordered deterministically under any partitioning.
    packed = t.groupBy("qid").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "tid"))),
                lambda s: s["tid"].cast("string"),
            ),
        ).alias("csv")
    )
    packed.createOrReplaceTempView("topk_packed")
    return spark.sql(
        "SELECT s.qid, t.tid, t.rnk FROM topk_packed s, "
        "LATERAL explode_topk(s.csv) t"
    )


def _q_pandas_iter(spark, sf_dir):
    """Iterator-form pandas UDF (``Iterator[Tuple[Series, ...]] →
    Iterator[Series]``) — the once-per-partition initialization slot: a
    model/codebook/tokenizer loads ONCE before the batch loop, then every
    Arrow batch reuses it. This is the pattern an embedding-model or
    LLM-scoring stage uses at 100 TB (init cost amortized over the whole
    partition, not paid per batch). Here the "model" is the squared-norm
    lookup the GEMM identity needs; math is identical to
    udf_pandas_vectorized, so the same oracle grades it."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def np_euclidean_iter(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        state = {"batches": 0}  # stands in for a loaded model
        for a, b in it:
            state["batches"] += 1
            mask = a.notna() & b.notna()
            res = np.full(len(a), np.nan)
            if mask.any():
                am = np.stack(a[mask].to_numpy())
                bm = np.stack(b[mask].to_numpy())
                d = am - bm
                res[mask.to_numpy()] = np.sqrt((d * d).sum(axis=1))
            yield pd.Series(res).astype("Float64")

    e = tables.embeddings(spark, sf_dir)
    pairs = all_pairs(split_test(e), train_all(e))
    return pairs.select(
        "qid", "tid", F.round(np_euclidean_iter("qemb", "temb"), 4).alias("dist")
    )


def _q_apply_arrow(spark, sf_dir):
    """Grouped-map over RAW Arrow tables (Spark 4 ``applyInArrow``) — one
    rung below applyInPandas on the ladder: no pandas conversion at all,
    the UDF sees/returns ``pyarrow.Table``. Same per-user z-score
    semantics as udf_grouped_map, so the same window-SQL oracle grades
    it. Use when the per-group transform is expressible in Arrow compute
    kernels — zero-copy in, zero-copy out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = tables.table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(table: pa.Table) -> pa.Table:
        v = table.column("value")
        mu = pc.mean(v).as_py()
        var = (
            pc.mean(pc.multiply(pc.subtract(v, mu), pc.subtract(v, mu))).as_py()
            if mu is not None
            else None
        )
        sd = var**0.5 if var is not None else 0.0
        if sd > 0:
            # pc.add(…, 0.0): §7.2 negative-zero normalization (the
            # pandas twin does `+ 0.0` too; hit at sf0.1)
            z = pc.add(pc.round(pc.divide(pc.subtract(v, mu), sd), 4), 0.0)
        else:
            # v * 0.0, not a literal zero array: a NULL measurement
            # must stay NULL through the zero-variance branch, matching
            # the window-SQL oracle and the pandas twin (r10 sweep)
            z = pc.multiply(v, 0.0)
        return pa.table(
            {
                "event_id": table.column("event_id"),
                "user_id": table.column("user_id"),
                "z": z,
            }
        )

    return ev.groupBy("user_id").applyInArrow(
        zscore, "event_id long, user_id long, z double"
    )


QUERIES = {
    "udf_scalar_py": _q_scalar_py,
    "udf_arrow_scalar": _q_arrow_scalar,
    "udf_pandas_iter": _q_pandas_iter,
    "udf_apply_arrow": _q_apply_arrow,
    "udf_pandas_vectorized": _q_pandas_vectorized,
    "udf_grouped_agg": _q_grouped_agg,
    "udf_grouped_map": _q_grouped_map,
    "udf_map_arrow": _q_map_arrow,
    "udf_udtf": _q_udtf,
}

ORACLE = {
    "udf_scalar_py": (
        _PAIRS_SQL_T5 + " SELECT qid, tid, round(dist, 4) AS dist FROM pairs "
        "WHERE qid % 25 = 0"
    ),
    "udf_arrow_scalar": (
        _PAIRS_SQL_T5 + " SELECT qid, tid, round(dist, 4) AS dist FROM pairs "
        "WHERE qid % 25 = 0"
    ),
    "udf_pandas_vectorized": (
        _PAIRS_SQL_T5 + " SELECT qid, tid, round(dist, 4) AS dist FROM pairs"
    ),
    "udf_pandas_iter": (
        _PAIRS_SQL_T5 + " SELECT qid, tid, round(dist, 4) AS dist FROM pairs"
    ),
    "udf_grouped_agg": (
        _PAIRS_SQL_T5 + ", "
        "ranked AS (SELECT pairs.*, row_number() OVER (PARTITION BY qid "
        "ORDER BY dist, tid) AS rnk FROM pairs), "
        "topk AS (SELECT * FROM ranked WHERE rnk <= 10), "
        "votes AS (SELECT qid, tlabel, count(*) AS votes FROM topk GROUP BY qid, tlabel), "
        "pred AS (SELECT qid, tlabel, row_number() OVER (PARTITION BY qid "
        "ORDER BY votes DESC, tlabel) AS vr FROM votes) "
        "SELECT qid, tlabel AS pred_label FROM pred WHERE vr = 1"
    ),
    "udf_map_arrow": (
        _PAIRS_SQL_T5_XP + ", "
        "ranked AS (SELECT pairs.*, row_number() OVER (PARTITION BY qid "
        "ORDER BY dist, tid) AS rnk FROM pairs) "
        "SELECT qid, tid, rnk, round(dist, 4) AS dist FROM ranked WHERE rnk <= 10"
    ),
    "udf_udtf": (
        _PAIRS_SQL_T5 + ", "
        "ranked AS (SELECT pairs.*, row_number() OVER (PARTITION BY qid "
        "ORDER BY dist, tid) AS rnk FROM pairs) "
        "SELECT qid, tid, rnk FROM ranked WHERE rnk <= 10"
    ),
    "udf_apply_arrow": (
        "WITH ev AS (SELECT event_id, user_id, value, "
        "avg(value) OVER w AS mu, stddev_pop(value) OVER w AS sd FROM events "
        "WINDOW w AS (PARTITION BY user_id)) "
        "SELECT event_id, user_id, "
        # value * 0.0, not literal 0.0: a NULL value (non-finite
        # sanitized at ingest, r10 sweep) must stay NULL in the
        # zero-variance branch too, like the pandas/arrow engines
        "CASE WHEN sd > 0 THEN round((value - mu) / sd, 4) + 0.0 "
        "ELSE value * 0.0 END AS z FROM ev"
    ),
    "udf_grouped_map": (
        "WITH ev AS (SELECT event_id, user_id, value, "
        "avg(value) OVER w AS mu, stddev_pop(value) OVER w AS sd FROM events "
        "WINDOW w AS (PARTITION BY user_id)) "
        "SELECT event_id, user_id, "
        # value * 0.0, not literal 0.0: a NULL value (non-finite
        # sanitized at ingest, r10 sweep) must stay NULL in the
        # zero-variance branch too, like the pandas/arrow engines
        "CASE WHEN sd > 0 THEN round((value - mu) / sd, 4) + 0.0 "
        "ELSE value * 0.0 END AS z FROM ev"
    ),
}
