"""IVF (inverted-file) similarity index — k-means coarse quantizer +
multi-probe search (SCALE.md §5.3; the FAISS IVF-Flat layout re-expressed
as DataFrames).

``ml_kmeans_lloyd`` (operators/iterative.py) is the trainer: its
centroids become the coarse quantizer. The index is just a partitioned
table — every vector tagged with its nearest centroid — so "build" is one
assignment pass and "search" is:

1. rank centroids per query (k_cells × n_queries tiny cross join,
   centroids broadcast),
2. probe only the ``n_probe`` best cells — an equi-join on cell id, the
   candidate set shrinks ~k_cells/n_probe-fold,
3. exact distance + window top-k over the candidates.

Recall is tunable with ``n_probe`` (n_probe = k_cells ⇒ exhaustive ⇒
recall 1.0 — asserted in tests). At 100 TB the assignment pass writes the
index partitioned/bucketed BY cell so a probe reads only its cells'
files — partition pruning does the candidate cut at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import col

from ..functions.vector import sq_euclidean


def build_ivf_index(e: DataFrame, iters: int = 2) -> tuple[DataFrame, DataFrame]:
    """Train the coarse quantizer and assign every vector to a cell.

    e: (vec_id, emb, label). Returns (centroids(c, cent), index(vec_id,
    emb, c)) — the index is the thing to persist partitioned by ``c``.
    """
    from ..operators.iterative import _lloyd

    centroids, assign = _lloyd(e, iters)
    index = assign.join(e, "vec_id").select("vec_id", "emb", "c")
    return centroids, index


def ivf_search(
    queries_df: DataFrame,
    centroids: DataFrame,
    index: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k euclidean neighbors probing only each query's n_probe best
    cells. queries_df: (qid, qemb). Returns (qid, tid, rnk, dist)."""
    ranked_cells = queries_df.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", sq_euclidean(col("qemb"), col("cent"))
    )
    wc = Window.partitionBy("qid").orderBy(F.asc_nulls_last("cdist"), "c")
    probes = (
        ranked_cells.withColumn("crnk", F.row_number().over(wc))
        .filter(col("crnk") <= n_probe)
        .select("qid", "qemb", "c")
    )
    cand = probes.join(index, "c").filter(col("qid") != col("vec_id"))
    scored = cand.withColumn("dist", F.sqrt(sq_euclidean(col("qemb"), col("emb"))))
    w = Window.partitionBy("qid").orderBy(F.asc_nulls_last("dist"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select("qid", col("vec_id").alias("tid"), "rnk", "dist")
    )
