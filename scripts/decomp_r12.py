#!/usr/bin/env python
"""Round-12 guide-§1 decompositions: where do llm_pipeline_ingest and
llm_dedup_minhash_mllib actually spend their time? Stage-by-stage noop
timings in one warm session (cheap key first so session warm-up doesn't
land on the first probe).

Usage: python scripts/decomp_r12.py  -> prints one line per probe
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import llm
from knn_with_mapreduce_cuda_spark.session import get_spark


def t(label, df, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: cold {runs[0]} warm {sorted(runs[1:])}", flush=True)
    return runs


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("decomp_r12")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, sf_dir, "documents").count()  # warm-up

    # ---- llm_pipeline_ingest stages
    t("tokens_wide", llm._tokens_wide(spark, sf_dir))
    t("minhash_bands", llm._minhash_bands(spark, sf_dir))
    t("dedup_incremental", llm._q_dedup_incremental(spark, sf_dir))
    t("gopher_repetition", llm._q_gopher_repetition(spark, sf_dir))
    t("chunk_windows", llm._q_chunk_windows(spark, sf_dir))
    t("pipeline_ingest (composed)", llm._q_pipeline_ingest(spark, sf_dir))

    # ---- llm_dedup_minhash_mllib stages
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    tt = llm._tokens(spark, sf_dir).select("doc_id", "ts").filter(
        col("ts").isNotNull()
    )
    if llm._fixture_rows(sf_dir, "documents") > llm.MINHASH_MLLIB_EXACT_MAX_DOCS:
        bucket = F.substring(F.md5(col("doc_id").cast("string")), 1, 2)
        tt = tt.filter(bucket < "1a")
    t0 = time.perf_counter()
    cv = CountVectorizer(inputCol="ts", outputCol="v", binary=True, vocabSize=1 << 18)
    cvm = cv.fit(tt)
    print(f"mllib cv.fit: {time.perf_counter() - t0:.3f}", flush=True)
    vecs = cvm.transform(tt)
    t("mllib cv.transform", vecs)
    t0 = time.perf_counter()
    mh = MinHashLSH(inputCol="v", outputCol="hashes", numHashTables=5, seed=42)
    model = mh.fit(vecs)
    print(f"mllib mh.fit: {time.perf_counter() - t0:.3f}", flush=True)
    joined = model.approxSimilarityJoin(vecs, vecs, 0.6, distCol="jdist")
    found = joined.filter(col("datasetA.doc_id") < col("datasetB.doc_id")).select(
        col("datasetA.doc_id").alias("doc_a"),
        col("datasetB.doc_id").alias("doc_b"),
    )
    t("mllib approxSimilarityJoin", found)
    dt = tt.select("doc_id", F.array_distinct("ts").alias("ds"))
    a = dt.select(col("doc_id").alias("doc_a"), F.explode("ds").alias("tok"))
    b = dt.select(col("doc_id").alias("doc_b"), F.explode("ds").alias("tok"))
    inter = (
        a.join(b, "tok")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = dt.select("doc_id", F.size("ds").alias("n"))
    exact = (
        inter.join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("na")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), "doc_b")
        .filter(col("i") * 7 > (col("na") + col("nb")) * 2)
        .select("doc_a", "doc_b")
    )
    t("mllib exact twin", exact)
    t("mllib full key", llm._q_dedup_minhash_mllib(spark, sf_dir))


if __name__ == "__main__":
    main()
